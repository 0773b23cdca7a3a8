package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Johnson–Lindenstrauss random projection with a DETERMINISTIC ±1
  * sign matrix (Achlioptas 2003: Rademacher entries satisfy the JL
  * lemma; no Gaussians needed). The 100 TB story: a d→d′ projection
  * shrinks every downstream ANN / clustering / dedup scan by d/d′
  * while preserving all pairwise geometry to 1 ± ε with
  * ε ≈ √(8·ln n / d′) — and because the projection is LINEAR,
  * preserving norms preserves distances (a difference of vectors is a
  * vector). The projection is a per-row map: no shuffle, no state,
  * embarrassingly parallel at any scale.
  *
  * Determinism discipline (the hash-gate contract): the sign matrix
  * derives from md5(i"_"j) parity — replayable in any engine — and the
  * projection runs in micro fixed-point: component x → round(x·10⁶)
  * BIGINT first, then integer multiply-accumulate. Integer sums are
  * order-free, so engine and oracle agree to the last bit (the
  * float-sum-order trap that forced min/max anchoring elsewhere —
  * PLAN_AUDIT r8 batch-13 — cannot occur here).
  */
object Project {

  /** +1/−1 from the parity of the first 8 md5 hex chars of "i_j" —
    * the same 32-bit md5 slice every other deterministic draw in the
    * engine uses (Splits.bucket, Sampling.prioritySample). */
  private[graft] def sign(i: Int, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"${i}_${j}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
  }

  /** Project `vecCol` (length `inDims`, fail-loud otherwise) to
    * `outDims` integer components `p_j = Σ_i round(x_i·10⁶)·s_ij` and
    * emit a per-row fidelity record:
    *
    *   - `x_norm2`:    Σ round(x_i·10⁶)²            (exact BIGINT)
    *   - `p_norm2`:    Σ p_j²                        (exact BIGINT)
    *   - `p_checksum`: Σ (j+1)·p_j — a position-weighted fold of the
    *     whole projected vector, so ANY flipped sign or misordered
    *     component breaks the hash gate without shipping d′ rows/row
    *   - `distortion_ok`: |p_norm2 − d′·x_norm2| ≤ σ·√(2/d′)·d′·x_norm2
    *     (E[p_norm2] = d′·x_norm2 for Rademacher signs; relative std
    *     √(2/d′))
    */
  def jlSketch(df: DataFrame, idCol: String, vecCol: String,
               inDims: Int, outDims: Int, sigmas: Double = 5.0): DataFrame = {
    require(inDims > 0 && outDims > 0, "dims must be positive")
    val checked = df.select(col(idCol).as("id"),
      when(size(col(vecCol)) =!= inDims,
        raise_error(concat(lit(s"jlSketch: expected $inDims dims, got "),
          size(col(vecCol)).cast("string"))))
        .otherwise(transform(col(vecCol).cast(ArrayType(DoubleType)),
          x => round(x * 1e6).cast("long"))).as("xm"))
    val projs = (0 until outDims).map { j =>
      val signs = typedLit((0 until inDims).map(i => sign(i, j)))
      aggregate(zip_with(col("xm"), signs, (a, b) => a * b),
        lit(0L), (acc, t) => acc + t).as(s"p$j")
    }
    val projected = checked.select(
      col("id") +:
      aggregate(col("xm"), lit(0L), (acc, x) => acc + x * x).as("x_norm2") +:
      projs: _*)
    val pCols = (0 until outDims).map(j => col(s"p$j"))
    val pNorm2 = pCols.map(p => p * p).reduce(_ + _)
    val pChecksum = pCols.zipWithIndex.map { case (p, j) => p * lit(j + 1L) }
      .reduce(_ + _)
    val band = lit(sigmas * math.sqrt(2.0 / outDims) * outDims)
    projected.select(col("id"), col("x_norm2"),
      pNorm2.as("p_norm2"), pChecksum.as("p_checksum"),
      (abs(pNorm2 - lit(outDims.toLong) * col("x_norm2")).cast("double")
        <= band * col("x_norm2").cast("double")).as("distortion_ok"))
  }
}
