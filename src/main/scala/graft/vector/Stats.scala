package graft.vector

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.functions.{vector_moments, VectorMoments}

/** Corpus-level vector statistics on one [[VectorMoments]] pass:
  * per-dimension standardization audits and the top principal
  * component. Both split the work the way 100 TB demands — the
  * data-sized term is a single constant-buffer aggregate (one ~17 KB
  * partial per partition at d = 64), and everything after is O(d²)
  * metadata math.
  */
object Stats {

  private def asDouble(vecCol: String) =
    col(vecCol).cast(ArrayType(DoubleType))

  /** Per-dimension mean/std (population, micro-units) plus the count of
    * 3σ outlier COMPONENTS per dimension — the pre-training embedding
    * health report (a dimension whose std collapses to 0 is dead; one
    * with heavy 3σ mass is corrupt or unnormalized input).
    *
    * Two passes, both cheap: the moments aggregate fixes (mean, std)
    * per dimension, then the outlier count re-scans with the 64-row
    * stats frame broadcast — the z-test is `|x·10⁶ − mean_micro| >
    * 3·std_micro` in EXACT micro-unit arithmetic, so engine and oracle
    * count the same components whenever the (micro-rounded) stats
    * agree, with no float-division edge at the boundary.
    *
    * Output: (dim, mean_micro, std_micro, n_outliers), one row per
    * dimension.
    */
  def standardizeAudit(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(vecCol)
    val m = emb.agg(vector_moments(v).as("m"))
      .select(col("m.n").as("n"), col("m.s").as("s"), col("m.s2").as("s2"))
    // diag index of dim i in the flattened upper triangle: i(2d−i+1)/2
    val d = size(col("s"))
    val stats = m
      .select(col("n"), posexplode(col("s")).as(Seq("dim", "sum_x")),
        element_at(col("s2"),
          (col("dim") * (lit(2) * d - col("dim") + lit(1)) / lit(2) + lit(1))
            .cast("int")).as("sum_xx"))
      .select(col("dim").cast(LongType).as("dim"),
        (col("sum_x") / col("n")).as("mean"),
        sqrt(greatest(col("sum_xx") / col("n")
          - (col("sum_x") / col("n")) * (col("sum_x") / col("n")), lit(0.0)))
          .as("std"))
      .select(col("dim"),
        round(col("mean") * 1e6).cast(LongType).as("mean_micro"),
        round(col("std") * 1e6).cast(LongType).as("std_micro"))
    val comps = emb.select(posexplode(v).as(Seq("dim", "x")))
      .select(col("dim").cast(LongType).as("dim"), col("x"))
    comps.join(broadcast(stats), Seq("dim"))
      .groupBy(col("dim"), col("mean_micro"), col("std_micro"))
      .agg(sum(when(col("std_micro") > 0 &&
        abs(col("x") * 1e6 - col("mean_micro").cast(DoubleType))
          > (col("std_micro") * 3).cast(DoubleType), 1L).otherwise(0L))
        .as("n_outliers"))
      .select(col("dim"), col("mean_micro"), col("std_micro"), col("n_outliers"))
  }

  /** Per-dimension affine int8 quantization of an embedding corpus —
    * the embedding-STORE compression op (4× over float32, 8× over
    * float64) a 100 TB vector table runs before anything else touches
    * it: codes `round((x − min_d)/scale_d)` clamped to [0, 255] with
    * `scale_d = (max_d − min_d)/255` from one per-dimension min/max
    * pass; a constant dimension (scale 0) quantizes to code 0 with
    * zero error rather than dividing by zero.
    *
    * Everything is a fixed double-op chain over corpus statistics, so
    * the codes — and therefore the round-trip error — are DETERMINISTIC
    * and the gate hashes them directly (no envelope): per vector, the
    * code sum and the max dequantization error in micro-units, plus the
    * hard bound `max_err ≤ scale_d/2 + ε` that affine rounding
    * guarantees per dimension.
    *
    * Scale: min/max is one map-side-combinable d-group aggregate; the
    * quantization pass broadcasts the d-row parameter table as two
    * aligned arrays and runs row-local `zip_with`/`transform` — no
    * shuffle of the corpus.
    *
    * Output: (vec_id, codes array<int>, max_err_micro, within_bound).
    */
  /** One-row (los, scales) parameter frame for [[quantizeInt8]]: per-dim
    * corpus min and `(max − min)/255`. min/max are order-independent —
    * the reason the whole quantization is bit-deterministic. */
  def quantizeParams(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    emb.select(posexplode(asDouble(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .groupBy()
      .agg(
        expr("transform(array_sort(collect_list(struct(dim, lo))), e -> e.lo)")
          .as("los"),
        expr("transform(array_sort(collect_list(struct(dim, hi))), e -> e.hi)")
          .as("his"))
      .select(col("los"),
        zip_with(col("his"), col("los"), (h, l) => (h - l) / lit(255.0))
          .as("scales"))

  /** Codes only, under a CALLER-supplied parameter frame — how queries
    * are quantized against a corpus's params at serving time. */
  def quantizeCodesWith(df: DataFrame, params: DataFrame,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val code = expr(
      """zip_with(zip_with(__v, __los, (x, l) -> x - l), __scales,
        |  (d, s) -> CASE WHEN s = 0D THEN 0
        |                 ELSE CAST(least(255D, greatest(0D, round(d / s))) AS INT)
        |            END)""".stripMargin)
    df.select(col(idCol).as("vec_id"), asDouble(vecCol).as("__v"))
      .crossJoin(broadcast(params.select(col("los").as("__los"),
        col("scales").as("__scales"))))
      .select(col("vec_id"), code.as("codes"))
  }

  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(vecCol)
    val params = quantizeParams(emb, vecCol)
    val code = expr(
      """zip_with(zip_with(__v, __los, (x, l) -> x - l), __scales,
        |  (d, s) -> CASE WHEN s = 0D THEN 0
        |                 ELSE CAST(least(255D, greatest(0D, round(d / s))) AS INT)
        |            END)""".stripMargin)
    val dequantErr = expr(
      """zip_with(zip_with(zip_with(__v, __los, (x, l) -> x - l), __scales,
        |  (d, s) -> CASE WHEN s = 0D THEN abs(d)
        |            ELSE abs(d - least(255D, greatest(0D, round(d / s))) * s) END),
        |  __scales, (e, s) -> e - s / 2D)""".stripMargin)
    emb.select(col(idCol).as("vec_id"), v.as("__v"))
      .crossJoin(broadcast(params.select(col("los").as("__los"),
        col("scales").as("__scales"))))
      .select(col("vec_id"), code.as("codes"),
        expr("""CAST(round(aggregate(zip_with(zip_with(__v, __los, (x, l) -> x - l),
          |  __scales, (d, s) -> CASE WHEN s = 0D THEN abs(d)
          |    ELSE abs(d - least(255D, greatest(0D, round(d / s))) * s) END),
          |  0D, (a, e) -> CASE WHEN e > a THEN e ELSE a END) * 1e6) AS BIGINT)"""
          .stripMargin).as("max_err_micro"),
        // affine rounding guarantees err ≤ scale/2 per dim (+1 micro of
        // rounding slack on the comparison itself)
        aggregate(dequantErr, lit(true).cast("boolean"),
          (acc, e) => acc && e <= lit(1e-6)).as("within_bound"))
  }

  /** Top-k retrieval over the QUANTIZED store — the serving payoff of
    * [[quantizeInt8]]: queries are coded with the corpus's params and
    * scored by the integer code dot product (≤ d·255² ≈ 4.2M at d = 64,
    * exact in a long and in the Double the bounded heap carries).
    * Everything is integer, so ranks, ties (score desc, id asc), and
    * scores replay in the oracle exactly — a full hash gate, where
    * float-cosine ANN needs rounded scores.
    *
    * Scale: the corpus crosses ONCE against the broadcast coded query
    * set and reduces through [[Similarity.TopKAgg]]'s bounded heap —
    * |queries|·k rows cross the shuffle, the q28 contract, now at a
    * quarter the scan bandwidth (int8 vs float32).
    */
  def int8TopK(emb: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val params = quantizeParams(emb)
    val corpus = quantizeCodesWith(emb, params)
    val q = quantizeCodesWith(queries, params)
      .select(col("vec_id").as("query_id"), col("codes").as("qcodes"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("codes"), col("qcodes"),
            (a, b) => a.cast("long") * b.cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double").as("score"))
      .as[Similarity.Scored]
    Similarity.rankTopK(scored, k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("score").cast("long").as("dot"))
  }

  /** Top principal component by the textbook distributed split
    * (identical to MLlib RowMatrix: Gramian on the cluster, eigensolve
    * on the driver): ONE moments pass builds the d×d population
    * covariance, rounded to micro-units so engine and oracle iterate
    * the SAME matrix; then `iters` rounds of power iteration on the
    * d×d — pure O(d²·iters) driver math on a matrix that is 32 KB at
    * d = 64, the bounded-by-construction coordination pattern
    * (Coreset/Bpe class), not a data collect.
    *
    * Protocol (replayed verbatim by the DuckDB oracle): v₀ = 1/√d;
    * each round w = C_micro/10⁶ · v, v = round(w/‖w‖·10⁶)/10⁶ — the
    * per-round micro-round pins the iterate across engines so float
    * summation-order drift cannot compound. λ is the Rayleigh quotient
    * vᵀCv of the final iterate (v is unit up to rounding, so no
    * division), in micro-units.
    *
    * Output: (dim, loading_micro, eigval_micro), one row per dimension.
    */
  def pcaTopComponent(emb: DataFrame, vecCol: String = "embedding",
                      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = emb.sparkSession
    val mrow = emb.agg(vector_moments(asDouble(vecCol)).as("m"))
      .select(col("m.n"), col("m.s"), col("m.s2")).head()
    val n = mrow.getLong(0)
    require(n > 0, "pcaTopComponent: empty input")
    val s = mrow.getSeq[Double](1).toArray
    val s2 = mrow.getSeq[Double](2).toArray
    val d = s.length
    // half-away-from-zero, matching DuckDB/Spark round() on the values
    // that arise here (exact .5 ties are measure-zero in covariance)
    def micro(x: Double): Long =
      (if (x >= 0) math.floor(x * 1e6 + 0.5) else math.ceil(x * 1e6 - 0.5)).toLong
    val cMic = Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      micro(s2(VectorMoments.triIdx(lo, hi, d)) / n - (s(lo) / n) * (s(hi) / n))
    }
    var vv = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += cMic(i)(j) / 1e6 * vv(j); j += 1 }
        acc
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "pcaTopComponent: zero covariance matrix")
      vv = w.map(x => micro(x / nrm) / 1e6)
    }
    var lam = 0.0
    for (i <- 0 until d; j <- 0 until d) lam += vv(i) * (cMic(i)(j) / 1e6) * vv(j)
    val lamMic = micro(lam)
    val rows = (0 until d).map(i =>
      Row(i.toLong, math.round(vv(i) * 1e6), lamMic))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("dim", LongType, nullable = false),
        StructField("loading_micro", LongType, nullable = false),
        StructField("eigval_micro", LongType, nullable = false))))
  }
}
