package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling for training-data curation: pick a
  * size-n sample where inclusion probability is proportional to a
  * per-row weight (quality score, token count, dedup-cluster mass…).
  *
  * The design is SYSTEMATIC probability-proportional-to-size sampling:
  * lay the rows out on a 0..W line (W = Σweights) in id order, place n
  * equally-spaced ticks (step = W div n) starting at the midpoint
  * offset step/2, and take every row whose weight interval contains a
  * tick — a textbook PPS design (Madow's systematic selection), made
  * fully deterministic by the fixed midpoint start and the id ordering.
  * Rows heavier than `step` can catch several ticks; the `copies`
  * column reports that multiplicity honestly (Σ copies = n exactly),
  * which is what a with-replacement training mixture actually consumes.
  * Everything is INTEGER arithmetic — no RNG, no transcendentals — so
  * the same formula replayed anywhere (including the DuckDB oracle)
  * selects the identical sample.
  *
  * Scale posture: the only global structure is a prefix sum over id
  * order, computed with the bucketed two-pass pattern (per-bucket sums
  * → |buckets|-row cumulative window → broadcast offsets → in-bucket
  * window), the same shape as Search.vocabGrowth — no corpus-scale
  * single-partition window. One shuffle (the bucket aggregate); the
  * tick test is a projection.
  */
object Sampling {

  /** PPS systematic sample of `n` ticks. `weightCol` must be a positive
    * integral column (fail-loud on w ≤ 0: a zero-weight row can never
    * be selected and a negative weight breaks the line layout — both
    * are upstream bugs, not rows to skip silently). `idCol` must be
    * numeric and unique; it defines the (arbitrary but fixed) traversal
    * order and the bucketing for the distributed prefix sum.
    *
    * Output: (id, weight, copies ≥ 1) — the sampled rows only.
    */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: String, n: Int,
                    bucketWidth: Long = 1024): DataFrame = {
    require(n > 0, "sample size must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val rows = df.select(col(idCol).cast("long").as("id"),
        when(col(weightCol).cast("long") <= 0,
          raise_error(concat(lit(s"ppsSystematic: non-positive weight in '$weightCol' at id "),
            col(idCol).cast("string"))))
          .otherwise(col(weightCol).cast("long")).as("w"))
      .withColumn("__b", expr(s"id div ${bucketWidth}L"))

    val perBucket = rows.groupBy("__b").agg(sum(col("w")).as("__bsum"))
    val wB = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // |buckets| rows — the single-partition window is metadata-scale
    val offsets = perBucket
      .withColumn("__off", sum(col("__bsum")).over(wB) - col("__bsum"))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixed = rows.join(broadcast(offsets), Seq("__b"))
      .withColumn("c", sum(col("w")).over(wIn) + col("__off"))

    // total weight as a broadcast scalar; step/offset derive from it
    // (named wtot: Spark's default resolver is case-insensitive, so a
    // "W" column would collide with the per-row weight "w")
    val total = df.select(sum(col(weightCol).cast("long")).as("wtot"))
    val params = broadcast(total
      .withColumn("step", expr(s"wtot div ${n}L"))
      .withColumn("off", expr("step div 2L")))

    // ticks at off + j*step, j = 0..n-1; ticksUpTo over a NAMED column so
    // the count stays in integer `div` arithmetic (Column.divide is
    // floating-point and would lose exactness near 2^53)
    def ticksUpTo(nm: String) =
      least(lit(n.toLong), greatest(lit(0L),
        when(col(nm) >= 0L, expr(s"$nm div step") + 1L).otherwise(lit(0L))))

    prefixed.crossJoin(params)
      .withColumn("__guard",
        when(col("step") <= 0, raise_error(lit(
          s"ppsSystematic: total weight smaller than sample size $n"))).otherwise(lit(0)))
      .withColumn("__hi", col("c") - col("off") + col("__guard"))
      .withColumn("__lo", col("c") - col("w") - col("off"))
      .withColumn("copies", ticksUpTo("__hi") - ticksUpTo("__lo"))
      .filter(col("copies") >= 1)
      .select(col("id"), col("w"), col("copies"))
  }

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007): a size-k
    * WITHOUT-replacement weighted sample that carries an unbiased
    * subset-sum estimator — the complement to [[ppsSystematic]]'s
    * with-replacement mixture ticks. Each row gets priority
    * `p = w / u` with `u` uniform in (0,1); the k highest-priority rows
    * are kept; τ is the (k+1)-th priority; each kept row estimates its
    * stratum as `ŵ = max(w, τ)`. Any downstream subset-sum
    * `Σ_{kept ∩ S} ŵ` is then unbiased for `Σ_S w` — the property that
    * makes a 100-row sample answer per-source/per-language budget
    * questions about a 100 TB corpus with NO second scan.
    *
    * `u` is hash-derived (first 8 md5 hex of the id, midpoint-offset,
    * over 2^32), not an RNG — the identical draw replays in any engine,
    * so the ENTIRE sample, τ, and every estimate are exact-replayable
    * (the q201 oracle hash-gates all of them; no envelope needed).
    *
    * Scale posture: priorities are a projection; the only global
    * structure is top-(k+1), which Spark executes as
    * TakeOrderedAndProject (per-partition bounded heaps, no sort, no
    * extra shuffle). τ and the total-weight scalar travel as broadcast
    * 1-row frames.
    *
    * Output: (id, w, est_micro, total_in_band) for the k kept rows —
    * `est_micro = round(max(w, τ)·1e6)`, and `total_in_band` pins the
    * realized full-population estimate `Σ ŵ` inside the
    * `σ·W/√(k−1)` band implied by the estimator's variance bound
    * (Var ≤ W²/(k−1) for any weights).
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     sigmas: Double = 5.0): DataFrame = {
    require(k > 1, "sample size must exceed 1 (tau needs a k+1-th row)")
    val rows = df.select(col(idCol).cast("long").as("id"),
        when(col(weightCol).cast("long") <= 0,
          raise_error(concat(lit(s"prioritySample: non-positive weight in '$weightCol' at id "),
            col(idCol).cast("string"))))
          .otherwise(col(weightCol).cast("long")).as("w"))
      // u in (0,1): md5-derived 32-bit draw at midpoint offset — 0 and 1
      // are both unreachable, so w/u can neither overflow nor divide by 0
      .withColumn("u",
        (conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long").cast("double") + 0.5) / 4294967296.0)
      .withColumn("pri", col("w").cast("double") / col("u"))
    // top-(k+1): TakeOrderedAndProject — bounded per-partition heaps
    val top = rows.orderBy(col("pri").desc, col("id").asc).limit(k + 1)
      .localCheckpoint() // ≤ k+1 rows, read three times below
    val tau = top.agg(
      when(count(lit(1)) === (k + 1), min(col("pri"))).otherwise(lit(0.0)).as("tau"))
    val wtot = df.agg(sum(col(weightCol).cast("long")).as("wtot"))
    val kept = top.orderBy(col("pri").desc, col("id").asc).limit(k)
      .crossJoin(broadcast(tau))
      .select(col("id"), col("w"),
        round(greatest(col("w").cast("double"), col("tau")) * 1e6).cast("long")
          .as("est_micro"))
    val band = kept.agg(sum(col("est_micro")).as("s"))
      .crossJoin(broadcast(wtot))
      .select((abs(col("s").cast("double") - col("wtot").cast("double") * 1e6)
        <= lit(sigmas * 1e6 / math.sqrt((k - 1).toDouble)) * col("wtot").cast("double"))
        .as("total_in_band"))
    kept.crossJoin(broadcast(band))
  }
}
