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
}
