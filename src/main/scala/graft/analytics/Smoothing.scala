package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exponentially-weighted smoothing of a daily count series — the
  * trend/monitoring view over ingest volumes (events per day, orders per
  * day) that a raw daily count is too noisy for.
  *
  * α is FIXED at ½ and the kernel truncated at 64 days, and both are
  * load-bearing, not arbitrary: with α = ½ every kernel weight is an
  * exact binary power 2⁰..2⁶³, so each term `x·2^(63−Δ)` is an EXACT
  * decimal product, the num/den reductions are order-independent exact
  * decimal sums (never a float accumulation — the repo's [[Drift]]
  * determinism discipline), and day 64 would carry weight 2⁻⁶⁴ ≈ 5e-20 —
  * below double resolution of any realistic count anyway. The result is
  * bit-identical at any parallelism and in any engine evaluating the
  * same plan; the one float op is the final num/den division.
  */
object Smoothing {

  /** Trailing-64-day EWMA (α = ½) over the per-day row counts of
    * `df.dateCol`. Output: (day 'yyyy-MM-dd', x, ewma_micro) — the
    * smoothed count in integer micro-units — one row per OBSERVED day,
    * day order. Weights decay by CALENDAR distance; unobserved days
    * inside the kernel contribute nothing to numerator or denominator
    * (observed-day semantics — densify with a calendar fill first, q89
    * style, if zero-filled decay is wanted).
    *
    * Scale shape: the corpus collapses to day cardinality in one
    * map-side-combinable count; everything after — the 64-offset
    * expansion, the self-join on shifted days, the exact decimal
    * aggregation — is (days × 64)-sized, i.e. ~2 × 10⁵ rows for a
    * decade, regardless of corpus size. Per-day counts route through
    * [[Drift.decCap]]: exact below 10¹⁸ rows/day, fail-loud past it
    * (where the 38-digit product headroom would end).
    */
  def dailyEwma(df: DataFrame, dateCol: String): DataFrame = {
    val session = df.sparkSession
    val daily = df
      .filter(col(dateCol).isNotNull)
      .select(to_date(col(dateCol)).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("x"))
      .localCheckpoint() // anchor side and shifted side both read it
    val offsets = session.range(0, 64)
      .select(col("id").cast("int").as("j"),
        pow(lit(2.0), lit(63) - col("id")).cast(DecimalType(20, 0)).as("w"))
    val terms = daily.select(col("d").as("anchor"))
      .crossJoin(broadcast(offsets))
      .withColumn("src_day", date_sub(col("anchor"), col("j")))
      .join(daily.withColumnRenamed("d", "src_day"), Seq("src_day"))
    terms
      .groupBy(col("anchor"))
      .agg(
        sum(when(col("j") === 0, col("x")).otherwise(0L)).as("x"),
        sum(col("w") * Drift.decCap(col("x"))).as("__num"),
        sum(col("w")).as("__den"))
      .select(date_format(col("anchor"), "yyyy-MM-dd").as("day"), col("x"),
        round(col("__num").cast("double") / col("__den").cast("double") * 1e6)
          .cast("long").as("ewma_micro"))
      .orderBy(col("day"))
  }
}
