package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier statistics per group — the
  * anomaly-detection layer over a metric column. Mean/stddev z-scores
  * are themselves dragged by the outliers they are supposed to flag; the
  * median absolute deviation is the standard breakdown-point-0.5
  * replacement: a point is anomalous when
  * {{{ |x − median| > k · 1.4826 · MAD }}}
  * (1.4826 ≈ 1/Φ⁻¹(¾) makes MAD consistent for the normal scale, k = 3
  * the conventional cut).
  */
object Robust {

  /** Per-group robust outlier report. Output:
    * (groupCol, n, med, mad, n_outliers) with med/mad rounded to 4dp —
    * one row per group, group-name order.
    *
    * Medians are Spark's EXACT interpolating `percentile` (the same
    * definition as the oracle engine's `quantile_cont`), computed in
    * two grouped aggregations — value median first, then the median of
    * absolute deviations — with the group-cardinality med/mad frames
    * broadcast back; no corpus-sized shuffle beyond the two per-group
    * aggregations themselves. Nulls and NaNs are excluded up front (a
    * NaN poisons a sort-based percentile). The cut multiplies once:
    * `k · 1.4826` is folded to a single literal so both engines compare
    * against the identical product.
    */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  k: Double = 3.0): DataFrame = {
    val cut = k * 1.4826
    val e = df
      .filter(col(valueCol).isNotNull && !isnan(col(valueCol)) &&
        col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"))
    val med = e.groupBy(col("__g"))
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    val ad = e.join(broadcast(med), Seq("__g"))
      .withColumn("__ad", abs(col("__v") - col("__med")))
    val mad = ad.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), expr("percentile(__ad, 0.5)").as("__mad"))
    ad.join(broadcast(mad), Seq("__g"))
      .groupBy(col("__g"))
      .agg(
        first(col("n")).as("n"),
        first(round(col("__med"), 4)).as("med"),
        first(round(col("__mad"), 4)).as("mad"),
        sum(when(col("__ad") > lit(cut) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("__g").as(groupCol), col("n"), col("med"), col("mad"),
        col("n_outliers"))
      .orderBy(col(groupCol))
  }
}
