package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point detection over a daily metric (Page 1954) — the
  * monitor that catches a sustained small LEVEL SHIFT which per-window
  * drift scores (q114/q115/q141/q149/q191 compare distributions
  * window-by-window) smear out: CUSUM accumulates evidence across days,
  * so a 1σ shift that never alarms any single window alarms the
  * cumulative statistic within a few days.
  *
  * The recursion `S⁺_t = max(0, S⁺_{t−1} + (x_t − μ₀ − δ))` looks
  * sequential, but has an exact closed form via prefix sums:
  * `S⁺_t = P_t − min(0, min_{j≤t} P_j)` with
  * `P_t = Σ_{i≤t} (x_i − μ₀ − δ)` — so both the engine and the SQL
  * oracle compute it with two window functions over the DAY frame, in
  * exact integer micro-units; the q206 gate is a full hash match (the
  * q204 lesson again: replace the sequential formulation with its
  * closed-form characterization).
  *
  * Scale split: the data term is one groupBy(day) with map-side
  * combine; the CUSUM windows then run over the ~|days| frame — the
  * same metadata-scale single-partition window licence as
  * [[graft.operators.Sampling.ppsSystematic]]'s bucket offsets.
  */
object ChangePoint {

  /** Daily-mean CUSUM. Baseline μ₀ = mean of the first `baselineDays`
    * daily means (integer div); slack δ = μ₀·slackPct/100; threshold
    * h = δ·hMult. Output per day, all exact micro integers:
    * (day, x_micro, s_pos, s_neg, alarm_up, alarm_down).
    */
  def cusumDaily(events: DataFrame, tsCol: String, valCol: String,
                 baselineDays: Int = 7, slackPct: Int = 5,
                 hMult: Int = 6): DataFrame = {
    require(baselineDays > 0 && slackPct > 0 && hMult > 0, "positive knobs")
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).as("sm"),
        count(lit(1)).as("n"))
      // floor_div, not `div`: the declared daily-mean semantics is the
      // FLOOR quotient, stable under negative micro-sums (ADVICE r8);
      // the oracle spells the same floor explicitly (sqlFloorDiv —
      // integer `//` truncates there too)
      .select(col("day"), graft.functions.floor_div(col("sm"), col("n")).as("x"))
    val byDay = Window.orderBy(col("day"))
    val indexed = daily.withColumn("i", row_number().over(byDay))
    val params = broadcast(indexed.filter(col("i") <= baselineDays)
      .agg(graft.functions.floor_div(sum(col("x")), count(lit(1))).as("mu0"))
      .select(col("mu0"),
        graft.functions.floor_div(col("mu0") * slackPct, lit(100L)).as("delta"))
      .select(col("mu0"), col("delta"), (col("delta") * hMult).as("h")))
    val cum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    indexed.crossJoin(params)
      .withColumn("p", sum(col("x") - col("mu0") - col("delta")).over(cum))
      .withColumn("q", sum(col("x") - col("mu0") + col("delta")).over(cum))
      .withColumn("s_pos", col("p") - least(min(col("p")).over(cum), lit(0L)))
      .withColumn("s_neg", greatest(max(col("q")).over(cum), lit(0L)) - col("q"))
      .select(col("day"), col("x").as("x_micro"), col("s_pos"), col("s_neg"),
        (col("s_pos") > col("h")).as("alarm_up"),
        (col("s_neg") > col("h")).as("alarm_down"))
  }
}
