package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the offline twin of
  * `streaming/StreamAgg.sessionize` (flatMapGroupsWithState): a new
  * session starts whenever the gap to the previous event of the same user
  * exceeds `gapUs`. The reference computes listening sessions on its
  * event stream (reference: pyspark_jobs/analyze_listening_data.py's
  * per-user activity shapes; ROADMAP.md session analytics); this is the
  * standard islands construction over the batch table.
  *
  * Plan shape: two window functions over ONE window definition
  * (partitionBy user) — a single hash-shuffle on the user key, then both
  * the lag and the running sum evaluate in the same sort pass. No
  * empty-partition window anywhere (the r1 scale-killer), so every stage
  * parallelizes by user at any corpus size.
  */
object Sessionize {

  /** Assign a per-user session number (1-based, in time order) to every
    * event. `tsCol` must be a numeric event-time column (µs); `tieCol`
    * makes the within-user order total so results are deterministic under
    * equal timestamps.
    */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             tieCol: String, gapUs: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(order))
      .withColumn("__boundary",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("__boundary"))
          .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__boundary")
  }

  /** One row per (user, session): event count, start/end, duration. */
  def stats(events: DataFrame, userCol: String, tsCol: String,
            tieCol: String, gapUs: Long): DataFrame =
    assign(events, userCol, tsCol, tieCol, gapUs)
      .groupBy(col(userCol), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_us"),
        max(col(tsCol)).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}
