package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-behavior analytics over the event stream: ordered funnels and
  * cohort retention — the product-analytics queries the reference's
  * listening-analysis jobs circle around
  * (reference: pyspark_jobs/analyze_listening_data.py per-user activity;
  * Grafana dashboards in SURVEY §3.4).
  *
  * Both operators are compositions of keyed aggregations and equi-joins:
  * per-stage/per-cohort state is one row per user, every shuffle is on
  * the user key, and outputs are exact integers — deterministic at any
  * parallelism.
  */
object Behavior {

  /** Ordered funnel: stage i counts users whose first stage-i event
    * STRICTLY follows their first qualifying stage-(i−1) event. One
    * aggregation + one join per stage (driver loops over the stage list
    * only — no data ever leaves the cluster). Output: (stage_idx, stage,
    * n_users), one row per stage.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // each round localCheckpoints `reached`: stage i's plan would
    // otherwise embed stages 1..i−1, so evaluating the unioned output
    // re-runs every prefix — an S-stage funnel would scan `events`
    // O(S²/2) times (the duplicateClusters lineage lesson; PageRank and
    // BFS already truncate per round)
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .localCheckpoint()
    var out = reached.agg(lit(0L).as("stage_idx"), lit(stages.head).as("stage"),
      count(lit(1)).as("n_users"))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      reached = events.filter(col(typeCol) === stage)
        .join(reached.select(col(userCol), col("__t").as("__prev")), Seq(userCol))
        .filter(col(tsCol) > col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .localCheckpoint()
      out = out.unionByName(reached.agg(lit(i.toLong).as("stage_idx"),
        lit(stage).as("stage"), count(lit(1)).as("n_users")))
    }
    out
  }

  /** Cohort retention: users grouped by their first-activity day, counted
    * per day-offset from it (0 = the cohort day itself), offsets bounded
    * by `maxOffsetDays`. `tsCol` is epoch-µs. Output: (cohort_day,
    * day_offset, n_users).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                maxOffsetDays: Int = 7): DataFrame = {
    val DayUs = 86400000000L
    // integer `div`, not double `/`+cast: exact at any epoch, and it is
    // the same floor DuckDB's `//` computes on the non-negative axis
    val e = events.select(col(userCol), expr(s"`$tsCol` div ${DayUs}L").as("__day"))
    val cohorts = e.groupBy(col(userCol)).agg(min(col("__day")).as("cohort_day"))
    e.join(cohorts, Seq(userCol))
      .withColumn("day_offset", col("__day") - col("cohort_day"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
