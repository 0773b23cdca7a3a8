package graft

import org.apache.spark.sql.SparkSession

/** Canonical session construction for the engine: one place for the
  * settings every entry point needs.
  *
  *   - shuffle partitions sized to the core count (local mode; a cluster
  *     deploy would size to 2–3× total cores and let AQE coalesce);
  *   - UTC session timezone (determinism across hosts);
  *   - nanosAsLong for the TIMESTAMP(NANOS) event table (Tables.events);
  *   - [[GraftExtensions]] installed so the custom SQL functions resolve
  *     from SQL text as well as the DataFrame API.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
}
