package graft

import org.apache.spark.sql.SparkSession
import graft.operators.CapMetricsListener

/** Canonical session construction for the engine: one place for the
  * settings every entry point needs.
  *
  *   - shuffle partitions sized to the core count (local mode; a cluster
  *     deploy would size to 2–3× total cores and let AQE coalesce);
  *   - UTC session timezone (determinism across hosts);
  *   - nanosAsLong for the TIMESTAMP(NANOS) event table (Tables.events);
  *   - [[GraftExtensions]] installed so the custom SQL functions resolve
  *     from SQL text as well as the DataFrame API;
  *   - the [[CapMetricsListener]] truncation monitor installed by
  *     [[getOrCreate]], so "truncation is never silent" holds for stock
  *     sessions without the caller knowing to opt in.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // micros (not the INT96 legacy default): INT96 chunks carry no
      // min/max statistics, so footer-derived zone maps (Versioned
      // stageAndDigest) could never prune timestamp ranges; micros is
      // also the non-deprecated representation and round-trips
      // TimestampType losslessly
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  // Weak keys: a stopped session must not be pinned alive by its monitor
  // entry. Guarded by its own lock — getOrCreate can race from test
  // threads and double-registering would double-count truncations.
  private val monitors =
    new java.util.WeakHashMap[SparkSession, CapMetricsListener]()

  /** Build-or-reuse the canonical session AND ensure the default
    * cap-truncation monitor is installed on it — exactly once per
    * session, so repeated entry-point calls don't stack listeners.
    * All shipped mains (Verify, Bench, Explore) come through here.
    */
  def getOrCreate(cores: String): SparkSession = {
    val s = builder(cores).getOrCreate()
    monitor(s)
    s
  }

  /** The default truncation monitor for `s`, installing it on first
    * call. Exposed so tests (and operators) can read
    * `monitor(spark).totalTruncated` for the session-wide count; the
    * per-query synchronous read remains `queryExecution.observedMetrics`.
    */
  def monitor(s: SparkSession): CapMetricsListener = monitors.synchronized {
    var m = monitors.get(s)
    if (m == null) {
      m = CapMetricsListener.install(s)
      monitors.put(s, m)
    }
    m
  }
}
