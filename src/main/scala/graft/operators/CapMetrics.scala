package graft.operators

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Production consumer for the pair-generator cap metrics
  * (`graft.<op>.caps#<n>` with a `truncated_groups` count — see
  * `Pipelines.capGroups`): a [[QueryExecutionListener]] that fires a
  * callback whenever a completed query truncated at least one over-cap
  * group. This is the monitoring half of the "truncation is never
  * silent" contract — `failOnOverflow` callers error at the task level,
  * truncating callers surface here.
  *
  * Register once per session:
  * {{{
  * val monitor = new CapMetricsListener()          // logs a warning
  * spark.listenerManager.register(monitor)
  * // or wire an alert:
  * new CapMetricsListener((name, n) => pager.alert(s"$name truncated $n"))
  * }}}
  *
  * The listener bus is asynchronous — `totalTruncated` is eventually
  * consistent with completed queries, which is fine for monitoring (the
  * per-query synchronous read remains
  * `df.queryExecution.observedMetrics`).
  */
final class CapMetricsListener(
    onTruncation: (String, Long) => Unit = CapMetricsListener.logWarning)
    extends QueryExecutionListener {

  private val total = new AtomicLong(0)

  /** Sum of truncated groups across every completed query so far. */
  def totalTruncated: Long = total.get()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      // schema guard: a future graft.*.caps# metric without the
      // truncated_groups long would otherwise throw inside the listener
      // bus, silently dropping the callback for that query (ADVICE r5)
      if (name.startsWith("graft.") && name.contains(".caps#") &&
          row.schema.fieldNames.contains("truncated_groups")) {
        val i = row.fieldIndex("truncated_groups")
        if (!row.isNullAt(i)) {
          val t = row.getLong(i)
          if (t > 0) {
            total.addAndGet(t)
            onTruncation(name, t)
          }
        }
      }
    }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}

object CapMetricsListener {
  private def logWarning(name: String, n: Long): Unit =
    org.slf4j.LoggerFactory.getLogger(classOf[CapMetricsListener])
      .warn(s"$name: $n group(s) exceeded their cap and were truncated — " +
        "results under-count pairs for those groups; raise the cap or pre-shard")

  /** Convenience: register a fresh listener and return it. */
  def install(spark: SparkSession,
              onTruncation: (String, Long) => Unit = logWarning): CapMetricsListener = {
    val l = new CapMetricsListener(onTruncation)
    spark.listenerManager.register(l)
    l
  }
}
