package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are NOT swallowed (VERDICT r1 item 10):
  * a failing query is reported with `-1` timing plus an `errors` entry and
  * the process exits nonzero, so regressions can't hide behind a number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => " "; case c => c.toString }
    // untimed warmup: JIT/codegen/scan setup shouldn't be billed to
    // whichever query happens to sort first
    try SparkEntry.queries("q20_sql_surface")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // min of N repetitions per query: this host shares CPUs with other
    // tenants and single-shot wall-clock varies several-fold; the min is
    // the standard noise-suppressed estimate. Reported via "repeats".
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
                  catch { case e: Throwable =>
                    Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}") }
        (if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0, err)
      }
      val err = runs.flatMap(_._2).headOption
      (name, if (err.isEmpty) runs.map(_._1).min else -1.0, err)
    }
    // millisecond precision: full-precision doubles ballooned the line to
    // ~2.7 KB at 68 queries and the driver's fixed-size tail capture
    // truncated it (BENCH_r03 "parsed": null) — keep the ONE line small
    // Locale.ROOT: the f-interpolator formats with the default locale,
    // which renders a comma decimal separator on e.g. de_DE JVMs —
    // malformed JSON, the exact parse failure the precision cap fixed
    def ms(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) => s""""$k":${ms(v)}""" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s""""$k":"${esc(m)}"""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    // host load average: this container shares CPUs with other tenants
    // and wall-clock varies up to 4x under contention — record the
    // conditions alongside the numbers
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errs,"load_avg":${ms(load)},"repeats":$repeats,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
