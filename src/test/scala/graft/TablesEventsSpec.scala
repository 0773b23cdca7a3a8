package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins the `events.ts` loader contract across the driver's testdata
  * format migration (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) NTZ): the
  * column must arrive as the declared TimestampType AND time-range
  * predicates must reach the parquet scan — the schema-coerced read
  * exists precisely because a cast-after-read blocks pushdown.
  */
class TablesEventsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("events.ts arrives as TimestampType with non-null values") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.filter(col("ts").isNotNull).count() == ev.count())
  }

  test("ts range predicate pushes down to the parquet scan") {
    val f = Tables.events(spark, dir)
      .filter(col("ts") >= lit("2000-01-01").cast("timestamp"))
    val scans = executedPlanNodes(f).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a parquet file scan in the plan")
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts"),
      s"ts predicate did not reach the scan; PushedFilters=$pushed")
  }

  test("schema-coerced read matches the declared events schema exactly") {
    Tables.assertSchema(Tables.events(spark, dir), "events")
  }

  test("non-UTC session zone is rejected loudly, not silently shifted") {
    val orig = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", orig)
  }
}
