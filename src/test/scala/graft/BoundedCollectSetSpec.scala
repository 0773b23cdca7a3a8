package graft

import org.apache.spark.sql.functions._
import graft.functions.bounded_collect_set

/** The in-buffer fail-loud cap (r6): bounded_collect_set must equal
  * collect_set below the cap and fail — during accumulation, on
  * whichever side of the shuffle first sees the violation — above it.
  */
class BoundedCollectSetSpec extends SparkTestBase {
  import spark.implicits._


  test("equals sort_array(collect_set) on every under-cap group, nulls ignored") {
    val df = Seq((1L, Some("b")), (1L, Some("a")), (1L, Some("b")), (1L, None),
      (2L, Some("z")), (3L, None)).toDF("g", "v")
    val bounded = rows(df.groupBy("g")
      .agg(sort_array(bounded_collect_set(col("v"), 3, "spec")).as("s")))
    val builtin = rows(df.groupBy("g")
      .agg(sort_array(collect_set(col("v"))).as("s")))
    assert(bounded == builtin)
    assert(bounded.map(r => (r(0), r(1))).toSet ==
      Set((1L, Seq("a", "b")), (2L, Seq("z")), (3L, Seq())))
  }

  test("long keys survive the partial/merge/serialize path across many partitions") {
    // 500 distinct values per group spread over 8 input partitions forces
    // partial buffers to serialize, ship, and merge
    val df = (0L until 1000L).map(i => (i % 2, i)).toDF("g", "v").repartition(8)
    val out = rows(df.groupBy("g")
      .agg(size(bounded_collect_set(col("v"), 500, "spec")).as("n")))
    assert(out.map(r => (r(0), r(1))).toSet == Set((0L, 500), (1L, 500)))
  }

  test("an over-cap group fails while accumulating, naming op and cap") {
    val df = (0L until 1000L).map(i => (i % 2, i)).toDF("g", "v").repartition(8)
    val ex = intercept[Exception] {
      df.groupBy("g").agg(bounded_collect_set(col("v"), 499, "specOp")).collect()
    }
    val ms = messages(ex)
    assert(ms.exists(m => m != null && m.contains("specOp") &&
        m.contains("maxGroupSize=499") &&
        m.contains("before the over-cap group materialized")),
      s"unexpected failure chain: ${ms.mkString(" | ")}")
  }

  test("duplicates never count against the cap") {
    val df = Seq.fill(100)((1L, "same")).toDF("g", "v")
    val out = rows(df.groupBy("g").agg(bounded_collect_set(col("v"), 1, "spec").as("s")))
    assert(out == Seq(Seq(1L, Seq("same"))))
  }

  test("map-typed input is rejected at analysis, like collect_set") {
    // MapData has no value-based equals/hashCode: a map-typed child would
    // make the HashSet identity-distinct — duplicate maps counted toward
    // the cap (spurious overflow) or returned as "distinct" values
    val df = Seq((1L, "a")).toDF("g", "v")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g")
        .agg(bounded_collect_set(map(col("v"), lit(1)), 10, "spec"))
        .collect()
    }
    assert(ex.getMessage.contains("bounded_collect_set") ||
      ex.getMessage.toLowerCase.contains("map"),
      s"expected the map-type rejection, got: ${ex.getMessage}")
  }

  test("GraftExtensions registers bounded_collect_set for SQL text") {
    val base = spark // ensure the shared session (and its context) exists
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      // same SparkContext, fresh session with the extensions installed
      // (same pattern as ZValueSpec — never stop() the shared context)
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val ok = s2.sql(
        "SELECT g, sort_array(bounded_collect_set(v, 10)) AS s FROM " +
          "VALUES (1, 'b'), (1, 'a'), (1, 'b') AS t(g, v) GROUP BY g").head()
      assert(ok.getInt(0) == 1 && ok.getSeq[String](1) == Seq("a", "b"))
      val ex = intercept[Exception] {
        s2.sql("SELECT g, bounded_collect_set(v, 1, 'sqlOp') FROM " +
          "VALUES (1, 'a'), (1, 'b') AS t(g, v) GROUP BY g").collect()
      }
      assert(messages(ex).exists(m => m != null && m.contains("sqlOp") &&
        m.contains("maxGroupSize=1")))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
