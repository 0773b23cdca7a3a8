package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.vector_dot

class VectorDotSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.5, -1.5), Seq(2.0, 2.0)),
    (3L, Seq.empty[Double], Seq.empty[Double]))
    .toDF("id", "a", "b")

  test("vector_dot matches the composable zip_with/aggregate form exactly") {
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)")
    val out = vecs.select(col("id"), vector_dot(col("a"), col("b")).as("d"), hof.as("h"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    out.foreach { case (id, d, h) => assert(d == h, s"row $id: $d != $h") }
    assert(out.find(_._1 == 1L).get._2 == 32.0)
    assert(out.find(_._1 == 3L).get._2 == 0.0)
  }

  test("vector_dot propagates null arrays and survives codegen + interpreted paths") {
    val withNull = Seq((1L, Option(Seq(1.0)), Option(Seq(2.0))), (2L, None, Option(Seq(2.0))))
      .toDF("id", "a", "b")
    val out = withNull.select(vector_dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 2.0 && out(1).isNullAt(0))
  }

  test("GraftExtensions registers vector_dot for SQL text") {
    val base = spark // ensure the shared session (and its context) exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, fresh session with the extensions installed.
      // (.withExtensions, not spark.sql.extensions: the conf is static and
      // can't attach to an already-running context)
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(r == 11.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
