package graft

import graft.functions.z_value
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ZValueSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference interleave, written independently of the expression. */
  private def ref(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleaves bits: x at even positions, y at odd") {
    // x=0b101, y=0b011 → z bits {0,4} from x, {1,3} from y = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(z_value(col("x"), col("y"), 8).as("z")).head().getLong(0)
    assert(got == 27L && got == ref(5L, 3L, 8))
  }

  test("matches the reference on random values, and is monotone per dimension") {
    val xs = (0 until 200).map(i => ((i * 2654435761L) & 0xFFFFFL, (i * 40503L) & 0xFFFFFL))
    val got = xs.toDF("x", "y").select(col("x"), col("y"),
        z_value(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 21), s"($x,$y)") }
    // fixing y, z is strictly monotone in x (interleave preserves order)
    val fixedY = (0L until 100L).map(x => ref(x, 7L, 21))
    assert(fixedY == fixedY.sorted && fixedY.distinct.size == fixedY.size)
  }

  test("null propagates; bits mask the input") {
    val rows = Seq((Some(3L), Some(1L)), (None, Some(1L))).toDF("x", "y")
      .select(z_value(col("x"), col("y"), 1).as("z")).collect()
    assert(rows(1).isNullAt(0))
    // bits=1: only bit 0 of each survives → z = 1 | (1 << 1) = 3
    assert(rows(0).getLong(0) == 3L)
  }

  test("GraftExtensions registers z_value for SQL text, optional bits arg") {
    val base = spark // ensure the shared session (and its context) exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, fresh session with the extensions installed
      // (same pattern as VectorDotSpec — never stop() the shared context)
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT z_value(5L, 3L, 8) AS a, z_value(5L, 3L) AS b").head()
      assert(r.getLong(0) == 27L && r.getLong(1) == 27L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
