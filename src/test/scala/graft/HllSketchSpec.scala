package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{hll_count, hll_sketch, hll_union, HllSketch}

class HllSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def sketchOf(vals: Seq[Long], p: Int = 12, parts: Int = 5): Array[Byte] =
    vals.toDF("x").repartition(parts)
      .agg(hll_sketch(col("x"), p)).head().getAs[Array[Byte]](0)

  test("estimate lands within 5 sigma of truth across cardinalities") {
    for (n <- Seq(10, 100, 1000, 20000)) {
      val est = HllSketch.estimate(sketchOf((1L to n.toLong).toSeq))
      val band = 5.0 * 1.04 / math.sqrt(4096.0) * n
      assert(math.abs(est - n) <= band, s"n=$n est=$est")
    }
  }

  test("sketch is invariant to partitioning, duplication, and order") {
    val vals = (1L to 500L).toSeq
    val a = sketchOf(vals, parts = 1)
    val b = sketchOf(scala.util.Random.javaRandomToRandom(
      new java.util.Random(3)).shuffle(vals ++ vals), parts = 9)
    assert(a.sameElements(b), "registers must be layout/multiplicity invariant")
  }

  test("union of stored part sketches equals the whole-data sketch bit-for-bit") {
    val gen = Gen.listOfN(300, Gen.chooseNum(1L, 5000L))
    for (vals <- samples(gen, n = 4)) {
      val (l, r) = vals.splitAt(vals.size / 3)
      val parts = Seq(sketchOf(l), sketchOf(r)).toDF("sk")
      val merged = parts.agg(hll_union(col("sk"))).head().getAs[Array[Byte]](0)
      assert(merged.sameElements(sketchOf(vals)))
    }
  }

  test("hll_count: empty sketch is 0, null is null, nulls skipped in sketch") {
    val empty = Seq.empty[Long].toDF("x").agg(hll_count(hll_sketch(col("x"), 12)))
    assert(empty.head().getLong(0) == 0L)
    val n = Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("x")
      .agg(hll_count(hll_sketch(col("x"), 12))).head().getLong(0)
    assert(n == 2L)
    val nul = Seq((1L, null: Array[Byte])).toDF("id", "sk")
      .select(hll_count(col("sk"))).head()
    assert(nul.isNullAt(0))
  }

  test("mixed precisions fail loudly on union") {
    val parts = Seq(sketchOf(Seq(1L), p = 10), sketchOf(Seq(2L), p = 12)).toDF("sk")
    val e = intercept[Exception] {
      parts.agg(hll_union(col("sk"))).collect()
    }
    assert(messages(e).exists(m => m != null && m.contains("mixed sketch precisions")))
  }

  test("GraftExtensions registers hll_sketch/hll_union/hll_count for SQL text") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      Seq(1L, 2L, 2L, 3L).toDF("x").createOrReplaceTempView("hll_in")
      val got = s2.sql(
        "SELECT hll_count(hll_union(sk)) FROM (SELECT hll_sketch(x, 12) AS sk FROM hll_in GROUP BY x % 2)")
        .head().getLong(0)
      assert(got == 3L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("hll_merge2 equals the aggregate union bit-for-bit and never mutates inputs") {
    val a = sketchOf((1L to 300L).toSeq)
    val b = sketchOf((200L to 500L).toSeq)
    val viaPair = Seq((a, b)).toDF("a", "b")
      .select(graft.functions.hll_merge2(col("a"), col("b"))).head().getAs[Array[Byte]](0)
    val viaAgg = Seq(a, b).toDF("sk").agg(hll_union(col("sk"))).head().getAs[Array[Byte]](0)
    assert(viaPair.sameElements(viaAgg))
    assert(a.sameElements(sketchOf((1L to 300L).toSeq)), "left input mutated")
  }

  test("overlapEnvelope: inclusion-exclusion overlap within band, zero-overlap pairs kept") {
    // segs: x={1..400}, y={201..600} (overlap 200), z={10001..10200} (disjoint)
    val rows = (1L to 400L).map(("x", _)) ++ (201L to 600L).map(("y", _)) ++
      (10001L to 10200L).map(("z", _))
    val got = graft.operators.Sketches.overlapEnvelope(
        rows.toDF("seg", "k"), "seg", "k", p = 12)
      .orderBy("seg_a", "seg_b").collect()
    assert(got.length == 3)
    val xy = got.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(xy.getLong(2) == 200L && xy.getBoolean(3))
    val xz = got.find(r => r.getString(0) == "x" && r.getString(1) == "z").get
    assert(xz.getLong(2) == 0L && xz.getBoolean(3), s"disjoint pair kept with env: $xz")
  }
}
