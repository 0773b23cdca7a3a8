package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{kmv_count, kmv_difference, kmv_intersect, kmv_merge2, kmv_sketch, KmvSketch}

class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def sk(vals: Seq[Long], k: Int = 64, parts: Int = 5): Array[Byte] =
    vals.toDF("x").repartition(parts)
      .agg(kmv_sketch(col("x"), k)).head().getAs[Array[Byte]](0)

  test("estimate is exact below k and within 5/sqrt(k-2) RSE above") {
    // below k: exact, regardless of duplication and partitioning
    val small = Seq(1L, 2L, 3L, 2L, 1L, 9L)
    assert(KmvSketch.estimate(sk(small, k = 64, parts = 3)) == 4L)
    // above k: statistical band (deterministic hash — one fixed draw)
    val gen = Gen.chooseNum(1000L, 9000L).map(n => (1L to n).toSeq)
    for (vals <- samples(gen, n = 4)) {
      val k = 256
      val est = KmvSketch.estimate(sk(vals, k = k)).toDouble
      val n = vals.size.toDouble
      assert(math.abs(est - n) <= 5.0 * n / math.sqrt((k - 2).toDouble),
        s"est=$est n=$n")
    }
  }

  test("sketch of union == union of sketches, bit for bit, any partitioning") {
    val a = (1L to 500L).toSeq
    val b = (300L to 900L).toSeq
    val direct = sk(a ++ b, parts = 7)
    val folded = KmvSketch.merged(sk(a, parts = 1), sk(b, parts = 4))
    assert(direct.sameElements(folded))
    // idempotent: merging a sketch with itself changes nothing
    assert(KmvSketch.merged(direct, direct).sameElements(direct))
  }

  test("intersection and difference are exact while both sides are below k") {
    val a = (1L to 40L).toSeq
    val b = (30L to 70L).toSeq
    val ska = sk(a, k = 256, parts = 2)
    val skb = sk(b, k = 256, parts = 3)
    assert(KmvSketch.intersectEstimate(ska, skb) == 11L)
    assert(KmvSketch.differenceEstimate(ska, skb) == 29L)
    assert(KmvSketch.differenceEstimate(skb, ska) == 30L)
  }

  test("intersection estimate lands in the sampling band on full sketches") {
    val k = 256
    val gen = for {
      n <- Gen.chooseNum(2000L, 6000L)
      shift <- Gen.chooseNum(0L, 4000L)
    } yield ((1L to n).toSeq, (shift + 1 to shift + n).toSeq)
    for ((a, b) <- samples(gen, n = 4)) {
      val exactInt = a.toSet.intersect(b.toSet).size.toDouble
      val union = a.toSet.union(b.toSet).size.toDouble
      val est = KmvSketch.intersectEstimate(sk(a, k = k), sk(b, k = k)).toDouble
      assert(math.abs(est - exactInt) <= 5.0 * union / math.sqrt(k.toDouble) + 5.0,
        s"est=$est exact=$exactInt union=$union")
    }
  }

  test("column expressions compose: merge2 fold equals direct sketch") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (2L, "b"), (4L, "c"))
      .toDF("u", "seg")
    val per = df.groupBy(col("seg")).agg(kmv_sketch(col("u"), 32).as("sk"))
    val got = per.agg(collect_list(col("sk")).as("sks"))
      .crossJoin(df.agg(kmv_sketch(col("u"), 32).as("all")))
      .select(
        aggregate(col("sks"), lit(KmvSketch.empty(32)),
          (acc, x) => kmv_merge2(acc, x)).as("folded"),
        col("all"),
        kmv_count(col("all")).as("n"))
      .head()
    assert(got.getAs[Array[Byte]]("folded").sameElements(got.getAs[Array[Byte]]("all")))
    assert(got.getAs[Long]("n") == 4L)
    val pair = per.filter(col("seg") === "a").select(col("sk").as("ska"))
      .crossJoin(per.filter(col("seg") === "b").select(col("sk").as("skb")))
      .select(kmv_intersect(col("ska"), col("skb")).as("i"),
        kmv_difference(col("ska"), col("skb")).as("d"))
      .head()
    assert(pair.getAs[Long]("i") == 1L) // u=2 in both
    assert(pair.getAs[Long]("d") == 1L) // u=1 only in a
  }

  test("mixed k fails loudly; nulls are skipped") {
    val e = intercept[Exception] {
      KmvSketch.merged(sk(Seq(1L), k = 32), sk(Seq(1L), k = 64))
    }
    assert(messages(e).exists(m => m != null && m.contains("mixed k")))
    val got = Seq[Option[Long]](Some(1L), None).toDF("x")
      .agg(kmv_sketch(col("x"), 32)).head().getAs[Array[Byte]](0)
    assert(KmvSketch.estimate(got) == 1L)
  }
}
