package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.misra_gries
import graft.operators.Sketches

class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  private def summary(vals: Seq[Long], k: Int, parts: Int = 7): Map[Long, Long] =
    vals.toDF("x").repartition(parts)
      .agg(misra_gries(col("x"), k).as("mg"))
      .select(explode(col("mg")))
      .as[(Long, Long)].collect().toMap

  test("k at or above the distinct count keeps exact counts (no eviction ever fires)") {
    val vals = Seq.fill(40)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(3)(3L)
    val got = summary(scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(vals), k = 3)
    assert(got == Map(1L -> 40L, 2L -> 25L, 3L -> 3L))
  }

  test("hard guarantees hold on random streams across partition layouts") {
    val gen = for {
      n <- Gen.chooseNum(30, 500)
      // zipf-ish: item = 60 / (u+1) over uniform u
      us <- Gen.listOfN(n, Gen.chooseNum(0, 59))
    } yield us.map(u => (60 / (u + 1)).toLong)
    for (vals <- samples(gen, n = 6); k <- Seq(2, 5, 11); parts <- Seq(1, 8)) {
      val n = vals.size.toLong
      val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = summary(vals, k, parts)
      assert(got.size <= k, s"summary exceeded k=$k")
      got.foreach { case (item, est) =>
        val t = truth(item)
        assert(est <= t, s"overcount: item=$item est=$est true=$t")
        assert((t - est) * (k + 1) <= n, s"deficit bound: item=$item k=$k parts=$parts")
      }
      truth.foreach { case (item, t) =>
        if (t * (k + 1) > n)
          assert(got.contains(item), s"missing guaranteed-heavy item=$item k=$k parts=$parts")
      }
    }
  }

  test("nulls are ignored") {
    val got = Seq[Option[Long]](Some(1L), None, Some(1L), None).toDF("x")
      .agg(misra_gries(col("x"), 2).as("mg"))
      .select(explode(col("mg"))).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L))
  }

  test("string items survive buffer reuse (values are copied on insert)") {
    val vals = (1 to 200).map(i => s"item_${i % 9}")
    val got = vals.toDF("x").repartition(5)
      .agg(misra_gries(col("x"), 20).as("mg"))
      .select(explode(col("mg"))).as[(String, Long)].collect().toMap
    assert(got == vals.groupBy(identity).view.mapValues(_.size.toLong).toMap)
  }

  test("map-typed items are rejected at analysis") {
    val df = Seq(1).toDF("i").select(map(lit("a"), lit(1)).as("m"))
    val e = intercept[Exception](df.agg(misra_gries(col("m"), 3)).collect())
    assert(messages(e).exists(_.contains("misra_gries")))
  }

  test("heavyHittersEnvelope pins both booleans true under eviction pressure") {
    // 1000 zipf-ish items, k = 7 << distinct
    val vals = (0 until 1000).map(i => (50 / (i % 50 + 1)).toLong)
    val out = Sketches.heavyHittersEnvelope(vals.toDF("item").repartition(9), "item", k = 7)
      .as[(Long, Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(out.nonEmpty, "vacuous envelope: no heavy items in fixture")
    out.foreach { case (item, _, inSketch, inBand) =>
      assert(inSketch && inBand, s"item=$item") }
    // the heavy set itself is the exact > n/(k+1) set
    val n = vals.size
    val want = vals.groupBy(identity).collect {
      case (i, occ) if occ.size * 8 > n => i }.toSeq.sorted
    assert(out.map(_._1).toSeq == want)
  }
}
