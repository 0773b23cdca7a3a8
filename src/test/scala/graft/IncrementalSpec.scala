package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.analytics.Incremental

/** Incremental materialized-aggregate maintenance
  * ([[graft.analytics.Incremental]]) against the one oracle that matters:
  * a full recompute over base+delta. All measures are fixed-point longs,
  * so every comparison is exact equality — no tolerance.
  */
class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private val keys = Seq("k1", "k2")
  private val meas = Seq("m")

  private def states(rows: Seq[(Int, String, Long)], sign: Long = 1L,
                     withMinMax: Boolean = true) =
    Incremental.aggregateStates(
      rows.toDF("k1", "k2", "m"), keys, meas, lit(sign), withMinMax)

  private def recompute(rows: Seq[(Int, String, Long)], withMinMax: Boolean = true) =
    states(rows, 1L, withMinMax)

  private val rowGen: Gen[(Int, String, Long)] = for {
    k1 <- Gen.chooseNum(0, 4)
    k2 <- Gen.oneOf("a", "b", "c")
    m <- Gen.chooseNum(-50L, 50L)
  } yield (k1, k2, m)

  test("insert-only refresh == full recompute (cnt/sum/min/max), property") {
    samples(Gen.zip(Gen.listOfN(30, rowGen), Gen.listOfN(12, rowGen)), n = 5)
      .foreach { case (base, delta) =>
        val refreshed = Incremental.refresh(
          recompute(base), states(delta), keys, meas)
        assert(rows(refreshed) == rows(recompute(base ++ delta)))
      }
  }

  test("retraction refresh == recompute of the surviving multiset; emptied groups vanish") {
    samples(Gen.listOfN(25, rowGen), n = 5).foreach { base =>
      // retract a prefix of each group's rows (a retraction only makes
      // sense for rows that exist) — including some FULL groups
      val retract = base.groupBy(r => (r._1, r._2)).values
        .flatMap(g => g.take(if (g.head._1 == 0) g.size else g.size / 2)).toSeq
      val survivors = {
        val m = scala.collection.mutable.Buffer(base: _*)
        retract.foreach(r => m.remove(m.indexOf(r)))
        m.toSeq
      }
      val refreshed = Incremental.refresh(
        recompute(base, withMinMax = false),
        states(retract, -1L, withMinMax = false), keys, meas)
      assert(rows(refreshed) == rows(recompute(survivors, withMinMax = false)))
      // emptied groups are GONE, not zero-count rows
      assert(!refreshed.select("cnt").as[Long].collect().contains(0L))
    }
  }

  test("min/max states with a retraction fail loudly in the aggregation buffer") {
    val e = intercept[Exception] {
      states(Seq((1, "a", 5L)), sign = -1L, withMinMax = true).collect()
    }
    assert(messages(e).exists(_.contains("not subtractable")))
  }

  test("non-integral measures are rejected (exactness contract)") {
    val doubles = Seq((1, "a", 1.5)).toDF("k1", "k2", "m")
    val e = intercept[IllegalArgumentException] {
      Incremental.aggregateStates(doubles, keys, meas)
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("refreshTouchedGroups: any aggregate survives deletes; untouched states kept verbatim") {
    samples(Gen.zip(Gen.listOfN(30, rowGen), Gen.listOfN(10, rowGen)), n = 4)
      .foreach { case (base, extra) =>
        // "change" = groups of `extra`: their post-image is base-rows-kept
        // (drop the first row of each touched group) plus the extra rows
        val touchedKeySet = extra.map(r => (r._1, r._2)).toSet
        val touchedBase = base.filter(r => touchedKeySet((r._1, r._2)))
        val postImage = touchedBase.groupBy(r => (r._1, r._2)).values
          .flatMap(_.drop(1)).toSeq ++ extra
        val untouched = base.filterNot(r => touchedKeySet((r._1, r._2)))

        val refreshed = Incremental.refreshTouchedGroups(
          recompute(base), postImage.toDF("k1", "k2", "m"),
          extra.toDF("k1", "k2", "m"), keys, meas)
        assert(rows(refreshed) == rows(recompute(untouched ++ postImage)))
      }
  }

  test("refresh output schema is keys ++ states, and cnt reflects multiplicity") {
    val r = Incremental.refresh(
      recompute(Seq((1, "a", 2L), (1, "a", 3L))),
      states(Seq((1, "a", 7L), (2, "b", -1L))), keys, meas)
    assert(r.columns.toSeq == Seq("k1", "k2", "cnt", "m_sum", "m_min", "m_max"))
    assert(rowSet(r) == Set(
      Seq(1, "a", 3L, 12L, 2L, 7L),
      Seq(2, "b", 1L, -1L, -1L, -1L)))
  }
}
