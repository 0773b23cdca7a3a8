package graft

import org.scalacheck.Gen
import graft.analytics.Robust

/** Brute-force oracle for the median/MAD outlier report
  * ([[graft.analytics.Robust]]): exact interpolating median per the
  * `percentile` definition (rank p·(n−1), linear between neighbors).
  */
class RobustSpec extends SparkTestBase {
  import spark.implicits._

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val rank = 0.5 * (s.size - 1)
    val lo = rank.toInt
    val frac = rank - lo
    if (frac == 0.0) s(lo) else s(lo) + (s(lo + 1) - s(lo)) * frac
  }

  test("madOutliers == brute force per group (n, med, mad, outlier count)") {
    val v = Gen.chooseNum(-40, 40).map(_ / 4.0)
    val rowGen = for { g <- Gen.oneOf("x", "y"); x <- v } yield (g, x)
    samples(Gen.listOfN(30, rowGen), n = 4).foreach { xs =>
      val df = xs.toDF("g", "v")
      val got = Robust.madOutliers(df, "v", "g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4))).toSeq
      val want = xs.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
        val vals = rs.map(_._2)
        val med = median(vals)
        val ads = vals.map(x => math.abs(x - med))
        val mad = median(ads)
        val cut = 3.0 * 1.4826
        def r4(d: Double) =
          BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (g, vals.size.toLong, r4(med), r4(mad),
          ads.count(_ > cut * mad).toLong)
      }
      assert(got == want, s"xs=$xs")
    }
  }

  test("madOutliers: constant group has mad 0; a single spike is the outlier") {
    // 9 constants + one spike: med = 5, mad = 0, only the spike exceeds 0
    val df = (Seq.fill(9)(5.0) :+ 1000.0).map(("g", _)).toDF("g", "v")
    val r = Robust.madOutliers(df, "v", "g").collect().head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)) ==
      (10L, 5.0, 0.0, 1L))
  }

  test("madOutliers excludes nulls and NaNs from every statistic") {
    val df = Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", None), ("g", Some(Double.NaN))).toDF("g", "v")
    val r = Robust.madOutliers(df, "v", "g").collect().head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3)) == (3L, 2.0, 1.0))
  }

  // -------------------------------------------------------- Theil–Sen

  /** One event per (group, day-of-Jan-2024, micro value). */
  private def series(g: String, ys: Seq[Long]) =
    ys.zipWithIndex.map { case (y, i) =>
      (g, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
        y.toDouble / 1e6)
    }

  private def tsBrute(ys: Seq[Long]): Long = {
    val slopes = (for {
      i <- ys.indices; j <- ys.indices if i < j
    } yield (ys(j) - ys(i)).toDouble / (j - i).toDouble).sorted
    // HALF_UP (ties away from zero) — what Spark's round() and the
    // oracle's round() both do on negative halves, unlike math.round
    java.math.BigDecimal.valueOf(slopes((slopes.size + 1) / 2 - 1))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
  }

  test("theilSenTrend == driver lower-median brute force") {
    val gen = org.scalacheck.Gen.listOfN(12,
      org.scalacheck.Gen.chooseNum(1000000L, 9000000L))
    samples(gen, n = 5).foreach { ys =>
      val df = series("a", ys).toDF("g", "ts", "v")
      val r = Robust.theilSenTrend(df, "g", "ts", "v").collect().head
      assert(r.getLong(3) == tsBrute(ys), s"ys=$ys")
      assert(r.getLong(1) == ys.size.toLong)
      assert(r.getLong(2) == ys.size.toLong * (ys.size - 1) / 2)
    }
  }

  test("a linear series recovers its exact slope; corruption can't drag it") {
    // y = 100 + 7 micro/day, with 3 of 15 days corrupted by +10000
    val clean = (0 until 15).map(i => 100000000L + 7L * i)
    val dirty = clean.zipWithIndex.map { case (y, i) =>
      if (i % 5 == 2) y + 10000000L else y }
    val rClean = Robust.theilSenTrend(series("a", clean).toDF("g", "ts", "v"),
      "g", "ts", "v").collect().head
    assert(rClean.getLong(3) == 7L)
    assert(!rClean.getBoolean(4) && !rClean.getBoolean(5)) // inside flat band
    val rDirty = Robust.theilSenTrend(series("a", dirty).toDF("g", "ts", "v"),
      "g", "ts", "v").collect().head
    // 20% corrupted days: the median slope stays within the flat band
    // (an OLS fit would report ~hundreds of micro/day)
    assert(math.abs(rDirty.getLong(3)) < 1000L, s"dragged: ${rDirty.getLong(3)}")
  }

  test("theilSenTrend flags a strong sustained rise") {
    val ys = (0 until 10).map(i => 100000000L + 500000L * i) // +0.5/day
    val r = Robust.theilSenTrend(series("a", ys).toDF("g", "ts", "v"),
      "g", "ts", "v").collect().head
    assert(r.getLong(3) == 500000L && r.getBoolean(4) && !r.getBoolean(5))
  }
}
