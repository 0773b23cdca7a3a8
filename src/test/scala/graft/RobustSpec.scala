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
}
