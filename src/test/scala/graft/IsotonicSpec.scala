package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.analytics.Isotonic

class IsotonicSpec extends SparkTestBase {
  import spark.implicits._

  /** Rows: (score, label). Bin width 10 → bin = score div 10. */
  private def fit(rows: Seq[(Long, Boolean)], maxBin: Int = 9): Seq[(Long, Long, Long, Long)] =
    Isotonic.isotonicCalibration(rows.toDF("score", "y"), "score", "y",
        binWidth = 10L, maxBin = maxBin)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect().toSeq

  /** Driver minimax replay: fit_i = max_{a<=i} min_{b>=i} mean(a..b)
    * over the non-empty bins in order — the identity the oracle uses. */
  private def minimax(rows: Seq[(Long, Boolean)], maxBin: Int = 9): Seq[Long] = {
    val bins = rows.groupBy(r => math.min(r._1 / 10, maxBin.toLong)).toSeq.sortBy(_._1)
      .map { case (_, g) => (g.size.toLong, g.count(_._2).toLong) }
    val cn = bins.scanLeft(0L)(_ + _._1)
    val cs = bins.scanLeft(0L)(_ + _._2)
    val bCount = bins.size
    (0 until bCount).map { i =>
      (0 to i).map { a =>
        (i until bCount).map { b =>
          (cs(b + 1) - cs(a)).toDouble / (cn(b + 1) - cn(a)).toDouble
        }.min
      }.max
    }.map(v => math.round(v * 1e6))
  }

  private val gen: Gen[Seq[(Long, Boolean)]] =
    Gen.listOfN(120, Gen.zip(Gen.chooseNum(0L, 99L), Gen.oneOf(true, false)))

  test("PAV == minimax identity on random inputs") {
    samples(gen, n = 6).foreach { rows =>
      val got = fit(rows).map(_._4)
      assert(got == minimax(rows), s"rows=$rows")
    }
  }

  test("fitted is monotone and pools preserve means") {
    samples(gen, n = 4).foreach { rows =>
      val res = fit(rows)
      assert(res.map(_._4) == res.map(_._4).sorted, "monotone violated")
      // global mean preservation: sum over pools of n*fitted == sum pos
      // (within micro rounding per pool: <= #pools/2 micro slack)
      val approx = res.map { case (_, n, _, f) => n * f }.sum
      val exact = res.map(_._3).sum * 1000000L
      assert(math.abs(approx - exact) <= res.size * 500000L)
    }
  }

  test("already-monotone bins come back untouched; a violator pools") {
    // bins: rates 0.2, 0.5, 0.8 in score order — already isotonic
    val mono = Seq.tabulate(10)(i => (5L, i >= 8)) ++
      Seq.tabulate(10)(i => (15L, i >= 5)) ++
      Seq.tabulate(10)(i => (25L, i >= 2))
    assert(fit(mono).map(_._4) == Seq(200000L, 500000L, 800000L))
    // rates 0.8 then 0.2 violate: both pool to 0.5
    val viol = Seq.tabulate(10)(i => (5L, i >= 2)) ++
      Seq.tabulate(10)(i => (15L, i >= 8))
    assert(fit(viol).map(_._4) == Seq(500000L, 500000L))
  }
}
