package graft

import org.scalacheck.Gen

import graft.analytics.Quantiles

class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(vals: Seq[Double], qbp: Int): Option[(Long, Double)] = {
    val clean = vals.filterNot(_.isNaN).sorted
    val n = clean.size.toLong
    val k = (qbp * n + 9999) / 10000
    if (k < 1) None else Some((n, clean((k - 1).toInt)))
  }

  private def run(vals: Seq[Double], qs: Seq[Int], b: Int = 16): Map[Int, (Long, Double)] =
    Quantiles.exactQuantiles(vals.toDF("x"), "x", qs, buckets = b)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("matches the sorted-multiset k-th element on random data, several bucket widths") {
    val gen = Gen.chooseNum(1, 400).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-1e6, 1e6),
        Gen.chooseNum(-5.0, 5.0),
        Gen.oneOf(0.0, 1.5, -2.25)))) // duplicate-heavy point masses
    val qs = Seq(1, 999, 2500, 5000, 7500, 9999, 10000)
    for (vals <- samples(gen, n = 6); b <- Seq(2, 16, 64)) {
      val got = run(vals, qs, b)
      val want = qs.flatMap(q => brute(vals, q).map(q -> _)).toMap
      assert(got == want, s"b=$b n=${vals.size}")
    }
  }

  test("all-equal input degenerates to the single value at every quantile") {
    val got = run(Seq.fill(50)(3.25), Seq(100, 5000, 10000))
    assert(got == Map(100 -> ((50L, 3.25)), 5000 -> ((50L, 3.25)),
      10000 -> ((50L, 3.25))))
  }

  test("nulls and NaNs are excluded from both rank and count") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(Double.NaN), Some(2.0),
      Some(3.0)).toDF("x")
    val got = Quantiles.exactQuantiles(df, "x", Seq(5000, 10000))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(5000 -> ((3L, 2.0)), 10000 -> ((3L, 3.0))))
  }

  test("empty input yields no rows") {
    assert(run(Seq.empty, Seq(5000)).isEmpty)
  }

  test("extreme skew: a point mass holding 99% of rows") {
    val vals = Seq.fill(990)(7.0) ++ (1 to 10).map(_.toDouble)
    val got = run(vals, Seq(100, 5000, 9999), b = 8)
    val want = Seq(100, 5000, 9999).flatMap(q => brute(vals, q).map(q -> _)).toMap
    assert(got == want)
  }

  test("result is partitioning-invariant") {
    val vals = (1 to 500).map(i => (i % 37).toDouble)
    val a = Quantiles.exactQuantiles(vals.toDF("x").repartition(1), "x", Seq(2500, 7500))
    val b = Quantiles.exactQuantiles(vals.toDF("x").repartition(13), "x", Seq(2500, 7500))
    assert(rows(a) == rows(b))
  }

  test("exactQuantilesBy: every group matches the per-group brute force") {
    val gen = Gen.chooseNum(10, 200).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      x <- Gen.chooseNum(-100.0, 100.0)
    } yield (g, x)))
    val qs = Seq(1, 2500, 5000, 9999)
    for (data <- samples(gen, n = 5); b <- Seq(4, 32)) {
      val got = Quantiles.exactQuantilesBy(data.toDF("g", "x"), "g", "x", qs, b)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val want = data.groupBy(_._1).flatMap { case (g, rows) =>
        qs.flatMap(q => brute(rows.map(_._2), q).map(r => (g, q) -> r)) }
      assert(got == want, s"b=$b")
    }
  }

  test("winsorizedStats: exact clip bounds, clipped counts, cent-exact sum") {
    val vals = (1 to 100).map(_.toDouble) // p10 = 10, p90 = 90
    val r = Quantiles.winsorizedStats(vals.toDF("x"), "x", loBp = 1000, hiBp = 9000)
      .collect().head
    assert(r.getLong(0) == 100L)
    assert(r.getDouble(1) == 10.0 && r.getDouble(2) == 90.0)
    assert(r.getLong(3) == 9L && r.getLong(4) == 10L) // 1..9 below, 91..100 above
    val wantSum = vals.map(v => math.min(math.max(v, 10.0), 90.0) * 100).map(_.round).sum
    assert(r.getLong(5) == wantSum)
    intercept[IllegalArgumentException](
      Quantiles.winsorizedStats(vals.toDF("x"), "x", loBp = 5000, hiBp = 5000))
  }

  test("equiDepthHistogram: exact buckets under heavy ties, full row conservation") {
    // 1..10 each repeated 10 times, 4 buckets: boundaries at p25/p50/p75
    val vals = (1 to 10).flatMap(v => Seq.fill(10)(v.toDouble))
    val got = Quantiles.equiDepthHistogram(vals.toDF("x"), "x", nBuckets = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    // brute replay: boundaries = k-th smallest at ceil(bp*n/10000)
    val sorted = vals.sorted
    val bs = Seq(2500, 5000, 7500).map(bp =>
      sorted(((bp * 100L + 9999) / 10000 - 1).toInt))
    val want = vals.groupBy(v => bs.count(_ < v)).map { case (b, vs) =>
      (b, vs.size.toLong, vs.min, vs.max) }.toSeq.sortBy(_._1)
    assert(got == want)
    assert(got.map(_._2).sum == 100L)
    intercept[IllegalArgumentException](
      Quantiles.equiDepthHistogram(vals.toDF("x"), "x", nBuckets = 1))
  }

  test("arguments are validated") {
    val df = Seq(1.0).toDF("x")
    for ((qs, b) <- Seq((Seq.empty[Int], 16), (Seq(0), 16), (Seq(10001), 16),
      (Seq(100, 100), 16), (Seq(100), 1)))
      intercept[IllegalArgumentException](Quantiles.exactQuantiles(df, "x", qs, b))
  }
}
