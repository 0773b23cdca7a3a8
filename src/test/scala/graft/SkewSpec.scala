package graft

import org.scalacheck.Gen
import graft.quality.Profile

/** Brute-force oracle for [[graft.quality.Profile.skewReport]]: the
  * count distribution, inverse-CDF quantile rule, top-key tie-break, and
  * skew ratio recomputed with plain collections; exact equality (integer
  * arithmetic plus one double expression replayed verbatim).
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(keys: Seq[Long]): (Long, Long, Long, Long, Long, String, Double) = {
    val counts = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nRows = keys.size.toLong
    val nKeys = counts.size.toLong
    val maxC = counts.values.max
    val sorted = counts.values.toSeq.sorted
    def invCdf(num: Long, den: Long): Long = {
      // smallest count whose cumulative key-fraction ≥ num/den
      var cum = 0L
      sorted.find { c => cum += 1; cum * den >= num * nKeys }.get
    }
    val p50 = invCdf(1, 2)
    val p99 = invCdf(99, 100)
    val top = counts.filter(_._2 == maxC).keys.map(_.toString).max
    val ratio = maxC.toDouble * nKeys.toDouble / nRows.toDouble
    (nRows, nKeys, maxC, p50, p99, top, ratio)
  }

  test("skewReport == brute force at any bucket width") {
    val keyGen = Gen.frequency(
      (6, Gen.chooseNum(1L, 8L)),   // some heavy keys
      (3, Gen.chooseNum(100L, 120L))) // long tail
    samples(Gen.listOfN(60, keyGen), n = 4).foreach { keys =>
      val df = keys.map(Tuple1(_)).toDF("user_id")
      Seq(1L, 3L, 1024L).foreach { width =>
        val got = Profile.skewReport(df, Seq("user_id"), bucketWidth = width)
          .collect().head
        val want = brute(keys)
        assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
          got.getLong(4), got.getString(5), got.getDouble(6)) == want,
          s"width=$width keys=$keys")
      }
    }
  }

  test("skewReport: uniform keys give ratio 1.0; composite keys concat with |") {
    val uniform = (1L to 12L).flatMap(k => Seq.fill(3)(k)).map(Tuple1(_)).toDF("user_id")
    val u = Profile.skewReport(uniform, Seq("user_id")).collect().head
    assert(u.getDouble(6) == 1.0 && u.getLong(2) == 3L && u.getLong(3) == 3L)

    val comp = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k1", "k2")
    val c = Profile.skewReport(comp, Seq("k1", "k2")).collect().head
    assert(c.getString(5) == "1|a" && c.getLong(2) == 2L)
  }

  test("concentration == brute-force HHI; extremes 1.0 and 1/k") {
    val catGen = Gen.oneOf("s1", "s2", "s3", "s4")
    samples(Gen.listOfN(25, catGen), n = 4).foreach { cats =>
      val df = cats.map(Tuple1(_)).toDF("source")
      val counts = cats.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = cats.size.toLong
      val sumsq = counts.values.map(c => c * c).sum
      val topCount = counts.values.max
      val topGroup = counts.filter(_._2 == topCount).keys.max
      val got = Profile.concentration(df, "source").collect().head
      assert((got.getLong(0), got.getLong(1), got.getString(2), got.getLong(3),
        got.getDouble(4)) ==
        (n, counts.size.toLong, topGroup, topCount,
          sumsq.toDouble / (n.toDouble * n.toDouble)), s"cats=$cats")
    }
    val mono = Seq.fill(5)(Tuple1("only")).toDF("source")
    assert(Profile.concentration(mono, "source").collect().head.getDouble(4) == 1.0)
    val even = Seq("a", "b", "c", "d").map(Tuple1(_)).toDF("source")
    assert(Profile.concentration(even, "source").collect().head.getDouble(4) == 0.25)
  }

  test("skewReport rejects empty keys and bad widths") {
    val df = Seq(Tuple1(1L)).toDF("user_id")
    intercept[IllegalArgumentException](Profile.skewReport(df, Seq.empty))
    intercept[IllegalArgumentException](
      Profile.skewReport(df, Seq("user_id"), bucketWidth = 0))
  }

  test("skewReport: null key components get the sentinel, not silent collapse") {
    // concat_ws would stringify (null,"a") and ("a",null) identically;
    // the sentinel keeps the reported heavy key distinguishable
    val df = Seq((Option.empty[Long], Some("a")), (Option.empty[Long], Some("a")),
      (Some(1L), Option.empty[String])).toDF("k1", "k2")
    val r = Profile.skewReport(df, Seq("k1", "k2")).collect().head
    assert(r.getLong(1) == 2L)           // two distinct composite groups
    assert(r.getString(5) == "␀|a")      // the heavy one, nulls visible
  }
}
