package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.analytics.Quantiles

class HistSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val LO = 0.0
  private val HI = 100.0
  private val BINS = 10

  private def sketch(vals: Seq[Double], grain: String = "g"): DataFrame =
    vals.map((grain, _)).toDF("g", "v").repartition(5)
      .transform(Quantiles.equiWidthSketch(_, "v", Seq("g"), LO, HI, BINS))

  private def arr(df: DataFrame): Seq[Long] =
    df.select("sketch").head().getSeq[Long](0)

  test("bin counts are dense, exact, and edge-complete") {
    val got = arr(sketch(Seq(-5.0, 0.0, 4.9, 5.0, 55.0, 99.999, 100.0, 250.0)))
    assert(got.size == BINS + 2)
    assert(got.head == 1L, "underflow")
    assert(got.last == 2L, "overflow (hi is exclusive)")
    assert(got(1) == 3L, "[0,10): 0.0, 4.9, 5.0")
    assert(got(6) == 1L && got(10) == 1L)
    assert(got.sum == 8L, "out-of-range values counted, not dropped")
  }

  test("merged stored sketches are bit-identical to the direct sketch") {
    val gen = Gen.listOfN(200, Gen.chooseNum(-20.0, 120.0))
    for (vals <- samples(gen, n = 5)) {
      val (a, b) = vals.splitAt(vals.size / 3)
      val parts = sketch(a).unionByName(sketch(b))
      val merged = parts.groupBy("g")
        .agg(Quantiles.mergeSketches(col("sketch"), BINS).as("sketch"))
      assert(arr(merged) == arr(sketch(vals)))
    }
  }

  test("quantile estimate lands inside the exact value's bin (error < width)") {
    val gen = Gen.listOfN(150, Gen.chooseNum(1.0, 99.0))
    for (vals <- samples(gen, n = 5); q <- Seq(0.1, 0.5, 0.9)) {
      val est = sketch(vals)
        .select(Quantiles.quantileFromSketch(col("sketch"), q, LO, HI, BINS))
        .head().getDouble(0)
      // the continuous-rank exact quantile the estimator targets
      val sorted = vals.sorted
      val r = q * (vals.size - 1)
      val exact = sorted(r.toInt) +
        (r - r.toInt) * (sorted(math.min(r.toInt + 1, vals.size - 1)) - sorted(r.toInt))
      assert(math.abs(est - exact) < (HI - LO) / BINS + 1e-9,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("deterministic point anchors") {
    // ten values 5,15,...,95: one per bin; median rank 4.5 → bin 5
    val vals = (0 until 10).map(i => i * 10.0 + 5.0)
    val est = sketch(vals)
      .select(Quantiles.quantileFromSketch(col("sketch"), 0.5, LO, HI, BINS))
      .head().getDouble(0)
    assert(est == 45.0, s"est=$est") // bin 5 spans [40,50), offset (4.5−4)/1
  }

  test("q = 1 falls back to the last non-empty bin") {
    val est = sketch(Seq(12.0, 13.0, 77.0))
      .select(Quantiles.quantileFromSketch(col("sketch"), 1.0, LO, HI, BINS))
      .head().getDouble(0)
    assert(est >= 70.0 && est < 80.0, s"est=$est")
  }

  test("quantile landing out of range fails loudly") {
    val e = intercept[Exception] {
      sketch(Seq(500.0, 600.0))
        .select(Quantiles.quantileFromSketch(col("sketch"), 0.5, LO, HI, BINS))
        .collect()
    }
    assert(messages(e).exists(m => m != null && m.contains("out-of-range bin")))
  }
}
