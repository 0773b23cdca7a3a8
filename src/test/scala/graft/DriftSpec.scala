package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions.lit
import graft.analytics.Drift
import graft.text.LangModel

/** Brute-force oracles for the drift statistics ([[graft.analytics.Drift]])
  * and the bigram-LM fluency score ([[graft.text.LangModel]]). Exact
  * equality throughout: each Spark expression is integer arithmetic plus
  * the identical sequence of correctly-rounded double ops the oracle
  * performs, so there is no tolerance to hide behind.
  */
class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[ \t\n\r\f]+").toSeq

  // ------------------------------------------------------------------- KS

  /** The single-partition textbook form: D over the distinct-value grid. */
  private def ksBrute(a: Seq[Double], b: Seq[Double]): Double = {
    val grid = (a ++ b).distinct.sorted
    val (na, nb) = (a.size.toLong, b.size.toLong)
    grid.map { x =>
      math.abs(a.count(_ <= x).toLong.toDouble / na.toDouble -
               b.count(_ <= x).toLong.toDouble / nb.toDouble)
    }.max
  }

  test("ksStatistic == brute-force CDF max at any bucket width") {
    val v = Gen.chooseNum(-20, 40).map(_ / 4.0) // duplicates + negatives
    val sideGen = for { x <- v; s <- Gen.oneOf("A", "B") } yield (s, x)
    samples(Gen.listOfN(40, sideGen), n = 4).foreach { xs =>
      val a = xs.collect { case ("A", x) => x }
      val b = xs.collect { case ("B", x) => x }
      whenever(a.nonEmpty && b.nonEmpty) {
        val df = xs.toDF("side", "value")
        Seq(0.5, 3.0, 1000.0).foreach { width =>
          val got = Drift.ksStatistic(df, "value", "side", lit("A"), lit("B"),
            bucketWidth = width).collect().head
          assert((got.getLong(0), got.getLong(1)) == (a.size.toLong, b.size.toLong))
          assert(got.getDouble(2) == ksBrute(a, b),
            s"width=$width got=${got.getDouble(2)} want=${ksBrute(a, b)} xs=$xs")
        }
      }
    }
  }

  test("ksStatistic extremes: identical samples -> 0, disjoint ranges -> 1") {
    val same = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0)).toDF("side", "value")
    assert(Drift.ksStatistic(same, "value", "side", lit("A"), lit("B"))
      .collect().head.getDouble(2) == 0.0)
    val apart = Seq(("A", 1.0), ("A", 2.0), ("B", 10.0), ("B", 11.0)).toDF("side", "value")
    assert(Drift.ksStatistic(apart, "value", "side", lit("A"), lit("B"))
      .collect().head.getDouble(2) == 1.0)
  }

  test("ksStatistic fails loudly on an empty side (never a NULL ks_d)") {
    // non-ANSI Divide would NULL the CDF heights on a zero n and max()
    // would swallow it — the guard must error instead, naming the side
    val oneSided = Seq(("A", 1.0), ("A", 2.0)).toDF("side", "value")
    val e = intercept[Exception] {
      Drift.ksStatistic(oneSided, "value", "side", lit("A"), lit("B")).collect()
    }
    assert(e.getMessage.contains("n_b") && e.getMessage.contains("undefined"))
    val allNull = Seq(("A", Some(1.0)), ("B", Option.empty[Double])).toDF("side", "value")
    val e2 = intercept[Exception] {
      Drift.ksStatistic(allNull, "value", "side", lit("A"), lit("B")).collect()
    }
    assert(e2.getMessage.contains("undefined"))
  }

  test("ksStatistic excludes nulls, NaNs, and third populations") {
    val df = Seq(("A", Some(1.0)), ("A", None), ("B", Some(5.0)), ("C", Some(1.0)))
      .toDF("side", "value")
    val r = Drift.ksStatistic(df, "value", "side", lit("A"), lit("B")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == (1L, 1L, 1.0))
    // a NaN must leave BOTH the totals and the CDF — were it only
    // bucket-dropped, n_a would count it and the CDF could never reach 1
    val withNan = Seq(("A", 1.0), ("A", Double.NaN), ("B", 5.0)).toDF("side", "value")
    val n = Drift.ksStatistic(withNan, "value", "side", lit("A"), lit("B")).collect().head
    assert((n.getLong(0), n.getLong(1), n.getDouble(2)) == (1L, 1L, 1.0))
  }

  test("decCap: identity below 10^18, loud error at the cap") {
    import org.apache.spark.sql.functions.lit
    val ok = spark.range(1).select(Drift.decCap(lit(999999999999999999L)).as("v"))
      .collect().head.getDecimal(0)
    assert(ok.longValueExact() == 999999999999999999L)
    val e = intercept[Exception] {
      spark.range(1).select(Drift.decCap(lit(1000000000000000000L))).collect()
    }
    assert(messages(e).exists(_.contains("decimal(18,0) exact-product domain")))
  }

  // ------------------------------------------------------------------- TV

  test("tvDistance == brute force; extremes hit 0 and 1") {
    val catGen = for { s <- Gen.oneOf("A", "B"); c <- Gen.oneOf("x", "y", "z") } yield (s, c)
    samples(Gen.listOfN(30, catGen), n = 4).foreach { xs =>
      val a = xs.collect { case ("A", c) => c }
      val b = xs.collect { case ("B", c) => c }
      whenever(a.nonEmpty && b.nonEmpty) {
        val (na, nb) = (a.size.toLong, b.size.toLong)
        val cats = (a ++ b).distinct
        val num = cats.map(c =>
          math.abs(a.count(_ == c).toLong * nb - b.count(_ == c).toLong * na)).sum
        val want = num.toDouble / (2.0 * na.toDouble * nb.toDouble)
        val got = Drift.tvDistance(xs.toDF("side", "cat"), "cat", "side",
          lit("A"), lit("B")).collect().head
        assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3)) ==
          (na, nb, cats.size.toLong, want), s"xs=$xs")
      }
    }
    val samePs = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")).toDF("side", "cat")
    assert(Drift.tvDistance(samePs, "cat", "side", lit("A"), lit("B"))
      .collect().head.getDouble(3) == 0.0)
    val disjoint = Seq(("A", "x"), ("B", "y")).toDF("side", "cat")
    assert(Drift.tvDistance(disjoint, "cat", "side", lit("A"), lit("B"))
      .collect().head.getDouble(3) == 1.0)
  }

  // ------------------------------------------------------------------ PSI

  test("psi == brute-force half-count-smoothed bin sum; identical sides ~ 0") {
    def brute(a: Seq[Double], b: Seq[Double], w: Double): (Long, Long, Long, Long) = {
      val bins = (a.map(x => math.floor(x / w).toLong) ++
        b.map(x => math.floor(x / w).toLong)).distinct
      val (na, nb, nBins) = (a.size.toLong, b.size.toLong, bins.size.toLong)
      val nano = bins.map { bin =>
        val ca = a.count(x => math.floor(x / w).toLong == bin).toLong
        val cb = b.count(x => math.floor(x / w).toLong == bin).toLong
        val p = (ca.toDouble + 0.5) / (na.toDouble + 0.5 * nBins.toDouble)
        val q = (cb.toDouble + 0.5) / (nb.toDouble + 0.5 * nBins.toDouble)
        BigDecimal((p - q) * math.log(p / q) * 1e9)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      (na, nb, nBins, nano)
    }
    val v = Gen.chooseNum(-20, 40).map(_ / 4.0)
    val sideGen = for { x <- v; s <- Gen.oneOf("A", "B") } yield (s, x)
    samples(Gen.listOfN(40, sideGen), n = 4).foreach { xs =>
      val a = xs.collect { case ("A", x) => x }
      val b = xs.collect { case ("B", x) => x }
      whenever(a.nonEmpty && b.nonEmpty) {
        val df = xs.toDF("side", "value")
        Seq(0.5, 3.0).foreach { w =>
          val got = Drift.psi(df, "value", "side", lit("A"), lit("B"),
            binWidth = w).collect().head
          assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
            brute(a, b, w), s"w=$w xs=$xs")
        }
      }
    }
    // equal-count identical distributions: p == q in every bin → 0
    val same = Seq(("A", 1.0), ("A", 5.0), ("B", 1.0), ("B", 5.0)).toDF("side", "value")
    assert(Drift.psi(same, "value", "side", lit("A"), lit("B"))
      .collect().head.getLong(3) == 0L)
  }

  test("psi fails loudly on an empty side; disjoint ranges score large") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 100.0), ("B", 101.0)).toDF("side", "value")
    val psi = Drift.psi(df, "value", "side", lit("A"), lit("B"), binWidth = 1.0)
      .collect().head.getLong(3)
    assert(psi > 250000000L) // far past the 0.25 action threshold
    val ex = intercept[Exception] {
      Drift.psi(df, "value", "side", lit("A"), lit("NOPE")).collect()
    }
    assert(messages(ex).exists(m => m != null && m.contains("undefined")))
  }

  // ------------------------------------------------------------------ JSD

  test("jsDivergence == brute force nano sum; extremes hit 0 and ln 2") {
    def brute(a: Seq[String], b: Seq[String]): (Long, Long, Long, Long) = {
      val (na, nb) = (a.size.toLong, b.size.toLong)
      val cats = (a ++ b).distinct
      val nano = cats.map { c =>
        val p = a.count(_ == c).toDouble / na.toDouble
        val q = b.count(_ == c).toDouble / nb.toDouble
        val pp = if (p > 0) p * math.log(2.0 * p / (p + q)) else 0.0
        val qq = if (q > 0) q * math.log(2.0 * q / (p + q)) else 0.0
        BigDecimal((pp + qq) * 0.5 * 1e9)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      (na, nb, cats.size.toLong, nano)
    }
    val catGen = for { s <- Gen.oneOf("A", "B"); c <- Gen.oneOf("x", "y", "z", "w") } yield (s, c)
    samples(Gen.listOfN(30, catGen), n = 4).foreach { xs =>
      val a = xs.collect { case ("A", c) => c }
      val b = xs.collect { case ("B", c) => c }
      whenever(a.nonEmpty && b.nonEmpty) {
        val got = Drift.jsDivergence(xs.toDF("side", "cat"), "cat", "side",
          lit("A"), lit("B")).collect().head
        assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
          brute(a, b), s"xs=$xs")
      }
    }
    val samePs = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")).toDF("side", "cat")
    assert(Drift.jsDivergence(samePs, "cat", "side", lit("A"), lit("B"))
      .collect().head.getLong(3) == 0L)
    // fully disjoint supports: JSD = ln 2 exactly (in nanos, both
    // categories contribute round(0.5 * ln 2 * 1e9))
    val disjoint = Seq(("A", "x"), ("B", "y")).toDF("side", "cat")
    val lnTwoNano = 2 * BigDecimal(0.5 * math.log(2.0) * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(Drift.jsDivergence(disjoint, "cat", "side", lit("A"), lit("B"))
      .collect().head.getLong(3) == lnTwoNano)
  }

  test("jsDivergence is symmetric in its sides and fails loudly on an empty side") {
    val xs = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "x"), ("B", "z"))
    val df = xs.toDF("side", "cat")
    val ab = Drift.jsDivergence(df, "cat", "side", lit("A"), lit("B")).collect().head
    val ba = Drift.jsDivergence(df, "cat", "side", lit("B"), lit("A")).collect().head
    assert(ab.getLong(3) == ba.getLong(3))
    val ex = intercept[Exception] {
      Drift.jsDivergence(df, "cat", "side", lit("A"), lit("NOPE")).collect()
    }
    assert(messages(ex).exists(m => m != null && m.contains("undefined")))
  }

  // -------------------------------------------------------------- fluency

  test("bigramFluency == brute-force corpus bigram counts; short docs score 0") {
    val word = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.chooseNum(1, 7).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    samples(Gen.listOfN(10, docGen), n = 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val allBgs = texts.flatMap(t => toks(t).sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq)
      val corpus = allBgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val want = texts.zipWithIndex.map { case (t, i) =>
        val bgs = toks(t).sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        val mean = if (bgs.isEmpty) 0.0
                   else bgs.map(corpus).sum.toDouble / bgs.size.toLong
        (i.toLong, bgs.size.toLong, mean)
      }
      val got = LangModel.bigramFluency(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == want, s"got=$got want=$want texts=$texts")
    }
  }

  test("collocations == brute-force lift ratio, top-k total order respected") {
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "new york is a city and new york is big",
      "the new day and the new year in new york",
      "a b a b a b a b",
      "york new is not new york")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val allToks = texts.map(toks)
    val uni = allToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bgs = allToks.flatMap(ts => ts.zip(ts.drop(1)))
    val bgc = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nUni, nBi) = (allToks.map(_.size).sum.toLong, bgs.size.toLong)
    val want = bgc.toSeq.filter(_._2 >= 2).map { case ((a, b), nxy) =>
      val s = (nxy.toDouble / nBi.toDouble) / (uni(a).toDouble / nUni.toDouble) /
        (uni(b).toDouble / nUni.toDouble)
      (a, b, nxy, math.round(s * 1e6))
    }.sortBy { case (a, b, _, s) => (-s, a, b) }.take(5)
    val got = graft.text.LangModel.collocations(docs, minCount = 2, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"got=$got want=$want")
    assert(got.map(t => (t._1, t._2)).contains(("new", "york")))
  }

  test("oovRate == brute-force occurrence fraction; empty eval scores 0") {
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    samples(Gen.zip(Gen.listOfN(5, docGen), Gen.listOfN(4, docGen)), n = 4).foreach {
      case (trainTexts, evalTexts) =>
        val train = trainTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val eval = evalTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val vocab = trainTexts.flatMap(toks).toSet
        val evToks = evalTexts.flatMap(toks)
        val nOov = evToks.count(!vocab.contains(_)).toLong
        val want = (evToks.size.toLong, nOov, vocab.size.toLong,
          if (evToks.isEmpty) 0.0 else nOov.toDouble / evToks.size.toLong)
        val got = LangModel.oovRate(train, eval).collect().head
        assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3)) == want)
    }
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = LangModel.oovRate(train, empty).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) == (0L, 0L, 2L, 0.0))
  }

  test("distinctNgramRatio == brute force; over-long n reports zeros") {
    val word = Gen.oneOf("a", "b", "c")
    val docGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    samples(Gen.listOfN(8, docGen), n = 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val want = Seq(1, 2, 3).map { n =>
        val grams = texts.flatMap(t =>
          toks(t).sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq)
        val ratio = if (grams.isEmpty) 0.0
                    else grams.distinct.size.toLong.toDouble / grams.size.toLong
        (n.toLong, grams.size.toLong, grams.distinct.size.toLong, ratio)
      }
      val got = LangModel.distinctNgramRatio(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == want, s"got=$got want=$want texts=$texts")
    }
    val tiny = Seq((1L, "x")).toDF("doc_id", "text")
    val r = LangModel.distinctNgramRatio(tiny, ns = Seq(5)).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) == (5L, 0L, 0L, 0.0))
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body
}
