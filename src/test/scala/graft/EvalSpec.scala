package graft

import org.scalacheck.Gen

import graft.analytics.Eval

class EvalSpec extends SparkTestBase {
  import spark.implicits._

  /** Probability interpretation brute force: AUC = P(pos > neg) +
    * ½·P(pos == neg) over all (pos, neg) pairs, in doubled units. */
  private def brute(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Long) = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    (pos.size.toLong, neg.size.toLong, u2,
      u2 * 1000000L / (2L * pos.size * neg.size))
  }

  private def run(rows: Seq[(Long, Boolean)], shift: Int = 10): (Long, Long, Long, Long) = {
    val r = Eval.aucExact(rows.toDF("score", "lbl"), "score", "lbl", shift)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.length == 1)
    r.head
  }

  test("matches the pairwise-probability brute force on random tied data") {
    val gen = for {
      n <- Gen.chooseNum(5, 300)
      rows <- Gen.listOfN(n, for {
        s <- Gen.chooseNum(-50L, 50L) // heavy ties, negatives included
        l <- Gen.oneOf(true, false)
      } yield (s, l))
      // ensure both classes present (single-class is the fail-loud case)
      withBoth = (0L, true) +: (0L, false) +: rows
    } yield withBoth
    for (rows <- samples(gen, n = 8); shift <- Seq(0, 4, 10))
      assert(run(rows, shift) == brute(rows), s"shift=$shift n=${rows.size}")
  }

  test("perfect separation gives 1.0; perfect inversion gives 0.0; all-tied gives 0.5") {
    val perfect = Seq((10L, true), (11L, true), (1L, false), (2L, false))
    assert(run(perfect)._4 == 1000000L)
    val inverted = perfect.map { case (s, l) => (s, !l) }
    assert(run(inverted)._4 == 0L)
    val tied = Seq((5L, true), (5L, true), (5L, false))
    assert(run(tied)._4 == 500000L)
  }

  test("single-class input fails loudly") {
    val e = intercept[Exception](run(Seq((1L, true), (2L, true))))
    assert(messages(e).exists(_.contains("aucExact")))
    val e2 = intercept[Exception](run(Seq.empty))
    assert(messages(e2).exists(_.contains("aucExact")))
  }

  test("result is partitioning-invariant") {
    val data = (1 to 200).map(i => ((i % 23).toLong, i % 3 == 0))
    val a = Eval.aucExact(data.toDF("score", "lbl").repartition(1), "score", "lbl")
    val b = Eval.aucExact(data.toDF("score", "lbl").repartition(13), "score", "lbl")
    assert(rows(a) == rows(b))
  }

  test("leaveOneGroupOut matches the integer brute force and flags the dragging group") {
    val data = Seq(("a", 100L), ("a", 200L), ("b", 1000L), ("b", 2000L), ("c", 150L))
    val got = Eval.leaveOneGroupOut(data.toDF("src", "v"), "src", "v")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val tn = 5L; val ts = data.map(_._2).sum
    val want = data.groupBy(_._1).map { case (g, rows) =>
      val (n, s) = (rows.size.toLong, rows.map(_._2).sum)
      (g, n, (ts - s) / (tn - n), (ts - s) / (tn - n) - ts / tn)
    }.toSeq.sortBy(_._1)
    assert(got == want)
    // group b holds the big values: removing it must drop the mean most
    assert(got.minBy(_._4)._1 == "b")
    val e = intercept[Exception](
      Eval.leaveOneGroupOut(Seq(("only", 1L)).toDF("src", "v"), "src", "v").collect())
    assert(messages(e).exists(_.contains("leaveOneGroupOut")))
  }

  /** Exact integer reference: floor(kappa · 10⁶) via Math.floorDiv —
    * no doubles, so boundary cases (kappa exactly 0, −1, rationals
    * landing on integers) can't be off by an ulp. */
  private def bruteKappa(pairs: Seq[(Boolean, Boolean)]): Long = {
    val n = pairs.size.toLong
    val a = pairs.count(p => p._1 && p._2).toLong
    val b = pairs.count(p => p._1 && !p._2).toLong
    val c = pairs.count(p => !p._1 && p._2).toLong
    val d = pairs.count(p => !p._1 && !p._2).toLong
    val s = (a + b) * (a + c) + (c + d) * (b + d)
    Math.floorDiv((n * (a + d) - s) * 1000000L, n * n - s)
  }

  private def runKappa(pairs: Seq[(Boolean, Boolean)]): (Long, Long, Long, Long, Long, Long) = {
    val r = Eval.cohenKappa(pairs.toDF("ra", "rb"), "ra", "rb")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length == 1)
    r.head
  }

  test("cohenKappa matches the double-precision floor on random raters") {
    val gen = for {
      n <- Gen.chooseNum(4, 300)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false)))
      // both raters must vary (constant raters are the fail-loud case)
      forced = (true, true) +: (true, false) +: (false, true) +: (false, false) +: rows
    } yield forced
    for (pairs <- samples(gen, n = 10))
      assert(runKappa(pairs)._6 == bruteKappa(pairs), s"pairs=$pairs")
  }

  test("cohenKappa: perfect agreement 1e6, -1e6 floor, negative floor exact") {
    val perfect = Seq((true, true), (true, true), (false, false))
    assert(runKappa(perfect)._6 == 1000000L)
    // disagreement on every row, balanced marginals: kappa = -1 exactly
    // (the binary-rater lower bound — see the operator doc)
    val inverted = Seq((true, false), (false, true), (true, false), (false, true))
    assert(runKappa(inverted)._6 == -1000000L)
    // skewed disagreement: kappa = -0.6 exactly — the negative branch's
    // nonneg-division floor must not truncate toward zero
    val skew = Seq((true, false), (true, false), (true, false), (false, true))
    assert(runKappa(skew)._6 == -600000L && bruteKappa(skew) == -600000L)
  }

  test("cohenKappa fails loudly on constant raters and empty input") {
    val e = intercept[Exception](runKappa(Seq((true, true), (true, true))))
    assert(messages(e).exists(_.contains("cohenKappa")))
    val e2 = intercept[Exception](runKappa(Seq.empty))
    assert(messages(e2).exists(_.contains("cohenKappa")))
  }

  private def runCal(rows: Seq[(Long, Boolean)], nBins: Int = 10) =
    Eval.calibrationBins(rows.toDF("p", "y"), "p", "y", nBins)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("calibrationBins: bins, integer means, rates, and Brier by hand") {
    // bin 0: p=50000 y=false; bin 9: p=900000 y=true, p=1000000 y=true
    // (the 1.0 edge folds into the last bin)
    val rows = Seq((50000L, false), (900000L, true), (1000000L, true))
    val got = runCal(rows)
    // brier = (50000² + 100000² + 0) / (3·10⁶) = (25e8+1e10)/3e6 = 4166 (floor)
    val brier = (50000L * 50000L + 100000L * 100000L) / (3L * 1000000L)
    assert(got == Seq(
      (0L, 1L, 50000L, 0L, brier),
      (9L, 2L, 950000L, 1000000L, brier)))
  }

  test("rankedNdcgMrr: hand case, perfect ranking, all-zero relevance") {
    def run(rows: Seq[(Long, Long)], k: Int = 10) =
      Eval.rankedNdcgMrr(rows.toDF("rank", "rel"), "rank", "rel", k)
        .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val w = (1 to 10).map(Eval.dcgWeightMicro)
    // ranks 1..3 with rel (0, 2, 1): dcg = 2w2 + w3; ideal order
    // (2,1,0) → idcg = 2w1 + w2; first relevant at rank 2
    val (n, dcg, idcg, ndcg, fr, mrr) = run(Seq((1L, 0L), (2L, 2L), (3L, 1L)))
    assert(n == 3 && dcg == 2 * w(1) + w(2) && idcg == 2 * w(0) + w(1))
    assert(ndcg == dcg * 1000000L / idcg && ndcg < 1000000L)
    assert(fr == 2L && mrr == 1000000000L / 2)
    // already-ideal ranking: ndcg exactly 1e6, mrr 1e9
    val ideal = run(Seq((1L, 3L), (2L, 1L), (3L, 0L)))
    assert(ideal._4 == 1000000L && ideal._6 == 1000000000L)
    // nothing relevant: 0s, not an error
    assert(run(Seq((1L, 0L), (2L, 0L))) == (2L, 0L, 0L, 0L, 0L, 0L))
  }

  test("rankedNdcgMrr is permutation-safe on tied relevances and rejects bad input") {
    def df(rows: Seq[(Long, Long)]) = rows.toDF("rank", "rel")
    // two orderings of the same tied-relevance multiset: same idcg
    val a = Eval.rankedNdcgMrr(df(Seq((1L, 1L), (2L, 2L), (3L, 2L))), "rank", "rel", 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val b = Eval.rankedNdcgMrr(df(Seq((1L, 2L), (2L, 2L), (3L, 1L))), "rank", "rel", 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(a._3 == b._3, "idcg must not depend on which tied doc came first")
    assert(b._4 == 1000000L, "descending relevance IS the ideal")
    val e = intercept[Exception](
      Eval.rankedNdcgMrr(df(Seq((11L, 1L))), "rank", "rel", 10).collect())
    assert(messages(e).exists(_.contains("rankedNdcgMrr")))
    val e2 = intercept[Exception](
      Eval.rankedNdcgMrr(df(Seq((1L, -1L))), "rank", "rel", 10).collect())
    assert(messages(e2).exists(_.contains("negative relevance")))
  }

  test("calibrationBins: out-of-range p raises; empty input yields an empty diagram") {
    val e = intercept[Exception](runCal(Seq((1000001L, true), (5L, false))))
    assert(messages(e).exists(_.contains("calibrationBins")))
    assert(runCal(Seq.empty).isEmpty)
    intercept[IllegalArgumentException](runCal(Seq((1L, true)), nBins = 7))
  }
}
