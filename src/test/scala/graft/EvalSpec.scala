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
}
