package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.text.{Dedup, SuffixDedup}

class SuffixDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver brute force: exact covered-position computation by string
    * comparison, then island merge. */
  private def brute(docs: Seq[(Long, String)], L: Int): Set[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("[ \t\n\r\f]+").filter(_.nonEmpty).toSeq }
    val wins = toks.flatMap { case (id, ts) =>
      (0 to ts.length - L).map(p => (id, p.toLong, ts.slice(p, p + L).mkString("")))
    }
    val dup = wins.groupBy(_._3).filter(_._2.size >= 2).keySet
    val cov = wins.filter(w => dup(w._3)).map(w => (w._1, w._2))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    cov.flatMap { case (id, ps) =>
      // merge [p, p+L) intervals
      val spans = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      ps.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2) {
          val (s0, e0) = spans.remove(spans.size - 1)
          spans += ((s0, math.max(e0, p + L)))
        } else spans += ((p, p + L))
      }
      spans.map { case (s, e) => (id, s, e, e - s) }
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], L: Int): Set[(Long, Long, Long, Long)] =
    SuffixDedup.maximalRepeatSpans(docs.toDF("doc_id", "text"), minLen = L)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("spans == exact brute force on random corpora (L = 4, non-power L = 5)") {
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.chooseNum(3, 18).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })
    for (L <- Seq(4, 5); docs <- samples(corpus, n = 6))
      assert(run(docs, L) == brute(docs, L), s"L=$L docs=$docs")
  }

  test("cross-document, within-document and overlapping repeats are exact") {
    val shared = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"$shared epsilon zeta"),
      // within-doc repeat, overlapping occurrences of an 8-token period
      (3L, "p1 p2 p3 p4 p1 p2 p3 p4 p1 p2 p3 p4 p1 p2 p3 p4"),
      (4L, "lone tokens only here nothing repeats at all friends")
    )
    for (l <- Seq(8, 10)) assert(run(docs, l) == brute(docs, l), s"L=$l")
    // the 12-token shared block is covered IN BOTH docs at L=10
    val spans = run(docs, 10)
    assert(spans.exists(s => s._1 == 1L && s._4 == 12L))
    assert(spans.exists(s => s._1 == 2L && s._4 == 12L))
    assert(!spans.exists(_._1 == 4L))
  }

  test("reports the FIRST occurrence q95's keep-first semantics provably misses") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, s"$shared tail one two three"),
                   (2L, s"head $shared four five six"))
    val exact = run(docs, 10)
    // exact: both occurrences covered
    assert(exact.map(_._1) == Set(1L, 2L))
    // q95 (keep-first windowed cut): the globally-first occurrence
    // (doc 1, pos 0) is NOT reported — the documented miss
    val q95 = Dedup.repeatedSpans(docs.toDF("doc_id", "text"), n = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(q95.map(_._1) == Set(2L),
      s"q95 should only cut the non-first occurrence, got $q95")
  }

  test("no window ever crosses a document boundary") {
    // doc1's suffix + doc2's prefix would form a repeat of the block in
    // doc3 if concatenation leaked across the gap
    val docs = Seq(
      (1L, "x1 x2 x3 a b c"),
      (2L, "d e f y1 y2 y3"),
      (3L, "a b c d e f"))
    assert(run(docs, 6) == brute(docs, 6))
    assert(run(docs, 6).isEmpty)
  }

  test("invariant to partition layout") {
    val docs = (1L to 30L).map(i =>
      (i, ((1 to 15).map(j => s"t${(i * 7 + j) % 11}") ++
        (if (i % 3 == 0) (1 to 6).map(j => s"c$j") else Nil)).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val a = SuffixDedup.maximalRepeatSpans(df.repartition(13), minLen = 6)
    val b = SuffixDedup.maximalRepeatSpans(df.coalesce(1), minLen = 6)
    assert(rowSet(a) == rowSet(b))
  }
}
