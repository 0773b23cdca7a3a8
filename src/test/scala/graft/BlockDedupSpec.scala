package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.text.Dedup

class BlockDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side transcription of the keep-first block-dedup semantics:
    * segment every doc into W-token blocks, keep a block instance iff it
    * is the globally smallest (doc_id, idx) occurrence of its content,
    * rebuild from survivors in order.
    */
  private def brute(docs: Seq[(Long, String)], w: Int): Seq[(Long, Long, Long, String)] = {
    val blocks = docs.map { case (id, text) =>
      val toks = text.toLowerCase.split("[ \t\n\r\f]+", -1).toSeq
      id -> toks.grouped(w).map(_.mkString(" ")).toSeq
    }
    val firstOcc = blocks
      .flatMap { case (id, bs) => bs.zipWithIndex.map { case (b, i) => (b, (id, i)) } }
      .groupBy(_._1).map { case (b, occ) => b -> occ.map(_._2).min }
    blocks.map { case (id, bs) =>
      val kept = bs.zipWithIndex.filter { case (b, i) => firstOcc(b) == (id, i) }
      (id, bs.size.toLong, kept.size.toLong, kept.map(_._1).mkString(" "))
    }
  }

  private def run(docs: Seq[(Long, String)], w: Int): Seq[(Long, Long, Long, String)] =
    Dedup.blockDedup(docs.toDF("doc_id", "text"), blockTokens = w)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("corpus-wide keep-first at block granularity, docs rebuilt in order") {
    // doc 1 owns "a b c" and "d e f"; doc 2 repeats "a b c" twice but
    // contributes fresh "x y z"; doc 3 is pure boilerplate of the two
    val docs = Seq(
      1L -> "a b c d e f",
      2L -> "a b c a b c x y z",
      3L -> "d e f x y z")
    val got = run(docs, 3)
    assert(got == Seq(
      (1L, 2L, 2L, "a b c d e f"),
      (2L, 3L, 1L, "x y z"),
      (3L, 2L, 0L, "")))
  }

  test("a doc whose every block is boilerplate survives with empty text") {
    val got = run(Seq(1L -> "a b", 2L -> "a b"), 2)
    assert(got == Seq((1L, 1L, 1L, "a b"), (2L, 1L, 0L, "")))
  }

  test("within-doc repetition is also excised (first instance wins)") {
    val got = run(Seq(5L -> "p q p q p q"), 2)
    assert(got == Seq((5L, 3L, 1L, "p q")))
  }

  test("trailing partial block is a block of its own") {
    val got = run(Seq(1L -> "a b c d e", 2L -> "e"), 2)
    // doc 1: blocks "a b" "c d" "e"; doc 2's lone "e" is a dup of doc 1's tail
    assert(got == Seq((1L, 3L, 3L, "a b c d e"), (2L, 1L, 0L, "")))
  }

  test("W = 1 degenerates to corpus-wide token dedup") {
    val got = run(Seq(1L -> "x y x", 2L -> "y z"), 1)
    assert(got == Seq((1L, 3L, 2L, "x y"), (2L, 2L, 1L, "z")))
  }

  test("matches the brute-force transcription on random corpora") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val doc = Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    for (docs <- samples(corpus, n = 8); w <- Seq(1, 3, 7))
      assert(run(docs, w) == brute(docs, w), s"w=$w docs=$docs")
  }

  test("result is partitioning-invariant") {
    val docs = Seq(1L -> "a b c d", 2L -> "c d a b", 3L -> "a b a b")
    val one = Dedup.blockDedup(docs.toDF("doc_id", "text").repartition(1), 2)
    val many = Dedup.blockDedup(docs.toDF("doc_id", "text").repartition(7), 2)
    assert(rows(one) == rows(many))
  }

  test("blockTokens must be positive") {
    val e = intercept[IllegalArgumentException](
      Dedup.blockDedup(Seq(1L -> "a").toDF("doc_id", "text"), 0))
    assert(e.getMessage.contains("blockTokens"))
  }
}
