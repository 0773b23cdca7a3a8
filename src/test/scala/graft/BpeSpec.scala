package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.text.Bpe

/** BPE merge learning ([[graft.text.Bpe]]) against a driver-side
  * transcription of the reference algorithm (Sennrich et al. 2016,
  * learn_bpe's count-pairs / argmax / greedy-replace loop). The
  * relational islands-and-parity formulation must reproduce the
  * sequential reference exactly — merge table AND segmentation.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // ----------------------------------------------- reference (driver)

  private def refMergeWord(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2 // greedy left-to-right, consumed pair skipped
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(dict: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[Vector[String], Long]) = {
    var words = dict.map { case (w, n) => (w.split("").toVector, n) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      val pairCounts = words.toSeq.flatMap { case (syms, n) =>
        syms.zip(syms.drop(1)).map(p => (p, n))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), cnt) = pairCounts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        merges += ((round, l, r, cnt))
        words = words.map { case (syms, n) => (refMergeWord(syms, l, r), n) }
        round += 1
      }
    }
    (merges.result(), words.groupBy(_._1).view.mapValues(_.values.sum).toMap)
  }

  private val dictGen: Gen[Map[String, Long]] = Gen
    .listOfN(14, Gen.zip(
      Gen.listOfN(6, Gen.oneOf("a", "b", "c")).map(_.mkString), // ab-heavy, tie-rich
      Gen.chooseNum(1L, 9L)))
    .map(_.toMap)

  test("learnMerges == sequential reference (merge table), property") {
    samples(dictGen, n = 5).foreach { dict =>
      val got = Bpe.learnMerges(spark, dict.toSeq.toDF("word", "n"), rounds = 5)
      val (expected, _) = refLearn(dict, 5)
      assert(rows(got) == expected.map(t => Seq[Any](t._1, t._2, t._3, t._4))
        .sortBy(_.mkString("|")))
    }
  }

  test("segment replays the merge table to the reference segmentation") {
    samples(dictGen, n = 3).foreach { dict =>
      val df = dict.toSeq.toDF("word", "n")
      val table = Bpe.learnMerges(spark, df, rounds = 4)
      val got = Bpe.segment(spark, df, table).collect()
        .map(r => (r.getString(0), r.getSeq[String](2).toVector)).toMap
      val (_, refWords) = refLearn(dict, 4)
      val refByWord = dict.keys.map { w =>
        // re-derive each word's final segmentation from the reference
        var syms = w.split("").toVector
        refLearn(dict, 4)._1.foreach { case (_, l, r, _) =>
          syms = refMergeWord(syms, l, r)
        }
        (w, syms)
      }.toMap
      assert(got == refByWord)
      // and the reference's multiset of segmentations is covered
      assert(refWords.keySet == got.values.toSet)
    }
  }

  test("repeated-symbol chains merge with greedy parity (aaaa -> aa aa, aaa -> aa a)") {
    val dict = Seq(("aaaa", 3L), ("aaa", 2L)).toDF("word", "n")
    val table = Bpe.learnMerges(spark, dict, rounds = 1)
    assert(rows(table) == Seq(Seq(1, "a", "a", 13L))) // 3 pairs·n3 + 2 pairs·n2, overlaps counted
    val seg = Bpe.segment(spark, dict, table).collect()
      .map(r => (r.getString(0), r.getSeq[String](2).toVector)).toMap
    assert(seg("aaaa") == Vector("aa", "aa"))
    assert(seg("aaa") == Vector("aa", "a"))
  }

  test("deep merge tables stay bounded: 80 rounds re-anchor past AnchorEvery and match the reference") {
    // 16 words × 6 chars over DISJOINT alphabets: no pair is shared
    // across words, so every word needs exactly 5 rounds to collapse —
    // 80 realized merges total, > 2×AnchorEvery, so the learn fold
    // re-anchors twice and segment's chunked path runs (the declared
    // queries' ≤6-round path never does). Parity with the sequential
    // reference must survive the re-anchoring.
    assert(Bpe.AnchorEvery == 32)
    val dict = (0 until 16).map { w =>
      ((0 until 6).map(j => ('a' + (w * 6 + j)).toChar).mkString, 1L)
    }.toMap
    val df = dict.toSeq.toDF("word", "n")
    val table = Bpe.learnMerges(spark, df, rounds = 80)
    val (expected, _) = refLearn(dict, 80)
    assert(expected.size == 80)
    assert(rows(table) == expected.map(t => Seq[Any](t._1, t._2, t._3, t._4))
      .sortBy(_.mkString("|")))
    val got = Bpe.segment(spark, df, table).collect()
      .map(r => (r.getString(0), r.getSeq[String](2).toVector)).toMap
    val refByWord = dict.keys.map { w =>
      var syms = w.split("").toVector
      expected.foreach { case (_, l, r, _) => syms = refMergeWord(syms, l, r) }
      (w, syms)
    }.toMap
    assert(got == refByWord)
  }

  test("early stop when every word is a single symbol") {
    val dict = Seq(("ab", 5L)).toDF("word", "n")
    val table = Bpe.learnMerges(spark, dict, rounds = 10)
    assert(rows(table) == Seq(Seq(1, "a", "b", 5L))) // round 2 has no pairs
  }

  test("wordDict filters empties and applies the word pattern") {
    val docs = Seq((1L, "ab ab  cd X9 ab")).toDF("doc_id", "text")
    val got = Bpe.wordDict(docs, wordPattern = "^[a-z]+$").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("ab" -> 3L, "cd" -> 1L))
  }
}
