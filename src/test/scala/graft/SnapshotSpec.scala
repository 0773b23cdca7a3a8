package graft

import org.apache.spark.sql.functions._

import graft.ingest.Snapshot

class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("diff classifies added / removed / changed / unchanged") {
    val cur = corpus((1L, "a", "s"), (2L, "b", "s"), (4L, "d", "s"))
    val prev = corpus((1L, "a", "s"), (2L, "B", "s"), (3L, "c", "s"))
    val got = Snapshot.diff(cur, prev, "doc_id", Seq("text", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("diff is null-safe: null, 'null', and empty string are three different contents") {
    val cur = Seq((1L, null.asInstanceOf[String]), (2L, "null"), (3L, ""))
      .toDF("doc_id", "text")
    val prev = Seq((1L, "null"), (2L, ""), (3L, "")).toDF("doc_id", "text")
    val got = Snapshot.diff(cur, prev, "doc_id", Seq("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"))
  }

  test("diff fingerprints multi-column content injectively — boundary shifts, separator bytes, sentinel lookalikes") {
    // every pair here has identical naive concatenations but different
    // (t1, t2) content, so each must classify as changed
    val cases = Seq(
      (("ab", "c"), ("a", "bc")), // boundary shift
      (("a\u0001b", "c"), ("a", "b\u0001c")), // content containing separator bytes
      ((null: String, "x"), ("<null-column-block>", "x")), // sentinel lookalike vs null
      (("", "x"), (null: String, "x"))) // empty vs null
    cases.zipWithIndex.foreach { case (((c1, c2), (p1, p2)), i) =>
      val cur = Seq((1L, c1, c2)).toDF("doc_id", "t1", "t2")
      val prev = Seq((1L, p1, p2)).toDF("doc_id", "t1", "t2")
      val got = Snapshot.diff(cur, prev, "doc_id", Seq("t1", "t2")).collect()
      assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "changed")), s"case $i: ($c1,$c2) vs ($p1,$p2)")
    }
  }

  test("changedKeys is exactly the added+changed worklist") {
    val cur = corpus((1L, "a", "s"), (2L, "b2", "s"), (5L, "e", "s"))
    val prev = corpus((1L, "a", "s"), (2L, "b", "s"), (3L, "c", "s"))
    val got = rowSet(Snapshot.changedKeys(cur, prev, "doc_id", Seq("text", "source")))
    assert(got == Set(Seq(2L, "changed"), Seq(5L, "added")))
  }

  test("property: diff matches brute-force classification for random corpus pairs") {
    import org.scalacheck.Gen
    val docGen = for {
      id <- Gen.chooseNum(0L, 30L)
      text <- Gen.oneOf(Gen.const(null: String), Gen.alphaStr.map(_.take(5)))
      src <- Gen.oneOf("a", "b")
    } yield (id, text, src)
    val gen = for {
      cur <- Gen.listOf(docGen)
      prev <- Gen.listOf(docGen)
    } yield (cur.distinctBy(_._1), prev.distinctBy(_._1))
    samples(gen, n = 6, size = 25).foreach { case (cur, prev) =>
      val cm = cur.map(d => d._1 -> ((d._2, d._3))).toMap
      val pm = prev.map(d => d._1 -> ((d._2, d._3))).toMap
      val expected = (cm.keySet ++ pm.keySet).map { k =>
        val st =
          if (!pm.contains(k)) "added"
          else if (!cm.contains(k)) "removed"
          else if (cm(k) != pm(k)) "changed"
          else "unchanged"
        Seq[Any](k, st)
      }
      val got = rowSet(Snapshot.diff(
        corpus(cur: _*), corpus(prev: _*), "doc_id", Seq("text", "source")))
      assert(got == expected, s"cur=$cur prev=$prev")
    }
  }

  test("diff fails loudly on null keys instead of reporting phantom added+removed") {
    val withNull = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b")).toDF("doc_id", "text")
    val ok = Seq((1L, "a")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Snapshot.diff(withNull, ok, "doc_id", Seq("text")).collect()
    }
    assert(messages(ex).exists(m => m != null && m.contains("null value in key column")))
  }

  test("diff rejects an empty content-column list") {
    val d = corpus((1L, "a", "s"))
    intercept[IllegalArgumentException] {
      Snapshot.diff(d, d, "doc_id", Nil)
    }
  }

  test("the join shuffles (key, fingerprint) projections, never document bodies") {
    val cur = corpus((1L, "a", "s"), (2L, "b", "s"))
    val plan = Snapshot.diff(cur, cur, "doc_id", Seq("text", "source"))
      .queryExecution.optimizedPlan
    // every join child projects exactly two attributes: the key and the md5
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      assert(j.left.output.size == 2 && j.right.output.size == 2,
        s"join child carries extra columns: ${j.left.output} / ${j.right.output}")
    }
  }
}
