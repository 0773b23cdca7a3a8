package graft

import graft.analytics.Behavior
import graft.graph.Triangles
import graft.text.Fuzzy
import org.apache.spark.sql.functions._

class BehaviorGraphSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------ triangles

  test("triangle count on known graphs") {
    // K4 has 4 triangles; adding a pendant vertex changes nothing
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    val edges = (k4 :+ (4L, 9L)).toDF("s", "d")
    assert(Triangles.triangleCount(edges, "s", "d").head().getLong(0) == 4L)
  }

  test("a 4-cycle has no triangles; duplicates and both directions don't double-count") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val noisy = (cyc ++ cyc.map(_.swap) ++ cyc).toDF("s", "d")
    assert(Triangles.triangleCount(noisy, "s", "d").head().getLong(0) == 0L)
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    assert(Triangles.triangleCount(tri, "s", "d").head().getLong(0) == 1L)
  }

  test("triangle count matches brute force on a pseudo-random graph") {
    val es = (0 until 300).map { i =>
      val a = (i * 2654435761L) % 40
      val b = (i * 40503L + 7) % 40
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val brute = (for {
      (a, b) <- es; (c, d) <- es if c == b
      if es.contains((a, d)) && a < b && b < d
    } yield (a, b, d)).size
    val got = Triangles.triangleCount(es.toDF("s", "d"), "s", "d").head().getLong(0)
    assert(got == brute.toLong)
  }

  // ---------------------------------------------------------------- fuzzy

  test("editDistancePairs finds substitution, deletion and insertion neighbors only") {
    val vocab = Seq("word", "ward", "words", "ord", "wrap", "zzzz").toDF("w")
    val got = Fuzzy.editDistancePairs(vocab)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("ward", "word", 1L),  // substitution
      ("word", "words", 1L), // insertion
      ("ord", "word", 1L)))  // deletion
  }

  test("vocabulary is distinct, lowercased and length-bounded") {
    val docs = Seq((1L, "Foo foo ab abcdefghijklm bar")).toDF("doc_id", "text")
    val got = Fuzzy.vocabulary(docs, 3, 12).as[String].collect().toSet
    assert(got == Set("foo", "bar"))
  }

  // --------------------------------------------------------------- funnel

  test("funnel requires strict order between first-event times") {
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full
      (2L, "click", 5L), (2L, "view", 10L),                         // click BEFORE view
      (2L, "click", 15L),                                           // …but again after
      (3L, "view", 10L),                                            // view only
      (4L, "purchase", 1L)                                          // never viewed
    ).toDF("user_id", "event_type", "us")
    val got = Behavior.funnel(ev, "user_id", "event_type", "us",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((0L, "view", 3L), (1L, "click", 2L), (2L, "purchase", 1L)))
  }

  test("funnel: equal timestamps do NOT advance the stage (strict >)") {
    val ev = Seq((1L, "view", 10L), (1L, "click", 10L)).toDF("user_id", "event_type", "us")
    val got = Behavior.funnel(ev, "user_id", "event_type", "us", Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("view" -> 1L, "click" -> 0L))
  }

  // ------------------------------------------------------------ retention

  test("empty inputs degrade to empty (or zero-count) results, not errors") {
    val noEdges = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(Triangles.triangleCount(noEdges, "s", "d").head().getLong(0) == 0L)
    assert(graft.graph.PageRank.ranks(noEdges, "s", "d").count() == 0L)
    val noEvents = Seq.empty[(Long, String, Long)].toDF("user_id", "event_type", "us")
    val funnelOut = Behavior.funnel(noEvents, "user_id", "event_type", "us",
      Seq("view", "click")).collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(funnelOut == Map("view" -> 0L, "click" -> 0L))
    assert(Behavior.retention(noEvents.select($"user_id", $"us"), "user_id", "us").count() == 0L)
    assert(Fuzzy.editDistancePairs(Seq.empty[String].toDF("w")).count() == 0L)
    val noSess = Seq.empty[(Long, Long, Long)].toDF("user_id", "event_id", "us")
    assert(graft.operators.Sessionize.stats(noSess, "user_id", "us", "event_id", 1L).count() == 0L)
    val noLog = Seq.empty[(Long, Long, Long, String)].toDF("k", "ts", "tie", "status")
    assert(graft.operators.Merge.scd2(noLog, Seq("k"), "ts", "tie", Seq("status")).count() == 0L)
  }

  test("retention counts distinct users per cohort and offset, bounded") {
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, day + 1L), (1L, day + 2L), // day 0 cohort, returns day 1 (once)
      (2L, 0L), (2L, 9L * day),                 // day-9 visit outside maxOffset
      (3L, day)                                 // day 1 cohort
    ).toDF("user_id", "us")
    val got = Behavior.retention(ev, "user_id", "us", maxOffsetDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L)))
  }
}
