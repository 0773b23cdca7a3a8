package graft

import org.apache.spark.sql.functions._
import graft.silver.Pipelines

/** Known-answer tests per silver-pipeline operator on tiny injected
  * frames (SURVEY §5 item 2; the reference's fixture style is
  * alsoLiked.json / personas.json + RecommendationEndpointTests.cs:16–37).
  */
class PipelinesSpec extends SparkTestBase {
  import spark.implicits._

  test("cooccurrence counts canonical t1<t2 pairs per group") {
    val pairs = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L), (3L, 10L))
      .toDF("g", "t")
    val out = rows(Pipelines.cooccurrence(pairs, "g", "t"))
    assert(out == Seq(
      Seq(10L, 20L, 2L), // groups 1 and 2
      Seq(10L, 30L, 1L),
      Seq(20L, 30L, 1L)).sortBy(_.mkString("|")))
  }

  test("cooccurrence deduplicates repeated (group, item) rows") {
    val pairs = Seq((1L, 10L), (1L, 10L), (1L, 20L)).toDF("g", "t")
    assert(rows(Pipelines.cooccurrence(pairs, "g", "t")) == Seq(Seq(10L, 20L, 1L)))
  }

  test("cooccurrence group cap truncates to the smallest item ids") {
    val pairs = Seq((1L, 40L), (1L, 10L), (1L, 30L), (1L, 20L)).toDF("g", "t")
    // cap 3 keeps {10,20,30}: C(3,2)=3 pairs, none involving 40
    val out = rows(Pipelines.cooccurrence(pairs, "g", "t", maxGroupSize = 3))
    assert(out.size == 3 && out.forall(r => r(0) != 40L && r(1) != 40L))
  }

  /** The truncated_groups observed metric of the LAST completed action on
    * `df` whose metric name carries the graft cap prefix. */
  private def truncatedGroups(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val metrics = df.queryExecution.observedMetrics.collect {
      case (name, row) if name.startsWith("graft.") && name.contains(".caps#") =>
        row.getAs[Long]("truncated_groups")
    }
    assert(metrics.nonEmpty, "expected a graft cap metric on the query")
    metrics.sum
  }

  test("cap truncation is observable: over-cap group raises the counter") {
    val pairs = Seq((1L, 40L), (1L, 10L), (1L, 30L), (1L, 20L), (2L, 5L), (2L, 6L))
      .toDF("g", "t")
    // group 1 (4 items) over cap 3 → exactly one truncated group
    assert(truncatedGroups(Pipelines.cooccurrence(pairs, "g", "t", maxGroupSize = 3)) == 1L)
  }

  test("cap truncation counter is zero when no group exceeds the cap") {
    val pairs = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("g", "t")
    assert(truncatedGroups(Pipelines.cooccurrence(pairs, "g", "t")) == 0L)
    val probe = Seq(10L).toDF("t")
    assert(truncatedGroups(
      Pipelines.cooccurrenceProbedSym(pairs, "g", "t", probe)) == 0L)
  }

  test("CapMetricsListener sees a truncating query and stays quiet otherwise") {
    val listener = new graft.operators.CapMetricsListener()
    spark.listenerManager.register(listener)
    try {
      val pairs = Seq((1L, 40L), (1L, 10L), (1L, 30L), (1L, 20L)).toDF("g", "t")
      Pipelines.cooccurrence(pairs, "g", "t", maxGroupSize = 3).collect()
      Pipelines.cooccurrence(pairs, "g", "t").collect() // under cap: no-op
      // the listener bus is async — poll briefly
      val deadline = System.nanoTime() + 10000000000L
      while (listener.totalTruncated < 1 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.totalTruncated == 1L,
        s"expected exactly the one truncated group, got ${listener.totalTruncated}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("failOnOverflow turns an over-cap group into a loud error, not a truncation") {
    val pairs = Seq((1L, 40L), (1L, 10L), (1L, 30L), (1L, 20L)).toDF("g", "t")
    val ex = intercept[Exception] {
      Pipelines.cooccurrence(pairs, "g", "t", maxGroupSize = 3,
        failOnOverflow = true).collect()
    }
    assert(messages(ex).exists(m => m != null && m.contains("maxGroupSize=3")),
      s"expected the cap in the error, got: ${messages(ex).mkString(" | ")}")
  }

  test("failOnOverflow in-buffer bound errors BEFORE the over-cap group materializes") {
    val pairs = Seq((1L, 40L), (1L, 10L), (1L, 30L), (1L, 20L)).toDF("g", "t")
    val ex = intercept[Exception] {
      Pipelines.cooccurrence(pairs, "g", "t", maxGroupSize = 3,
        failOnOverflow = true).collect()
    }
    // the in-buffer bound's message, not capGroups' post-materialization
    // one: bounded_collect_set must fail while accumulating, so a
    // pathological bucket errors cleanly instead of OOMing inside
    // collect_set first
    assert(messages(ex).exists(m =>
        m != null && m.contains("before the over-cap group materialized")),
      s"expected the in-buffer bound to fire, got: ${messages(ex).mkString(" | ")}")
  }

  test("in-buffer bound doesn't false-alarm on duplicate-heavy groups") {
    // 8 rows in group 1 but only 3 DISTINCT items: the bound counts the
    // buffer's distinct size, not input rows, so duplicates must not be
    // a cap violation (a row-counting bound would spuriously fail here)
    val pairs = Seq((1L, 10L), (1L, 10L), (1L, 10L), (1L, 20L), (1L, 20L),
      (1L, 30L), (1L, 30L), (1L, 30L)).toDF("g", "t")
    val out = rows(Pipelines.cooccurrence(pairs, "g", "t", maxGroupSize = 3,
      failOnOverflow = true))
    assert(out == Seq(
      Seq(10L, 20L, 1L), Seq(10L, 30L, 1L), Seq(20L, 30L, 1L)).sortBy(_.mkString("|")))
  }

  test("GraftSession sessions carry the default truncation monitor, installed once") {
    // getOrCreate must return a session whose CapMetricsListener is live
    // without any caller opt-in, and repeated getOrCreate must not stack
    // listeners (a double install would double-count every truncation)
    val s = GraftSession.getOrCreate("4")
    val s2 = GraftSession.getOrCreate("4")
    val m = GraftSession.monitor(s)
    assert(m eq GraftSession.monitor(s2), "monitor must be one instance per session")
    val before = m.totalTruncated
    val pairs = Seq((1L, 40L), (1L, 10L), (1L, 30L), (1L, 20L)).toDF("g", "t")
    Pipelines.cooccurrence(pairs, "g", "t", maxGroupSize = 3).collect()
    // the listener bus is async — poll briefly
    val deadline = System.nanoTime() + 10000000000L
    while (m.totalTruncated < before + 1 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(m.totalTruncated == before + 1,
      s"expected exactly one newly-counted truncated group (single listener), " +
        s"got delta ${m.totalTruncated - before}")
  }

  test("symmetrize emits both directions") {
    val sim = Seq((1L, 2L, 5L)).toDF("track_id_1", "track_id_2", "score")
    assert(rowSet(Pipelines.symmetrize(sim)) ==
      Set(Seq(1L, 2L, 5L), Seq(2L, 1L, 5L)))
  }

  test("follows links users within key distance 2 in the same nation only") {
    val customer = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 2), (6L, 2))
      .toDF("c_custkey", "c_nationkey")
    val out = rowSet(Pipelines.follows(customer))
    assert(out == Set(
      Seq(1L, 2L), Seq(2L, 1L), Seq(1L, 3L), Seq(3L, 1L),
      Seq(2L, 3L), Seq(3L, 2L), Seq(4L, 6L), Seq(6L, 4L)))
  }

  test("normalizedTrending divides by the global max") {
    val trending = Seq((1L, 10L), (2L, 5L)).toDF("track_id", "play_count")
    val out = rowSet(Pipelines.normalizedTrending(trending))
    assert(out == Set(Seq(1L, 10L, 1.0), Seq(2L, 5L, 0.5)))
  }

  test("likesAnalysis fills missing relevant counts with 0") {
    val likes = Seq((1L, 10L), (1L, 99L), (2L, 99L)).toDF("user_id", "track_id")
    val sim = Seq((10L, 20L, 2L)).toDF("track_id_1", "track_id_2", "score")
    val out = rowSet(Pipelines.likesAnalysis(likes, sim))
    // user 1: 2 likes, 1 on a model track (10); user 2: 1 like, 0 relevant
    assert(out == Set(Seq(1L, 2L, 1L), Seq(2L, 1L, 0L)))
  }

  test("recentWindow keeps only rows within N days of the max timestamp") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("id", "ts")
    val out = rowSet(Pipelines.recentWindow(df, "ts", days = 7).select("id"))
    assert(out == Set(Seq(1L), Seq(2L)))
  }

  test("trending counts recent listens and joins track names deterministically") {
    val li = Seq(
      (100L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
      (100L, java.sql.Timestamp.valueOf("2024-01-09 00:00:00")),
      (200L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
      (300L, java.sql.Timestamp.valueOf("2023-06-01 00:00:00"))) // stale
      .toDF("l_partkey", "l_shipdate")
    val parts = Seq((100L, "a"), (200L, "b"), (300L, "c")).toDF("p_partkey", "p_name")
    val out = Pipelines.trending(li, parts, days = 30).collect().toSeq.map(_.toSeq)
    assert(out == Seq(Seq(100L, 2L, "a"), Seq(200L, 1L, "b"))
      || out == Seq(Seq(100L, "a", 2L), Seq(200L, "b", 1L)))
  }
}
