package graft

import org.apache.spark.sql.functions._

import graft.ingest.{ChangeFeed, Fingerprint, Versioned}

/** Streaming change-feed consumption: version-window triggers, atomic
  * offset checkpointing, and the exactly-once mirror (idempotent
  * tagged appends keyed by window upper version). */
class ChangeFeedSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cf_$name").toString

  private def df(rows: (Long, String)*) = rows.toDF("id", "t")

  test("run tails only new versions per call; offset advances atomically") {
    val base = tmp("tail")
    val tbl = s"$base/tbl"
    val ckpt = s"$base/ckpt"
    Versioned.overwrite(df(1L -> "a", 2L -> "b"), tbl) // v1
    Versioned.append(df(3L -> "c"), tbl)               // v2
    var seen = Vector.empty[(Long, Long, Long)]
    val t1 = ChangeFeed.run(spark, tbl, ckpt, maxVersionsPerTrigger = 1) {
      (w, from, to) => seen :+= ((from, to, w.count()))
    }
    assert(t1 == 2 && seen == Vector((0L, 1L, 2L), (1L, 2L, 1L)))
    assert(ChangeFeed.lastConsumed(spark, ckpt) == 2L)
    // caught up: no triggers, no process calls
    assert(ChangeFeed.run(spark, tbl, ckpt)((_, _, _) =>
      fail("no new versions — must not fire")) == 0L)
    // new commits resume from the checkpoint, not from zero
    Versioned.upsert(spark, tbl, df(1L -> "A"), Seq("id"))  // v3
    seen = Vector.empty
    val t2 = ChangeFeed.run(spark, tbl, ckpt)((w, from, to) =>
      seen :+= ((from, to, w.count())))
    assert(t2 == 1 && seen.head._1 == 2L && seen.head._2 == 3L)
    // the upsert window carries the delete+insert pair for id=1
    assert(seen.head._3 == 2L)
  }

  test("a failed trigger does not advance the offset; retry re-delivers") {
    val base = tmp("crash")
    val tbl = s"$base/tbl"
    val ckpt = s"$base/ckpt"
    Versioned.overwrite(df(1L -> "a"), tbl)
    intercept[RuntimeException] {
      ChangeFeed.run(spark, tbl, ckpt)((_, _, _) =>
        throw new RuntimeException("sink down"))
    }
    assert(ChangeFeed.lastConsumed(spark, ckpt) == 0L)
    var n = 0L
    ChangeFeed.run(spark, tbl, ckpt)((w, _, _) => n = w.count())
    assert(n == 1L && ChangeFeed.lastConsumed(spark, ckpt) == 1L)
  }

  test("mirrorTo is exactly-once under total re-delivery from a fresh checkpoint") {
    val base = tmp("mirror")
    val tbl = s"$base/tbl"
    val down = s"$base/down"
    Versioned.overwrite(df(1L -> "a", 2L -> "b"), tbl)            // v1
    Versioned.append(df(3L -> "c"), tbl)                          // v2
    Versioned.upsert(spark, tbl, df(2L -> "B"), Seq("id"))        // v3
    Versioned.deleteWhere(spark, tbl, col("id") === 3L)           // v4
    ChangeFeed.mirrorTo(spark, tbl, down, s"$base/ckpt1", "cf",
      maxVersionsPerTrigger = 1)
    val once = rows(Versioned.read(spark, down))
    // expected CDF multiset: v1 inserts a,b; v2 inserts c; v3 pairs
    // delete(2,b)+insert(2,B); v4 deletes (3,c) — 6 change rows
    assert(once.size == 6, once.toString)
    val downCommits = Versioned.latestVersion(spark, down)
    // FRESH checkpoint: the whole feed re-delivers; every window is
    // already tagged downstream -> absorbed, nothing duplicated
    ChangeFeed.mirrorTo(spark, tbl, down, s"$base/ckpt2", "cf",
      maxVersionsPerTrigger = 1)
    assert(rows(Versioned.read(spark, down)) == once)
    assert(Versioned.latestVersion(spark, down) == downCommits)
    // and the mirror itself is certified like any versioned table
    val (n, fp) = Versioned.archivedFingerprint(spark, down, downCommits)
    val r = Versioned.read(spark, down).agg(count(lit(1)),
      sum(Fingerprint.rowDigest(Seq(col("id"), col("t"),
        col("_change_type"), col("_version"))))).head()
    assert((r.getLong(0), r.getLong(1)) == ((n, fp)))
  }

  test("re-delivery with a DIFFERENT trigger width is absorbed (per-version keys)") {
    val base = tmp("rewin")
    val tbl = s"$base/tbl"
    val down = s"$base/down"
    Versioned.overwrite(df(1L -> "a"), tbl)       // v1
    Versioned.append(df(2L -> "b"), tbl)          // v2
    Versioned.append(df(3L -> "c"), tbl)          // v3
    Versioned.append(df(4L -> "d"), tbl)          // v4
    // first run windows (0,2], (2,4]; a window-keyed idempotence would
    // tag batches 2 and 4
    ChangeFeed.mirrorTo(spark, tbl, down, s"$base/ckpt1", "cf",
      maxVersionsPerTrigger = 2)
    val once = rows(Versioned.read(spark, down))
    assert(once.size == 4)
    val downCommits = Versioned.latestVersion(spark, down)
    // fresh checkpoint, width 1: windows (0,1], (1,2], (2,3], (3,4] —
    // upper versions 1 and 3 were never window keys, but the
    // PER-SOURCE-VERSION tags absorb every row regardless of windowing
    ChangeFeed.mirrorTo(spark, tbl, down, s"$base/ckpt2", "cf",
      maxVersionsPerTrigger = 1)
    assert(rows(Versioned.read(spark, down)) == once)
    assert(Versioned.latestVersion(spark, down) == downCommits)
  }

  test("an OPTIMIZE in the feed window mirrors as zero rows, no empty commit") {
    val base = tmp("opt")
    val tbl = s"$base/tbl"
    val down = s"$base/down"
    Versioned.overwrite(df(1L -> "a"), tbl)
    Versioned.append(df(2L -> "b"), tbl)
    Versioned.optimize(spark, tbl, numFiles = 1)
    val downHead = ChangeFeed.mirrorTo(spark, tbl, down, s"$base/ckpt", "cf",
      maxVersionsPerTrigger = 1)
    // v1+v2 mirrored; v3 (optimize) produced an empty window -> skipped
    assert(downHead == 2L)
    assert(ChangeFeed.lastConsumed(spark, s"$base/ckpt") == 3L)
    assert(Versioned.read(spark, down).count() == 2L)
  }

  test("a checkpoint ahead of the table fails loudly") {
    val base = tmp("ahead")
    val tbl = s"$base/tbl"
    Versioned.overwrite(df(1L -> "a"), tbl)
    val other = s"$base/other"
    Versioned.overwrite(df(1L -> "a"), other)
    Versioned.append(df(2L -> "b"), other)
    ChangeFeed.run(spark, other, s"$base/ckpt")((_, _, _) => ())
    val e = intercept[IllegalArgumentException] {
      ChangeFeed.run(spark, tbl, s"$base/ckpt")((_, _, _) => ())
    }
    assert(messages(e).exists(_.contains("ahead of the table")))
  }
}
