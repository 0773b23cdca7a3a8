package graft

import org.apache.spark.sql.functions._

import graft.ingest.Versioned
import graft.ingest.Versioned._

/** Full conditional MERGE INTO (Versioned.merge): every Delta clause
  * shape — conditional matched update/delete, conditional insert, NOT
  * MATCHED BY SOURCE update/delete — plus first-match-wins ordering,
  * the multiple-match refusal, CoW file sharing, and certification of
  * every version through the merge. */
class VersionedMergeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_merge_$name").toString

  private def base(rows: (Long, String, Long)*) =
    rows.toDF("id", "status", "amount")

  test("matched update / matched-and delete / not-matched insert in one commit") {
    val tbl = tmp("triad") + "/tbl"
    Versioned.overwrite(base((1L, "open", 10L)), tbl)
    Versioned.append(base((2L, "open", 20L), (3L, "closed", 30L)), tbl)
    val src = Seq((1L, "open", 11L), (3L, "closed", 0L), (4L, "new", 40L))
      .toDF("id", "status", "amount")
    Versioned.merge(spark, tbl, src, Seq("id"), Seq(
      // matched + closed → delete; matched otherwise → update from source
      WhenMatchedDelete(Some(col("status") === "closed")),
      WhenMatchedUpdate(Map("amount" -> srcCol("amount"),
        "status" -> srcCol("status"))),
      WhenNotMatchedInsert() // INSERT *
    ))
    assert(rowSet(Versioned.read(spark, tbl)) == Set(
      Seq(1L, "open", 11L), Seq(2L, "open", 20L), Seq(4L, "new", 40L)))
  }

  test("conditional insert filters source rows; unclaimed sources are ignored") {
    val tbl = tmp("condins") + "/tbl"
    Versioned.overwrite(base((1L, "open", 10L)), tbl)
    val src = Seq((2L, "new", 5L), (3L, "new", 50L)).toDF("id", "status", "amount")
    Versioned.merge(spark, tbl, src, Seq("id"), Seq(
      WhenNotMatchedInsert(cond = Some(srcCol("amount") >= 10L))))
    assert(rowSet(Versioned.read(spark, tbl)) == Set(
      Seq(1L, "open", 10L), Seq(3L, "new", 50L)))
  }

  test("NOT MATCHED BY SOURCE: conditional update then delete") {
    val tbl = tmp("bysrc") + "/tbl"
    Versioned.overwrite(
      base((1L, "open", 10L), (2L, "open", 20L), (3L, "stale", 30L)), tbl)
    val src = Seq((1L, "open", 11L)).toDF("id", "status", "amount")
    Versioned.merge(spark, tbl, src, Seq("id"), Seq(
      WhenMatchedUpdate(Map("amount" -> srcCol("amount"))),
      WhenNotMatchedBySourceDelete(Some(col("status") === "stale")),
      WhenNotMatchedBySourceUpdate(Map("status" -> lit("orphan")))))
    assert(rowSet(Versioned.read(spark, tbl)) == Set(
      Seq(1L, "open", 11L), Seq(2L, "orphan", 20L)))
  }

  test("first-match-wins within a population") {
    val tbl = tmp("order") + "/tbl"
    Versioned.overwrite(base((1L, "open", 100L)), tbl)
    val src = Seq((1L, "x", 0L)).toDF("id", "status", "amount")
    // both clauses match; the FIRST (update) must win over the delete
    Versioned.merge(spark, tbl, src, Seq("id"), Seq(
      WhenMatchedUpdate(Map("amount" -> lit(1L))),
      WhenMatchedDelete()))
    assert(rowSet(Versioned.read(spark, tbl)) == Set(Seq(1L, "open", 1L)))
  }

  test("multiple source rows matching one target row are refused") {
    val tbl = tmp("dup") + "/tbl"
    Versioned.overwrite(base((1L, "open", 10L)), tbl)
    val src = Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("id", "status", "amount")
    val e = intercept[IllegalStateException] {
      Versioned.merge(spark, tbl, src, Seq("id"),
        Seq(WhenMatchedUpdate(Map("amount" -> srcCol("amount")))))
    }
    assert(e.getMessage.contains("multiple source rows"))
    // duplicate keys that match NOTHING (insert-only) are fine
    val ins = Seq((7L, "a", 1L), (7L, "b", 2L)).toDF("id", "status", "amount")
    Versioned.merge(spark, tbl, ins, Seq("id"), Seq(WhenNotMatchedInsert()))
    assert(Versioned.read(spark, tbl).count() == 3L)
  }

  test("CoW shares untouched files; pure insert rewrites nothing") {
    val tbl = tmp("cow") + "/tbl"
    Versioned.overwrite(base((1L, "open", 10L)).coalesce(1), tbl)
    Versioned.append(base((2L, "open", 20L)).coalesce(1), tbl)
    val src = Seq((2L, "open", 21L)).toDF("id", "status", "amount")
    val c = Versioned.merge(spark, tbl, src, Seq("id"), Seq(
      WhenMatchedUpdate(Map("amount" -> srcCol("amount")))))
    assert(c.remove.size == 1, "only the file holding id=2 is rewritten")
    val ins = Seq((9L, "new", 90L)).toDF("id", "status", "amount")
    val c2 = Versioned.merge(spark, tbl, ins, Seq("id"),
      Seq(WhenNotMatchedInsert()))
    assert(c2.remove.isEmpty, "pure insert is an append-shaped commit")
  }

  test("every version replays certified through a merge; time travel intact") {
    val tbl = tmp("cert") + "/tbl"
    Versioned.overwrite(base((1L, "open", 10L), (2L, "open", 20L)), tbl)
    val src = Seq((1L, "open", 11L), (3L, "new", 30L))
      .toDF("id", "status", "amount")
    Versioned.merge(spark, tbl, src, Seq("id"), Seq(
      WhenMatchedUpdate(Map("amount" -> srcCol("amount"))),
      WhenNotMatchedInsert()))
    (1L to Versioned.latestVersion(spark, tbl)).foreach { v =>
      val (n, fp) = Versioned.archivedFingerprint(spark, tbl, v)
      val asOf = Versioned.readAsOf(spark, tbl, v)
      val r = asOf.agg(count(lit(1)),
        coalesce(sum(graft.ingest.Fingerprint.rowDigest(
          asOf.schema.fieldNames.toSeq.map(col))), lit(0L))).head()
      assert((r.getLong(0), r.getLong(1)) == ((n, fp)), s"v$v certified")
    }
    assert(Versioned.readAsOf(spark, tbl, 1L).count() == 2L)
  }

  test("mergeMoR: same clause semantics, zero rewrites, unclaimed matches untouched") {
    val tbl = tmp("mor") + "/tbl"
    Versioned.overwrite(
      base((1L, "open", 10L), (2L, "open", 20L), (3L, "closed", 30L)), tbl)
    val src = Seq((1L, "open", 11L), (2L, "skip", 0L), (3L, "closed", 0L),
      (4L, "new", 40L), (5L, "new", 3L)).toDF("id", "status", "amount")
    val c = Versioned.mergeMoR(spark, tbl, src, Seq("id"), Seq(
      WhenMatchedDelete(Some(col("status") === "closed")),
      WhenMatchedUpdate(Map("amount" -> srcCol("amount")),
        Some(srcCol("status") =!= "skip")),
      WhenNotMatchedInsert(cond = Some(srcCol("amount") >= 10L))))
    assert(c.remove.isEmpty, "MoR rewrites nothing")
    assert(c.dv.nonEmpty, "claimed matches are tombstoned")
    // id=1 updated, id=2 matched but UNCLAIMED (skip cond) -> untouched,
    // id=3 deleted, id=4 inserted, id=5 insert cond fails
    assert(rowSet(Versioned.read(spark, tbl)) == Set(
      Seq(1L, "open", 11L), Seq(2L, "open", 20L), Seq(4L, "new", 40L)))
    (1L to 2L).foreach { v =>
      val (n, fp) = Versioned.archivedFingerprint(spark, tbl, v)
      val asOf = Versioned.readAsOf(spark, tbl, v)
      val r = asOf.agg(count(lit(1)),
        coalesce(sum(graft.ingest.Fingerprint.rowDigest(
          asOf.schema.fieldNames.toSeq.map(col))), lit(0L))).head()
      assert((r.getLong(0), r.getLong(1)) == ((n, fp)), s"v$v certified")
    }
  }

  test("mergeMoR refuses BY SOURCE clauses; delete-only claims append nothing") {
    val tbl = tmp("morref") + "/tbl"
    Versioned.overwrite(base((1L, "open", 10L), (2L, "open", 20L)), tbl)
    val src = Seq((1L, "x", 0L)).toDF("id", "status", "amount")
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeMoR(spark, tbl, src, Seq("id"), Seq(
        WhenNotMatchedBySourceDelete()))
    }
    assert(e.getMessage.contains("NOT MATCHED BY SOURCE"))
    val c = Versioned.mergeMoR(spark, tbl, src, Seq("id"),
      Seq(WhenMatchedDelete()))
    assert(c.add.isEmpty && c.dv.nonEmpty)
    assert(rowSet(Versioned.read(spark, tbl)) == Set(Seq(2L, "open", 20L)))
  }

  test("mergeMoR multi-match refusal and distinct-source fast path") {
    val tbl = tmp("mordup") + "/tbl"
    Versioned.overwrite(base((1L, "open", 10L)), tbl)
    val dup = Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("id", "status", "amount")
    val e = intercept[IllegalStateException] {
      Versioned.mergeMoR(spark, tbl, dup, Seq("id"),
        Seq(WhenMatchedUpdate(Map("amount" -> srcCol("amount")))))
    }
    assert(e.getMessage.contains("multiple source rows"))
    // duplicate keys that only INSERT are legal (no matched clause)
    val c = Versioned.mergeMoR(spark, tbl, dup, Seq("id"),
      Seq(WhenNotMatchedInsert()))
    assert(c.dv.isEmpty && Versioned.read(spark, tbl).count() == 1L,
      "id=1 exists, so neither dup row inserts")
  }

  test("INSERT * refuses a source missing target columns") {
    val tbl = tmp("insstar") + "/tbl"
    Versioned.overwrite(base((1L, "open", 10L)), tbl)
    val src = Seq((2L, 20L)).toDF("id", "amount") // no status
    val e = intercept[IllegalArgumentException] {
      Versioned.merge(spark, tbl, src, Seq("id"), Seq(WhenNotMatchedInsert()))
    }
    assert(e.getMessage.contains("INSERT *"))
  }
}
