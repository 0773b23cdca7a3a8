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

  test("evolveSchema: new source columns evolve the table, old rows read null") {
    val tbl = tmp("evolve") + "/tbl"
    Versioned.overwrite(
      base((1L, "open", 10L), (2L, "open", 20L), (3L, "open", 30L)), tbl)
    val src = Seq((2L, "open", 21L, "patched"), (4L, "new", 40L, "fresh"))
      .toDF("id", "status", "amount", "note")
    val c = Versioned.merge(spark, tbl, src, Seq("id"), Seq(
      WhenMatchedUpdate(Map("amount" -> srcCol("amount"),
        "note" -> srcCol("note"))),
      WhenNotMatchedInsert()), evolveSchema = true)
    val head = Versioned.read(spark, tbl)
    assert(head.columns.toSeq == Seq("id", "status", "amount", "note"))
    assert(rowSet(head) == Set(
      Seq(1L, "open", 10L, null), Seq(2L, "open", 21L, "patched"),
      Seq(3L, "open", 30L, null), Seq(4L, "new", 40L, "fresh")))
    // pre-evolution version reads under its own (narrower) schema
    assert(Versioned.readAsOf(spark, tbl, 1L).columns.toSeq ==
      Seq("id", "status", "amount"))
    // both versions certified across the epoch boundary
    (1L to 2L).foreach { v =>
      val (n, fp) = Versioned.archivedFingerprint(spark, tbl, v)
      val asOf = Versioned.readAsOf(spark, tbl, v)
      val r = asOf.agg(count(lit(1)),
        coalesce(sum(graft.ingest.Fingerprint.rowDigest(
          asOf.schema.fieldNames.toSeq.map(col))), lit(0L))).head()
      assert((r.getLong(0), r.getLong(1)) == ((n, fp)), s"v$v certified")
    }
    assert(c.colMap.isEmpty, "note's physical name is its logical name")
    // appends keep working against the evolved schema
    Versioned.append(Seq((5L, "x", 50L, "n5"))
      .toDF("id", "status", "amount", "note"), tbl)
    assert(Versioned.read(spark, tbl).count() == 5L)
  }

  test("evolveSchema refuses lossy type changes; off by default") {
    val tbl = tmp("evguard") + "/tbl"
    Versioned.overwrite(base((1L, "open", 10L), (2L, "open", 20L)), tbl)
    // bigint -> double is LOSSY (2^53 cliff) — refused even though it
    // "widens" colloquially; the r12 lattice allows only lossless moves
    val retyped = Seq((1L, "open", 1.5)).toDF("id", "status", "amount")
    val e = intercept[IllegalArgumentException] {
      Versioned.merge(spark, tbl, retyped, Seq("id"),
        Seq(WhenMatchedUpdate(Map("amount" -> srcCol("amount")))),
        evolveSchema = true)
    }
    assert(e.getMessage.contains("lossless widenings"))
    // without the flag, extra source columns are clause inputs only
    val extra = Seq((1L, "open", 11L, "ignored"))
      .toDF("id", "status", "amount", "note")
    Versioned.merge(spark, tbl, extra, Seq("id"),
      Seq(WhenMatchedUpdate(Map("amount" -> srcCol("amount")))))
    assert(Versioned.read(spark, tbl).columns.toSeq ==
      Seq("id", "status", "amount"))
    // in-force DVs no longer refuse evolution (r12): the epoch
    // recompute digests live contributions, so the deleted row stays
    // dead through the boundary with no OPTIMIZE-first rewrite
    Versioned.deleteWhereMoR(spark, tbl, col("id") === 2L)
    Versioned.merge(spark, tbl, extra, Seq("id"),
      Seq(WhenMatchedUpdate(Map("note" -> srcCol("note")))),
      evolveSchema = true)
    assert(rowSet(Versioned.read(spark, tbl)) ==
      Set(Seq[Any](1L, "open", 11L, "ignored")))
  }

  test("change feed across CoW merge, evolve merge and MoR merge") {
    val tbl = tmp("cdf") + "/tbl"
    Versioned.overwrite(
      base((1L, "open", 10L), (2L, "open", 20L), (3L, "closed", 30L))
        .coalesce(1), tbl)
    // v2: CoW merge — update 2, delete 3, insert 4; row 1 untouched
    Versioned.merge(spark, tbl,
      Seq((2L, "open", 21L), (3L, "closed", 0L), (4L, "new", 40L))
        .toDF("id", "status", "amount"),
      Seq("id"), Seq(
        WhenMatchedDelete(Some(col("status") === "closed")),
        WhenMatchedUpdate(Map("amount" -> srcCol("amount"))),
        WhenNotMatchedInsert()))
    val cdf2 = Versioned.changesBetween(spark, tbl, 1L, 2L)
      .select("_change_type", "id", "status", "amount")
    assert(rowSet(cdf2) == Set(
      Seq("insert", 2L, "open", 21L), Seq("insert", 4L, "new", 40L),
      Seq("delete", 2L, "open", 20L), Seq("delete", 3L, "closed", 30L)),
      "a merge diffs add/remove files, never the full snapshot; " +
        "untouched row 1 must cancel")
    // v3: schema-evolving merge — note lands, only row 2 changes
    Versioned.merge(spark, tbl,
      Seq((2L, "open", 21L, "x")).toDF("id", "status", "amount", "note"),
      Seq("id"),
      Seq(WhenMatchedUpdate(Map("note" -> srcCol("note")))),
      evolveSchema = true)
    val cdf3 = Versioned.changesBetween(spark, tbl, 2L, 3L)
      .select("_change_type", "id", "status", "amount", "note")
    assert(rowSet(cdf3) == Set(
      Seq("insert", 2L, "open", 21L, "x"),
      Seq("delete", 2L, "open", 21L, null)),
      "the evolve diff aligns epochs by name; unchanged rows cancel")
    // v4: MoR merge — delete 4 by tombstone
    Versioned.mergeMoR(spark, tbl,
      Seq((4L, "new", 0L, "gone")).toDF("id", "status", "amount", "note"),
      Seq("id"), Seq(WhenMatchedDelete()))
    val cdf4 = Versioned.changesBetween(spark, tbl, 3L, 4L)
      .select("_change_type", "id", "status", "amount", "note")
    assert(rowSet(cdf4) == Set(Seq("delete", 4L, "new", 40L, null)),
      "a MoR merge's deletes surface from its position vector")
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
