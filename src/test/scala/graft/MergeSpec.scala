package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert: updates beat base, latest update wins, untouched keys survive") {
    val base = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)).toDF("k", "v", "ver")
    val upd = Seq((1L, "a2", 5L), (1L, "a3", 9L), (2L, "b2", 1L)).toDF("k", "v", "ver")
    val got = Merge.upsert(base, upd, Seq("k"), Seq("ver"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a3", 9L), (2L, "b2", 1L), (3L, "c", 0L)))
  }

  test("upsert: an update with version 0 still beats the base row") {
    val base = Seq((1L, "old", 0L)).toDF("k", "v", "ver")
    val upd = Seq((1L, "new", 0L)).toDF("k", "v", "ver")
    val got = Merge.upsert(base, upd, Seq("k"), Seq("ver")).collect()
    assert(got.length == 1 && got(0).getString(1) == "new")
  }

  test("upsert: keys only in updates are inserted") {
    val base = Seq((1L, "a", 0L)).toDF("k", "v", "ver")
    val upd = Seq((9L, "z", 1L)).toDF("k", "v", "ver")
    val got = Merge.upsert(base, upd, Seq("k"), Seq("ver"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (9L, "z")))
  }

  test("upsert rejects mismatched schemas") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val upd = Seq((1L, 2L)).toDF("k", "n")
    intercept[IllegalArgumentException] {
      Merge.upsert(base, upd, Seq("k"), Seq("n"))
    }
  }

  test("scd2: runs collapse, intervals chain, last is open and current") {
    val log = Seq(
      (1L, 10L, 100L, "A"), (1L, 20L, 101L, "A"), // same run
      (1L, 30L, 102L, "B"),
      (1L, 40L, 103L, "A") // back to A — a NEW run, not merged with the first
    ).toDF("k", "ts", "tie", "status")
    val got = Merge.scd2(log, Seq("k"), "ts", "tie", Seq("status"))
      .orderBy("valid_from")
      .collect()
      .map(r => (r.getAs[String]("status"), r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")), r.getAs[Boolean]("is_current")))
    assert(got.toSeq == Seq(
      ("A", 10L, Some(30L), false),
      ("B", 30L, Some(40L), false),
      ("A", 40L, None, true)))
  }

  test("scd2: ties on the timestamp resolve by the tie column") {
    val log = Seq((1L, 10L, 1L, "A"), (1L, 10L, 2L, "B")).toDF("k", "ts", "tie", "status")
    val got = Merge.scd2(log, Seq("k"), "ts", "tie", Seq("status"))
      .collect().map(r => (r.getAs[String]("status"), r.getAs[Boolean]("is_current"))).toSet
    // tie=1 (A) precedes tie=2 (B): B is the current row
    assert(got == Set(("A", false), ("B", true)))
  }

  test("scd2: null attribute values are values, not wildcards") {
    val log = Seq((1L, 10L, 1L, Some("A")), (1L, 20L, 2L, None), (1L, 30L, 3L, None))
      .toDF("k", "ts", "tie", "status")
    val got = Merge.scd2(log, Seq("k"), "ts", "tie", Seq("status"))
      .collect().map(r => (Option(r.getAs[String]("status")), r.getAs[Long]("valid_from")))
    // A→null is a change; null→null is NOT (the two nulls share one run)
    assert(got.toSet == Set((Some("A"), 10L), (None, 20L)))
  }

  private def cdcBase = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

  test("applyChanges: update replaces, delete removes, insert appears, rest survive") {
    val ch = Seq((1L, "a2", "U", 1L), (2L, "b", "D", 1L), (9L, "z", "I", 1L))
      .toDF("k", "v", "op", "seq")
    val got = Merge.applyChanges(cdcBase, ch, Seq("k"), "op", Seq("seq"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a2"), (3L, "c"), (9L, "z")))
  }

  test("applyChanges: only the latest change per key matters (delete then reinsert)") {
    val ch = Seq(
      (1L, "x", "D", 1L), (1L, "back", "I", 2L), // delete then reinsert → present
      (2L, "b2", "U", 1L), (2L, "gone", "D", 2L) // update then delete → absent
    ).toDF("k", "v", "op", "seq")
    val got = Merge.applyChanges(cdcBase, ch, Seq("k"), "op", Seq("seq"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "back"), (3L, "c")))
  }

  test("applyChanges: delete of an absent key is a no-op; output keeps base schema") {
    val ch = Seq((42L, "ghost", "D", 1L)).toDF("k", "v", "op", "seq")
    val out = Merge.applyChanges(cdcBase, ch, Seq("k"), "op", Seq("seq"))
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.count() == 3)
  }

  test("applyChanges rejects changes missing a base column or the op column") {
    val noV = Seq((1L, "U", 1L)).toDF("k", "op", "seq")
    intercept[IllegalArgumentException] {
      Merge.applyChanges(cdcBase, noV, Seq("k"), "op", Seq("seq"))
    }
    val noOp = Seq((1L, "a", 1L)).toDF("k", "v", "seq")
    intercept[IllegalArgumentException] {
      Merge.applyChanges(cdcBase, noOp, Seq("k"), "op", Seq("seq"))
    }
  }

  test("applyChanges rejects change-only columns that are not precedence columns") {
    val stray = Seq((1L, "a", "U", 1L, "x")).toDF("k", "v", "op", "seq", "stray")
    intercept[IllegalArgumentException] {
      Merge.applyChanges(cdcBase, stray, Seq("k"), "op", Seq("seq"))
    }
  }
}
