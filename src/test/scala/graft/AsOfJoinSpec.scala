package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("backward attaches the latest version at or before each probe") {
    val probes = Seq((1L, 3L, "a"), (1L, 5L, "b"), (1L, 7L, "c"),
      (1L, -1L, "d"), (2L, 10L, "e"))
      .toDF("k", "t", "tag")
    val vers = Seq((1L, 0L, 10L), (1L, 5L, 20L), (2L, 9L, 30L))
      .toDF("k", "vt", "v")
    val out = rows(AsOfJoin.backward(probes, vers, "k", "t", "vt")
      .select("tag", "v").orderBy("tag"))
    // a: latest ≤3 is t=0 → 10; b: version AT 5 visible (inclusive) → 20;
    // c: → 20; d: nothing precedes → null; e: key-2 sees only key-2 → 30
    assert(out == Seq(Seq("a", 10L), Seq("b", 20L), Seq("c", 20L),
      Seq("d", null), Seq("e", 30L)))
  }

  test("backward keeps every probe row exactly once and all left columns") {
    val probes = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k", "t", "tag")
    val vers = Seq((9L, 0L, 5L)).toDF("k", "vt", "v") // no overlapping key
    val out = AsOfJoin.backward(probes, vers, "k", "t", "vt")
    assert(out.columns.toSeq == Seq("k", "t", "tag", "v"))
    assert(out.count() == 2 && out.filter($"v".isNull).count() == 2)
  }
}
