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

  test("backward matches a reference in-memory as-of computation on random inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      probes <- Gen.listOf(Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L)))
      vers <- Gen.listOf(Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L)))
    } yield (probes, vers)
    (1 to 8).flatMap(i => gen.apply(Gen.Parameters.default.withSize(15), Seed(i.toLong)))
      .foreach { case (probesRaw, versRaw) =>
        val probes = probesRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        // right must be unique per (key, time): keep max payload per slot
        val vers = versRaw.groupBy(identity).keys.toList
          .map { case (k, t) => (k, t, k * 100 + t) }
        val expected = probes.map { case (k, t, i) =>
          val best = vers.filter(v => v._1 == k && v._2 <= t)
            .sortBy(_._2).lastOption.map(_._3)
          i -> best
        }.toMap
        val got = AsOfJoin.backward(
            probes.toDF("k", "t", "pid"), vers.toDF("k", "vt", "v"),
            "k", "t", "vt")
          .select("pid", "v").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        assert(got == expected, s"probes=$probes vers=$vers")
      }
  }

  test("NULL keys and times never match, per SQL ASOF semantics") {
    val probes = Seq(
      (Some(1L), Some(5L), "ok"),      // normal probe
      (None, Some(5L), "nullkey"),     // null key → no version can match
      (Some(1L), None, "nulltime"))    // null probe time → no version precedes
      .toDF("k", "t", "tag")
    val vers = Seq(
      (Some(1L), Some(0L), 10L),       // normal version
      (None, Some(0L), 66L),           // null-key version must seed nothing
      (Some(1L), None, 77L))           // null-time version must seed nothing
      .toDF("k", "vt", "v")
    val got = rows(AsOfJoin.backward(probes, vers, "k", "t", "vt")
      .select("tag", "v").orderBy("tag"))
    assert(got == Seq(Seq("nullkey", null), Seq("nulltime", null), Seq("ok", 10L)),
      s"got $got")
  }

  test("backward keeps every probe row exactly once and all left columns") {
    val probes = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k", "t", "tag")
    val vers = Seq((9L, 0L, 5L)).toDF("k", "vt", "v") // no overlapping key
    val out = AsOfJoin.backward(probes, vers, "k", "t", "vt")
    assert(out.columns.toSeq == Seq("k", "t", "tag", "v"))
    assert(out.count() == 2 && out.filter($"v".isNull).count() == 2)
  }
  test("reserved internal column names are rejected up front") {
    val probes = Seq((1L, 1L, 0L)).toDF("k", "t", "__t")
    val vers = Seq((1L, 0L, 5L)).toDF("k", "vt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(probes, vers, "k", "t", "vt")
    }
    assert(e.getMessage.contains("__t"))
    val vers2 = Seq((1L, 0L, 5L)).toDF("k", "vt", "__m")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(probes.select($"k", $"t"), vers2, "k", "t", "vt")
    }
    assert(e2.getMessage.contains("__m"))
  }
}
