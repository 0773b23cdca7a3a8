package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("within matches the brute-force theta join on random inputs, negatives included") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.zip(Gen.listOf(Gen.choose(-50L, 50L)), Gen.listOf(Gen.choose(-50L, 50L)))
    (1 to 8).flatMap(i => gen.apply(Gen.Parameters.default.withSize(20), Seed(i.toLong)))
      .foreach { case (ls, rs) =>
        val tol = 7L
        val left = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
        val right = rs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
        val expected = (for {
          (lv, li) <- ls.zipWithIndex; (rv, ri) <- rs.zipWithIndex
          if math.abs(lv - rv) <= tol
        } yield (li.toLong, ri.toLong)).toSet
        val got = RangeJoin.within(left, right, "lv", "rv", tol)
          .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length == got.toSet.size, s"duplicate pairs: ls=$ls rs=$rs")
        assert(got.toSet == expected, s"ls=$ls rs=$rs")
      }
  }

  test("bucket keys stay exact beyond double precision (values past 2^53)") {
    // with a DOUBLE bucket key, values around 2^60 collapse to the same
    // rounded bucket or shift by one — the join silently drops/adds pairs
    val base = 1L << 60
    val left = Seq((1L, base), (2L, base + 100L)).toDF("lid", "lv")
    val right = Seq((10L, base + 3L), (20L, base + 97L), (30L, base + 50L))
      .toDF("rid", "rv")
    val got = RangeJoin.within(left, right, "lv", "rv", 5L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  test("boundary values exactly at the tolerance are included") {
    val left = Seq((1L, 0L)).toDF("lid", "lv")
    val right = Seq((1L, 7L), (2L, 8L), (3L, -7L), (4L, -8L)).toDF("rid", "rv")
    val got = RangeJoin.within(left, right, "lv", "rv", 7L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("domain extremes and huge tolerances: no wrapped pair survives (ADVICE r3)") {
    // the ±1 neighbor bucket of Long.MaxValue wraps to Long.MinValue's
    // bucket, and MaxValue − MinValue wraps to −1 — a plain `abs(l − r)`
    // filter reports the two extremes as "within 1". Brute-force expected
    // pairs are computed in BigInt so the TEST cannot overflow either.
    val vals = Seq(Long.MinValue, Long.MinValue + 1, Long.MinValue + 7,
      -3L, 0L, 5L, Long.MaxValue - 6, Long.MaxValue - 1, Long.MaxValue)
    val left = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
    val right = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
    for (tol <- Seq(1L, 7L, 1L << 40, Long.MaxValue - 1)) {
      val expected = (for {
        (lv, li) <- vals.zipWithIndex; (rv, ri) <- vals.zipWithIndex
        if (BigInt(lv) - BigInt(rv)).abs <= BigInt(tol)
      } yield (li.toLong, ri.toLong)).toSet
      val got = RangeJoin.within(left, right, "lv", "rv", tol)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"tol=$tol: spurious=${got -- expected} missing=${expected -- got}")
    }
  }

  test("a bucket-adjacent pair whose difference is exactly -2^63 is dropped, not an error") {
    // buckets -1 and 0 are adjacent so the equi-join matches, and the
    // difference -2^62 - 2^62 = Long.MinValue IS representable — but
    // abs(Long.MinValue) overflows (ANSI error / negative value that
    // passes an abs <= tol filter). The BETWEEN filter must simply drop
    // the pair: its true distance 2^63 exceeds any long tolerance.
    val left = Seq((1L, -(1L << 62))).toDF("lid", "lv")
    val right = Seq((1L, 1L << 62)).toDF("rid", "rv")
    assert(RangeJoin.within(left, right, "lv", "rv", (1L << 62) + 1).count() == 0L)
  }

  test("intervalOverlap matches the brute-force theta join, exactly once per pair") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // keys 0/1, starts spanning negatives, lengths 0..30 over chunk=10:
    // pairs meet in up to 4 shared chunks — duplicates would show
    val iv = Gen.zip(Gen.choose(0L, 1L), Gen.choose(-40L, 40L), Gen.choose(0L, 30L))
    val gen = Gen.zip(Gen.listOfN(12, iv), Gen.listOfN(12, iv))
    (1 to 8).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { case (ls, rs) =>
        val left = ls.zipWithIndex.map { case ((k, s, len), i) =>
          (k, i.toLong, s, s + len) }.toDF("k", "lid", "ls", "le")
        val right = rs.zipWithIndex.map { case ((k, s, len), i) =>
          (k, i.toLong, s, s + len) }.toDF("k", "rid", "rs", "re")
        val expected = (for {
          ((lk, lsv, ll), li) <- ls.zipWithIndex
          ((rk, rsv, rl), ri) <- rs.zipWithIndex
          if lk == rk && lsv <= rsv + rl && rsv <= lsv + ll
        } yield (li.toLong, ri.toLong)).toSet
        val got = RangeJoin.intervalOverlap(left, right, Seq("k"),
            "ls", "le", "rs", "re", chunk = 10L)
          .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length == got.toSet.size, s"duplicate pairs: ls=$ls rs=$rs")
        assert(got.toSet == expected, s"ls=$ls rs=$rs")
      }
  }

  test("intervalOverlap: touching endpoints overlap (closed intervals); disjoint keys never pair") {
    val left = Seq((1L, 1L, 0L, 10L), (2L, 2L, 0L, 10L)).toDF("k", "lid", "ls", "le")
    val right = Seq((1L, 10L, 10L, 20L), (1L, 20L, 11L, 20L), (2L, 30L, 5L, 6L))
      .toDF("k", "rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, Seq("k"),
        "ls", "le", "rs", "re", chunk = 100L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // le=10 touches rs=10 → pair; rs=11 > le=10 → no; key 2 pairs only with key 2
    assert(got == Set((1L, 10L), (2L, 30L)))
  }

  test("withinAll matches the brute-force multi-dim theta join, negatives included") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val row = Gen.zip(Gen.choose(-30L, 30L), Gen.choose(-30L, 30L), Gen.choose(-30L, 30L))
    val gen = Gen.zip(Gen.listOf(row), Gen.listOf(row))
    (1 to 6).flatMap(i => gen.apply(Gen.Parameters.default.withSize(15), Seed(i.toLong)))
      .foreach { case (ls, rs) =>
        val tol = 7L
        val expected = (for {
          (l, li) <- ls.zipWithIndex
          (r, ri) <- rs.zipWithIndex
          if math.abs(l._1 - r._1) <= tol && math.abs(l._2 - r._2) <= tol &&
            math.abs(l._3 - r._3) <= tol
        } yield (li.toLong, ri.toLong)).toSet
        val left = ls.zipWithIndex.map { case ((x, y, z), i) => (i.toLong, x, y, z) }
          .toDF("lid", "lx", "ly", "lz")
        val right = rs.zipWithIndex.map { case ((x, y, z), i) => (i.toLong, x, y, z) }
          .toDF("rid", "rx", "ry", "rz")
        val got = RangeJoin.withinAll(left, right,
            Seq("lx", "ly", "lz"), Seq("rx", "ry", "rz"), tol)
          .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length == got.toSet.size, s"duplicate pairs: ls=$ls rs=$rs")
        assert(got.toSet == expected, s"ls=$ls rs=$rs")
      }
  }

  test("withinAll single dimension degenerates to within") {
    val left = Seq((1L, 0L)).toDF("lid", "lv")
    val right = Seq((1L, 7L), (2L, 8L), (3L, -7L), (4L, -8L)).toDF("rid", "rv")
    val got = RangeJoin.withinAll(left, right, Seq("lv"), Seq("rv"), 7L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("withinAll domain extremes: no wrapped pair survives any dimension") {
    val left = Seq((1L, Long.MaxValue, 0L)).toDF("lid", "lx", "ly")
    val right = Seq((1L, Long.MinValue, 0L), (2L, Long.MaxValue - 3L, 2L))
      .toDF("rid", "rx", "ry")
    val got = RangeJoin.withinAll(left, right,
        Seq("lx", "ly"), Seq("rx", "ry"), 5L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L))
  }

  test("intervalOverlap fails loudly on inverted intervals and over-cap spans") {
    val ok = Seq((1L, 1L, 0L, 5L)).toDF("k", "lid", "ls", "le")
    val inverted = Seq((1L, 9L, 10L, 0L)).toDF("k", "rid", "rs", "re")
    val e1 = intercept[Exception] {
      RangeJoin.intervalOverlap(ok, inverted, Seq("k"),
        "ls", "le", "rs", "re", chunk = 10L).count()
    }
    assert(e1.getMessage.contains("start > end"))
    val endless = Seq((1L, 9L, 0L, 1000000L)).toDF("k", "rid", "rs", "re")
    val e2 = intercept[Exception] {
      RangeJoin.intervalOverlap(ok, endless, Seq("k"),
        "ls", "le", "rs", "re", chunk = 10L, maxChunksPerRow = 64).count()
    }
    assert(e2.getMessage.contains("covers more than"))
  }
}
