package graft

import graft.text.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toList.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup groups identical texts and keeps the smallest id") {
    val d = docs((1L, "a b c"), (3L, "a b c"), (2L, "x y z"))
    val out = rows(Dedup.exact(d).select("keep_doc_id", "n_copies"))
    assert(out == Seq(Seq(1L, 2L), Seq(2L, 1L)))
  }

  test("exactKeepBest == brute-force (max quality, ties -> smallest id)") {
    val row = for {
      k <- org.scalacheck.Gen.oneOf("k1", "k2", "k3")
      q <- org.scalacheck.Gen.chooseNum(0L, 3L) // few values => frequent ties
    } yield (k, q)
    samples(org.scalacheck.Gen.listOfN(14, row), n = 4).foreach { xs =>
      val withIds = xs.zipWithIndex.map { case ((k, q), i) => (i.toLong, k, q) }
      val df = withIds.toDF("doc_id", "content_key", "quality")
      val want = withIds.groupBy(_._2).toSeq.map { case (k, g) =>
        val best = g.map(_._3).max
        (k, g.filter(_._3 == best).map(_._1).min, best, g.size.toLong)
      }.sortBy(_._1)
      val got = Dedup.exactKeepBest(df, "content_key", "quality").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
      assert(got == want, s"got=$got want=$want xs=$xs")
    }
  }

  test("ngramJaccard: identical docs score 1.0, disjoint docs are absent") {
    val d = docs(
      (1L, "a b c d e f"), (2L, "a b c d e f"), // identical
      (3L, "p q r s t u")) // disjoint
    val out = rows(Dedup.ngramJaccard(d, n = 3, threshold = 0.4))
    assert(out == Seq(Seq(1L, 2L, 1.0)))
  }

  test("ngramJaccard computes the exact shingle Jaccard") {
    // doc1 shingles: {a b c, b c d}; doc2: {a b c, b c x}
    // intersection 1, union 3 → 1/3
    val d = docs((1L, "a b c d"), (2L, "a b c x"))
    val out = rows(Dedup.ngramJaccard(d, n = 3, threshold = 0.1))
    assert(out == Seq(Seq(1L, 2L, 0.3333)))
  }

  test("containmentPairs: subset-duplicate scores 1.0 toward its container only") {
    // doc1's 2 shingles both appear in doc2 (C(1→2)=1.0) but doc2 has 4
    // shingles, only 2 shared (C(2→1)=0.5 — below threshold): the
    // asymmetric case Jaccard misses (J = 2/4 = 0.5 < 0.9)
    val d = docs(
      (1L, "a b c d"), // shingles {a b c, b c d}
      (2L, "a b c d e f"), // {a b c, b c d, c d e, d e f}
      (3L, "p q r s")) // disjoint
    val out = rows(Dedup.containmentPairs(d, n = 3, threshold = 0.9))
    assert(out == Seq(Seq(1L, 2L, 1.0)))
    assert(rows(Dedup.ngramJaccard(d, n = 3, threshold = 0.9)).isEmpty)
  }

  test("containmentPairs == brute force over random doc sets, both directions") {
    val word = org.scalacheck.Gen.oneOf("a", "b", "c", "d")
    val docGen = org.scalacheck.Gen.chooseNum(3, 9)
      .flatMap(n => org.scalacheck.Gen.listOfN(n, word)).map(_.mkString(" "))
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    samples(org.scalacheck.Gen.listOfN(8, docGen), n = 4).foreach { texts =>
      val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
      val want = (for {
        (ta, ia) <- texts.zipWithIndex; (tb, ib) <- texts.zipWithIndex
        if ia != ib && sh(ta).nonEmpty
        c = sh(ta).intersect(sh(tb)).size.toDouble / sh(ta).size
        if c >= 0.5
      } yield Seq[Any](ia.toLong, ib.toLong,
        BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy(_.mkString("|"))
      val got = rows(Dedup.containmentPairs(d, n = 3, threshold = 0.5))
      assert(got == want, s"texts=$texts")
    }
  }

  test("prefixFilterJaccard == ngramJaccard on random corpora (recall lemma holds)") {
    val word = org.scalacheck.Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = org.scalacheck.Gen.chooseNum(3, 10)
      .flatMap(n => org.scalacheck.Gen.listOfN(n, word)).map(_.mkString(" "))
    samples(org.scalacheck.Gen.listOfN(10, docGen), n = 5).foreach { texts =>
      val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
      for (t <- Seq(0.4, 0.5, 0.8)) {
        val full = rows(Dedup.ngramJaccard(d, n = 3, threshold = t))
        val pref = rows(Dedup.prefixFilterJaccard(d, n = 3, threshold = t))
        assert(pref == full, s"t=$t texts=$texts")
      }
    }
  }

  test("prefixFilterJaccard: integral t·s boundary pair is not lost") {
    // two docs with exactly 5 shingles each sharing exactly 2:
    // J = 2/8 = 0.25; at t = 0.25, t·s = 1.25 → required overlap 2,
    // prefix 4. At the float-hostile t = 0.4 with s = 5 (t·s = 2.0000…04),
    // a naive ceil would shorten the prefix; built so the qualifying
    // pair sits exactly at the minimum overlap ⌈t·s⌉ = 2.
    val d = docs(
      (1L, "a b c d e f g"), // shingles: abc bcd cde def efg (5)
      (2L, "a b c d x y z")) // abc bcd cdx dxy xyz (5), shared {abc, bcd} = 2
    // J = 2/(5+5-2) = 0.25
    val out = rows(Dedup.prefixFilterJaccard(d, n = 3, threshold = 0.25))
    assert(out == Seq(Seq(1L, 2L, 0.25)))
  }

  test("minhashLsh finds the same high-similarity pairs as the exact op") {
    val d = docs(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz"), // near-dup of 1
      (3L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"))
    val exact = rows(Dedup.ngramJaccard(d, threshold = 0.4).select("doc_id_1", "doc_id_2"))
    val lsh = rows(Dedup.minhashLsh(d, threshold = 0.4).select("doc_id_1", "doc_id_2"))
    assert(lsh == exact && lsh == Seq(Seq(1L, 2L)))
  }

  test("simhash: identical texts produce identical fingerprints") {
    val d = docs((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "zz yy xx qq"))
    val fp = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("simhashPairs reports identical docs at hamming 0") {
    val d = docs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "qq ww ee rr tt yy uu ii"))
    val out = rows(Dedup.simhashPairs(d, maxHamming = 3))
    assert(out.contains(Seq(1L, 2L, 0L)))
    assert(!out.exists(r => r(0) == 3L || r(1) == 3L))
  }

  test("duplicateClusters resolves transitive components to the min label") {
    import spark.implicits._
    // components: {1,2,3} via chain 1-2, 2-3; {7,9}; 5-1 joins 5 into the first
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L), (1L, 5L))
      .toDF("doc_id_1", "doc_id_2")
    val out = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false), 5L -> (1L, false),
      7L -> (7L, true), 9L -> (7L, false)))
  }

  test("duplicateClusters handles a long chain (diameter > 2)") {
    import spark.implicits._
    val chain = (1L to 9L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_id_1", "doc_id_2")
    val out = Dedup.duplicateClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 9L).forall(out(_) == 1L))
  }

  test("repeatedSpans cuts every occurrence except the globally first") {
    // docs 1 and 2 share the 3-token run "a b c"; doc 1 is first → doc 2 cut
    val d = docs(
      (1L, "a b c x y z"),
      (2L, "p q a b c r"))
    val out = rows(Dedup.repeatedSpans(d, n = 3))
    assert(out == Seq(Seq(2L, 2L, 5L, 3L)))
  }

  test("repeatedSpans merges overlapping cut windows into maximal spans") {
    // doc 2 repeats doc 1's "a b c d": windows (a b c) and (b c d) both
    // duplicate → cut spans [1,4) and [2,5) merge to [1,5)
    val d = docs(
      (1L, "a b c d"),
      (2L, "z a b c d"))
    val out = rows(Dedup.repeatedSpans(d, n = 3))
    assert(out == Seq(Seq(2L, 1L, 5L, 4L)))
  }

  test("repeatedSpans also cuts repeats WITHIN one document, keeping the first") {
    // "m n o" occurs at pos 0 and pos 3 of the same doc
    val d = docs((7L, "m n o m n o"))
    val out = rows(Dedup.repeatedSpans(d, n = 3))
    assert(out == Seq(Seq(7L, 3L, 6L, 3L)))
  }

  test("exciseRepeats removes exactly the cut spans and keeps clean docs intact") {
    val d = docs(
      (1L, "a b c d"),      // first occurrence — untouched
      (2L, "z a b c d"),    // loses the merged span [1,5)
      (3L, "u v w x"))      // clean
    val out = rows(Dedup.exciseRepeats(d, n = 3))
    assert(out == Seq(
      Seq(1L, 4L, 4L, "a b c d"),
      Seq(2L, 5L, 1L, "z"),
      Seq(3L, 4L, 4L, "u v w x")))
  }

  test("ngramJaccard maxShingleDf drops hot shingles from BOTH intersection and union") {
    // docs 1/2 share a rare 3-gram; every doc shares the hot 3-gram
    // "the same boilerplate". With the hot shingle dropped, doc 3 (only
    // boilerplate) leaves the index entirely and 1-2's Jaccard is
    // computed over their remaining shingles alone.
    val d = Seq(
      (1L, "the same boilerplate alpha beta gamma"),
      (2L, "the same boilerplate alpha beta gamma"),
      (3L, "the same boilerplate")).toDF("doc_id", "text")
    val unfiltered = rows(graft.text.Dedup.ngramJaccard(d, n = 3, threshold = 0.1))
    val filtered = rows(graft.text.Dedup.ngramJaccard(d, n = 3, threshold = 0.1,
      maxShingleDf = Some(2)))
    // unfiltered: doc 3 pairs with 1 and 2 through the boilerplate shingle
    assert(unfiltered.exists(r => r(1) == 3L))
    // filtered: doc 3 is gone; 1-2 remain identical over their own space
    assert(filtered.map(r => (r(0), r(1))) == Seq((1L, 2L)))
    assert(filtered.head(2) == 1.0)
  }

  test("ngramJaccard maxShingleDf: exact Jaccard over the df-filtered shingle space " +
      "(randomized vs brute force)") {
    // The knob's contract (r5): dropping shingles with df > m must behave
    // exactly as if those shingles never existed — removed from BOTH the
    // intersection and the union of every pair, docs left shingle-less
    // leave the index entirely. Replayed brute-force on random corpora
    // over a small vocabulary (so shingles collide across docs often).
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 1 to 3) {
      val corpus = (1L to 12L).map { id =>
        val len = 4 + rnd.nextInt(8)
        (id, Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val n = 3
      val m = 1 + rnd.nextInt(3)
      val threshold = 0.2
      val shingleSets: Map[Long, Set[String]] = corpus.map { case (id, text) =>
        id -> text.split(" ").toSeq.sliding(n).filter(_.size == n)
          .map(_.mkString(" ")).toSet
      }.toMap
      val df = shingleSets.values.flatten.toSeq.groupBy(identity)
        .map { case (s, o) => s -> o.size }
      val kept = shingleSets.map { case (id, ss) => id -> ss.filter(s => df(s) <= m) }
      val expected = (for {
        (i, si) <- kept.toSeq; (j, sj) <- kept.toSeq if i < j
        inter = (si & sj).size if inter > 0
        jac = inter.toDouble / (si.size + sj.size - inter) if jac >= threshold
      } yield Seq[Any](i, j,
        // Spark round() is HALF_UP — replay it exactly
        BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy(_.mkString("|"))
      val got = rows(Dedup.ngramJaccard(corpus.toDF("doc_id", "text"), n, threshold,
        maxShingleDf = Some(m)))
      assert(got == expected,
        s"trial $trial (m=$m): got $got\nexpected $expected\ncorpus $corpus")
    }
  }

  test("U+000B survives the full simhash and shingle pipelines as a token character") {
    // ADVICE r3 regression, end-to-end through the q27/q51 dataflows: a
    // `\s` tokenizer (Java's includes U+000B, RE2's does not) would
    // split "alphabeta" into two tokens and make these two docs
    // identical — both pipelines must see them as DIFFERENT
    val d = Seq((1L, "alphabeta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    // q27's base: fingerprints must differ (same doc under \s-splitting)
    val fps = Dedup.simhash(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) != fps(2L),
      "simhash treated the vertical tab as whitespace — \\s tokenization regressed")
    // q51's base: doc 1's shingles carry the fused token, and the two
    // docs share only the VT-free suffix shingles
    val sh1 = Dedup.shingleIndex(d.filter($"doc_id" === 1), n = 3)
      .collect().map(_.getString(1)).toSet
    assert(sh1.contains("alphabeta gamma delta"),
      s"expected the fused VT token in shingles, got $sh1")
    assert(!sh1.contains("alpha beta gamma"),
      "shingles split the vertical tab — \\s tokenization regressed")
  }

  test("tokens uses the explicit whitespace class: U+000B stays inside a token") {
    // Java \\s+ would split on the vertical tab; RE2 (the DuckDB oracle's
    // engine) would not — the explicit class keeps both engines identical
    import spark.implicits._
    val got = Seq("a\u000Bb c").toDF("text")
      .select(Dedup.tokens(org.apache.spark.sql.functions.col("text")))
      .as[Seq[String]].head()
    assert(got == Seq("a\u000bb", "c"), s"got $got")
  }

  test("shingles of a too-short doc are empty, not an error") {
    val d = docs((1L, "one two"))
    assert(Dedup.ngramJaccard(d, n = 3, threshold = 0.0).collect().isEmpty)
  }

  test("dedup operators leave no session-lifetime cache behind") {
    import org.apache.spark.sql.graftshim.CacheProbe
    spark.catalog.clearCache()
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g zz"),
      (3L, "p q r s t u v w"))
    Dedup.ngramJaccard(d).count()
    Dedup.minhashLsh(d).count()
    Dedup.simhashPairs(d).count()
    Dedup.duplicateClusters(Dedup.ngramJaccard(d)).count()
    assert(CacheProbe.cacheManagerEmpty(spark),
      "an internal cache() survived an operator call — CacheManager pins " +
        "it for the session, so repeated calls would accumulate indexes")
  }

  test("crossMinhashNearDup: batch-vs-corpus pairs only, exact jaccard, no corpus pairs") {
    // corpus has an INTERNAL near-dup pair (1, 2) that must NOT appear;
    // batch doc 10 is a near-dup of corpus doc 1; batch doc 11 matches nothing
    val corpus = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g x"), (3L, "p q r s t u v w"))
    val batch = docs((10L, "a b c d e f g h"), (11L, "zz yy xx ww vv uu tt ss"))
    val got = Dedup.crossMinhashNearDup(corpus, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sortBy(t => (t._1, t._2))
    // exact jaccard vs brute force over cross pairs only
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val want = (for {
      (cid, ct) <- Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g x"), (3L, "p q r s t u v w"))
      (bid, bt) <- Seq((10L, "a b c d e f g h"), (11L, "zz yy xx ww vv uu tt ss"))
      inter = sh(ct).intersect(sh(bt)).size
      jac = inter.toDouble / (sh(ct).size + sh(bt).size - inter)
      if jac >= 0.4
    } yield (cid, bid, math.floor(jac * 10000 + 0.5) / 10000)).sortBy(t => (t._1, t._2))
    assert(got == want, s"got=$got want=$want")
    assert(got.forall { case (c, b, _) => Seq(1L, 2L, 3L).contains(c) && Seq(10L, 11L).contains(b) })
    assert(got.map(t => (t._1, t._2)).contains((1L, 10L)))
  }

  test("softDedupWeights: reciprocal cluster weights, singletons at 1.0, floor division") {
    import spark.implicits._
    val d = Seq((1L, "s0"), (2L, "s0"), (3L, "s0"), (4L, "s1"), (5L, "s1"))
      .toDF("doc_id", "source")
    // explicit cluster graph: {1,2,3} one cluster, {4} via pairs-absent, {5} absent
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id")
    val got = Dedup.softDedupWeights(d, clusters)
      .select("doc_id", "cluster_id", "cluster_size", "weight_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 1L, 3L, 333333L), (2L, 1L, 3L, 333333L), (3L, 1L, 3L, 333333L),
      (4L, 4L, 1L, 1000000L), (5L, 5L, 1L, 1000000L)))
    // cluster mass: each cluster contributes at most one doc's worth
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._4).sum)
    assert(byCluster.values.forall(_ <= 1000000L))
    assert(byCluster(1L) == 999999L) // declared floor undercount < 1 micro
  }

  test("softDedupWeights composes with duplicateClusters end-to-end") {
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "p q r s t u v w"))
    val out = Dedup.softDedupWeights(d,
        Dedup.duplicateClusters(Dedup.ngramJaccard(d)))
      .select("doc_id", "weight_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(out == Seq((1L, 500000L), (2L, 500000L), (3L, 1000000L)))
  }
}
