package graft

import org.scalacheck.Gen
import graft.analytics.Assoc
import graft.text.Search

/** Brute-force oracles for the retrieval ([[graft.text.Search]]) and
  * association ([[graft.analytics.Assoc]]) operators added in round 6.
  * Each property recomputes the expected answer with plain Scala
  * collections over random corpora (fixed ScalaCheck seeds, same
  * rationale as PropertiesSpec) and demands exact equality — every score
  * in these modules is integer arithmetic plus correctly-rounded double
  * ops, so there is no tolerance to hide behind.
  */
class SearchAssocSpec extends SparkTestBase {
  import spark.implicits._

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[ \t\n\r\f]+").toSeq

  // -------------------------------------------------------------- Search

  test("bm25TopDocs == per-doc brute force (rational idf, micro-units)") {
    val word = Gen.oneOf("spark", "join", "scan", "merge", "the", "a")
    val docGen = Gen.chooseNum(1, 9).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    samples(Gen.listOfN(12, docGen), n = 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val terms = Seq("spark", "join")
      val (k1, b) = (1.2, 0.75)
      val tokenized = texts.zipWithIndex.map { case (t, i) => i.toLong -> toks(t) }.toMap
      val n = texts.size.toLong
      val avgdl = tokenized.values.map(_.size).sum.toDouble / n
      val df = terms.map(t => t -> tokenized.values.count(_.contains(t)).toLong).toMap
      val want = tokenized.toSeq.flatMap { case (id, tk) =>
        val scores = terms.flatMap { t =>
          val tf = tk.count(_ == t).toLong
          if (tf == 0 || df(t) == 0) None
          else {
            val tfn = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (tk.size / avgdl)))
            val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
            // floor(x + 0.5) == HALF_UP for positive x — the rule BOTH
            // Spark round() and DuckDB round() apply; math.rint would be
            // HALF_EVEN and diverge on exact .5 ties
            Some(math.floor(tfn * idf * 1e6 + 0.5).toLong)
          }
        }
        if (scores.isEmpty) None else Some((id, scores.size.toLong, scores.sum))
      }.sortBy { case (id, _, s) => (-s, id) }.take(10)
      val got = Search.bm25TopDocs(docs, terms, k = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"got=$got want=$want texts=$texts")
    }
  }

  test("rrfFusion == brute two-leg reciprocal-rank fusion in nano-units") {
    val word = Gen.oneOf("spark", "join", "scan", "merge", "the", "a")
    val docGen = Gen.chooseNum(1, 9).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    samples(Gen.listOfN(14, docGen), n = 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val terms = Seq("spark", "join")
      val (k1, b) = (1.2, 0.75)
      val tokenized = texts.zipWithIndex.map { case (t, i) => i.toLong -> toks(t) }.toMap
      val n = texts.size.toLong
      val avgdl = tokenized.values.map(_.size).sum.toDouble / n
      val df = terms.map(t => t -> tokenized.values.count(_.contains(t)).toLong).toMap
      val bmLeg = tokenized.toSeq.flatMap { case (id, tk) =>
        val scores = terms.flatMap { t =>
          val tf = tk.count(_ == t).toLong
          if (tf == 0 || df(t) == 0) None
          else {
            val tfn = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (tk.size / avgdl)))
            val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
            Some(math.floor(tfn * idf * 1e6 + 0.5).toLong)
          }
        }
        if (scores.isEmpty) None else Some((id, scores.sum))
      }.sortBy { case (id, s) => (-s, id) }.take(10)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val tfLeg = tokenized.toSeq.flatMap { case (id, tk) =>
        val qtf = tk.count(terms.contains).toLong
        if (qtf == 0) None else Some((id, qtf * 1000000L / tk.size))
      }.sortBy { case (id, s) => (-s, id) }.take(10)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val want = (bmLeg.keySet ++ tfLeg.keySet).toSeq.map { id =>
        val rrf = bmLeg.get(id).map(r => 1000000000L / (60L + r)).getOrElse(0L) +
          tfLeg.get(id).map(r => 1000000000L / (60L + r)).getOrElse(0L)
        (id, bmLeg.get(id), tfLeg.get(id), rrf)
      }.sortBy { case (id, _, _, s) => (-s, id) }.take(10)
      val got = Search.rrfFusion(docs, terms, k = 10).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3))).toSeq
      assert(got == want, s"got=$got want=$want texts=$texts")
    }
  }

  test("prfExpansion == brute feedback-tf x idf term ranking") {
    val word = Gen.oneOf("spark", "join", "scan", "merge", "the", "a", "b")
    val docGen = Gen.chooseNum(2, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    samples(Gen.listOfN(12, docGen), n = 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val terms = Seq("spark", "join")
      val (k1, b) = (1.2, 0.75)
      val tokenized = texts.zipWithIndex.map { case (t, i) => i.toLong -> toks(t) }.toMap
      val n = texts.size.toLong
      val avgdl = tokenized.values.map(_.size).sum.toDouble / n
      val qdf = terms.map(t => t -> tokenized.values.count(_.contains(t)).toLong).toMap
      val fbDocs = tokenized.toSeq.flatMap { case (id, tk) =>
        val scores = terms.flatMap { t =>
          val tf = tk.count(_ == t).toLong
          if (tf == 0 || qdf(t) == 0) None
          else {
            val tfn = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (tk.size / avgdl)))
            Some(math.floor(tfn * ((n - qdf(t) + 0.5) / (qdf(t) + 0.5)) * 1e6 + 0.5).toLong)
          }
        }
        if (scores.isEmpty) None else Some((id, scores.sum))
      }.sortBy { case (id, s) => (-s, id) }.take(3).map(_._1).toSet
      val fbTf = fbDocs.toSeq.flatMap(tokenized(_)).filterNot(terms.contains)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = fbTf.toSeq.map { case (term, tf) =>
        val df = tokenized.values.count(_.contains(term)).toLong
        (term, math.floor(tf * ((n - df + 0.5) / (df + 0.5)) * 1e6 + 0.5).toLong)
      }.sortBy { case (t, s) => (-s, t) }.take(5)
      val got = Search.prfExpansion(docs, terms, feedbackDocs = 3, expansionK = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == want, s"got=$got want=$want texts=$texts")
    }
  }

  test("conjunctiveSearch == all-terms membership brute force") {
    val word = Gen.oneOf("spark", "merge", "window", "x", "y")
    val docGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    samples(Gen.listOfN(10, docGen), n = 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val terms = Seq("spark", "merge", "window")
      val want = texts.zipWithIndex.collect {
        case (t, i) if terms.forall(toks(t).contains) => (i.toLong, toks(t).size.toLong)
      }.sortBy(_._1)
      val got = Search.conjunctiveSearch(docs, terms).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want, s"got=$got want=$want texts=$texts")
    }
  }

  test("conjunctiveSearch: duplicated query terms don't change the hit set") {
    val docs = Seq((1L, "spark merge window"), (2L, "spark merge"), (3L, "window spark merge spark"))
      .toDF("doc_id", "text")
    val base = rows(Search.conjunctiveSearch(docs, Seq("spark", "merge", "window")))
    val dup = rows(Search.conjunctiveSearch(docs, Seq("spark", "spark", "merge", "window", "merge")))
    assert(base == dup)
    assert(base.map(_.head) == Seq(1L, 3L))
  }

  test("phraseSearch == brute contiguous-window count on random docs") {
    val word = Gen.oneOf("a", "b", "c")
    val docGen = Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    def brute(ts: Seq[String], p: Seq[String]): Long =
      (0 to ts.size - p.size).count(i => ts.slice(i, i + p.size) == p).toLong
    samples(Gen.listOfN(12, docGen), n = 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      for (phrase <- Seq(Seq("a", "b"), Seq("a", "a"), Seq("b", "a", "c"))) {
        val want = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, brute(toks(t), phrase)) }
          .filter(_._2 > 0).sortBy(_._1)
        val got = Search.phraseSearch(docs, phrase).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got == want, s"phrase=$phrase texts=$texts")
      }
    }
  }

  test("phraseSearch counts overlapping occurrences and repeated-word phrases") {
    // "a a a" contains "a a" at anchors 0 and 1 (overlap) — each anchor
    // is its own (doc, anchor) group, so both count
    val docs = Seq((1L, "a a a"), (2L, "a b a b"), (3L, "b b")).toDF("doc_id", "text")
    assert(rows(Search.phraseSearch(docs, Seq("a", "a"))) == Seq(Seq(1L, 2L)))
    assert(rows(Search.phraseSearch(docs, Seq("a", "b", "a", "b"))) == Seq(Seq(2L, 1L)))
    assert(Search.phraseSearch(docs, Seq("a", "c")).collect().isEmpty)
  }

  test("kwic == brute sliding-context extraction on random corpora") {
    val word = Gen.oneOf("a", "b", "c", "dd")
    val doc = Gen.chooseNum(1, 15).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    for (docs <- samples(corpus, n = 6); w <- Seq(0, 2, 4)) {
      val got = rows(Search.kwic(docs.toDF("doc_id", "text"), "b", width = w))
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").toSeq
        toks.zipWithIndex.collect { case ("b", p) =>
          Seq[Any](id, p.toLong,
            toks.slice(math.max(p - w, 0), p).mkString(" "),
            toks.slice(p + 1, p + 1 + w).mkString(" "))
        }
      }.sortBy(_.mkString("|"))
      assert(got == want, s"w=$w docs=$docs")
    }
  }

  test("kwic contexts clamp at document edges and never cross documents") {
    val docs = Seq((1L, "x q y"), (2L, "q"), (3L, "a b q")).toDF("doc_id", "text")
    val got = rows(Search.kwic(docs, "q", width = 5))
    assert(got == Seq(
      Seq(1L, 1L, "x", "y"),
      Seq(2L, 0L, "", ""),
      Seq(3L, 2L, "a b", "")))
    intercept[IllegalArgumentException](Search.kwic(docs, "", 3))
    intercept[IllegalArgumentException](Search.kwic(docs, "q", -1))
  }

  test("vocabGrowth: bucketed two-pass prefix sum == single-partition form, any width") {
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    samples(Gen.listOfN(11, docGen), n = 3).foreach { texts =>
      // non-contiguous, shuffled doc ids: bucket boundaries must not
      // assume dense ids or sorted input
      val ids = texts.indices.map(i => i.toLong * 7 + 3)
      val docs = scala.util.Random.javaRandomToRandom(new java.util.Random(1))
        .shuffle(ids.zip(texts)).toDF("doc_id", "text")
      val firstSeen = scala.collection.mutable.Map[String, Long]()
      ids.zip(texts).sortBy(_._1).foreach { case (id, t) =>
        toks(t).foreach(tok => if (!firstSeen.contains(tok)) firstSeen(tok) = id)
      }
      var cum = 0L
      val want = ids.sorted.map { id =>
        val nw = firstSeen.count(_._2 == id).toLong
        cum += nw
        (id, nw, cum)
      }
      Seq(1L, 4L, 1000L).foreach { width =>
        val got = Search.vocabGrowth(docs, bucketWidth = width).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got == want, s"width=$width got=$got want=$want")
      }
    }
  }

  // --------------------------------------------------------------- Assoc

  test("liftPairs == brute-force distinct-membership lift") {
    val ev = for {
      g <- Gen.chooseNum(1, 6); i <- Gen.oneOf("p", "q", "r", "s")
    } yield (g.toLong, i)
    samples(Gen.listOfN(30, ev), n = 4).foreach { events =>
      val df = events.toDF("user_id", "event_type")
      val m = events.distinct
      val groups = m.map(_._1).distinct.size.toLong
      val perItem = m.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
      val want = m.groupBy(_._1).values.toSeq
        .flatMap(xs => for { a <- xs.map(_._2); b <- xs.map(_._2) if a < b } yield (a, b))
        .groupBy(identity).map { case ((a, b), xs) =>
          val nab = xs.size.toLong
          (a, b, nab, nab * groups.toDouble / (perItem(a) * perItem(b)))
        }.toSeq.sortBy(t => (t._1, t._2))
      val got = Assoc.liftPairs(df, "user_id", "event_type").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == want, s"got=$got want=$want events=$events")
    }
  }

  test("simpsonDiversity == brute force; extremes hit 0 and (n-1)/n") {
    val ev = for {
      g <- Gen.chooseNum(1, 5); i <- Gen.oneOf("p", "q", "r")
    } yield (g.toLong, i)
    samples(Gen.listOfN(25, ev), n = 4).foreach { events =>
      val df = events.toDF("user_id", "event_type")
      val want = events.groupBy(_._1).toSeq.map { case (g, xs) =>
        val c = xs.groupBy(_._2).map(_._2.size.toLong)
        val tot = c.sum
        (g, tot, c.size.toLong, 1.0 - c.map(x => x * x).sum.toDouble / (tot * tot))
      }.sortBy(_._1)
      val got = Assoc.simpsonDiversity(df, "user_id", "event_type").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == want, s"got=$got want=$want")
    }
    // extremes: single item → 0; n distinct singletons → 1 - 1/n
    val single = Seq((1L, "p"), (1L, "p"), (1L, "p")).toDF("user_id", "event_type")
    assert(Assoc.simpsonDiversity(single, "user_id", "event_type")
      .collect().head.getDouble(3) == 0.0)
    val spread = Seq((1L, "p"), (1L, "q"), (1L, "r")).toDF("user_id", "event_type")
    assert(Assoc.simpsonDiversity(spread, "user_id", "event_type")
      .collect().head.getDouble(3) == 1.0 - 1.0 / 3.0)
  }

  test("transitions == brute-force lead counts; ties broken by tieCol") {
    // deliberate same-timestamp collisions: tieCol must make the order total
    val ev = for {
      g <- Gen.chooseNum(1, 3); s <- Gen.oneOf("a", "b", "c"); t <- Gen.chooseNum(0, 3)
    } yield (g.toLong, s, t.toLong)
    samples(Gen.listOfN(20, ev), n = 4).foreach { raw =>
      val events = raw.zipWithIndex.map { case ((g, s, t), i) => (g, s, t, i.toLong) }
      val df = events.toDF("user_id", "event_type", "ts", "event_id")
      val steps = events.groupBy(_._1).values.toSeq.flatMap { xs =>
        val ordered = xs.sortBy(e => (e._3, e._4)).map(_._2)
        ordered.zip(ordered.drop(1))
      }
      val counts = steps.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val perSrc = steps.groupBy(_._1).map { case (s, v) => s -> v.size.toLong }
      val want = counts.toSeq.map { case ((s, d), n) =>
        (s, d, n, n.toDouble / perSrc(s))
      }.sortBy(t => (t._1, t._2))
      val got = Assoc.transitions(df, "user_id", "event_type", "ts", "event_id").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == want, s"got=$got want=$want events=$events")
    }
  }
}
