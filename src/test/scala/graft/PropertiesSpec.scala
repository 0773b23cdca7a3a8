package graft

import org.scalacheck.Gen
import graft.silver.Pipelines
import graft.recommend.Recommender

/** Property-based invariants (SURVEY §5 item 3):
  *   1. co-occurrence canonical form: every pair satisfies t1 < t2 and the
  *      score equals the number of groups containing both items;
  *   2. anti-join exclusion: no recommended track is ever a liked track;
  *   3. score additivity: pair score over a union of group-disjoint inputs
  *      = sum of the per-input scores.
  *
  * ScalaCheck generators are sampled with fixed seeds (no scalatest
  * bridge in the offline dependency set): deterministic, reproducible
  * failures. Frames stay tiny — the property space, not data scale, is
  * what's explored.
  */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val pairGen: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      g <- Gen.choose(1L, 5L)
      t <- Gen.choose(1L, 8L)
    } yield (g, t))

  test("cooccurrence: canonical t1 < t2, exact counts, complete pair set") {
    samples(pairGen).foreach { ps =>
      val out = Pipelines.cooccurrence(ps.toDF("g", "t"), "g", "t").collect()
      val sets = ps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      out.foreach { r =>
        val (t1, t2, score) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(t1 < t2, s"non-canonical pair ($t1, $t2)")
        val expected = sets.values.count(s => s.contains(t1) && s.contains(t2))
        assert(score == expected, s"pair ($t1,$t2): score $score != $expected")
      }
      val expectedPairs = sets.values.flatMap(s =>
        for (a <- s; b <- s if a < b) yield (a, b)).toSet
      assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == expectedPairs)
    }
  }

  test("crossNearDup: exact precision (subset of brute force), planted recall") {
    import graft.vector.Similarity
    val vecGen: Gen[Seq[Float]] =
      Gen.listOfN(6, Gen.choose(-1.0f, 1.0f)).map(_.toSeq)
    samples(Gen.zip(Gen.listOfN(12, vecGen), Gen.listOfN(3, vecGen)), n = 4)
      .foreach { case (corpusVs, probeVs) =>
        val corpus = corpusVs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        // plant: probe 0 leaks into the corpus near-identically
        val leak = (900L, probeVs.head.zipWithIndex.map {
          case (x, i) => if (i == 0) x + 1e-4f else x })
        val probes = probeVs.zipWithIndex.map { case (v, i) => (100L + i, v) }
        val threshold = 0.9
        val got = rows(Similarity.crossNearDup(
            (corpus :+ leak).toDF("vec_id", "embedding"),
            probes.toDF("vec_id", "embedding"), threshold = threshold)
          .select("corpus_id", "probe_id", "cosine"))
        // brute force over the same prepped frames (shared zero-norm contract)
        def cos(a: Seq[Float], b: Seq[Float]): Double = {
          val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
          val (na, nb) = (math.sqrt(ad.map(x => x * x).sum), math.sqrt(bd.map(x => x * x).sum))
          if (na == 0 || nb == 0) Double.NaN
          else BigDecimal(ad.zip(bd).map { case (x, y) => x * y }.sum / (na * nb))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        val brute = (for {
          (cid, cv) <- corpus :+ leak
          (pid, pv) <- probes
          c = cos(cv, pv) if !c.isNaN && c >= threshold
        } yield Seq[Any](cid, pid)).toSet
        // precision: every emitted pair is a true pair (scores re-checked
        // loosely — Spark sums left-to-right, the test oracle may differ
        // in the last ulp before rounding, so compare to 1e-5)
        got.foreach { r =>
          assert(brute.contains(r.take(2)),
            s"false positive ${r.take(2)} not in brute-force set")
          val expected = cos(corpus.toMap.getOrElse(r.head.asInstanceOf[Long],
            leak._2), probes.toMap.apply(r(1).asInstanceOf[Long]))
          assert(math.abs(r(2).asInstanceOf[Double] - expected) < 1e-5)
        }
        // recall on the planted near-identical pair specifically: cosine
        // ≈ 1 − 10⁻⁸, all-bands-miss probability ~10⁻²⁰ — a miss is a bug
        if (cos(leak._2, probeVs.head) >= threshold)
          assert(got.exists(r => r.take(2) == Seq[Any](900L, 100L)),
            "planted near-identical leak not recalled")
      }
  }

  test("recommend: output is disjoint from the user's likes") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("track_id_1", "track_id_2", "score")
    val noFollows = Seq.empty[(Long, Long)].toDF("user_id_a", "user_id_b")
    samples(Gen.zip(pairGen, pairGen), n = 6).foreach { case (likesRaw, trendRaw) =>
      val likes = likesRaw.map { case (u, t) => (u % 3, t) }.toDF("user_id", "track_id")
      val trending = trendRaw.groupBy(_._1).view.mapValues(_.map(_._2).sum + 1)
        .toList.toDF("track_id", "play_count")
      val sim = likesRaw.map { case (a, b) => (math.min(a, b), math.max(a, b) + 1, 2L) }
        .distinct.toDF("track_id_1", "track_id_2", "score")
      val out = Recommender.recommend(sim, empty, trending, noFollows, likes,
        userId = 1L, k = 10).collect().map(_.getLong(0)).toSet
      val liked = likesRaw.collect { case (u, t) if u % 3 == 1L => t }.toSet
      assert(out.intersect(liked).isEmpty,
        s"recommended already-liked tracks: ${out.intersect(liked)}")
    }
  }

  test("cooccurrenceProbed equals the full operator restricted to probe-touching pairs") {
    samples(Gen.zip(pairGen, Gen.nonEmptyListOf(Gen.choose(1L, 8L))), n = 8)
      .foreach { case (ps, probeRaw) =>
        val probe = probeRaw.map(Tuple1(_)).toDF("track_id")
        val full = Pipelines.cooccurrence(ps.toDF("g", "t"), "g", "t").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
          .filter { case ((a, b), _) => probeRaw.contains(a) || probeRaw.contains(b) }
        val probed = Pipelines.cooccurrenceProbed(ps.toDF("g", "t"), "g", "t", probe)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(probed == full, s"probe=$probeRaw input=$ps")
      }
  }

  test("cooccurrenceProbedSym equals symmetrize∘cooccurrenceProbed anchored on the probe") {
    samples(Gen.zip(pairGen, Gen.nonEmptyListOf(Gen.choose(1L, 8L))), n = 8)
      .foreach { case (ps, probeRaw) =>
        val probe = probeRaw.map(Tuple1(_)).toDF("track_id")
        val viaSym = Pipelines.symmetrize(
            Pipelines.cooccurrenceProbed(ps.toDF("g", "t"), "g", "t", probe))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
          .filter { case ((a, _), _) => probeRaw.contains(a) }
        val direct = Pipelines.cooccurrenceProbedSym(ps.toDF("g", "t"), "g", "t", probe)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(direct == viaSym, s"probe=$probeRaw input=$ps")
      }
  }

  test("cooccurrence: additivity over group-disjoint unions") {
    samples(pairGen, n = 6).foreach { ps =>
      val left = ps
      val right = ps.map { case (g, t) => (g + 100, (t * 7) % 8 + 1) }
      def scores(xs: List[(Long, Long)]): Map[(Long, Long), Long] =
        Pipelines.cooccurrence(xs.toDF("g", "t"), "g", "t").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val both = scores(left ++ right)
      val (sl, sr) = (scores(left), scores(right))
      val merged = (sl.keySet ++ sr.keySet).map(k =>
        k -> (sl.getOrElse(k, 0L) + sr.getOrElse(k, 0L))).toMap
      assert(both == merged)
    }
  }
}
