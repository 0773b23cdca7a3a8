package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
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

  private def samples[A](gen: Gen[A], n: Int = 8): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default.withSize(12), Seed(i.toLong)))

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
