package graft

import org.scalacheck.Gen
import graft.analytics.Behavior
import graft.graph.Paths
import graft.operators.{Merge, Sessionize}
import graft.text.Fuzzy

/** Property-based invariants for the round-4 operators, each checked
  * against an independent in-memory brute-force reference over
  * ScalaCheck-generated inputs (fixed seeds — deterministic failures,
  * same convention as [[PropertiesSpec]]).
  */
class Round4PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- upsert

  private val upsertGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      base <- Gen.listOf(for { k <- Gen.choose(1L, 6L); v <- Gen.choose(0L, 99L) } yield (k, v, 0L))
      upd <- Gen.listOf(for {
        k <- Gen.choose(1L, 6L); v <- Gen.choose(0L, 99L); ver <- Gen.choose(1L, 9L)
      } yield (k, v, ver))
    } yield (base.groupBy(_._1).values.map(_.head).toList, upd)

  test("upsert == brute-force latest-wins merge on random change sets") {
    samples(upsertGen).foreach { case (base, upd0) =>
      // make the precedence total within each key: (ver, v) must be unique
      val upd = upd0.groupBy(t => (t._1, t._3, t._2)).values.map(_.head).toList
      val got = Merge.upsert(base.toDF("k", "v", "ver"), upd.toDF("k", "v", "ver"),
          Seq("k"), Seq("ver", "v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val updByKey = upd.groupBy(_._1).view
        .mapValues(_.maxBy(t => (t._3, t._2))).toMap
      val want = (base.filterNot(b => updByKey.contains(b._1)) ++ updByKey.values).toSet
      assert(got == want, s"base=$base upd=$upd")
    }
  }

  // ------------------------------------------------------------- sessionize

  private val eventsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOf(for {
      u <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 50L)
    } yield (u, t)).map(_.distinct.zipWithIndex.map { case ((u, t), i) => (u, i.toLong, t) })

  test("sessionize == brute-force islands under any gap") {
    samples(eventsGen).foreach { evs =>
      for (gap <- Seq(1L, 5L, 20L)) {
        val got = Sessionize.assign(evs.toDF("u", "id", "t"), "u", "t", "id", gap)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("session_no")).toMap
        // brute force: sort per user by (t, id), split when gap exceeded
        val want = evs.groupBy(_._1).flatMap { case (u, es) =>
          val sorted = es.sortBy(e => (e._3, e._2))
          var sess = 0L; var prev = Long.MinValue
          sorted.map { e =>
            if (prev == Long.MinValue || e._3 - prev > gap) sess += 1
            prev = e._3
            (u, e._2) -> sess
          }
        }
        assert(got == want, s"gap=$gap evs=$evs")
      }
    }
  }

  // -------------------------------------------------------------------- bfs

  private val graphGen: Gen[List[(Long, Long)]] =
    Gen.listOf(for { a <- Gen.choose(1L, 10L); b <- Gen.choose(1L, 10L) if a != b } yield (a, b))

  test("bfs == brute-force bounded shortest hops from seed 1") {
    samples(graphGen).foreach { es =>
      val maxHops = 3
      val got = Paths.bfs(es.toDF("s", "d"), "s", "d", Seq(1L).toDF("id"), maxHops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force BFS over the adjacency map
      val adj = es.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var dist = Map(1L -> 0L)
      var frontier = Set(1L)
      for (h <- 1 to maxHops) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        dist = dist ++ frontier.map(_ -> h.toLong)
      }
      assert(got == dist, s"edges=$es")
    }
  }

  // -------------------------------------------------------------- retention

  test("retention == brute force on random activity") {
    samples(eventsGen).foreach { evs =>
      val day = 7L // small "day" length not needed — use raw offsets via µs scale
      val scaled = evs.map { case (u, id, t) => (u, t * 86400000000L / day) }
      val got = Behavior.retention(scaled.toDF("u", "us"), "u", "us", maxOffsetDays = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val days = scaled.map { case (u, us) => (u, us / 86400000000L) }.distinct
      val cohort = days.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val want = days.map { case (u, d) => (cohort(u), d - cohort(u), u) }
        .filter(_._2 <= 2)
        .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).distinct.size.toLong).toMap
      assert(got == want, s"evs=$scaled")
    }
  }

  // ------------------------------------------------------------ edit-dist

  private val wordGen: Gen[List[String]] =
    Gen.listOf(Gen.choose(4, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))).map(_.distinct)

  test("editDistancePairs == brute-force levenshtein over a small alphabet") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    samples(wordGen).foreach { ws =>
      val got = Fuzzy.editDistancePairs(ws.toDF("w"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val want = (for (a <- ws; b <- ws if a < b && lev(a, b) <= 1) yield (a, b)).toSet
      assert(got == want, s"vocab=$ws")
    }
  }

  // ------------------------------------------------- repeated substrings

  // tiny alphabet + short docs → plenty of cross-doc window collisions
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.listOfN(5, Gen.listOfN(12, Gen.oneOf("x", "y")).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("repeatedSpans == brute-force keep-first window excision") {
    val n = 3
    samples(corpusGen).foreach { corpus =>
      // brute force: every (doc, pos) window except the globally-first
      // occurrence of its text is cut; merge overlapping cuts per doc
      val wins = for {
        (id, text) <- corpus
        toks = text.split(" ")
        pos <- 0 to toks.length - n
      } yield (id, pos, toks.slice(pos, pos + n).mkString(" "))
      val first = wins.groupBy(_._3).view.mapValues(_.minBy(w => (w._1, w._2))).toMap
      val cuts = wins.filterNot(w => first(w._3) == w)
        .map(w => (w._1, w._2, w._2 + n))
      val want = cuts.groupBy(_._1).flatMap { case (id, cs) =>
        cs.sortBy(_._2).foldLeft(List.empty[(Long, Int, Int)]) {
          case (acc, (_, s, e)) => acc match {
            case (aid, as, ae) :: rest if s <= ae => (aid, as, math.max(ae, e)) :: rest
            case _ => (id, s, e) :: acc
          }
        }
      }.map { case (id, s, e) => (id, s.toLong, e.toLong, (e - s).toLong) }.toSet
      val got = graft.text.Dedup.repeatedSpans(
          corpus.toDF("doc_id", "text"), n = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"corpus=$corpus")
    }
  }
}
