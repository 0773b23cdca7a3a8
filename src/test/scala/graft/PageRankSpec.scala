package graft

import graft.graph.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  test("two-node symmetric pair converges to equal ranks, mass preserved per round") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.ranks(edges, "src", "dst", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // symmetric 2-cycle: each round r' = 0.15 + 0.85 * r, fixpoint 1.0;
    // starting AT scale 1e9 the rank stays exactly 1e9 every round
    assert(got == Map(1L -> PageRank.Scale, 2L -> PageRank.Scale))
  }

  test("a sink-pointing hub: rank flows toward higher in-degree, deterministically") {
    // star: 1,2,3 all point at 4; 4 points at 1
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val ranks = PageRank.ranks(edges, "src", "dst", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranks(4L) > ranks(1L) && ranks(1L) > ranks(2L))
    assert(ranks(2L) == ranks(3L), "symmetric leaves must tie exactly")
    // exact replay of the integer recurrence (the oracle's contract):
    // r'(v) = 150000000 + Σ_{(u,v)} (r(u) * 85) div (100 * outdeg(u))
    var r = Map(1L -> 1000000000L, 2L -> 1000000000L, 3L -> 1000000000L, 4L -> 1000000000L)
    val es = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 1L))
    val outdeg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    for (_ <- 1 to 3) {
      val in = es.groupBy(_._2).map { case (v, e) =>
        v -> e.map { case (u, _) => (r(u) * 85) / (100 * outdeg(u)) }.sum }
      r = r.keys.map(v => v -> (150000000L + in.getOrElse(v, 0L))).toMap
    }
    assert(ranks == r)
  }

  test("a pure sink (no out-edges) still gets a rank row") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = PageRank.ranks(edges, "src", "dst", iterations = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == 150000000L) // nothing points at 1
    assert(got(2L) == 150000000L + 850000000L)
  }
}
