package graft

import graft.graph.Paths
import org.apache.spark.sql.functions._

class PathsSpec extends SparkTestBase {
  import spark.implicits._

  test("bfs assigns exact hop distances on a chain, bounded by maxHops") {
    val chain = (1L to 9L).sliding(2).map(p => (p(0), p(1))).toSeq
    val edges = (chain ++ chain.map(_.swap)).toDF("s", "d")
    val got = Paths.bfs(edges, "s", "d", Seq(1L).toDF("id"), maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfs keeps the SHORTEST distance when multiple paths reach a vertex") {
    // 1→2→3→4 and a shortcut 1→4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("s", "d")
    val got = Paths.bfs(edges, "s", "d", Seq(1L).toDF("id"), maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(4L) == 1L && got(3L) == 2L)
  }

  test("bfs from multiple seeds takes the nearest seed; unreachable stays absent") {
    val edges = Seq((1L, 2L), (5L, 6L), (8L, 9L)).toDF("s", "d")
    val got = Paths.bfs(edges, "s", "d", Seq(1L, 5L).toDF("id"), maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 6L -> 1L))
  }
}
