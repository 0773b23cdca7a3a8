package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop breadth-first search over an edge list: exact hop
  * distances from a seed set, up to `maxHops` — the k-hop generalization
  * of the reference's 1-hop social expansion
  * (reference: RecommendationService.cs social candidates; SURVEY §2.3
  * J8 `follows` join).
  *
  * Each round joins ONLY the newest frontier (vertices first reached in
  * the previous round) against the edge list, then anti-joins the
  * already-visited set — per-round work tracks the frontier size, not
  * the visited set, which is what keeps round k from re-expanding rounds
  * 1..k−1 at scale. Distances are exact small integers (no floats
  * anywhere), and each round's result is localCheckpoint'd so the plan
  * stays flat for any hop count (the duplicateClusters lineage lesson).
  */
object Paths {

  /** (id, dist) for every vertex within `maxHops` of `seeds` (a
    * one-column frame of vertex ids); seeds are at dist 0. Ties resolve
    * to the smaller distance by construction (a vertex joins the visited
    * set the first round it is reached). */
  def bfs(edges: DataFrame, srcCol: String, dstCol: String,
          seeds: DataFrame, maxHops: Int = 3): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    var visited = seeds.select(col(seeds.columns.head).as("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = visited
    var hop = 1L
    while (hop <= maxHops) {
      val reached = e.join(frontier.select(col("id").as("src")), Seq("src"))
        .select(col("dst").as("id")).distinct()
      frontier = reached.join(visited, Seq("id"), "left_anti")
        .withColumn("dist", lit(hop)).localCheckpoint()
      visited = visited.unionByName(frontier).localCheckpoint()
      hop += 1
    }
    visited
  }
}
