package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list, in FIXED-POINT integer
  * arithmetic so the result is bit-reproducible on any engine and any
  * partitioning. The reference's social graph (follow edges,
  * reference: generate_seed_data.py:139–145; social one-hop serving in
  * RecommendationService.cs) motivates an influence score over users;
  * PageRank is the canonical one.
  *
  * Why fixed-point: floating-point PageRank sums per-edge contributions
  * in whatever order the partial aggregation happens to combine them —
  * the result varies run to run in the last ulps, which breaks both the
  * oracle gate and any downstream exact dedup of scores. Scaled-integer
  * ranks (1e9 = rank 1.0) make every sum exact and associative, the same
  * trick as `vector/Similarity.trainCentroids`. Truncating integer
  * division loses < 1e-9 of mass per edge per round — irrelevant to
  * ranking, and identically lost on every engine (`div` and DuckDB `//`
  * agree on non-negative operands).
  *
  * Scale posture: each round is one equi-join (edges ⋈ ranks on src — a
  * shuffle on the edge's src key, or a broadcast when ranks fit) plus one
  * groupBy(dst) aggregation. No driver data path; ranks are
  * localCheckpoint'd per round so the logical plan stays flat no matter
  * the iteration count (the `duplicateClusters` lineage lesson). Skewed
  * in-degree (the celebrity node) lands on AQE's skew-split; out-degree
  * fan-out is per-row work, not a hot key.
  */
object PageRank {

  val Scale: Long = 1000000000L

  /** `iterations` rounds of r' = (1−d)·Scale + d·Σ_in (r_src / outdeg),
    * d = 85/100, over directed `edges` (srcCol → dstCol). Nodes are the
    * distinct edge endpoints; every returned rank is in scaled units
    * (Scale = rank 1.0, the uniform start).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iterations: Int = 3): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // edges annotated with out-degree, materialized once for all rounds
    val ed = e.join(deg, Seq("src")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    // Overflow guard: a node's rank_fp is bounded by the total mass
    // N·Scale, and the per-edge contribution computes rank_fp * 85 in
    // Long — for N ≳ 10^8 a sufficiently concentrated hub could wrap
    // NEGATIVE silently (an oracle engine promoting to 128-bit would
    // not, silently diverging). Fail loudly at the boundary; larger
    // graphs should run with a smaller Scale.
    val n = nodes.count()
    require(n <= Long.MaxValue / 85 / Scale,
      s"PageRank fixed-point: $n nodes can overflow Long at Scale=$Scale; reduce Scale")
    var ranks = nodes.withColumn("rank_fp", lit(Scale))
    for (_ <- 1 to iterations) {
      val contribs = ed
        .join(ranks.select(col("id").as("src"), col("rank_fp")), Seq("src"))
        .select(col("dst").as("id"),
          expr(s"(rank_fp * 85) div (100 * outdeg)").as("c"))
        .groupBy("id").agg(sum(col("c")).as("c_in"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(Scale * 15 / 100) + coalesce(col("c_in"), lit(0L))).as("rank_fp"))
        .localCheckpoint()
    }
    ranks
  }
}
