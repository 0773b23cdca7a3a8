package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * standard cohesion metric for the reference's social graph
  * (reference: generate_seed_data.py:139–145 materializes follow edges
  * both ways; ROADMAP.md social analytics).
  *
  * Algorithm: degree-based edge orientation. Every undirected edge is
  * directed from its lower to its higher endpoint in the total order
  * (degree, id); each triangle then has exactly one vertex with two
  * out-edges, so counting (wedge ⋈ closing edge) matches each triangle
  * once. The orientation is THE scale lever: out-degree under it is
  * O(√|E|) for any graph (a celebrity vertex with 10⁷ followers has its
  * wedges generated at its low-degree neighbors, not at the hub), so the
  * wedge join's fan-out is bounded where the naive id-ordered join is
  * quadratic in the hub degree. Three equi-join shuffles total, no
  * driver data path.
  */
object Triangles {

  /** Global triangle count; input edges may contain both directions
    * and/or duplicates (they are canonicalized first). Returns one row:
    * (n_triangles). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected edges a < b, self-loops dropped
    val ue = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val deg = ue.select(col("a").as("v")).unionByName(ue.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient by the (degree, id) total order; carry the head's order key
    // for the wedge disambiguation below
    // order keys as uniformly-named structs (struct comparison is
    // lexicographic; CASE branches must agree on field names)
    def ord(d: String, v: String) = struct(col(d).as("deg"), col(v).as("id"))
    val oriented = ue
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(ord("da", "a") < ord("db", "b"), col("a")).otherwise(col("b")).as("u"),
        when(ord("da", "a") < ord("db", "b"), col("b")).otherwise(col("a")).as("v"),
        when(ord("da", "a") < ord("db", "b"), ord("db", "b"))
          .otherwise(ord("da", "a")).as("ov"))
    // wedges at the minimal vertex: two out-edges of u, ordered by the
    // heads' order keys so each unordered out-pair appears once
    val wedges = oriented.select(col("u"), col("v").as("x"), col("ov").as("ox"))
      .join(oriented.select(col("u"), col("v").as("y"), col("ov").as("oy")), Seq("u"))
      .filter(col("ox") < col("oy"))
      .select(col("x"), col("y"))
    // a wedge (x, y) closes iff the oriented edge x→y exists (x precedes
    // y in the order by construction)
    wedges
      .join(oriented.select(col("v").as("y"), col("u").as("x")), Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
