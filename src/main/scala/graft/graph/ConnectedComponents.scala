package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alternating large-star / small-star connected components — the
  * MapReduce-native CC algorithm of Kiveris et al. (KDD'14, "Connected
  * Components in MapReduce and Beyond"), here as the O(log n)-round
  * companion to [[graft.text.Dedup.duplicateClusters]]'s min-label
  * propagation. Propagation needs rounds proportional to the component
  * DIAMETER — a 10⁶-node duplicate chain (boilerplate that mutates one
  * token per crawl snapshot) needs 10⁶ rounds and never finishes; the
  * star operations contract paths aggressively and the round count is
  * logarithmic in component size regardless of shape. Same contract,
  * same labels (component min), same oracle — q179 gates this plan
  * against the identical recursive-closure SQL as q38 gates propagation,
  * the multi-plan discipline used for the three exact-Jaccard joins.
  *
  * Per round over the canonical edge set E (pairs `lo < hi`, deduped):
  *  - large-star: for each node u with symmetric neighborhood Γ(u),
  *    m = min(Γ(u) ∪ {u}); emit (v, m) for every v ∈ Γ(u) with v > u.
  *  - small-star: for each node u with smaller-neighbors
  *    N(u) = {v ∈ Γ(u) : v < u}, m = min N(u); emit (x, m) for
  *    x ∈ N(u) ∪ {u}, x ≠ m.
  * Both preserve connectivity and monotonically shrink a potential
  * function; the fixed point is a star forest rooted at each component's
  * minimum, read off as `label(v) = min(Γ(v) ∪ {v})`.
  *
  * Scale posture: each round is two groupBy-min aggregations and two
  * narrow (id, id) joins — no adjacency lists materialize, no
  * collect_set to blow a hot node. Every round's edge frame is
  * localCheckpoint'd (the [[graft.text.Dedup.duplicateClusters]] lesson:
  * plan lineage doubles per round and kills the DRIVER before any
  * executor struggles). Convergence is decided on (count, xxhash64
  * bit_xor) of the canonical edge set — two scalars per round, not a
  * frame compare — and non-convergence within `maxIterations` THROWS:
  * wrong labels must never ship silently.
  */
object ConnectedComponents {

  /** Pairs (`doc_id_1`, `doc_id_2`) → (doc_id, cluster_id, is_kept),
    * cluster_id = component minimum — [[graft.text.Dedup
    * .duplicateClusters]]'s exact output contract. */
  def twoPhase(pairs: DataFrame, maxIterations: Int = 30): DataFrame = {
    val canon = pairs.select(
        least(col("doc_id_1"), col("doc_id_2")).as("lo"),
        greatest(col("doc_id_1"), col("doc_id_2")).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
    var edges = canon.localCheckpoint()

    // bit_xor, not sum: xxhash64 spans the full Long range and an ANSI
    // sum overflows; xor is order-independent and closed over Long
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(lo, hi))"), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    def sym(e: DataFrame): DataFrame =
      e.select(col("lo").as("u"), col("hi").as("v"))
        .unionByName(e.select(col("hi").as("u"), col("lo").as("v")))

    var sig = checksum(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      // large-star: m = min(Γ(u) ∪ {u}) ≤ u < v, so (v, m) is already
      // canonical with m as the low end
      val s = sym(edges)
      val mins = s.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = s.join(mins, Seq("u"))
        .where(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("m").as("lo"), col("v").as("hi"))
        .distinct()
      // small-star over the large-star output: m = min N(u) < x
      val smaller = sym(ls).where(col("v") < col("u"))
      val m2 = smaller.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = smaller.join(m2, Seq("u"))
        .select(col("v").as("x"), col("m"))
        .unionByName(m2.select(col("u").as("x"), col("m")))
        .where(col("x") =!= col("m"))
        .select(col("m").as("lo"), col("x").as("hi"))
        .distinct()
        .localCheckpoint()
      val nextSig = checksum(ss)
      converged = nextSig == sig
      sig = nextSig
      edges = ss
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"twoPhase: no fixed point after $maxIterations rounds — refusing " +
        "to emit possibly-wrong component labels")

    sym(edges).groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u").as("doc_id"),
        least(col("u"), col("mn")).as("cluster_id"),
        (col("u") <= col("mn")).as("is_kept"))
  }
}
