package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy k-center (farthest-point-first) coreset selection — the
  * diversity-maximizing exemplar picker of data-curation pipelines:
  * iteratively take the vector farthest (squared euclidean) from
  * everything already taken. The selected set is a 2-approximation of
  * the optimal k-center cover (Gonzalez 1985), which is what makes it a
  * principled "cover the embedding space with k exemplars" primitive
  * rather than a heuristic.
  *
  * Determinism: seed = smallest vec_id; each round's pick maximizes
  * (min-distance, then smallest id). Distances use the 3-dot identity
  * ‖a−c‖² = a·a − 2·a·c + c·c with the fused [[graft.functions.VectorDot]]
  * reduction, so every candidate's score is a fixed-order float
  * computation an external engine replays bit-identically (the q28
  * contract); ties cannot diverge because ids break them.
  *
  * 100 TB shape: the min-distance state is INCREMENTAL — each round
  * crosses the corpus with only the ONE new center (n·k dots total, not
  * n·k²) and folds it into the running minimum, localCheckpoint-ing per
  * round to keep lineage flat (the duplicateClusters discipline); the
  * driver sees one k-row result, one row per round. Zero-norm vectors
  * are excluded by the module-wide [[Similarity.prep]] contract.
  */
object Coreset {

  /** Driver-loop bound: greedy k-center (Gonzalez) is k sequential
    * farthest-point picks BY CONSTRUCTION — each pick needs the
    * distance field updated by the previous one — so this runs k
    * driver round-trips, each fetching ONE max_by row, with lineage
    * cut by localCheckpoint. k is the CORESET size (hundreds to low
    * thousands — a sketch of the corpus, chosen for what downstream
    * training can afford), never corpus-proportional; for
    * corpus-scale reduction compose with pre-clustering (q186) or
    * sampling (q136) first.
    *
    * @return (round, vec_id, dist_sq): dist_sq = squared distance to the
    *         previously-selected set at pick time (0 for the seed),
    *         rounded to 6 decimals for presentation. Fewer than k rows
    *         when the corpus runs out of distinct candidates.
    */
  def kCenterGreedy(embeddings: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = embeddings.sparkSession
    import spark.implicits._

    val vv = Similarity.prep(embeddings, idCol, vecCol)
      .withColumn("sq", Similarity.dot("v", "v"))
      .select(col("vec_id"), col("v"), col("sq"))

    val seedRows = vv.orderBy(col("vec_id")).limit(1).collect()
    if (seedRows.isEmpty) return Seq.empty[(Int, Long, Double)]
      .toDF("round", "vec_id", "dist_sq")
    val seed = seedRows.head

    // picked: (round, id, vec, sq, dist_sq at selection)
    var picked = List((0, seed.getLong(0), seed.getSeq[Double](1),
      seed.getDouble(2), 0.0))
    // running min squared distance to the selected set
    var state = distTo(vv, picked.head._2, picked.head._3, picked.head._4)
      .withColumnRenamed("d", "md")
      .localCheckpoint()

    var r = 1
    var exhausted = false
    while (r < k && !exhausted) {
      val ids = picked.map(_._2)
      val pick = state.where(!col("vec_id").isin(ids: _*))
        .agg(max_by(struct(col("vec_id"), col("v"), col("sq"), col("md")),
          struct(col("md"), -col("vec_id"))).as("p"))
        .select(col("p.*")).collect()
      if (pick.isEmpty || pick.head.isNullAt(0)) exhausted = true
      else {
        val row = pick.head
        val (id, vec, sq, md) = (row.getLong(0), row.getSeq[Double](1),
          row.getDouble(2), row.getDouble(3))
        picked ::= ((r, id, vec, sq, md))
        state = distTo(state, id, vec, sq)
          .withColumn("md", least(col("md"), col("d"))).drop("d")
          .localCheckpoint()
        r += 1
      }
    }
    // Spark `round` (not driver math.rint): HALF_UP matches the oracle
    // engine's round() for the non-negative distances here
    picked.reverse.map { case (rd, id, _, _, d) => (rd, id, d) }
      .toDF("round", "vec_id", "dist_sq")
      .withColumn("dist_sq", round(col("dist_sq"), 6))
  }

  /** Column `d` = squared distance of every row's `v` to one center,
    * via the fixed-order 3-dot identity over a broadcast 1-row frame. */
  private def distTo(df: DataFrame, cid: Long, cvec: Seq[Double],
                     csq: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = broadcast(Seq((cid, cvec, csq)).toDF("cid", "cv", "csq"))
    df.crossJoin(c)
      .withColumn("d",
        col("sq") - lit(2.0) * Similarity.dot("v", "cv") + col("csq"))
      .drop("cid", "cv", "csq")
  }
}
