package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the retrieval-diversification sibling of [[Coreset]]: from a
  * candidate pool scored against a query, greedily take the item
  * maximizing
  *
  *   mmr = λ·rel(item, query) − (1 − λ)·(1 + maxSim(item, selected))
  *
  * — the classic λ·rel − (1−λ)·maxSim plus a constant −(1−λ) shift,
  * which cannot move any argmax (the penalty term just starts at 0 via
  * the ms = −1 sentinel instead of at −(1−λ)); the first pick, with no
  * selected set, maximizes rel alone. High relevance, low redundancy —
  * the search-result and RAG-context diversifier.
  *
  * Determinism contract = [[Coreset]]'s: cosines through the fused
  * sequential-dot [[graft.functions.VectorDot]] (bit-replayable, the
  * q28 precedent), fixed-order float combination, ties by smallest id.
  *
  * 100 TB shape: the candidate pool is top-N of an ANN stage (q28/q35),
  * so n is serving-sized; the running max-similarity state is
  * INCREMENTAL (one new-center cross per round, n·k dots total) with
  * per-round localCheckpoint, one driver row per round.
  */
object Mmr {

  /** Driver-loop bound: greedy MMR is k sequential argmax picks BY
    * CONSTRUCTION (each pick re-scores against the newly selected
    * item), so this runs k driver round-trips, each a single max_by
    * row, with lineage cut by localCheckpoint. k here is a SERVING
    * parameter — the size of one result page (tens) — not a corpus
    * knob; re-ranking a million-candidate pool is fine, asking for a
    * million picks is the wrong operator (use [[Coreset]] sampling or
    * a plain top-k instead).
    *
    * @param lambdaMicro λ in integer micro-units (500000 = 0.5) — the
    *                    relevance/diversity trade-off, kept integral so
    *                    the oracle replays the exact same literal.
    * @return (round, vec_id, mmr_score) for k greedy picks, mmr rounded
    *         to 6 decimals for presentation (selection uses unrounded).
    */
  def rerank(candidates: DataFrame, queryVec: Seq[Double], k: Int,
             lambdaMicro: Int = 500000,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaMicro >= 0 && lambdaMicro <= 1000000,
      s"lambdaMicro out of [0, 1000000]: $lambdaMicro")
    require(queryVec.nonEmpty, "query vector must be non-empty")
    val spark = candidates.sparkSession
    import spark.implicits._
    val lam = lambdaMicro / 1000000.0

    val qn = math.sqrt(queryVec.foldLeft(0.0)((s, x) => s + x * x))
    require(qn > 0, "query vector must have non-zero norm")
    val q = broadcast(Seq((queryVec, qn)).toDF("qv", "qn"))

    // rel = cosine(candidate, query), row-local
    val base = Similarity.prep(candidates, idCol, vecCol)
      .crossJoin(q)
      .withColumn("rel",
        graft.functions.vector_dot(col("v"), col("qv")) / (col("norm") * col("qn")))
      .select(col("vec_id"), col("v"), col("norm"), col("rel"))

    // running max cosine to the selected set; −1 before any pick so the
    // shifted penalty term (1 + ms) starts at 0
    var state = base.withColumn("ms", lit(-1.0)).localCheckpoint()
    var picked = List.empty[(Int, Long, Double)]
    var r = 0
    var exhausted = false
    while (r < k && !exhausted) {
      val ids = picked.map(_._2)
      val score = lit(lam) * col("rel") -
        lit(1.0 - lam) * (lit(1.0) + col("ms"))
      val pick = state.where(!col("vec_id").isin(ids: _*))
        .select(col("vec_id"), col("v"), col("norm"), score.as("mmr"))
        .agg(max_by(struct(col("vec_id"), col("v"), col("norm"), col("mmr")),
          struct(col("mmr"), -col("vec_id"))).as("p"))
        .select(col("p.*")).collect()
      if (pick.isEmpty || pick.head.isNullAt(0)) exhausted = true
      else {
        val row = pick.head
        val (id, vec, nrm, mmr) = (row.getLong(0), row.getSeq[Double](1),
          row.getDouble(2), row.getDouble(3))
        picked ::= ((r, id, mmr))
        val c = broadcast(Seq((vec, nrm)).toDF("cv", "cn"))
        state = state.crossJoin(c)
          .withColumn("ms", greatest(col("ms"),
            graft.functions.vector_dot(col("v"), col("cv")) / (col("norm") * col("cn"))))
          .drop("cv", "cn")
          .localCheckpoint()
        r += 1
      }
    }
    picked.reverse.toDF("round", "vec_id", "mmr_score")
      .withColumn("mmr_score", round(col("mmr_score"), 6))
  }
}
