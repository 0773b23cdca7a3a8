package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag training documents that share any
  * n-token shingle with an evaluation corpus — the GPT-3/PaLM-style
  * n-gram overlap check run before training so benchmark text does not
  * leak into the training set. (Beyond the reference's own surface, like
  * the rest of the LLM-data-pipeline operators; its ROADMAP.md:85–90
  * points at similarity infrastructure.)
  *
  * Scale posture: an evaluation corpus is benchmark-sized — orders of
  * magnitude smaller than the training corpus — so its distinct shingle
  * set is BROADCAST and the training side joins against it map-side: the
  * 100 TB training corpus never shuffles. The only aggregation runs over
  * matching (doc, shingle) rows, i.e. the contaminated sliver. For an
  * eval set too large to broadcast whole, the same plan drops in behind
  * [[graft.operators.BloomJoin]]: bloom-prefilter the training shingle
  * stream (fixed-size bitset, still no training-side shuffle), then
  * exact-verify the survivors.
  */
object Decontaminate {

  /** Per-training-document count of DISTINCT shingles shared with the
    * eval corpus: `(doc_id, n_shared)`, one row per contaminated doc.
    * Clean docs produce no row — at scale the output is the report you
    * act on (drop or mask), not a full-corpus annotation.
    */
  def overlaps(train: DataFrame, eval: DataFrame, n: Int = 5): DataFrame = {
    val evalShingles = Dedup.shingleIndex(eval, n).select(col("shingle")).distinct()
    Dedup.shingleIndex(train, n) // distinct per doc by construction
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[overlaps]] for an eval corpus too large to broadcast whole: a
    * bloom sketch over the eval shingles (built distributed by Spark's
    * `BloomFilterAggregate`, delivered to the probe side as a scalar-
    * subquery result — never a plan literal, however many bits it holds)
    * pre-filters the training shingle stream IN the scan pipeline, and
    * the survivors — the true matches plus the fpp sliver — go through
    * the exact semi-join. The result is EXACTLY `overlaps` (no false
    * positives survive the residual join, no false negatives exist in a
    * bloom), with the training-side shuffle now sized by the
    * contamination rate instead of the eval corpus's broadcastability.
    */
  def overlapsBloom(train: DataFrame, eval: DataFrame, n: Int = 5,
                    expectedItems: Long = 1L << 17, numBits: Long = 1L << 20): DataFrame = {
    val evalShingles = Dedup.shingleIndex(eval, n).select(col("shingle")).distinct()
    graft.operators.BloomJoin.semiJoin(
        Dedup.shingleIndex(train, n), "shingle", evalShingles, "shingle",
        expectedItems, numBits)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
