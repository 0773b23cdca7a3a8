package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature importance weighting — the data-selection primitive of
  * DSIR-style pipelines (Xie et al. 2023): score every document by how
  * much more likely its tokens are under a TARGET domain than under the
  * corpus as a whole, Σ_tokens ln(p_target(bucket)/p_source(bucket))
  * over hashed token buckets. High scorers read like the target domain;
  * the score feeds sampling (ppsSystematic), filtering, or mixture
  * construction.
  *
  * Determinism contract (the PSI/JSD discipline, analytics/Drift.scala):
  * the log-ratio is computed ONCE per bucket — nBuckets ln() calls
  * total, each over a fixed +,−,×,÷ sequence with add-half smoothing —
  * nano-rounded to an integer, and every downstream aggregate is an
  * exact integer sum: order-independent at any parallelism, replayable
  * by any engine with the same ln. Documents never see a float.
  *
  * 100 TB shape: two map-side-combinable counts over the token stream
  * (target-filtered and whole-corpus) collapse to one ≤ nBuckets-row
  * weight table that BROADCASTS into a single per-doc sum — the corpus
  * crosses the wire once, as (doc, bucket) pairs, and the only ln() work
  * is bucket-sized. The md5 bucket matches [[Splits.bucket]]'s conv(md5)
  * recipe so external engines reproduce bucketing exactly.
  */
object Importance {

  /** @param targetPred row predicate over `docs` selecting the target
    *                   domain (e.g. `col("lang") === "en"`)
    * @return per-doc (all original columns minus text, n_toks, imp_nano)
    */
  def tokenImportanceNano(docs: DataFrame, targetPred: Column,
                          nBuckets: Int = 4096,
                          textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val half = nBuckets * 0.5
    val tk = docs
      .withColumn("__target", targetPred)
      .withColumn("__tok", explode(Dedup.tokens(col(textCol))))
      .withColumn("__bk",
        conv(substring(md5(col("__tok")), 1, 8), 16, 10).cast("long") % nBuckets)
      .drop("__tok")
    val cs = tk.groupBy(col("__bk")).agg(count(lit(1)).as("c_s"))
    val ct = tk.where(col("__target")).groupBy(col("__bk")).agg(count(lit(1)).as("c_t"))
    val tot = tk.agg(count(lit(1)).as("ns"),
      count(when(col("__target"), 1)).as("nt"))
    val weights = cs.join(ct, Seq("__bk"), "left")
      .na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(tot))
      .select(col("__bk"),
        round(log(((col("c_t") + 0.5) / (col("nt") + half)) /
          ((col("c_s") + 0.5) / (col("ns") + half))) * 1000000000.0)
          .cast("long").as("__nano"))
    tk.join(broadcast(weights), Seq("__bk"))
      .groupBy(docs.columns.filter(_ != textCol).map(col).toSeq: _*)
      .agg(count(lit(1)).as("n_toks"), sum(col("__nano")).as("imp_nano"))
  }
}
