package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextStats

/** Model-based document quality filtering: a logistic scorer over the
  * cheap text features ([[graft.text.TextStats.profile]]) — the standard
  * second tier between heuristic rules (q49's expectation gate) and an
  * expensive LLM judge. The classifier form (fastText-style linear model
  * over ratio features) is real and fully evaluated in-plan; the
  * COEFFICIENTS here are fixed reference constants standing in for a
  * trained model's — swap [[referenceWeights]] for fitted values, the
  * plan is identical.
  *
  * Determinism: every feature is either an exact rational or one of
  * profile's 4dp-rounded ratios (both engines round to the same decimal,
  * hence the same double); the linear term is a fixed left-associated
  * chain of correctly-rounded ops; `exp` is the single
  * last-ulp-platform-dependent op, and the final micro-rounding quantum
  * (1e-6) is ~10 orders above its error, so cross-engine agreement is
  * effectively certain per row.
  */
object ModelFilter {

  /** Coefficients of the logistic quality model. */
  final case class LogitWeights(bias: Double, stopword: Double,
                                punct: Double, unique: Double, length: Double)

  /** Reference coefficients: reward stopword density (natural prose) and
    * vocabulary spread, punish punctuation soup, give partial credit for
    * length up to 2000 chars. */
  val referenceWeights: LogitWeights =
    LogitWeights(bias = -2.0, stopword = 6.0, punct = -8.0,
      unique = 3.0, length = 2.0)

  /** Per-document logistic quality score. Output:
    * (doc_id, score_micro, keep) — sigmoid of the linear term in integer
    * micro-units, `keep` at the 0.5 cut — doc-id order.
    *
    * Scale shape: one narrow pass per document (profile's per-row
    * expressions, no shuffle beyond its own), then a row-local scoring
    * expression inside whole-stage codegen; the filter column means
    * downstream consumers prune with a pushable predicate instead of
    * re-scoring.
    */
  def logitQuality(docs: DataFrame, w: LogitWeights = referenceWeights,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val f = TextStats.profile(docs, textCol, idCol)
    val lenNorm = least(col("n_chars"), lit(2000L)).cast("double") / 2000.0
    val z = lit(w.bias) +
      lit(w.stopword) * col("stopword_ratio") +
      lit(w.punct) * col("punct_ratio") +
      lit(w.unique) * col("unique_ratio") +
      lit(w.length) * lenNorm
    f.select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-z)) * 1e6).cast("long").as("score_micro"))
      .withColumn("keep", col("score_micro") >= 500000L)
      .orderBy(col("doc_id"))
  }
}
