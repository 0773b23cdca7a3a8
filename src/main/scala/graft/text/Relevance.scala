package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term-relevance scoring: TF-IDF top terms per document — the
  * ranking half of a training-data quality pipeline (alongside
  * [[TextStats]]'s quality scores): surfacing each document's most
  * characteristic terms for topic bucketing, boilerplate detection and
  * corpus exploration (BASELINE north star; beyond the reference's own
  * surface, its ROADMAP.md:85–90 points at content-based features).
  *
  * Determinism note: the classic idf = ln(N/df) is a transcendental —
  * IEEE does NOT require correctly-rounded ln, so engines legitimately
  * differ in the last ulp and a cross-engine hash gate would flap. We
  * score with the rarity ratio instead: score = (tf·N)/df computed as an
  * exact integer product followed by ONE double division (division IS
  * correctly rounded) — bit-identical on every IEEE-754 engine, and a
  * monotone transform of tf·idf for fixed tf, so per-term ranking within
  * a document is preserved wherever it matters.
  *
  * Scale posture: two hash aggregations (tf by (doc, token), df by
  * token) and one window bounded per document — no all-pairs stage, no
  * driver data path. The df side is |vocabulary| rows; its join back to
  * tf is AQE-broadcast while vocab fits and a plain shuffle join beyond.
  */
object Relevance {

  /** Top `k` terms per document by score = (tf·N)/df, deterministic
    * tie-break (score desc, token asc). Output: (doc_id, rn, token, tf,
    * df, score).
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // one-row N, attached via broadcast cross join (withMaxAnchor pattern)
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("__n")).cast("double") / col("df"))
      .drop("__n")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("rn"), col("token"), col("tf"), col("df"), col("score"))
  }
}
