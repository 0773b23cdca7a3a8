package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.silver.Pipelines

/** Fuzzy (edit-distance) string similarity join over a vocabulary — the
  * typo-clustering / vocab-normalization step of a text pipeline
  * (BASELINE north star, same family as [[Dedup]]'s near-dup tiers).
  *
  * Candidate generation is FastSS deletion-neighborhood banding: every
  * word keys on itself plus each single-character deletion variant. Two
  * words at Levenshtein distance ≤ 1 ALWAYS share a key (substitution →
  * same position deleted; insert/delete → the shorter word IS a deletion
  * variant of the longer), so recall is exact; survivors are verified
  * with the true levenshtein, so precision is exact too. The shuffle is
  * on deletion keys only — bucket sizes are bounded by |alphabet|·len
  * look-alikes, never the vocabulary size, where the naive approach is a
  * quadratic cross join of the whole vocab.
  */
object Fuzzy {

  /** All single-deletion variants of column `c` (one per position), via a
    * higher-order transform — vocabulary-sized input, not corpus-sized,
    * so the non-codegen lambda is off the hot path. */
  private def deletionVariants(c: String): Column =
    expr(s"transform(sequence(1, length($c)), i -> " +
      s"concat(substring($c, 1, i - 1), substring($c, i + 1, length($c))))")

  /** Distinct token vocabulary of `docs.textCol`, length-bounded. */
  def vocabulary(docs: DataFrame, minLen: Int, maxLen: Int,
                 textCol: String = "text"): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("w"))
      .filter(length(col("w")).between(minLen, maxLen))
      .distinct()

  /** Unordered vocab pairs (w1 < w2) at Levenshtein distance ≤ 1. */
  def editDistancePairs(vocab: DataFrame): DataFrame = {
    val keyed = vocab
      .select(col("w"), explode(array_union(deletionVariants("w"),
        array(col("w")))).as("k"))
    // A binding cap would silently DROP distance-1 pairs whenever one
    // deletion-key bucket exceeds it, breaking the exact-recall contract,
    // so overflow is an ERROR, not a truncation. The cap itself is set
    // far above any real bucket — FastSS buckets hold only
    // |alphabet|·len look-alikes of one stem, orders of magnitude under
    // 2^20 — but finite, so a pathological vocabulary (adversarial
    // near-identical stems) fails loudly instead of silently losing
    // pairs (ADVICE r4). Since r6 the bound lives INSIDE the aggregation
    // buffer (bounded_collect_set via Pipelines.cooccurrence): the task
    // fails the moment a bucket's distinct size passes the cap, so even
    // a bucket big enough to exhaust an executor errors cleanly instead
    // of OOMing first (ADVICE r5) — a memory bound as well as a
    // correctness guard.
    val cand = Pipelines.cooccurrence(keyed, "k", "w",
      maxGroupSize = 1 << 20, failOnOverflow = true)
      .select(col("track_id_1").as("w1"), col("track_id_2").as("w2"))
    cand
      .withColumn("dist", levenshtein(col("w1"), col("w2")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("w1"), col("w2"), col("dist"))
  }

  /** Blocked Jaro–Winkler record linkage over a vocabulary: candidate
    * pairs share their first two characters and differ in length by at
    * most `maxLenDiff`; survivors are scored with the fused
    * [[graft.functions.JaroWinkler]] expression and kept at
    * `score ≥ threshold` (reported as exact micro-units so the gate is
    * integer-comparable).
    *
    * Unlike [[editDistancePairs]]' FastSS keys, prefix blocking is the
    * standard linkage HEURISTIC, not an exact-recall scheme — a
    * transposed-first-letter pair is out of scope by construction, and
    * that contract is part of the operator's definition (the oracle
    * replays the same blocks). Scale shape: the shuffle keys on the
    * 2-byte prefix of a VOCABULARY (sublinear in corpus size), the
    * within-block join is length-banded, and the scorer runs inside
    * whole-stage codegen, so the cost is Σ block² over ~26² blocks of a
    * dictionary — not corpus-quadratic.
    */
  def jaroLinkage(vocab: DataFrame, threshold: Double = 0.9,
                  maxLenDiff: Int = 2): DataFrame = {
    val a = vocab.select(col("w").as("w1"), substring(col("w"), 1, 2).as("blk"))
    val b = vocab.select(col("w").as("w2"), substring(col("w"), 1, 2).as("blk"))
    a.join(b, Seq("blk"))
      .filter(col("w1") < col("w2") &&
        abs(length(col("w1")) - length(col("w2"))) <= maxLenDiff)
      .withColumn("jw_micro",
        round(graft.functions.jaro_winkler(col("w1"), col("w2")) * 1e6)
          .cast("long"))
      .filter(col("jw_micro") >= math.round(threshold * 1e6))
      .select(col("w1"), col("w2"), col("jw_micro"))
  }
}
