package graft.recommend

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive / implicit-feedback
  * training: for every user in a positives table, draw up to `k`
  * item ids the user has NOT interacted with — the (user, positive,
  * negatives) triple construction behind BPR-style recommender losses
  * and contrastive embedding training. `randomSplit`-style sampling
  * would tie the draws to partition layout; here candidate `t` for user
  * `u` is the md5-bucket `hash(u, t) mod nItems` ([[graft.text.Splits
  * .bucket]]'s idiom), so the negative set is a pure function of
  * (user, catalog size) — same triples on any cluster, forever, and the
  * DuckDB oracle replays every draw.
  *
  * Rejection is vectorized, not looped: all `trials` candidates
  * materialize at once (one bounded explode), positives knock theirs
  * out with ONE left-anti join on (user, item), within-user duplicate
  * candidates keep their first trial, and the first `k` survivors by
  * trial order win. A user whose rejection rate leaves fewer than `k`
  * survivors yields fewer rows (n_neg < k is the caller's signal to
  * raise `trials`) — short rows, never silently recycled positives.
  *
  * Scale posture: the explode is ×`trials` on the USER list (not the
  * positives table), the anti-join and the keep-first/top-k windows key
  * on user — one shuffle family, no global window, no driver loop.
  */
object NegativeSampling {

  /** `positives(userCol, itemCol)` → (user_id, trial, item_id) negative
    * draws, ≤ k per user, trial-ordered. `nItems`: catalog size;
    * `keyOffset`: the catalog's first item id — draws land on
    * `[keyOffset, keyOffset + nItems)`. TPC-H part keys are 1-based, so
    * a 0-based draw could emit a NONEXISTENT item 0 and could never
    * draw key `nItems` (ADVICE r8); pass `keyOffset = 1` for 1-based
    * catalogs. */
  def sample(positives: DataFrame, nItems: Long, k: Int, trials: Int,
             userCol: String = "user_id", itemCol: String = "track_id",
             keyOffset: Long = 0L): DataFrame = {
    require(nItems > 0, s"nItems must be positive, got $nItems")
    require(k >= 1 && trials >= k,
      s"need trials ($trials) >= k ($k) >= 1")
    val pos = positives.select(col(userCol).as("user_id"),
      col(itemCol).as("item_id"))
    val cands = pos.select(col("user_id")).distinct()
      .select(col("user_id"), explode(sequence(lit(0), lit(trials - 1))).as("trial"))
      .withColumn("item_id",
        lit(keyOffset) +
          conv(substring(md5(concat(col("user_id").cast("string"), lit("-"),
            col("trial").cast("string"))), 1, 8), 16, 10)
            .cast("long") % nItems)
    val novel = cands.join(pos, Seq("user_id", "item_id"), "left_anti")
    val keepFirst = Window.partitionBy(col("user_id"), col("item_id"))
      .orderBy(col("trial"))
    val byTrial = Window.partitionBy(col("user_id")).orderBy(col("trial"))
    novel
      .withColumn("__dup", row_number().over(keepFirst))
      .where(col("__dup") === 1)
      .withColumn("__rk", row_number().over(byTrial))
      .where(col("__rk") <= k)
      .select(col("user_id"), col("trial").cast("long").as("trial"),
        col("item_id"))
  }
}
