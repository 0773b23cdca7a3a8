package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ranking-evaluation metrics — the model-eval counterpart to the
  * drift family: does a scorer (quality filter, importance weigher,
  * recommender) actually separate a labeled class? Everything is integer
  * arithmetic end to end; there is no float to disagree across engines.
  */
object Eval {

  /** Exact ROC AUC via the Mann–Whitney U statistic with average-rank
    * tie handling, computed entirely in integers:
    *
    *   - ranks 1..n over ascending score; a tie group occupying ranks
    *     [s, s+c−1] contributes `2·avg_rank = 2s + c − 1` per member
    *     (doubled ranks stay integral through the ½ of the average);
    *   - `u2 = 2·U = Σ_pos 2·avg_rank − n₁(n₁+1)`;
    *   - `AUC = U / (n₁·n₀)`, emitted as `auc_micro = (u2 · 10⁶) div
    *     (2·n₁·n₀)` plus the exact (u2, n_pos, n_neg) triple so callers
    *     needing the unrounded rational have it.
    *
    * A single-class input has no ranking to measure — AUC is 0/0 — so it
    * fails loudly (the KS empty-side discipline) instead of emitting a
    * silent NULL a monitor would read as "fine".
    *
    * 100 TB shape: scores collapse to per-VALUE counts first (one
    * map-side-combinable aggregate — ties, the common case for
    * integer-valued scores, never shuffle row-by-row), then the global
    * rank prefix runs as the bucketed two-pass pattern
    * ([[graft.text.Search.vocabGrowth]]'s shape): an arithmetic-shift
    * bucket (floor division, monotone for negatives), per-bucket sums,
    * one window over buckets, and within-bucket windows over distinct
    * values only. `scoreCol` must be integral; `labelCol` boolean.
    */
  /** Leave-one-group-out sensitivity (the jackknife's group form): for
    * each group, the corpus mean of `valCol` recomputed WITHOUT that
    * group, and its deviation from the full mean — "which source is
    * dragging the corpus statistic, and by how much" for a quality
    * score, a drift statistic, or any integral metric. All integer:
    * `valCol` must already be in fixed-point units (micro scores, cents)
    * and means are integer `div`s — deterministic on any engine, no
    * variance-formula floats.
    *
    * A single-group input has no leave-one-out to compute (N − N_g = 0)
    * and fails loudly. 100 TB shape: one map-side-combinable groupBy to
    * (group, sum, count) plus a broadcast 1-row total — the data is
    * scanned once.
    */
  def leaveOneGroupOut(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("grp"), col(valCol).cast("long").as("v"))
      .where(col("grp").isNotNull && col("v").isNotNull)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val tot = g.agg(sum(col("n")).as("tn"), sum(col("s")).as("ts"))
    g.crossJoin(broadcast(tot))
      .select(col("grp").as(groupCol), col("n"),
        when(col("tn") === col("n"),
          raise_error(lit("leaveOneGroupOut: a single group has no " +
            "leave-one-out mean — need at least two groups")))
          .otherwise(expr("(ts - s) div (tn - n)")).as("loo_mean"),
        (expr("(ts - s) div (tn - n)") - expr("ts div tn")).as("dev_from_full"))
  }

  def aucExact(df: DataFrame, scoreCol: String, labelCol: String,
               bucketShift: Int = 10): DataFrame = {
    require(bucketShift >= 0 && bucketShift <= 62,
      s"bucketShift out of [0, 62]: $bucketShift")
    val s = df.select(col(scoreCol).cast("long").as("score"),
        col(labelCol).cast("boolean").as("lbl"))
      .where(col("score").isNotNull && col("lbl").isNotNull)
    val g = s.groupBy(col("score"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("lbl"), 1L).otherwise(0L)).as("p"))
      .withColumn("__b", shiftright(col("score"), bucketShift))
    val wB = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = g.groupBy(col("__b")).agg(sum(col("c")).as("__bsum"))
      .withColumn("__off", sum(col("__bsum")).over(wB) - col("__bsum"))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = g.join(broadcast(offsets), Seq("__b"))
      .withColumn("__cum", sum(col("c")).over(wIn) + col("__off"))
      .withColumn("__r2",
        col("p") * ((col("__cum") - col("c") + 1) * 2 + col("c") - 1))
    ranked.agg(sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"),
        sum(col("__r2")).as("r2"))
      .select(col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + 1)).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") === 0 || col("n_neg") === 0 ||
          col("n_pos").isNull || col("n_neg").isNull,
          raise_error(lit("aucExact: single-class or empty input — AUC " +
            "is undefined (0/0); check the label column")))
          .otherwise(expr("(u2 * 1000000) div (2 * n_pos * n_neg)"))
          .as("auc_micro"))
  }
}
