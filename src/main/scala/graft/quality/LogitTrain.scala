package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.floor_div
import graft.text.TextStats

/** In-engine training of the q147 quality classifier (VERDICT r8 #5):
  * full-batch gradient descent over the SAME profile features
  * ModelFilter scores with, so the fitted coefficients drop straight
  * into [[ModelFilter.logitQuality]]'s plan in place of
  * `referenceWeights`. Label: `lang = 'en'` (the corpus's natural
  * prose-vs-other split, the q204 calibration label).
  *
  * Numerics: the whole optimization runs on an EXACT INTEGER
  * micro-unit grid so the oracle replays every iterate bit-for-bit —
  * features, margins, link outputs, gradients and weights are all
  * BIGINT micros, with floor division everywhere a quotient is taken
  * (both engines floor identically; see functions.floor_div). The link
  * is the rational fast sigmoid `σ̃(z) = 1/2 + z / (2(1+|z|))`
  * (Elliott's activation — same shape, range and 0.5-at-0 as the
  * logistic, but exactly computable in integer arithmetic, where `exp`
  * would be the one op two engines may round differently across
  * thousands of accumulated draws). The q147 SERVING scorer keeps its
  * exp-based sigmoid; only training uses the rational link.
  *
  * Scale split (the q188 PCA discipline): each step's data term is ONE
  * map-side-combined aggregate over the feature frame — count, keep
  * count, and the 5 per-coefficient gradient sums — so a step shuffles
  * 8 longs per partition regardless of corpus size; the O(d) weight
  * update runs on the driver. The feature frame is localCheckpoint'ed
  * once and re-scanned `steps` times (columnar, 6 narrow columns).
  *
  * Gradient terms are floor-divided back to micro scale PER ROW
  * (`(p − y)·x // 10⁶` ≤ 10⁶), so the sums stay exact longs up to
  * ~9·10¹² rows; the mean-then-scale update order
  * (`lr · (g // n) // 10⁶`) keeps the driver arithmetic in range at
  * any corpus size.
  *
  * Output: one row per step — (step, n, n_keep_pre, then the five
  * weights AFTER the step's update, all micro). `n_keep_pre` is the
  * keep count under the step's INCOMING weights (the scorer composed
  * at every iterate — step 1's value is the all-zero-weights p = 0.5
  * boundary case, counted as keep by the >= cut).
  */
object LogitTrain {

  def train(docs: DataFrame, steps: Int = 5, lrMicro: Long = 4000000L,
            textCol: String = "text", idCol: String = "doc_id",
            labelCol: String = "lang"): DataFrame = {
    require(steps >= 1 && steps <= 50, s"steps in [1, 50], got $steps")
    require(lrMicro > 0, s"lrMicro must be positive, got $lrMicro")
    val spark = docs.sparkSession
    import spark.implicits._

    val M = 1000000L
    val f = TextStats.profile(docs, textCol, idCol)
    val fx = f.join(docs.select(col(idCol).as("doc_id"),
        col(labelCol).as("__lang")), Seq("doc_id"))
      .select(
        when(col("__lang") === "en", M).otherwise(0L).as("y"),
        lit(M).as("x0"),
        round(col("stopword_ratio") * 1e6).cast("long").as("x1"),
        round(col("punct_ratio") * 1e6).cast("long").as("x2"),
        round(col("unique_ratio") * 1e6).cast("long").as("x3"),
        (least(col("n_chars"), lit(2000L)) * 500L).as("x4"))
      .localCheckpoint()

    val xs = Seq("x0", "x1", "x2", "x3", "x4")
    val w = Array.fill(5)(0L)
    val rows = (1 to steps).map { t =>
      // margin and rational link under the incoming weights — all
      // integer micros, floor-divided like the oracle's //
      val z: Column = floor_div(
        xs.zipWithIndex.map { case (x, j) => col(x) * w(j) }.reduce(_ + _),
        lit(M))
      val p: Column = lit(M / 2) + floor_div(z * (M / 2), lit(M) + abs(z))
      val aggs =
        Seq(count(lit(1)).as("n"),
          sum(when(p >= M / 2, 1L).otherwise(0L)).as("n_keep")) ++
        xs.zipWithIndex.map { case (x, j) =>
          sum(floor_div((p - col("y")) * col(x), lit(M))).as(s"g$j") }
      val r = fx.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getLong(0)
      require(n > 0, "logit training needs at least one document")
      val nKeep = r.getLong(1)
      for (j <- 0 until 5)
        w(j) -= Math.floorDiv(lrMicro * Math.floorDiv(r.getLong(2 + j), n), M)
      (t.toLong, n, nKeep, w(0), w(1), w(2), w(3), w(4))
    }
    rows.toDF("step", "n", "n_keep_pre", "w_bias_micro", "w_stop_micro",
      "w_punct_micro", "w_uniq_micro", "w_len_micro")
  }
}
