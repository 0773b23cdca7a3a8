package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Cohen's kappa between two boolean raters — the chance-corrected
    * agreement of two CLASSIFIERS over the same rows (quality model vs
    * heuristic rule, old filter vs new filter): the standard check that
    * a cheap rater can stand in for an expensive one. Everything is
    * integer: with the 2×2 table (a = both true, b = only A, c = only
    * B, d = neither, n = a+b+c+d),
    * {{{
    *   kappa = (n·(a+d) − S) / (n² − S),  S = (a+b)(a+c) + (c+d)(b+d)
    * }}}
    * emitted as `kappa_micro = floor(kappa · 10⁶)` — the numerator can
    * be negative (worse-than-chance agreement; for the binary 2×2 case
    * kappa IS bounded in [−1, 1]: num ≥ −den reduces to
    * `n(a+d) ≥ (a−d)² − (b−c)²`, which holds since (a−d)² ≤ n(a+d)),
    * and Spark's `div` truncates toward zero while DuckDB's `//`
    * floors, so the floor is spelled with nonnegative divisions only:
    * `−((−x + den − 1) div den)` on the negative branch. An oracle
    * replaying the identical CASE matches bit-for-bit.
    *
    * Fail-loud edges: constant raters make pe = 1 (denominator 0 —
    * kappa undefined), and n beyond ~2·10⁶ rows overflows
    * `|num|·10⁶ ≤ 2n²·10⁶` in BIGINT — both raise instead of returning
    * garbage. At 100 TB the 2×2 table is still four counts (one
    * map-side-combinable aggregate); only the final scalar arithmetic
    * needs DECIMAL there.
    */
  def cohenKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val t = df.select(col(colA).cast("boolean").as("ra"),
        col(colB).cast("boolean").as("rb"))
      .where(col("ra").isNotNull && col("rb").isNotNull)
      // coalesce: a global agg over ZERO rows yields null sums, which
      // would null-skip every guard below instead of raising
      .agg(coalesce(sum(when(col("ra") && col("rb"), 1L).otherwise(0L)), lit(0L)).as("both_true"),
        coalesce(sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)), lit(0L)).as("only_a"),
        coalesce(sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)), lit(0L)).as("only_b"),
        coalesce(sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)), lit(0L)).as("neither"))
    t.select(col("both_true"), col("only_a"), col("only_b"), col("neither"),
        (col("both_true") + col("only_a") + col("only_b") + col("neither"))
          .as("n"))
      .withColumn("__s",
        (col("both_true") + col("only_a")) * (col("both_true") + col("only_b")) +
        (col("only_b") + col("neither")) * (col("only_a") + col("neither")))
      .withColumn("__num",
        (col("n") * (col("both_true") + col("neither")) - col("__s")) * 1000000L)
      .withColumn("__den", col("n") * col("n") - col("__s"))
      .select(col("both_true"), col("only_a"), col("only_b"), col("neither"),
        col("n"),
        when(col("n") === 0 || col("__den") === 0,
          raise_error(lit("cohenKappa: empty input or constant raters — " +
            "chance agreement is 1, kappa is undefined")))
          .when(col("n") > 2000000L,
            raise_error(lit("cohenKappa: n > 2e6 overflows the BIGINT " +
              "kappa arithmetic — compute the 2x2 table in DECIMAL")))
          .when(col("__num") >= 0, expr("__num div __den"))
          .otherwise(-expr("(-__num + __den - 1) div __den"))
          .as("kappa_micro"))
  }

  /** Position-discount weight for [[rankedNdcgMrr]]: `round(10⁶ /
    * log₂(pos+1))`. Computed ONCE here in Scala and embedded as a
    * LITERAL on both engines (the plan's when-chain and the oracle's
    * VALUES table are generated from this same function), so the
    * transcendental log never runs inside either engine — the
    * BM25-rational-idf determinism discipline applied to DCG. */
  def dcgWeightMicro(pos: Int): Long = {
    require(pos >= 1, s"position must be >= 1, got $pos")
    math.round(1e6 / (math.log(pos + 1.0) / math.log(2.0)))
  }

  /** Exact nDCG@k and MRR@k of one ranked result list — the retrieval
    * quality headline over a ranking an engine query produced (BM25,
    * RRF, ANN top-k) joined to graded relevance labels. Input: ≤ k rows
    * with a 1-based dense `rankCol` and an integral `relCol` ≥ 0.
    * Output row: `n_ranked`, `dcg_micro = Σ rel·w(rank)`,
    * `idcg_micro = Σ rel·w(ideal rank)` (relevances re-sorted
    * descending — equal-rel permutations tie, so the ideal is unique as
    * a VALUE), `ndcg_micro = dcg·10⁶ div idcg` (0 when nothing relevant
    * was retrievable — an all-zero list scores 0, it is not an error),
    * and `mrr_nano = 10⁹ div (first rank with rel > 0)` (0 if none).
    *
    * Scale posture: the input is a top-k frame by construction
    * (serving-sized — the MMR/RRF bounded-input argument); the ideal
    * re-rank window and final aggregate run on k rows. Corpus-scale
    * cost lives in the upstream ranker, not here.
    */
  def rankedNdcgMrr(ranked: DataFrame, rankCol: String, relCol: String,
                    k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k out of [1, 1000]: $k")
    def w(rc: Column): Column = (1 to k).foldLeft(lit(0L)) {
      case (acc, i) => when(rc === i, lit(dcgWeightMicro(i))).otherwise(acc)
    }
    val t = ranked.select(col(rankCol).cast("long").as("r"),
        col(relCol).cast("long").as("rel"))
      .select(
        when(col("r") < 1 || col("r") > k,
          raise_error(lit(s"rankedNdcgMrr: rank outside [1, $k]")))
        .when(col("rel") < 0,
          raise_error(lit("rankedNdcgMrr: negative relevance")))
        .otherwise(col("r")).as("r"), col("rel"))
    val ideal = t.withColumn("ir",
      row_number().over(Window.orderBy(col("rel").desc, col("r").asc))
        .cast("long"))
    ideal.agg(count(lit(1)).as("n_ranked"),
        coalesce(sum(col("rel") * w(col("r"))), lit(0L)).as("dcg_micro"),
        coalesce(sum(col("rel") * w(col("ir"))), lit(0L)).as("idcg_micro"),
        coalesce(min(when(col("rel") > 0, col("r"))), lit(0L)).as("__fr"))
      .select(col("n_ranked"), col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") === 0, 0L)
          .otherwise(expr("(dcg_micro * 1000000) div idcg_micro"))
          .as("ndcg_micro"),
        col("__fr").as("first_rel_rank"),
        when(col("__fr") === 0, 0L)
          .otherwise(expr("1000000000 div __fr")).as("mrr_nano"))
  }

  /** Reliability (calibration) diagram of a probabilistic scorer in
    * integer micro-units: rows bucketed by predicted probability
    * (`pMicroCol` ∈ [0, 10⁶], `nBins` equal-width bins, the 1.0 edge
    * folded into the last bin), each bin reporting its size, mean
    * predicted probability, and empirical positive rate — the per-bin
    * gap IS the calibration error. The global Brier score (mean squared
    * error of p against the 0/10⁶ label, in micro-units) rides every
    * row via a broadcast one-row frame — the established
    * scalar-parameter delivery, so one result surface carries both the
    * curve and the headline number.
    *
    * Integer posture: `(p − y·10⁶)²` ≤ 10¹² per row keeps the Brier sum
    * in BIGINT to ~9·10⁶ rows (fail-loud above); per-bin divisions are
    * nonnegative `div`s. Empty input yields an EMPTY diagram (AQE's
    * empty-relation propagation would skip a scalar-side raise anyway —
    * the curve of nothing is nothing, not an error). 100 TB shape: one
    * map-side-combinable groupBy on the bin key (≤ nBins groups) + one
    * scalar aggregate.
    */
  def calibrationBins(df: DataFrame, pMicroCol: String, labelCol: String,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && 1000000 % nBins == 0,
      s"nBins must divide 1e6 and be >= 2, got $nBins")
    val w = 1000000L / nBins
    val t = df.select(col(pMicroCol).cast("long").as("p"),
        col(labelCol).cast("boolean").as("y"))
      .where(col("p").isNotNull && col("y").isNotNull)
      .select(when(col("p") < 0 || col("p") > 1000000L,
          raise_error(lit("calibrationBins: p_micro outside [0, 1e6]")))
          .otherwise(least(expr(s"p div ${w}L"), lit(nBins - 1L)).cast("long"))
          .as("bin"),
        col("p"), when(col("y"), 1000000L).otherwise(0L).as("ym"))
    val bins = t.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"), sum(col("p")).as("__sp"),
        sum(when(col("ym") > 0, 1L).otherwise(0L)).as("__np"))
    val brier = t.agg(count(lit(1)).as("__n"),
        sum((col("p") - col("ym")) * (col("p") - col("ym"))).as("__se"))
      .select(when(col("__n") > 9000000L,
          raise_error(lit("calibrationBins: n > 9e6 overflows the BIGINT " +
            "Brier sum — pre-aggregate or use DECIMAL")))
        .otherwise(expr("__se div (__n * 1000000)")).as("brier_micro"))
    bins.crossJoin(broadcast(brier))
      .select(col("bin"), col("n_rows"),
        expr("__sp div n_rows").as("mean_p_micro"),
        expr("(__np * 1000000) div n_rows").as("pos_rate_micro"),
        col("brier_micro"))
      .orderBy(col("bin"))
  }
}
