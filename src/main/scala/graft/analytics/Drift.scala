package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift statistics between two populations of the same
  * table — the monitoring layer a training-data pipeline needs when a
  * corpus is re-crawled or re-split (reference: the repo's GE-style
  * quality gate checks single-snapshot invariants,
  * pyspark_jobs/data_quality_checks.py; these are the standard
  * two-sample extensions of that idea).
  *
  * Determinism discipline (shared with [[Assoc]]): counts stay exact
  * integers through every aggregation; the continuous statistics are
  * built from single correctly-rounded double ops per row plus
  * order-independent reductions (`max`, integer/decimal `sum`) — never
  * an order-dependent double accumulation — so results are bit-identical
  * at any parallelism and reproducible in any engine evaluating the same
  * expression tree.
  */
object Drift {

  /** Cast a long count to decimal(18,0), erroring if the value would not
    * fit: a non-ANSI decimal cast silently returns NULL past 10^18, and
    * sum() would then skip the category — an under-reported statistic
    * with no error. Fail-loud is the repo-wide cap posture.
    */
  private[graft] def decCap(c: Column): Column =
    when(c >= 1000000000000000000L, raise_error(concat(
      lit("count exceeds the decimal(18,0) exact-product domain: "), c.cast("string"))))
      .otherwise(c).cast("decimal(18,0)")

  /** Two-sample Kolmogorov–Smirnov statistic between the `valueCol`
    * distributions of rows where `sideCol === sideA` vs `=== sideB`:
    * {{{ D = max_x | F_a(x) − F_b(x) | }}}
    * over the empirical CDFs evaluated at every distinct observed value.
    * Output: one row (n_a, n_b, ks_d). Null values are excluded (a CDF
    * over nulls is undefined); an EMPTY side fails loudly (raise_error)
    * rather than returning a value — the two-sample statistic is
    * undefined there, and the silent alternative (non-ANSI Divide
    * returns NULL on the zero divisor, so ks_d would come back NULL,
    * not NaN) reads like "no drift" to a monitoring consumer.
    *
    * Per distinct value the CDF heights are `c/n` — one correctly-rounded
    * double division each — and D is a `max` reduction, so the result is
    * deterministic at any parallelism and matches any engine running the
    * same per-row arithmetic (the DuckDB oracle does exactly this). The
    * double form also cannot overflow at any corpus size, unlike the
    * integer cross-product `|c_a·n_b − c_b·n_a|` formulation.
    *
    * Scale posture: the cumulative counts need a value-ordered prefix
    * sum, which is inherently sequential — the naive global window
    * collapses every distinct value to ONE partition. This uses the same
    * two-pass distributed prefix sum as `Search.vocabGrowth`: distinct
    * values land in `bucketWidth`-wide numeric ranges, per-bucket totals
    * (a few thousand rows) take the tiny single-partition window to
    * become bucket offsets, and the offsets broadcast back so the heavy
    * within-bucket window runs partitioned by bucket. Both passes are
    * exact integer sums.
    */
  def ksStatistic(df: DataFrame, valueCol: String, sideCol: String,
                  sideA: Column, sideB: Column,
                  bucketWidth: Double = 1.0): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // NaN is excluded along with NULL (the contract, mirrored in the
    // oracles): a NaN would pass isNotNull, then floor(NaN/w) lands a
    // NULL bucket that the offsets equi-join silently drops — counted in
    // the totals but missing from the CDF. Exclude it from BOTH so the
    // statistic is over the finite sample. isnan() only types on
    // float/double; other numerics have no NaN to exclude.
    val isFloating = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => true
      case _ => false
    }
    val finite =
      if (isFloating) col(valueCol).isNotNull && !isnan(col(valueCol))
      else col(valueCol).isNotNull
    val sided = df
      .filter(finite && (col(sideCol) === sideA || col(sideCol) === sideB))
      .select(col(valueCol).as("__v"),
        when(col(sideCol) === sideA, 1L).otherwise(0L).as("__a"),
        when(col(sideCol) === sideB, 1L).otherwise(0L).as("__b"))
    // checkpointed: three consumers (bucket totals, the windowed CDF,
    // n_a/n_b) read the materialized value-cardinality-sized counts
    // instead of re-paying the corpus scan + shuffle per consumer
    val perValue = sided.groupBy(col("__v"))
      .agg(sum(col("__a")).as("__ca"), sum(col("__b")).as("__cb"))
      .withColumn("__bk", floor(col("__v") / bucketWidth).cast("long"))
      .localCheckpoint()
    val perBucket = perValue.groupBy("__bk")
      .agg(sum(col("__ca")).as("__bca"), sum(col("__cb")).as("__bcb"))
    val wB = Window.orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = perBucket
      .withColumn("__offa", sum(col("__bca")).over(wB) - col("__bca"))
      .withColumn("__offb", sum(col("__bcb")).over(wB) - col("__bcb"))
      .select(col("__bk"), col("__offa"), col("__offb"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // totals from the ALREADY-AGGREGATED per-value counts — identical
    // exact integers, but value-cardinality-sized input instead of a
    // second corpus-scale scan of `sided`. An all-null/empty side sums
    // to NULL-or-0: fail loudly here (the broadcast evaluates this
    // eagerly) so the undefined statistic cannot propagate as NULL.
    val totals = perValue.agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
      .select(Seq("n_a", "n_b").map(c =>
        when(coalesce(col(c), lit(0L)) === 0L, raise_error(lit(
          s"ksStatistic: side '$c' has no finite non-null rows — " +
            "the two-sample statistic is undefined"))).otherwise(col(c)).as(c)): _*)
    perValue.join(broadcast(offsets), Seq("__bk"))
      .withColumn("__cuma", sum(col("__ca")).over(wIn) + col("__offa"))
      .withColumn("__cumb", sum(col("__cb")).over(wIn) + col("__offb"))
      .crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs(col("__cuma").cast("double") / col("n_a").cast("double") -
            col("__cumb").cast("double") / col("n_b").cast("double")).as("__gap"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("__gap")).as("ks_d"))
      .select(col("n_a"), col("n_b"), col("ks_d"))
  }

  /** Population stability index between the two populations' `valueCol`
    * distributions over fixed-width bins — the industry-standard model-
    * monitoring drift score (PSI < 0.1 stable, > 0.25 action):
    * {{{ PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i) }}}
    * with half-count Laplace smoothing `p_i = (c_i + ½) / (n + ½·B)`
    * (B = observed bins) so empty-on-one-side bins contribute a finite,
    * defined term instead of ±∞. Output: one row
    * (n_a, n_b, n_bins, psi_nano) — the statistic in integer nano-units.
    *
    * Same fixed-point determinism contract as [[jsDivergence]]: per-bin
    * terms (≥ 0 — the factors share sign) from a fixed double-op chain,
    * nano-rounded once, exact integer sum; `ln` again the only
    * sub-ulp-platform op, orders below the quantum. Bin counts are one
    * keyed aggregation; everything after is bin-cardinality-sized.
    */
  def psi(df: DataFrame, valueCol: String, sideCol: String,
          sideA: Column, sideB: Column, binWidth: Double = 1.0): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val isFloating = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => true
      case _ => false
    }
    val finite =
      if (isFloating) col(valueCol).isNotNull && !isnan(col(valueCol))
      else col(valueCol).isNotNull
    val sided = df
      .filter(finite && (col(sideCol) === sideA || col(sideCol) === sideB))
      .select(floor(col(valueCol) / binWidth).cast("long").as("__bin"),
        when(col(sideCol) === sideA, 1L).otherwise(0L).as("__a"),
        when(col(sideCol) === sideB, 1L).otherwise(0L).as("__b"))
    val perBin = sided.groupBy(col("__bin"))
      .agg(sum(col("__a")).as("__ca"), sum(col("__b")).as("__cb"))
      .localCheckpoint()
    val totals = perBin
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
        count(lit(1)).as("n_bins"))
      .select(
        Seq("n_a", "n_b").map(c =>
          when(coalesce(col(c), lit(0L)) === 0L, raise_error(lit(
            s"psi: side '$c' has no finite non-null rows — the statistic " +
              "is undefined"))).otherwise(col(c)).as(c)) :+ col("n_bins"): _*)
    val p = (col("__ca").cast("double") + 0.5) /
      (col("n_a").cast("double") + lit(0.5) * col("n_bins").cast("double"))
    val q = (col("__cb").cast("double") + 0.5) /
      (col("n_b").cast("double") + lit(0.5) * col("n_bins").cast("double"))
    perBin.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"), col("n_bins"),
        round((p - q) * log(p / q) * 1000000000.0).cast("long").as("__nano"))
      .groupBy(col("n_a"), col("n_b"), col("n_bins"))
      .agg(sum(col("__nano")).as("psi_nano"))
      .select(col("n_a"), col("n_b"), col("n_bins"), col("psi_nano"))
  }

  /** Total-variation distance between the categorical `catCol`
    * distributions of the two populations:
    * {{{ TV = ½ · Σ_c | p_a(c) − p_b(c) | ∈ [0, 1] }}}
    * Output: one row (n_a, n_b, n_categories, tv).
    *
    * The sum is over per-category terms, and a double Σ would make the
    * result depend on partition order. Instead each term is the exact
    * integer cross-product `|c_a·n_b − c_b·n_a|` (common denominator
    * n_a·n_b), summed in DECIMAL(38,0) — Spark decimal sums are exact and
    * order-independent — with the single double division at the very
    * end. Factors route through [[decCap]] — exact for counts below
    * 10^18 rows per side, fail-loud past it (a bare decimal cast would
    * silently NULL and under-report). One keyed aggregation on the
    * category; everything after is category-cardinality-sized.
    */
  /** Jensen–Shannon divergence (nats) between the categorical `catCol`
    * distributions of the two populations:
    * {{{ JSD = ½·KL(P‖M) + ½·KL(Q‖M),  M = (P+Q)/2,  ∈ [0, ln 2] }}}
    * Output: one row (n_a, n_b, n_categories, jsd_nano) — the statistic
    * in integer NANO-nats.
    *
    * The fixed-point form is the determinism contract, not a convenience:
    * a double Σ over categories would make the result depend on partition
    * order, so each per-category contribution
    * `½·(p·ln(2p/(p+q)) + q·ln(2q/(p+q)))` (log-sum inequality ⇒ ≥ 0,
    * absent sides contribute their `ln 2` half) is computed with a fixed
    * per-row double-op sequence, rounded once to nano-units, and summed
    * as exact integers — order-independent at any parallelism. `ln` is
    * the one sub-ulp-platform-dependent op in the chain; contributions
    * are O(1/|vocab|), so a last-ulp difference lands on a nano boundary
    * with probability ~1e-10 per category — the quantum is chosen so the
    * cross-engine gate cannot flake. Shape is [[tvDistance]]'s: one keyed
    * aggregation on the category, then category-cardinality-sized work.
    */
  def jsDivergence(df: DataFrame, catCol: String, sideCol: String,
                   sideA: Column, sideB: Column): DataFrame = {
    val sided = df
      .filter(col(catCol).isNotNull &&
        (col(sideCol) === sideA || col(sideCol) === sideB))
      .select(col(catCol).as("__c"),
        when(col(sideCol) === sideA, 1L).otherwise(0L).as("__a"),
        when(col(sideCol) === sideB, 1L).otherwise(0L).as("__b"))
    val perCat = sided.groupBy(col("__c"))
      .agg(sum(col("__a")).as("__ca"), sum(col("__b")).as("__cb"))
      .localCheckpoint()
    // empty sides fail loudly, same contract (and reason) as ksStatistic
    val totals = perCat.agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
      .select(Seq("n_a", "n_b").map(c =>
        when(coalesce(col(c), lit(0L)) === 0L, raise_error(lit(
          s"jsDivergence: side '$c' has no rows — the divergence is undefined")))
          .otherwise(col(c)).as(c)): _*)
    val p = col("__ca").cast("double") / col("n_a").cast("double")
    val q = col("__cb").cast("double") / col("n_b").cast("double")
    val pPart = when(col("__ca") > 0L, p * log(lit(2.0) * p / (p + q))).otherwise(0.0)
    val qPart = when(col("__cb") > 0L, q * log(lit(2.0) * q / (p + q))).otherwise(0.0)
    perCat.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        round((pPart + qPart) * 0.5 * 1000000000.0).cast("long").as("__nano"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_categories"), sum(col("__nano")).as("jsd_nano"))
      .select(col("n_a"), col("n_b"), col("n_categories"), col("jsd_nano"))
  }

  def tvDistance(df: DataFrame, catCol: String, sideCol: String,
                 sideA: Column, sideB: Column): DataFrame = {
    val sided = df
      .filter(col(catCol).isNotNull &&
        (col(sideCol) === sideA || col(sideCol) === sideB))
      .select(col(catCol).as("__c"),
        when(col(sideCol) === sideA, 1L).otherwise(0L).as("__a"),
        when(col(sideCol) === sideB, 1L).otherwise(0L).as("__b"))
    // checkpointed: totals and the cross-product stage both read the
    // materialized category-cardinality counts, not the corpus
    val perCat = sided.groupBy(col("__c"))
      .agg(sum(col("__a")).as("__ca"), sum(col("__b")).as("__cb"))
      .localCheckpoint()
    val totals = perCat.agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
    perCat.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs(decCap(col("__ca")) * decCap(col("n_b")) -
            decCap(col("__cb")) * decCap(col("n_a"))).as("__num"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_categories"), sum(col("__num")).as("__tvnum"))
      .select(col("n_a"), col("n_b"), col("n_categories"),
        (col("__tvnum").cast("double") /
          (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")))
          .as("tv"))
  }

  /** Per-window PSI against the FIRST window's histogram — the batch
    * half of a streaming drift monitor: feed it the (window_start, bin,
    * n) sink of [[graft.streaming.StreamAgg.windowedHistogram]] and
    * every later window is scored against the cold-start baseline with
    * [[psi]]'s exact fixed-point contract (half-count Laplace smoothing
    * over the bins observed in EITHER side of that window's pair,
    * per-bin nano-rounded terms, exact integer sum).
    *
    * Scale: the histogram is (windows × bins) metadata, so every join
    * here is metadata-sized; the corpus-scale work already happened in
    * the streaming aggregation. The reference side is broadcast (one
    * window's bins); the bins-union grid is windows × bins rows.
    *
    * Output: (window_start, n_ref, n_win, n_bins, psi_nano), one row
    * per non-baseline window.
    */
  def psiVsFirstWindow(hist: DataFrame, windowCol: String = "window_start",
                       binCol: String = "bin", cntCol: String = "n"): DataFrame = {
    // eager guard, not raise_error-in-plan: an EMPTY input produces no
    // rows for any downstream expression to evaluate, so an in-plan
    // guard can never fire — and the input is metadata-sized (windows ×
    // bins), so the extra action is free
    require(!hist.isEmpty,
      "psiVsFirstWindow: empty histogram — no baseline window")
    val w0 = hist.agg(min(col(windowCol)).as("__w0"))
    val sided = hist.select(col(windowCol).as("__w"), col(binCol).as("bin"),
      col(cntCol).cast("long").as("__n")).crossJoin(broadcast(w0))
    val ref = sided.filter(col("__w") === col("__w0"))
      .select(col("bin"), col("__n").as("__cb"))
      .localCheckpoint()
    val wins = sided.filter(col("__w") =!= col("__w0"))
      .select(col("__w"), col("bin"), col("__n").as("__ca"))
    val grid = wins.select(col("__w")).distinct()
      .crossJoin(broadcast(ref.select(col("bin"))))
      .unionByName(wins.select(col("__w"), col("bin")))
      .distinct()
    val full = grid
      .join(wins, Seq("__w", "bin"), "left")
      .join(broadcast(ref), Seq("bin"), "left")
      .na.fill(0L, Seq("__ca", "__cb"))
    val totals = full.groupBy(col("__w"))
      .agg(sum(col("__ca")).as("n_win"), count(lit(1)).as("n_bins"))
    val refTotal = ref.agg(sum(col("__cb")).as("n_ref"))
    val p = (col("__ca").cast("double") + 0.5) /
      (col("n_win").cast("double") + lit(0.5) * col("n_bins").cast("double"))
    val q = (col("__cb").cast("double") + 0.5) /
      (col("n_ref").cast("double") + lit(0.5) * col("n_bins").cast("double"))
    full.join(broadcast(totals), Seq("__w"))
      .crossJoin(broadcast(refTotal))
      .select(col("__w").as(windowCol), col("n_ref"), col("n_win"), col("n_bins"),
        round((p - q) * log(p / q) * 1000000000.0).cast("long").as("__nano"))
      .groupBy(col(windowCol), col("n_ref"), col("n_win"), col("n_bins"))
      .agg(sum(col("__nano")).as("psi_nano"))
  }
}
