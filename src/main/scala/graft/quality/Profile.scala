package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-column table profiling — the discovery pass a curation pipeline
  * runs before writing expectations (reference: great_expectations
  * suite bootstrap in the quality gate, SURVEY.md §5 item 4; the
  * reference profiles interactively, here it is one declarative job).
  *
  * One row out per profiled column: row count, null count, distinct
  * count, min/max (stringified so heterogeneous column types share one
  * output schema). The whole profile is ONE aggregate over ONE scan —
  * no per-column jobs, no driver loop over columns.
  *
  * Scale posture: with `exactDistinct = true` (the oracle-checked
  * default) Spark plans the multi-column distinct through an Expand —
  * the scanned rows are replicated (k+1)× through the partial
  * aggregate, the standard exact plan; linear in data × columns, all
  * map-side combinable. For wide tables at 100 TB pass
  * `exactDistinct = false`: `approx_count_distinct` (HLL++) keeps the
  * pass expand-free and constant-memory per column — same envelope
  * trade as [[graft.operators.Sketches]] q42.
  */
object Profile {

  /** Profile `cols` of `df` in one aggregate pass; one output row per
    * column: (col_name, n_rows, n_nulls, n_distinct, min_s, max_s).
    * min/max/distinct ignore nulls (SQL semantics); an all-null column
    * profiles as (n, n, 0, null, null).
    */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(",")}")
    require(cols.forall(!_.startsWith("__")),
      "reserved __ prefix in profiled column names")
    def nd(c: String): Column =
      if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single wide row to one row per column; explode of a
    // k-element literal-shaped array is row-local, no second pass
    val entries = array(cols.map(c => struct(lit(c).as("col_name"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))): _*)
    one.select(col("__n").as("n_rows"), explode(entries).as("__e"))
      .select(col("__e.col_name").as("col_name"), col("n_rows"),
        col("__e.n_nulls").as("n_nulls"),
        col("__e.n_distinct").as("n_distinct"),
        col("__e.min_s").as("min_s"), col("__e.max_s").as("max_s"))
  }

  /** Key-skew diagnostic for a prospective shuffle/join key: the per-key
    * count distribution plus the heaviest key. One row out:
    * (n_rows, n_keys, max_count, p50_count, p99_count, top_key,
    * skew_ratio), where skew_ratio = max_count / mean_count (1.0 ⇔
    * perfectly uniform; the factor by which the hottest partition-key
    * exceeds the average — the number that predicts stragglers).
    *
    * Quantiles of the count distribution are EXACT inverse-CDF picks
    * (smallest count whose cumulative key-fraction ≥ p) computed over
    * the count-of-counts histogram with integer threshold comparisons
    * (`2·cum ≥ n_keys`, `100·cum ≥ 99·n_keys`) — no interpolation, no
    * doubles, no percentile-buffer that would hold all n_keys values in
    * one aggregator. `top_key` ties break by max of the stringified key.
    *
    * Scale posture: ONE data-scale shuffle (the per-key count), then a
    * `localCheckpoint` so the three scalar consumers (stats, histogram,
    * top-key probe) read the materialized counts instead of re-paying
    * the shuffle. The histogram's running sum rides the same two-pass
    * bucketed prefix sum as `Search.vocabGrowth` — count-of-counts rows
    * are few in practice but are NOT assumed small. Everything after
    * the checkpoint is key-cardinality-sized or scalar.
    */
  def skewReport(df: DataFrame, keyCols: Seq[String],
                 bucketWidth: Long = 1024): DataFrame = {
    require(keyCols.nonEmpty, "skewReport needs at least one key column")
    require(bucketWidth > 0, "bucketWidth must be positive")
    // NULL key components stringify to a sentinel: concat_ws SKIPS null
    // args, which would collapse (NULL,"a") / ("a",NULL) / ("a") to the
    // same reported label (grouping itself is on the real columns and
    // unaffected). "␀" collides only with a literal value "␀" — documented.
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(concat_ws("|",
        keyCols.map(c => coalesce(col(c).cast("string"), lit("␀"))): _*).as("key"),
        col("cnt"))
      .localCheckpoint()
    val stats = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("max_count"))
    val cc = counts.groupBy("cnt").agg(count(lit(1)).as("__freq"))
      .withColumn("__bk", expr(s"cnt div ${bucketWidth}L"))
    val perBucket = cc.groupBy("__bk").agg(sum(col("__freq")).as("__bsum"))
    val wB = org.apache.spark.sql.expressions.Window.orderBy(col("__bk"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val offsets = perBucket
      .withColumn("__off", sum(col("__bsum")).over(wB) - col("__bsum"))
      .select(col("__bk"), col("__off"))
    val wIn = org.apache.spark.sql.expressions.Window.partitionBy(col("__bk"))
      .orderBy(col("cnt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cw = cc.join(broadcast(offsets), Seq("__bk"))
      .withColumn("__cum", sum(col("__freq")).over(wIn) + col("__off"))
      .crossJoin(broadcast(stats.select(col("n_keys").as("__nk"))))
    val p50 = cw.filter(col("__cum") * 2 >= col("__nk"))
      .agg(min(col("cnt")).as("p50_count"))
    val p99 = cw.filter(col("__cum") * 100 >= col("__nk") * 99)
      .agg(min(col("cnt")).as("p99_count"))
    val top = counts
      .crossJoin(broadcast(stats.select(col("max_count").as("__mx"))))
      .filter(col("cnt") === col("__mx"))
      .agg(max(col("key")).as("top_key"))
    stats.crossJoin(broadcast(p50)).crossJoin(broadcast(p99))
      .crossJoin(broadcast(top))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        col("p50_count"), col("p99_count"), col("top_key"),
        (col("max_count").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double")).as("skew_ratio"))
  }

  /** Corpus-composition concentration over a categorical column
    * (Herfindahl–Hirschman index):
    * {{{ hhi = Σ c_i² / N²  ∈ (0, 1] }}}
    * (1 ⇔ one category owns everything; 1/k ⇔ k equal categories) plus
    * the dominant category. The monitoring number for "is this corpus
    * quietly becoming one source". Output: one row
    * (n_rows, n_groups, top_group, top_count, hhi); `top_group` ties
    * break by max of the stringified value. Nulls are excluded.
    *
    * Σ c² runs in DECIMAL(38,0) — factors route through
    * [[graft.analytics.Drift.decCap]] (exact below 10^18 rows per
    * category, fail-loud past it), and decimal sums are exact and
    * order-independent — with the single double division at the end
    * (same discipline as [[graft.analytics.Drift.tvDistance]]).
    * One data-scale shuffle (the category count), checkpointed for its
    * two scalar consumers.
    */
  /** Benford first-significant-digit audit of a positive money-like
    * column — the classic fabricated-data / unit-mixup screen (natural
    * multiplicative amounts follow P(d) = log₁₀(1 + 1/d); flat or
    * spiked first-digit histograms flag synthetic or corrupted feeds).
    * Output: 9 rows (digit, n_obs, obs_ppm, benford_ppm, dev_ppm) in
    * digit order, proportions in integer parts-per-million.
    *
    * The first digit is extracted from the exact integer cents
    * (`round(x·100)` as long, the repo's money convention) via the
    * integer's decimal string — NOT `floor(x / 10^⌊log₁₀x⌋)`, whose
    * transcendental log misclassifies exact powers of ten when log₁₀
    * lands a last-ulp low. String heads of integers are exact in every
    * engine. One map-side-combinable aggregation on a 9-value key; the
    * expected-law constants are per-digit literals-by-construction
    * (round(log₁₀(1+1/d)·1e6) over d = 1..9 — computed once on the
    * driver, not per row).
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val law = (1 to 9).map(d =>
      (d.toLong, math.round(math.log10(1.0 + 1.0 / d) * 1e6)))
      .toDF("digit", "benford_ppm")
    val cents = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(round(col(valueCol) * 100, 0).cast("long").as("__c"))
    val obs = cents
      .select(substring(col("__c").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val total = obs.agg(sum(col("n_obs")).as("__n"))
    obs.join(broadcast(law), Seq("digit"), "right")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(total))
      .withColumn("obs_ppm",
        round(col("n_obs").cast("double") * 1e6 / col("__n").cast("double"))
          .cast("long"))
      .select(col("digit"), col("n_obs"), col("obs_ppm"), col("benford_ppm"),
        (col("obs_ppm") - col("benford_ppm")).as("dev_ppm"))
      .orderBy(col("digit"))
  }

  def concentration(df: DataFrame, catCol: String): DataFrame = {
    val counts = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val sq = graft.analytics.Drift.decCap(col("__c"))
    val stats = counts.agg(sum(col("__c")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      max(col("__c")).as("top_count"),
      sum(sq * sq).as("__sumsq"))
    val top = counts
      .crossJoin(broadcast(stats.select(col("top_count").as("__mx"))))
      .filter(col("__c") === col("__mx"))
      .agg(max(col("__g")).as("top_group"))
    stats.crossJoin(broadcast(top))
      .select(col("n_rows"), col("n_groups"), col("top_group"), col("top_count"),
        (col("__sumsq").cast("double") /
          (col("n_rows").cast("double") * col("n_rows").cast("double"))).as("hhi"))
  }
}
