package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch aggregations with ENVELOPE columns derived from their accuracy
  * knobs — the pattern that lets a DuckDB oracle gate an approximate
  * operator: the query returns the exact value plus a boolean "the
  * sketch landed inside its guaranteed band", and the oracle asserts the
  * boolean is literally TRUE. Tuning a knob re-derives the band, so the
  * gate stays valid for any setting (VERDICT r4 next-round #7); a
  * hard-coded band would silently turn into a wrong gate the day someone
  * loosens the sketch.
  *
  * Scale posture: both sketches are mergeable constant-memory partials
  * (HLL++ registers; Greenwald–Khanna summaries), which is the entire
  * reason they replace their exact forms at 100 TB — see q42/q43/q47.
  */
object Sketches {

  /** Per-group exact distinct count plus `within_env`: whether
    * `approx_count_distinct(keyCol, rsd)` landed within `sigmas · rsd`
    * relative error of exact. HLL++'s error is near-Gaussian with
    * standard deviation `rsd`, so the default 5σ band false-alarms at
    * ~3·10⁻⁷ per group while still catching an implementation
    * regression of ANY practical size.
    */
  def distinctEnvelope(df: DataFrame, groupCol: String, keyCol: String,
                       rsd: Double = 0.01, sigmas: Double = 5.0): DataFrame = {
    def exact = countDistinct(col(keyCol))
    df.groupBy(col(groupCol))
      .agg(exact.as("exact_distinct"),
        // exact = 0 (an all-null group) needs its own branch: 0/0 is NaN
        // and would false-alarm; both counts ignore nulls, so 0 vs 0 is
        // inside any band by definition
        when(exact === 0, lit(true)).otherwise(
          abs(approx_count_distinct(col(keyCol), rsd) - exact).cast("double") / exact
            <= sigmas * rsd).as("within_env"))
  }

  /** Per-group exact percentiles plus, for each requested quantile q, a
    * `p<q>_in_env` boolean: whether `approx_percentile(valCol, q,
    * accuracy)` lies between the exact `percentile(q ± slackRanks /
    * accuracy)` band (clamped to [0, 1]). GK's guarantee is HARD — rank
    * error ≤ N/accuracy — so `slackRanks ≥ 1` can never false-alarm by
    * the bound itself; the default 50 mirrors the generous ±5% band the
    * envelope shipped with at accuracy = 1000 and absorbs
    * interpolation-vs-element differences on small groups.
    */
  /** Exact heavy-hitter set plus the [[graft.functions.MisraGries]]
    * envelope: the items whose true frequency exceeds n/(k+1) — exactly
    * the set the sketch GUARANTEES to contain — each with two pinned
    * booleans the oracle asserts literally TRUE:
    *
    *   - `in_sketch`: the guaranteed-present item is in the summary;
    *   - `est_within_band`: est ≤ true and (true − est)·(k+1) ≤ n —
    *     the hard deterministic deficit bound, checked in INTEGER
    *     arithmetic (no float n/(k+1) edge).
    *
    * Unlike the HLL/GK envelopes this one has zero false-alarm
    * probability: Misra–Gries' bound is combinatorial, so a single
    * `false` is an implementation bug, full stop.
    */
  def heavyHittersEnvelope(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val sk = df.agg(
      graft.functions.misra_gries(col(itemCol), k).as("mg"),
      count(col(itemCol)).as("n"))
    val ests = sk.select(explode(col("mg")).as(Seq("item", "est")))
    df.where(col(itemCol).isNotNull) // MG and n both skip nulls
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("true_count"))
      .crossJoin(broadcast(sk.select(col("n"))))
      .where(col("true_count") * (k + 1) > col("n"))
      .join(broadcast(ests), Seq("item"), "left")
      .select(col("item"), col("true_count"),
        col("est").isNotNull.as("in_sketch"),
        (col("est") <= col("true_count") &&
          (col("true_count") - col("est")) * (k + 1) <= col("n"))
          .as("est_within_band"))
  }

  /** Pairwise audience overlap from PER-SEGMENT HLL sketches — sketch
    * algebra, the payoff of a stored sketch table
    * ([[graft.functions.HllSketch]]): |A∩B| estimated by
    * inclusion–exclusion `est(A) + est(B) − est(A∪B)`, where the union
    * sketch is one register-wise max — NO rescan, NO pairwise key join.
    * The exact overlap (computed here for the gate; at 100 TB you'd
    * skip it — that's the point) rides a distinct-pair self-join.
    *
    * Envelope: each of the three estimates carries ~1.04/√m relative
    * error on ITS OWN cardinality, so the intersection's absolute error
    * is bounded (to first order) by σ·(|A| + |B| + |A∪B|)·1.04/√m; the
    * default 5σ band makes a false alarm vanishingly unlikely while a
    * broken merge (the failure this guards) blows through it instantly.
    *
    * Output: one row per unordered segment pair (seg_a < seg_b):
    * (seg_a, seg_b, exact_overlap, within_env).
    */
  def overlapEnvelope(df: DataFrame, segCol: String, keyCol: String,
                      p: Int = 12, sigmas: Double = 5.0): DataFrame = {
    import graft.functions.{hll_count, hll_sketch}
    val rsd = 1.04 / math.sqrt((1L << p).toDouble)
    val sketches = df.groupBy(col(segCol).as("seg"))
      .agg(hll_sketch(col(keyCol), p).as("sk"),
        countDistinct(col(keyCol)).as("exact_n"))
      .localCheckpoint() // tiny (segment cardinality); read 3× below
    val a = sketches.select(col("seg").as("seg_a"), col("sk").as("sk_a"),
      col("exact_n").as("n_a"))
    val b = sketches.select(col("seg").as("seg_b"), col("sk").as("sk_b"),
      col("exact_n").as("n_b"))
    val pairs = a.join(b, col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        hll_count(col("sk_a")).as("est_a"), hll_count(col("sk_b")).as("est_b"),
        hll_count(graft.functions.hll_merge2(col("sk_a"), col("sk_b")))
          .as("est_ab"))
    // exact distinct-pair overlap for the gate
    val keys = df.select(col(segCol).as("seg"), col(keyCol).as("k")).distinct()
    val exact = keys.select(col("seg").as("seg_a"), col("k"))
      .join(keys.select(col("seg").as("seg_b"), col("k")), Seq("k"))
      .filter(col("seg_a") < col("seg_b"))
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    pairs.join(exact, Seq("seg_a", "seg_b"), "left")
      .na.fill(0L, Seq("exact_overlap"))
      .select(col("seg_a"), col("seg_b"), col("exact_overlap"),
        (abs(col("est_a") + col("est_b") - col("est_ab") - col("exact_overlap"))
          .cast("double")
          <= lit(sigmas * rsd) *
            (col("n_a") + col("n_b") + col("est_ab")).cast("double"))
          .as("within_env"))
  }

  /** Pairwise set algebra from PER-SEGMENT KMV sketches
    * ([[graft.functions.KmvSketch]]) — the operation q194's HLL
    * inclusion–exclusion can't do well: |A∩B| and |A∖B| answered
    * DIRECTLY from the stored hash samples, with error that shrinks
    * with k (RSE ≈ 1/√(k−2) per estimate) instead of riding the union
    * size. At 100 TB the per-segment sketches are a tiny stored table
    * and every pairwise audience question is sketch-only — the exact
    * values computed here exist only for the gate.
    *
    * Three pinned contracts per unordered pair (seg_a < seg_b):
    *
    *   - `int_in_env`:  |est∩ − exact∩| ≤ σ·|A∪B|/√k  (sampling error
    *     of a k-sample of the union, θ-estimation term absorbed);
    *   - `diff_in_env`: same band for |A∖B|;
    *   - `merge_identity` (constant column): the fold of per-segment
    *     sketches via kmv_merge2 is BIT-FOR-BIT equal to one sketch
    *     built over all rows — keep-k-smallest-distinct is an
    *     idempotent semilattice, so merge shape and replays cannot
    *     change the bytes. A broken offer/trim shows up here first.
    */
  def kmvSetOpsEnvelope(df: DataFrame, segCol: String, keyCol: String,
                        k: Int = 512, sigmas: Double = 5.0): DataFrame = {
    import graft.functions.{kmv_difference, kmv_intersect, kmv_merge2, kmv_sketch}
    val sketches = df.groupBy(col(segCol).as("seg"))
      .agg(kmv_sketch(col(keyCol), k).as("sk"),
        countDistinct(col(keyCol)).as("exact_n"))
      .localCheckpoint() // tiny (segment cardinality); read 3× below
    val emptyBlob = graft.functions.KmvSketch.empty(k)
    val identity = sketches.agg(collect_list(col("sk")).as("sks"))
      .crossJoin(df.agg(kmv_sketch(col(keyCol), k).as("sk_all")))
      .select((aggregate(col("sks"), lit(emptyBlob),
        (acc, x) => kmv_merge2(acc, x)) === col("sk_all")).as("merge_identity"))
    val a = sketches.select(col("seg").as("seg_a"), col("sk").as("sk_a"),
      col("exact_n").as("n_a"))
    val b = sketches.select(col("seg").as("seg_b"), col("sk").as("sk_b"),
      col("exact_n").as("n_b"))
    val ests = a.join(b, col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        kmv_intersect(col("sk_a"), col("sk_b")).as("est_int"),
        kmv_difference(col("sk_a"), col("sk_b")).as("est_diff"))
    val keys = df.where(col(keyCol).isNotNull)
      .select(col(segCol).as("seg"), col(keyCol).as("key")).distinct()
    val exact = keys.select(col("seg").as("seg_a"), col("key"))
      .join(keys.select(col("seg").as("seg_b"), col("key")), Seq("key"))
      .filter(col("seg_a") < col("seg_b"))
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    val band = lit(sigmas / math.sqrt(k.toDouble))
    val exactUnion = (col("n_a") + col("n_b") - col("exact_overlap")).cast("double")
    ests.join(exact, Seq("seg_a", "seg_b"), "left")
      .na.fill(0L, Seq("exact_overlap"))
      .select(col("seg_a"), col("seg_b"), col("exact_overlap"),
        (col("n_a") - col("exact_overlap")).as("exact_only_a"),
        (abs(col("est_int") - col("exact_overlap")).cast("double")
          <= band * exactUnion + lit(sigmas)).as("int_in_env"),
        (abs(col("est_diff") - (col("n_a") - col("exact_overlap"))).cast("double")
          <= band * exactUnion + lit(sigmas)).as("diff_in_env"))
      .crossJoin(broadcast(identity))
  }

  def percentileEnvelope(df: DataFrame, groupCol: String, valCol: String,
                         qs: Seq[Double], accuracy: Int = 1000,
                         slackRanks: Double = 50.0): DataFrame = {
    require(qs.nonEmpty, "at least one quantile")
    val tags = qs.map(q => math.round(q * 100))
    require(tags.distinct.size == tags.size,
      s"quantiles collide on their p<q> column tags (rounded to whole percents): " +
        s"${qs.mkString(", ")} — space them, or extend the tag scheme")
    val eps = slackRanks / accuracy
    val aggs = qs.flatMap { q =>
      val lo = math.max(q - eps, 0.0)
      val hi = math.min(q + eps, 1.0)
      val tag = math.round(q * 100)
      // all-null group: percentile/approx_percentile both return NULL and
      // BETWEEN propagates it, which would surface as a confusing NULL
      // in_env instead of the vacuous-true distinctEnvelope's exact==0
      // branch emits — mirror that branch (both aggregates ignore nulls,
      // so NULL-vs-NULL is inside any band by definition)
      Seq(round(expr(s"percentile(`$valCol`, $q)"), 4).as(s"p${tag}_exact"),
        when(count(col(valCol)) === 0, lit(true)).otherwise(
          expr(s"approx_percentile(`$valCol`, $q, $accuracy)")
            .between(expr(s"percentile(`$valCol`, $lo)"),
              expr(s"percentile(`$valCol`, $hi)")))
          .as(s"p${tag}_in_env"))
    }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
