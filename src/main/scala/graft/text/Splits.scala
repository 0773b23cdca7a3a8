package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit`/`sample` depend on partition layout and seed plumbing —
  * rerun the job with different parallelism and rows migrate between
  * train and test. Here the split is a pure function of a key: md5 of
  * the key → 32-bit bucket → threshold ranges. Same row, same split, on
  * any cluster, forever; adding data never reshuffles existing
  * assignments (the property that keeps eval sets stable as a corpus
  * grows).
  *
  * Leakage control: key on the unit that must not straddle splits — the
  * document id for row-level splits, the source/site/author for
  * group-cohesive splits (every row of a group lands in one split).
  *
  * Scale: one projection pass, no shuffle, no state.
  */
object Splits {

  val Buckets = 10000

  /** Stable bucket in [0, Buckets) from any key column. */
  def bucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Deterministic sample at `fraction`, a pure function of the key —
    * the reproducible replacement for `df.sample` (stable under
    * reruns, partitioning, and corpus growth). */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(bucket(col(keyCol)) < (fraction * Buckets).round)

  /** Stratified deterministic sampling: a different rate per stratum —
    * the mixture-construction op (e.g. downsample web text to 10%, keep
    * books at 100%) expressed as one filter, no shuffle. Strata absent
    * from `rates` are dropped. */
  /** Temporal train/test split with an EMBARGO gap — the time-series
    * leakage control the hash splits above cannot express: test = the
    * trailing `holdoutDays` (anchored at the column's max date, the P4
    * deterministic-anchor discipline), train = everything at least
    * `embargoDays` older than the test boundary, and the rows in
    * between are labeled `embargo` and belong to NEITHER side — lagged
    * or windowed features computed on train rows otherwise peek across
    * the boundary into test time.
    *
    * Pure function of (row date, corpus max date): deterministic on any
    * layout; the anchor rides a broadcast 1-row frame; one projection
    * pass otherwise. Empty input yields an empty frame.
    */
  def temporalEmbargoSplit(df: DataFrame, dateCol: String,
                           holdoutDays: Int, embargoDays: Int): DataFrame = {
    require(holdoutDays >= 1, s"holdoutDays must be >= 1, got $holdoutDays")
    require(embargoDays >= 0, s"embargoDays must be >= 0, got $embargoDays")
    val anchor = df.agg(max(col(dateCol).cast("date")).as("__max_d"))
    df.crossJoin(broadcast(anchor))
      .withColumn("split",
        when(col(dateCol).cast("date").isNull,
          raise_error(lit("temporalEmbargoSplit: null date — a row " +
            "without a date has no place on the timeline; filter or " +
            "impute first")))
          .when(col(dateCol).cast("date") >
            date_sub(col("__max_d"), holdoutDays), lit("test"))
          .when(col(dateCol).cast("date") <=
            date_sub(col("__max_d"), holdoutDays + embargoDays), lit("train"))
          .otherwise(lit("embargo")))
      .drop("__max_d")
  }

  def sampleStratified(df: DataFrame, strataCol: String, keyCol: String,
                       rates: Map[String, Double]): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket(col(keyCol)) < round(rate * Buckets).cast("long"))
  }

  /** Temperature-rebalanced mixture sampling: the multilingual-corpus
    * rebalancing rule (sample stratum l at rate ∝ (n_l / n_max)^α) that
    * upweights low-resource strata as α → 0 while keeping the largest
    * stratum at rate 1. Counts are a one-pass aggregate broadcast back
    * onto the corpus; the kept-row decision stays the pure md5-bucket
    * function (stable under reruns and corpus growth between recounts).
    *
    * α is fixed at 0.5 because sqrt is CORRECTLY ROUNDED under IEEE 754 —
    * the rate, and therefore every keep/drop decision, is bit-identical
    * on any engine (an arbitrary pow(x, α) carries cross-libm ulp risk an
    * oracle comparison cannot tolerate).
    */
  def sampleTemperatureHalf(df: DataFrame, strataCol: String, keyCol: String): DataFrame = {
    // checkpointed so the corpus is scanned ONCE for the counts — the
    // max-rate derivation reads the materialized (tiny) frame, not a
    // second full aggregation of df
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val withMax = counts.crossJoin(
      broadcast(counts.agg(max(col("__n")).as("__nmax"))))
      .select(col(strataCol),
        sqrt(col("__n").cast("double") / col("__nmax")).as("__rate"))
    df.join(broadcast(withMax), Seq(strataCol))
      .filter(bucket(col(keyCol)) < round(col("__rate") * Buckets).cast("long"))
      .drop("__rate")
  }

  /** Approximate token-budget packing: assign documents to packs of
    * ~`budget` total weight (tokens/chars) — training-batch construction.
    * Docs are spread across `buckets` hash buckets (bounding any single
    * task's window) and packed within a bucket by a running-sum window in
    * deterministic id order: pack = floor(weight-before-me / budget).
    * Packs can overshoot by at most one document — the standard
    * approximation that keeps packing a single parallel window pass
    * instead of a sequential fill.
    */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
                   budget: Long, buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("pack_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("pack_bucket", bucket(col(idCol)) % buckets)
      .withColumn("__before", coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__before") / budget))
      .drop("__before")
  }

  /** Deterministic per-group exemplars: the `k` rows of each group a
    * human (or a downstream eval) should look at, chosen as a pure
    * function of the key — rank by (md5-bucket(key), key) within the
    * group, keep rank ≤ k. Stable across reruns, partitioning, and
    * corpus growth within a group's unchanged members (the same property
    * [[sampleByKey]] gives global samples), unlike `df.sample` or a
    * timestamp-ordered head. Output: input columns + `exemplar_rank`.
    *
    * `keyCol` must uniquely identify rows WITHIN each group — it is the
    * total tie-break. A duplicated key ties the window order, and which
    * physical row (with its payload columns) survives the rank filter
    * becomes partition-layout-dependent, voiding the stability contract.
    *
    * Scale posture: one shuffle on the group key. The rank-≤-k filter is
    * the form Catalyst rewrites with WindowGroupLimit: each map task
    * keeps only its local top-k per group BEFORE the exchange, so the
    * shuffle carries O(k · groups-per-task), not whole groups — the
    * declarative window IS the two-phase top-k at scale.
    */
  def exemplars(df: DataFrame, groupCols: Seq[String], keyCol: String,
                k: Int): DataFrame = {
    require(groupCols.nonEmpty, "exemplars needs at least one group column")
    require(k >= 1, "k must be at least 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(bucket(col(keyCol)), col(keyCol))
    df.withColumn("exemplar_rank", row_number().over(w))
      .filter(col("exemplar_rank") <= k)
  }

  /** Downsample a corpus to a target category mixture — the pretraining
    * mixture-rebalance step ("50% web, 30% code, 20% papers"), without
    * upsampling: the output is the LARGEST corpus achievable under the
    * target shares, i.e. scale = min_s(count_s / w_s) rows overall and
    * ≈ floor(scale·w_s) rows per category, selected deterministically by
    * the md5-bucket rule (stable across reruns, partitioning, and corpus
    * growth — the [[sampleByKey]] property, per category). Categories
    * not in `targets` are dropped; every target category must exist in
    * the corpus (absent ⇒ the requested mixture is unsatisfiable —
    * fails loudly rather than silently renormalizing).
    *
    * Per-category kept counts are bucket-approximate (within
    * ~count/[[Buckets]] of the exact desired size, hash-uniform) — the
    * standard trade for a sample that is a pure function of the key.
    * The threshold arithmetic is a fixed chain of correctly-rounded
    * double ops (divide, min, floor, round) reproducible on any engine.
    *
    * Scale posture: one shuffle for the per-category counts
    * (checkpointed, category-cardinality rows), then one broadcast-join
    * filter pass over the corpus — no second corpus shuffle.
    */
  def rebalanceMixture(df: DataFrame, catCol: String, keyCol: String,
                       targets: Seq[(String, Double)]): DataFrame =
    applyMixture(df, catCol, keyCol, mixtureThresholds(df, catCol, targets))

  /** The planning half of [[rebalanceMixture]]: per-category corpus
    * counts and the derived bucket thresholds, checkpointed (one corpus
    * shuffle). Exposed so a caller that ALSO needs the before-counts
    * (e.g. a rebalance summary) reads this frame instead of re-scanning
    * the corpus. Output: (category, n_before, bucket_threshold).
    */
  def mixtureThresholds(df: DataFrame, catCol: String,
                        targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty, "rebalanceMixture needs at least one target")
    require(targets.forall(_._2 > 0), "target weights must be positive")
    require(targets.map(_._1).distinct.size == targets.size, "duplicate target labels")
    require(targets.map(_._2).sum <= 1.0 + 1e-9, "target weights must sum to <= 1")
    val counts = df.filter(col(catCol).isin(targets.map(_._1): _*))
      .groupBy(col(catCol).cast("string").as("category"))
      .agg(count(lit(1)).as("n_before"))
      .localCheckpoint()
    val present = counts.count()
    require(present == targets.size,
      s"mixture unsatisfiable: only $present of ${targets.size} target categories present")
    val t = df.sparkSession.createDataFrame(targets).toDF("category", "__w")
    val scaled = counts.join(broadcast(t), Seq("category"))
      .withColumn("__cap", col("n_before").cast("double") / col("__w"))
    val scale = scaled.agg(min(col("__cap")).as("__scale"))
    scaled.crossJoin(broadcast(scale))
      .withColumn("__desired", floor(col("__scale") * col("__w")))
      .withColumn("bucket_threshold",
        round(col("__desired").cast("double") / col("n_before") * Buckets, 0).cast("long"))
      .select(col("category"), col("n_before"), col("bucket_threshold"))
  }

  /** The execution half of [[rebalanceMixture]]: one broadcast-join
    * filter pass keeping rows whose md5 bucket clears their category's
    * threshold. Categories absent from `thresholds` are dropped.
    */
  def applyMixture(df: DataFrame, catCol: String, keyCol: String,
                   thresholds: DataFrame): DataFrame =
    df.join(broadcast(thresholds.select(col("category"), col("bucket_threshold"))),
        col(catCol).cast("string") === col("category"))
      .filter(bucket(col(keyCol)) < col("bucket_threshold"))
      .drop("category", "bucket_threshold")

  /** Leakage-proof split assignment: like [[assign]], but documents in
    * the same duplicate cluster NEVER straddle splits — a near-dup of a
    * test document sitting in train is exactly the eval-contamination
    * q93/q99 hunt for, and plain per-key splitting plants it. The split
    * is keyed on the cluster representative (`cluster_id` from
    * [[graft.text.Dedup.duplicateClusters]], i.e. the cluster's min
    * label; unclustered docs represent themselves), exposed as
    * `split_key` beside the `split` label.
    *
    * Scale posture: one equi-join of the corpus keys against the cluster
    * table (cluster rows ≪ corpus — only docs with a near-dup; AQE
    * broadcasts while small), then the same projection-only bucket rule
    * as [[assign]]. Composes with any clustering that yields
    * (`clusterKeyCol`, cluster_id) — the default matches
    * [[graft.text.Dedup.duplicateClusters]]'s output.
    */
  def assignLeakProof(df: DataFrame, keyCol: String, clusters: DataFrame,
                      fractions: Seq[(String, Double)] =
                        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                      clusterKeyCol: String = "doc_id"): DataFrame = {
    require(df.columns.contains(keyCol), s"unknown key column $keyCol")
    require(clusters.columns.contains(clusterKeyCol) &&
        clusters.columns.contains("cluster_id"),
      s"clusters must carry ($clusterKeyCol, cluster_id); got " +
        clusters.columns.mkString(", "))
    val c = clusters.select(col(clusterKeyCol).as(keyCol), col("cluster_id"))
    val withRep = df.join(c, Seq(keyCol), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col(keyCol)))
      .drop("cluster_id")
    assign(withRep, "split_key", fractions)
  }

  /** Leakage-aware k-fold cross-validation assignment: every row's fold
    * is `bucket(split_key) % k`, where split_key is its near-dup-cluster
    * representative (so a duplicate cluster can never straddle folds —
    * the same leakage contract as [[assignLeakProof]], which this is
    * the k-way generalization of) or the row key when unclustered.
    * Folds are a pure function of content keys: stable under reruns,
    * partitioning, and corpus growth, and exactly replayable by an
    * oracle. Uniformity is md5-bucket uniformity modulo k (off by at
    * most 1/Buckets per fold when k ∤ Buckets — negligible and, unlike
    * a random split, reproducible).
    *
    * Scale: one left join against the (small) cluster map — broadcast
    * while it fits — then a projection; no shuffle of the corpus. */
  def kFold(df: DataFrame, keyCol: String, clusters: DataFrame, k: Int,
            clusterKeyCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(df.columns.contains(keyCol), s"unknown key column $keyCol")
    require(clusters.columns.contains(clusterKeyCol) &&
        clusters.columns.contains("cluster_id"),
      s"clusters must carry ($clusterKeyCol, cluster_id); got " +
        clusters.columns.mkString(", "))
    val c = clusters.select(col(clusterKeyCol).as(keyCol), col("cluster_id"))
    df.join(c, Seq(keyCol), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col(keyCol)))
      .drop("cluster_id")
      .withColumn("fold", bucket(col("split_key")) % k)
  }

  /** Assign a split label per row. `fractions` are (label, weight) in
    * priority order and should sum to ≤ 1; leftover buckets take the
    * last label. */
  /** Water-filling token-budget allocation across sources: give every
    * source its full count if the total fits the budget; otherwise cap
    * every source at the unique threshold `t` where
    * `Σ min(cnt_i, t) = budget` — small sources keep everything, large
    * sources are truncated to the same ceiling. This is the standard
    * max-min-fair mixture plan for "fit B tokens, don't let one crawl
    * dominate" (the continuous analogue of [[rebalanceMixture]]'s
    * per-category caps, solved exactly instead of per-category).
    *
    * All integer: the threshold is the floor solution, and the residual
    * `budget − Σ min(cnt_i, t)` (< number of capped sources) is handed
    * out as +1 to the first capped sources in (cnt, key) order, so
    * `Σ alloc = budget` EXACTLY whenever `Σ cnt ≥ budget` — an
    * assertable contract, replayed identically by the oracle.
    *
    * Scale posture: operates on the per-source count table — metadata
    * scale by construction (|sources| ≪ rows), so the single-partition
    * windows here are over |sources| rows; the heavy work (producing
    * `counts`) is the caller's one aggregate over the corpus.
    */
  def waterfill(counts: DataFrame, keyCol: String, cntCol: String,
                budget: Column): DataFrame = {
    // `budget` may reference the scalars `tot` (Σ counts) and `nsrc`
    // (source count) — e.g. expr("(tot * 6) div 10") for a 60% budget —
    // or be a plain literal; it must be non-negative (fail-loud below)
    val w = Window.partitionBy(lit(0)).orderBy(col("cnt"), col("key"))
    val ordered = counts
      .select(col(keyCol).cast("string").as("key"),
        when(col(cntCol).cast("long") < 0,
          raise_error(concat(lit("waterfill: negative count for key "), col(keyCol))))
          .otherwise(col(cntCol).cast("long")).as("cnt"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("p", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(
        counts.agg(count(lit(1)).cast("long").as("nsrc"),
            sum(col(cntCol).cast("long")).as("tot"))
          .withColumn("budget", budget.cast("long"))))
    // first capped rank: smallest i where capping AT cnt_i already
    // overshoots the budget; null ⇒ everything fits uncapped
    val istar = ordered
      .filter(col("p") - col("cnt") + col("cnt") * (col("nsrc") - col("i") + 1L) > col("budget"))
      .agg(min(col("i")).as("istar"), min(col("p") - col("cnt")).as("pbelow"))
    ordered.crossJoin(broadcast(istar))
      .withColumn("t",
        when(col("budget") < 0,
          raise_error(concat(lit("waterfill: negative budget "), col("budget"))))
          .when(col("istar").isNull, lit(null))
          .otherwise(expr("(budget - pbelow) div (nsrc - istar + 1)")))
      .withColumn("leftover",
        when(col("istar").isNull, lit(0L))
          .otherwise(col("budget") - col("pbelow") - col("t") * (col("nsrc") - col("istar") + 1L)))
      .withColumn("alloc",
        when(col("istar").isNull || col("i") < col("istar"), col("cnt"))
          .otherwise(col("t") +
            when(col("i") < col("istar") + col("leftover"), 1L).otherwise(0L)))
      .withColumn("capped", col("istar").isNotNull && col("i") >= col("istar"))
      .select(col("key").as(keyCol), col("cnt"), col("alloc"), col("capped"))
  }

  /** Length-bucketed batching profile — the padding-efficiency planner
    * for fixed-shape training batches: each document is assigned the
    * smallest bucket cap from `caps` that holds its token count
    * ([[Dedup.tokens]] normalization, the shared tokenizer), documents
    * longer than the top cap are TRUNCATED to it (the real training
    * semantics of a max context length, counted explicitly rather than
    * hidden), and each bucket reports its doc count, truncation count,
    * kept-token total, padded-token total (`n_docs · cap`), and
    * `efficiency_micro = kept·10⁶ div padded` — the fraction of batch
    * compute that lands on real tokens. Bucket choice IS the knob: a
    * coarse ladder wastes compute as padding, a fine ladder shrinks
    * per-bucket batch pools; this profile is the data for that trade.
    *
    * Determinism: the cap ladder is an explicit foldRight CASE chain
    * (no log2 floats at power-of-two boundaries); all divisions are
    * nonnegative integer `div`s. Scale posture: one narrow pass to
    * (cap, tokens) then a map-side-combinable groupBy on ≤ |caps| keys
    * — no data-sized shuffle, no window.
    */
  def lengthBuckets(docs: DataFrame,
                    caps: Seq[Long] = Seq(16L, 32L, 64L, 128L, 256L, 512L,
                      1024L, 2048L, 4096L),
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(caps.nonEmpty && caps == caps.sorted && caps.distinct == caps,
      s"caps must be a strictly ascending non-empty ladder, got $caps")
    val top = caps.last
    val t = docs.select(size(Dedup.tokens(col(textCol))).cast("long").as("tokens"))
    val capCol = caps.init.foldRight(lit(top): Column) {
      case (cap, acc) => when(col("tokens") <= cap, lit(cap)).otherwise(acc)
    }
    t.select(capCol.as("bucket_cap"), col("tokens"),
        least(col("tokens"), lit(top)).as("kept"))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("tokens") > top, 1L).otherwise(0L)).as("n_truncated"),
        sum(col("kept")).as("kept_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket_cap"))
      .withColumn("efficiency_micro",
        expr("(kept_tokens * 1000000) div padded_tokens"))
      .orderBy(col("bucket_cap"))
  }

  /** Deterministic global training order — the epoch-shuffle
    * materializer: every row gets a dense 1-based `pos` in the order of
    * a keyed hash (md5-derived 60-bit value, tie-break on the key), so
    * the "shuffled" training sequence is a pure function of the corpus —
    * the same order on any cluster, resumable mid-epoch at any offset,
    * and replayable by the oracle (`randomSplit`/`orderBy(rand())` are
    * neither).
    *
    * Scale posture: a global `row_number` is a single-partition window —
    * the classic scale-killer — so enumeration is the bucketed TWO-PASS
    * pattern ([[graft.text.Search.vocabGrowth]]'s shape, proven in
    * q152's quantiles): the hash's top bits form `nBuckets` contiguous
    * ranges, per-bucket counts (one tiny agg) turn into broadcast
    * offsets via a window over nBuckets ROWS, and each bucket numbers
    * its own rows independently — `pos = offset + rank-within-bucket`.
    * No data-sized window, no skew (hash buckets are uniform by
    * construction).
    */
  def trainingOrder(df: DataFrame, keyCol: String,
                    nBuckets: Int = 256): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 65536 &&
      (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two in [2, 65536], got $nBuckets")
    val shift = 60 - Integer.numberOfTrailingZeros(nBuckets)
    val t = df.select(col(keyCol),
        conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
          .cast("long").as("__h"))
      .withColumn("__b", shiftright(col("__h"), shift))
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = t.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", sum(col("__c")).over(w) - col("__c"))
      .select(col("__b"), col("__off"))
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col("__h"), col(keyCol))
    t.join(broadcast(offsets), Seq("__b"))
      .withColumn("pos", (row_number().over(inBucket) + col("__off")).cast("long"))
      .select(col(keyCol), col("pos"))
  }

  def assign(df: DataFrame, keyCol: String,
             fractions: Seq[(String, Double)] =
               Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9)
    val cum = fractions.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val thresholds = fractions.map(_._1).zip(cum.map(c => (c * Buckets).round))
    val b = bucket(col(keyCol))
    val label = thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((name, upper), acc) => when(b < upper, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }
}
