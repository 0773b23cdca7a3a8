package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT order statistics without a global sort — the 100 TB replacement
  * for `ORDER BY val LIMIT 1 OFFSET k`: two rounds of equi-width
  * histogram refinement narrow each requested quantile to a 1/B² value
  * slice, and only that slice's rows are ever ranked.
  *
  * Semantics (declared, engine-independent): the q-quantile of n non-null
  * values is the k-th smallest with `k = ceil(q_bp · n / 10000)` computed
  * in INTEGER arithmetic over basis points — `(q_bp·n + 9999) div 10⁴` —
  * so no float `ceil(q·n)` can land on opposite sides of an integer in
  * two engines. Ties are rank-transparent: the k-th element of the sorted
  * multiset is well-defined whatever order equal values appear in.
  *
  * Exactness does NOT depend on float bin geometry: bins are any
  * deterministic pure function of the value, counts per bin are exact
  * integers, and later rounds re-filter on the RECOMPUTED bin id (never
  * on `lo ≤ v < hi` range predicates, whose float edges could disagree
  * with the bin assignment and drop a boundary row).
  *
  * 100 TB shape: two map-side-combinable histogram aggregates (≤ B and
  * ≤ |qs|·B narrow rows out per group), windows only over histogram rows
  * partitioned by group (never data rows), per-group geometry/target
  * frames riding AQE-broadcast equi-joins. The final rank scan groups
  * the target slice by VALUE first, so its window is over distinct
  * values inside a 1/B² slice — duplicates (the common skew case: one
  * hot price point) collapse to one row before any sort. The residual
  * caveat is n distinct values packed inside one 1/B² value range; a
  * third refinement round is the mechanical extension if a corpus ever
  * hits it.
  */
object Quantiles {

  /** Global order statistics. @param qBasisPoints quantiles in basis
    * points (2500 = p25), each in [1, 10000]. @return one row per
    * quantile: (q_bp, n, value); empty when no non-null non-NaN values.
    */
  def exactQuantiles(df: DataFrame, valCol: String, qBasisPoints: Seq[Int],
                     buckets: Int = 4096): DataFrame =
    exactQuantilesBy(df.withColumn("__all", lit(0)), "__all", valCol,
      qBasisPoints, buckets).drop("__all")

  /** Per-group order statistics — same contract, one (q_bp, n, value)
    * row per (group, quantile). Histogram windows partition by group, so
    * no stage ever funnels more than one group's ≤ B histogram rows
    * through a single partition.
    */
  def exactQuantilesBy(df: DataFrame, groupCol: String, valCol: String,
                       qBasisPoints: Seq[Int], buckets: Int = 4096): DataFrame = {
    require(qBasisPoints.nonEmpty, "at least one quantile")
    require(qBasisPoints.forall(q => q >= 1 && q <= 10000),
      s"q_bp out of [1, 10000]: ${qBasisPoints.mkString(", ")}")
    require(qBasisPoints.distinct.size == qBasisPoints.size,
      s"duplicate q_bp: ${qBasisPoints.mkString(", ")}")
    core(df, groupCol, valCol, buckets) { geoN =>
      val spark = df.sparkSession
      import spark.implicits._
      // integer ceil-division — `div`, never float `/`: q_bp·n reaches
      // 10¹⁷ at trillion-row scale, past double's exact-integer range
      geoN.crossJoin(broadcast(qBasisPoints.toDF("q_bp")))
        .withColumn("k", expr("(q_bp * n + 9999) div 10000"))
    }
  }

  /** Exact interpolating per-group MEDIAN through the same two-round
    * machinery — `percentile(v, 0.5)` semantics (continuous rank
    * q·(n−1): the lower and upper middle order statistics, interpolated
    * as `lo + (hi − lo) · 0.5`, the identical IEEE op chain) WITHOUT
    * per-group value buffering: Spark's exact `percentile` collects
    * every distinct value of a group into one aggregation buffer, so a
    * hot group at 100× pressures executor memory (VERDICT r8 #7); here
    * no stage holds more than a B-bin histogram per group. Output:
    * (groupCol, n, median). */
  def interpolatedMedianBy(df: DataFrame, groupCol: String, valCol: String,
                           buckets: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // rank labels ride the q_bp column: 1 = lower middle (n+1 div 2),
    // 2 = upper middle (n div 2 + 1); for odd n they coincide and the
    // interpolation collapses to the middle value exactly
    // ONE refinement round, not two: the final ranking groups the
    // target slice by VALUE before any window, so a 1/B slice already
    // bounds the sort at ~n/B distinct values — and the second round
    // costs a whole extra job (scan + histogram + checkpoint) per
    // median, pure fixed overhead for this two-rank use (measured 10x
    // on q144's bench entry before this was split)
    val ranked = core(df, groupCol, valCol, buckets, twoRounds = false) { geoN =>
      geoN.crossJoin(broadcast(Seq(1, 2).toDF("q_bp")))
        .withColumn("k", when(col("q_bp") === 1, expr("(n + 1) div 2"))
          .otherwise(expr("n div 2 + 1")))
    }
    ranked.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        min(when(col("q_bp") === 1, col("value"))).as("__lo"),
        min(when(col("q_bp") === 2, col("value"))).as("__hi"))
      .select(col(groupCol), col("n"),
        (col("__lo") + (col("__hi") - col("__lo")) * 0.5).as("median"))
  }

  /** Shared refinement body; `mkKs` turns the per-group (__g, n) frame
    * into the target ranks (__g, q_bp, n, k) — q_bp is an opaque
    * per-rank label, k the 1-based order statistic. `twoRounds = false`
    * stops after the first histogram (target slice 1/B of the group
    * instead of 1/B², ranked by distinct value — still bounded, one
    * whole job cheaper; the median path uses it). */
  private def core(df: DataFrame, grpCol: String, valCol: String,
                   buckets: Int, twoRounds: Boolean = true)(
                   mkKs: DataFrame => DataFrame): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val b = buckets

    val v = df.select(col(grpCol).as("__g"), col(valCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))

    // per-group geometry (one narrow row per group)
    val geo = v.groupBy(col("__g")).agg(min(col("v")).as("mn"),
      max(col("v")).as("mx"), count(lit(1)).as("n"))

    // round-1 bin: clamp(floor((v-mn)/w1)); an all-equal group
    // degenerates to bin 0 (w1 = 0 would divide by zero)
    def bin1: Column = {
      val w1 = (col("mx") - col("mn")) / b
      when(col("mx") === col("mn"), lit(0)).otherwise(
        least(greatest(floor((col("v") - col("mn")) / w1), lit(0)),
          lit(b - 1))).cast("int")
    }
    // round-2 sub-bin inside round-1 bin `b1`, same clamp discipline
    def bin2: Column = {
      val w1 = (col("mx") - col("mn")) / b
      val w2 = w1 / b
      when(col("mx") === col("mn"), lit(0)).otherwise(
        least(greatest(
          floor((col("v") - col("mn") - col("b1") * w1) / w2), lit(0)),
          lit(b - 1))).cast("int")
    }
    val binW = Window.partitionBy(col("__g")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qW = Window.partitionBy(col("__g"), col("q_bp")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ---- round 1: per-group histogram -> per-(group, q) target bin
    val hist1 = v.join(geo, Seq("__g"))
      .select(col("__g"), bin1.as("bin"))
      .groupBy(col("__g"), col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(binW))
    val ks = mkKs(geo.select(col("__g"), col("n")))
    // localCheckpoint (two-round only): t1 (one row per group×quantile)
    // feeds BOTH round 2 and the final target chain — without it the
    // round-1 histogram subtree (and its full scan) executes twice. In
    // one-round mode t1 is consumed once, so the eager job would be
    // pure overhead.
    val t1raw = ks.join(hist1, Seq("__g"))
      .where(col("cum") - col("cnt") < col("k") && col("k") <= col("cum"))
      .select(col("__g"), col("q_bp"), col("n"), col("bin").as("b1"),
        (col("k") - (col("cum") - col("cnt"))).as("k1"))
    val t1 = if (twoRounds) t1raw.localCheckpoint() else t1raw

    val slice1 = v.join(geo.select(col("__g"), col("mn"), col("mx")), Seq("__g"))
      .withColumn("b1", bin1)
      .join(t1, Seq("__g", "b1"))

    val valW = Window.partitionBy(col("__g"), col("q_bp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // the target slice to rank by DISTINCT value, and the rank into it
    val (target, kk) =
      if (!twoRounds) (slice1, "k1")
      else {
        // ---- round 2: sub-histogram of only the target bins
        val sliced2 = slice1.withColumn("b2", bin2)
        val hist2 = sliced2.groupBy(col("__g"), col("q_bp"), col("b2").as("bin"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(qW))
        val t2 = t1.join(hist2, Seq("__g", "q_bp"))
          .where(col("cum") - col("cnt") < col("k1") && col("k1") <= col("cum"))
          .select(col("__g"), col("q_bp"), col("n"), col("b1"),
            col("bin").as("b2"), (col("k1") - (col("cum") - col("cnt"))).as("k2"))
        (sliced2.drop("n", "k1").join(t2, Seq("__g", "q_bp", "b1", "b2")), "k2")
      }

    // ---- final: rank DISTINCT values of the target slice
    target
      .groupBy(col("__g"), col("q_bp"), col("n"), col(kk), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(valW))
      .where(col("cum") - col("cnt") < col(kk) && col(kk) <= col("cum"))
      .select(col("__g").as(grpCol), col("q_bp"), col("n"), col("v").as("value"))
  }

  /** Equi-depth histogram profile: the value domain cut at the exact
    * i/N quantiles, every bucket's exact (count, min, max) — the
    * distribution readout a profiler wants when equi-WIDTH bins hide
    * the mass (one hot price point, long tails). Bucket membership is
    * the [[graft.ingest.Shards.writeRangeSharded]] rule — count of
    * boundaries strictly below the value, ties sit low — so under
    * heavy ties buckets are intentionally UNEVEN but exactly defined
    * (equal mass is impossible when one value holds >1/N of the rows).
    *
    * One assignment pass over the data after the quantile machinery;
    * boundaries ride a broadcast 1-row array.
    */
  def equiDepthHistogram(df: DataFrame, valCol: String,
                         nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 10000,
      s"nBuckets out of [2, 10000]: $nBuckets")
    val bps = (1 until nBuckets).map(i => i * 10000 / nBuckets).distinct
    val bounds = exactQuantiles(df, valCol, bps)
      .agg(sort_array(collect_list(col("value"))).as("bs"))
    val v = df.select(col(valCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
    v.crossJoin(broadcast(bounds))
      .withColumn("bucket", aggregate(col("bs"), lit(0),
        (acc, b) => acc + when(col("v") > b, 1).otherwise(0)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("min_val"), max(col("v")).as("max_val"))
  }

  /** Winsorized (clipped) summary: clip `valCol` to its exact
    * [loBp, hiBp] basis-point quantiles and report what that treatment
    * did — the outlier-robust preprocessing companion to the MAD report
    * (q144): (n, lo_value, hi_value, n_clipped_lo, n_clipped_hi,
    * clipped_sum_cents). The sum is exact: values fix to integer cents
    * BEFORE summing, so any engine replays it bit-for-bit.
    *
    * One pass over the data after the quantile machinery; the two clip
    * bounds ride a broadcast 1-row frame.
    */
  def winsorizedStats(df: DataFrame, valCol: String,
                      loBp: Int = 100, hiBp: Int = 9900,
                      buckets: Int = 4096): DataFrame = {
    require(loBp < hiBp, s"loBp must be < hiBp, got $loBp >= $hiBp")
    val qs = exactQuantiles(df, valCol, Seq(loBp, hiBp), buckets)
    val bounds = qs.agg(
      min(when(col("q_bp") === loBp, col("value"))).as("lo"),
      max(when(col("q_bp") === hiBp, col("value"))).as("hi"))
    val v = df.select(col(valCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
    val clipped = least(greatest(col("v"), col("lo")), col("hi"))
    v.crossJoin(broadcast(bounds))
      .agg(count(lit(1)).as("n"),
        min(col("lo")).as("lo_value"), min(col("hi")).as("hi_value"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
        sum(round(clipped * 100, 0).cast("long")).as("clipped_sum_cents"))
  }

  /** Equi-width histogram sketch TABLE: per-grain dense `array<long>`
    * bin counts over `[lo, hi)` — the persistable quantile sibling of
    * the q192 HLL sketch column, composed ENTIRELY from built-ins (no
    * custom aggregate): a stored sketch row per grain, range rollups by
    * element-wise integer addition ([[mergeSketches]]), quantiles
    * interpolated from cumulative counts ([[quantileFromSketch]]).
    * Fixed-bin histograms are what production percentile dashboards
    * actually store at 100 TB (constant size per grain, associative
    * integer merges, no rescan) — and unlike GK/KLL the whole structure
    * is exact integers, so estimates replay in the oracle to the bit.
    *
    * Layout: `bins + 2` entries — [0] underflow (< lo), [1..bins]
    * in-range, [bins+1] overflow (≥ hi). Out-of-range values are
    * COUNTED, not dropped, so Σ = n always and a mis-sized range is
    * visible (and [[quantileFromSketch]] fails loudly if a requested
    * quantile lands in an edge bin). Null values are skipped.
    */
  def equiWidthSketch(df: DataFrame, valCol: String, grainCols: Seq[String],
                      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val bin = when(col(valCol) < lo, 0L)
      .when(col(valCol) >= hi, (bins + 1).toLong)
      .otherwise(floor((col(valCol) - lo) / w).cast("long") + 1L)
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy((grainCols.map(col) :+ bin.as("__bin")): _*)
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(grainCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("__bin"), col("__c"))))
        .as("__m"))
      .select((grainCols.map(col) :+
        expr(s"transform(sequence(0, ${bins + 1}), " +
          "i -> coalesce(element_at(__m, CAST(i AS BIGINT)), 0L))")
          .as("sketch")): _*)
  }

  /** Element-wise sum of stored sketch arrays — the range rollup.
    * `aggregate` over the collected per-grain arrays (bounded: one
    * array per merged grain row, each `bins + 2` longs); integer adds
    * are exactly associative/commutative, so the merged sketch is
    * bit-identical to one built directly over the union's rows. */
  def mergeSketches(sketchCol: Column, bins: Int): Column =
    aggregate(collect_list(sketchCol),
      expr(s"array_repeat(0L, ${bins + 2})"),
      (acc, x) => zip_with(acc, x, _ + _))

  /** Quantile interpolated from a sketch's cumulative counts: with
    * continuous rank `r = q·(n−1)` landing in in-range bin `b` (1-based
    * layout) holding `cnt` values after `cum` earlier ones, the
    * estimate is `lo + w·(b−1 + (r−cum)/cnt)` — a fixed double-op chain
    * over exact integers, replayed bit-for-bit by the oracle. Fails
    * loudly when `r` lands in an under/overflow bin (the range was
    * mis-sized for this quantile) or the sketch is empty.
    */
  def quantileFromSketch(sketchCol: Column, q: Double,
                         lo: Double, hi: Double, bins: Int): Column = {
    require(q >= 0 && q <= 1, s"q in [0,1], got $q")
    val w = (hi - lo) / bins
    // one pass builds (bin, cumBefore, cnt) structs; filter to the bin
    // containing r, which is unique because cum is strictly increasing
    // across non-empty bins
    val n = aggregate(sketchCol, lit(0L), (a, x) => a + x)
    val r = lit(q) * (n - lit(1L)).cast("double")
    // cumBefore per index via a running fold is awkward in pure HOFs;
    // zip index + slice-sum stays O(bins²) but bins is a constant ~100
    val est = {
      val idx = sequence(lit(0), lit(bins + 1))
      val cumBefore = transform(idx, i =>
        aggregate(slice(sketchCol, lit(1), i), lit(0L), (a, x) => a + x))
      val cands = filter(
        zip_with(idx, cumBefore, (i, c) => struct(i.as("b"), c.as("cum"))),
        s => {
          val cnt = element_at(sketchCol, (s.getField("b") + lit(1)).cast("int"))
          cnt > 0 && s.getField("cum").cast("double") <= r &&
            r < (s.getField("cum") + cnt).cast("double")
        })
      // r == n−1 exactly (q = 1): the predicate above is half-open —
      // fall back to the LAST non-empty bin
      val lastNonEmpty = element_at(filter(
        zip_with(idx, cumBefore, (i, c) => struct(i.as("b"), c.as("cum"))),
        s => element_at(sketchCol, (s.getField("b") + lit(1)).cast("int")) > 0), -1)
      val chosen = coalesce(element_at(cands, 1), lastNonEmpty)
      val b = chosen.getField("b")
      val cum = chosen.getField("cum")
      val cnt = element_at(sketchCol, (b + lit(1)).cast("int"))
      when(n === 0L, raise_error(lit("quantileFromSketch: empty sketch")))
        .when(b === 0 || b === bins + 1, raise_error(concat(
          lit(s"quantileFromSketch: q=$q lands in an out-of-range bin — " +
            s"resize [$lo, $hi)"))))
        .otherwise(lit(lo) + lit(w) *
          ((b - lit(1)).cast("double") +
            (r - cum.cast("double")) / cnt.cast("double")))
    }
    est
  }

  private val Window = org.apache.spark.sql.expressions.Window
}
