package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs of rows whose integer values lie within a
  * tolerance — the generic form of the explode-offsets rewrite the
  * social graph uses (silver/Pipelines.follows, §2.3 J8), and a beyond-
  * reference §2.3 operator Spark has no built-in for (a raw
  * `|a − b| <= tol` theta join plans as a broadcast nested loop or a
  * full cross product — quadratic residual work per key at scale).
  *
  * Each left row explodes to its value bucket and both neighbors
  * (bucket = floor(v / tol), so any partner within `tol` is at bucket
  * distance ≤ 1); the right side keeps its single bucket; an ordinary
  * hash equi-join on the bucket meets them and a residual filter trims
  * the corners. Fan-out is a FIXED 3 rows per left row — cost is linear
  * in the inputs plus the true match count, for any distribution.
  *
  * A (left, right) pair can meet in only one bucket (the right row has
  * exactly one), so no dedup pass is needed. Values must be integral
  * (scale doubles to cents first — exact, and the residual comparison
  * stays exact integer arithmetic); floor division via pmod keeps
  * buckets monotone for negative values.
  */
object RangeJoin {

  /** Floor-division bucket of an integral column — truncating `div` plus
    * a negative-remainder correction; see the overflow notes in [[within]]
    * for why this form (and not the subtract-then-divide form). */
  private def floorBucket(c: String, w: Long) = expr(
    s"(`$c` div $w) - (CASE WHEN `$c` < 0 AND pmod(`$c`, $w) != 0 THEN 1 ELSE 0 END)")

  def within(left: DataFrame, right: DataFrame, leftVal: String,
             rightVal: String, tol: Long): DataFrame = {
    require(tol > 0, s"tolerance must be positive, got $tol")
    val shared = left.columns.intersect(right.columns)
    require(shared.isEmpty,
      s"left/right column collision (rename before joining): ${shared.mkString(",")}")
    // integral `div` keeps the join key a LONG: Column `/` promotes to
    // DOUBLE, where buckets beyond 2^53·tol collide or shift and the join
    // silently returns wrong pairs. Floor division is computed as
    // truncating div plus a negative-remainder correction, NOT as
    // `(c - pmod(c, tol)) div tol`: near Long.MinValue the floor MULTIPLE
    // is unrepresentable even though the floor QUOTIENT is fine, so the
    // subtraction form overflows (an ANSI error / a wrapped bucket) on
    // legitimate extreme values.
    def bucketOf(c: String) = expr(
      s"(`$c` div $tol) - (CASE WHEN `$c` < 0 AND pmod(`$c`, $tol) != 0 THEN 1 ELSE 0 END)")
    val lb = left.withColumn("__b0", bucketOf(leftVal))
      // try_add/try_subtract: the neighbor of the domain-edge bucket does
      // not exist — a NULL neighbor joins nothing, which is exactly the
      // semantics (plain ±1 wraps MaxValue's neighbor onto MinValue's
      // bucket and pairs the two domain extremes)
      .withColumn("__b", explode(array(expr("try_subtract(__b0, 1L)"),
        col("__b0"), expr("try_add(__b0, 1L)"))))
      .drop("__b0")
    val rb = right.withColumn("__b", bucketOf(rightVal))
    lb.join(rb, Seq("__b"))
      // try_subtract, not `-`: at the domain extremes the ±1 neighbor
      // bucket of Long.MaxValue wraps to Long.MinValue's bucket, and the
      // plain difference then ALSO wraps (MaxValue − MinValue = −1), so
      // the filter would emit an opposite-extremes pair as "within tol".
      // A true within-tol pair can never overflow (|l−r| ≤ tol ≤ Long
      // range), so the null-on-overflow difference drops exactly the
      // wrapped impostors. BETWEEN, not abs(...): a difference of exactly
      // Long.MinValue is representable (not nulled) but abs of it
      // overflows — an ANSI error on legitimate data, a spurious
      // negative-passes-the-filter pair with ANSI off.
      .filter(expr(s"try_subtract(`$leftVal`, `$rightVal`)").between(-tol, tol))
      .drop("__b")
  }

  /** Multi-dimensional banded join: pairs within `tol` on EVERY listed
    * dimension simultaneously. Same explode-neighbors construction as
    * [[within]], applied per dimension — the composite join key is the
    * k-tuple of buckets, fan-out a fixed 3^k per left row, and a pair
    * can still meet in exactly one composite bucket (the right row has
    * one bucket per dimension), so no dedup pass.
    *
    * Why it exists: a 1-D band prunes only on that one value, and when
    * the corpus piles up inside single buckets (e.g. document sizes at
    * 10× replication) the join output grows with the SQUARE of the
    * bucket population. Each extra dimension multiplies the bucket key
    * space, shrinking populations multiplicatively for constant 3×
    * fan-out per dim — the standard grid-file trick. Used by
    * [[graft.multimodal.Multimodal.histogramNearDup]], which derives
    * extra lossless dimensions from disjoint histogram-bin group sums
    * (each is 1-Lipschitz under the L1 metric being banded).
    *
    * Keep k small (2–4): pruning is multiplicative but fan-out is
    * exponential, and dimensions only help if they are not perfectly
    * correlated with ones already present. */
  def withinAll(left: DataFrame, right: DataFrame,
                leftVals: Seq[String], rightVals: Seq[String],
                tol: Long): DataFrame = {
    require(tol > 0, s"tolerance must be positive, got $tol")
    require(leftVals.nonEmpty && leftVals.length == rightVals.length,
      s"dimension lists must be non-empty and equal-length: " +
        s"${leftVals.length} vs ${rightVals.length}")
    val shared = left.columns.intersect(right.columns)
    require(shared.isEmpty,
      s"left/right column collision (rename before joining): ${shared.mkString(",")}")
    var lb = left
    leftVals.zipWithIndex.foreach { case (c, i) =>
      lb = lb.withColumn(s"__v$i", floorBucket(c, tol))
        .withColumn(s"__b$i", explode(array(expr(s"try_subtract(__v$i, 1L)"),
          col(s"__v$i"), expr(s"try_add(__v$i, 1L)"))))
        .drop(s"__v$i")
    }
    var rb = right
    rightVals.zipWithIndex.foreach { case (c, i) =>
      rb = rb.withColumn(s"__b$i", floorBucket(c, tol))
    }
    val keys = leftVals.indices.map(i => s"__b$i")
    lb.join(rb, keys)
      .filter(leftVals.zip(rightVals).map { case (l, r) =>
        expr(s"try_subtract(`$l`, `$r`)").between(-tol, tol)
      }.reduce(_ && _))
      .drop(keys: _*)
  }

  /** Keyed interval overlap join: pairs of (left, right) rows sharing
    * `keys` whose CLOSED integral intervals `[start, end]` overlap
    * (`ls <= re AND rs <= le`). The theta form plans as a per-key nested
    * loop — quadratic residual work on busy keys; here each interval
    * explodes to the `chunk`-width time chunks it covers, an ordinary
    * hash equi-join on (keys, chunk) meets co-chunk intervals, and a
    * residual filter keeps true overlaps.
    *
    * An overlapping pair shares every chunk in the intersection of its
    * chunk ranges, so naive emission duplicates; instead a pair is
    * emitted ONLY in its first shared chunk — `chunk(max(ls, rs))`,
    * which equals `greatest(bucket(ls), bucket(rs))` because floor
    * division is monotone — making the output exactly-once with NO
    * distinct/dedup shuffle.
    *
    * Scale posture: fan-out per row is `length/chunk + 1` — pick `chunk`
    * near the typical interval length for O(1) expansion (the knob the
    * caller owns, like every bucket width in this library). A row whose
    * interval covers more than `maxChunksPerRow` chunks fails LOUDLY
    * before exploding (the repo-wide fail-loud cap contract) — a
    * degenerate never-ending interval cannot silently quadratic-ify the
    * plan. Inverted (`start > end`) intervals also raise.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      chunk: Long, maxChunksPerRow: Int = 4096): DataFrame = {
    require(chunk > 0, s"chunk width must be positive, got $chunk")
    require(maxChunksPerRow > 0, "maxChunksPerRow must be positive")
    require(keys.nonEmpty, "keyless overlap joins every interval pair; pass keys")
    val shared = left.columns.intersect(right.columns).toSeq.diff(keys)
    require(shared.isEmpty,
      s"non-key column collision (rename before joining): ${shared.mkString(",")}")
    require(!(left.columns ++ right.columns).exists(_.startsWith("__")),
      "reserved __ prefix in input columns")
    def chunked(df: DataFrame, s: String, e: String, bs: String): DataFrame =
      df.withColumn(bs, floorBucket(s, chunk))
        .withColumn("__be", floorBucket(e, chunk))
        // guards ride the explode input so they evaluate per source row:
        // inverted intervals and over-cap spans error before any fan-out.
        // try_subtract: a span whose BUCKET difference itself overflows is
        // certainly over the cap — treat null as over.
        .withColumn("__b", explode(when(col(s) > col(e),
            expr(s"raise_error(concat('interval start > end: ', `$s`, ' > ', `$e`))"))
          .when(coalesce(expr(s"try_subtract(__be, $bs)"),
              lit(Long.MaxValue)) >= maxChunksPerRow,
            expr(s"raise_error(concat('interval at `$s` covers more than " +
              s"$maxChunksPerRow chunks of width $chunk (raise chunk or maxChunksPerRow)'))"))
          .otherwise(expr(s"sequence($bs, __be)"))))
        .drop("__be")
    val lb = chunked(left, leftStart, leftEnd, "__bsl")
    val rb = chunked(right, rightStart, rightEnd, "__bsr")
    lb.join(rb, keys :+ "__b")
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      // first-shared-chunk emission: exactly one row per overlapping pair
      .filter(col("__b") === greatest(col("__bsl"), col("__bsr")))
      .drop("__b", "__bsl", "__bsr")
  }
}
