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
}
