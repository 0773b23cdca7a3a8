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
    // silently returns wrong pairs
    def bucketOf(c: String) = expr(s"((`$c` - pmod(`$c`, $tol)) div $tol)")
    val lb = left.withColumn("__b",
      explode(array(bucketOf(leftVal) - 1, bucketOf(leftVal), bucketOf(leftVal) + 1)))
    val rb = right.withColumn("__b", bucketOf(rightVal))
    lb.join(rb, Seq("__b"))
      .filter(abs(col(leftVal) - col(rightVal)) <= tol)
      .drop("__b")
  }
}
