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
  * 100 TB shape: two full-scan map-side-combinable histogram aggregates
  * (≤ B and ≤ |qs|·B narrow rows out), windows only over histogram rows
  * (never data rows), geometry/target frames broadcast. The final rank
  * scan groups the target slice by VALUE first, so its window is over
  * distinct values inside a 1/B² slice — duplicates (the common skew
  * case: one hot price point) collapse to one row before any sort. The
  * residual caveat is n distinct values packed inside one 1/B² value
  * range; a third refinement round is the mechanical extension if a
  * corpus ever hits it.
  */
object Quantiles {

  /** @param qBasisPoints quantiles in basis points (2500 = p25); each in
    *                     [1, 10000], 10000 = maximum.
    * @return one row per requested quantile: (q_bp, n, value), empty when
    *         the input has no non-null non-NaN values.
    */
  def exactQuantiles(df: DataFrame, valCol: String, qBasisPoints: Seq[Int],
                     buckets: Int = 4096): DataFrame = {
    require(qBasisPoints.nonEmpty, "at least one quantile")
    require(qBasisPoints.forall(q => q >= 1 && q <= 10000),
      s"q_bp out of [1, 10000]: ${qBasisPoints.mkString(", ")}")
    require(qBasisPoints.distinct.size == qBasisPoints.size,
      s"duplicate q_bp: ${qBasisPoints.mkString(", ")}")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val b = buckets
    val spark = df.sparkSession
    import spark.implicits._

    val v = df.select(col(valCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))

    // one-row geometry frame, broadcast into every scan
    val geo = v.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(lit(1)).as("n"))

    // round-1 bin: clamp(floor((v-mn)/w1)); all-equal input degenerates
    // to bin 0 (w1 = 0 would divide by zero)
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
    val binW = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qW = Window.partitionBy(col("q_bp")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ---- round 1: global histogram -> per-q target bin + in-bin rank
    val hist1 = v.crossJoin(broadcast(geo))
      .select(bin1.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(binW))
    // integer ceil-division — `div`, never float `/`: q_bp·n reaches
    // 10¹⁷ at trillion-row scale, past double's exact-integer range
    val ks = qBasisPoints.toDF("q_bp")
      .crossJoin(broadcast(geo.select(col("n"))))
      .withColumn("k", expr("(q_bp * n + 9999) div 10000"))
      .select(col("q_bp"), col("n"), col("k"))
    // localCheckpoint: t1 (<= |qs| rows) feeds BOTH round 2 and the
    // final target chain — without it the round-1 histogram subtree
    // (and its global scan) executes twice
    val t1 = ks.join(hist1,
        col("cum") - col("cnt") < col("k") && col("k") <= col("cum"))
      .select(col("q_bp"), col("n"), col("bin").as("b1"),
        (col("k") - (col("cum") - col("cnt"))).as("k1"))
      .localCheckpoint()

    // ---- round 2: sub-histogram of only the target bins (geo's n is
    // dropped here — t1 already carries it, and a duplicate would make
    // later col("n") references ambiguous)
    val slice1 = v.crossJoin(broadcast(geo.select(col("mn"), col("mx"))))
      .withColumn("b1", bin1)
      .join(broadcast(t1), Seq("b1"))
      .withColumn("b2", bin2)
    val hist2 = slice1.groupBy(col("q_bp"), col("b2").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(qW))
    val t2 = t1.join(hist2, Seq("q_bp"))
      .where(col("cum") - col("cnt") < col("k1") && col("k1") <= col("cum"))
      .select(col("q_bp"), col("n"), col("b1"), col("bin").as("b2"),
        (col("k1") - (col("cum") - col("cnt"))).as("k2"))

    // ---- final: rank DISTINCT values of the 1/B^2 slice
    val valW = Window.partitionBy(col("q_bp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slice1.drop("n", "k1")
      .join(broadcast(t2), Seq("q_bp", "b1", "b2"))
      .groupBy(col("q_bp"), col("n"), col("k2"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(valW))
      .where(col("cum") - col("cnt") < col("k2") && col("k2") <= col("cum"))
      .select(col("q_bp"), col("n"), col("v").as("value"))
  }

  private val Window = org.apache.spark.sql.expressions.Window
}
