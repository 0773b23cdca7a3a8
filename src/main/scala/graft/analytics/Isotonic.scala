package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact isotonic calibration — pool-adjacent-violators (PAV) over
  * score bins. Platt-style parametric calibration assumes a sigmoid;
  * a reliability diagram (q174) only DESCRIBES miscalibration. The
  * isotonic fit is the standard nonparametric fix: the L2-optimal
  * monotone nondecreasing mapping from score to empirical positive
  * rate (Zadrozny & Elkan, KDD 2002).
  *
  * Scale split: the data-sized term is ONE groupBy over ≤ maxBin+1
  * integer bins (map-side combined — each partition ships at most one
  * (n, Σy) partial per bin); PAV itself then runs on the bin frame,
  * which is metadata-scale (50 rows for a 50-bin calibration of any
  * corpus size) in a single sorted partition. Pool-mean comparisons
  * use BigInt cross-multiplication — no float merge decisions, so the
  * pool structure is an exact function of the integer (n, Σy) table.
  *
  * The gate is FULL hash replay, no envelope: the PAV solution equals
  * the minimax formula `fit_i = max_{a≤i} min_{b≥i} mean(S[a..b])`
  * (Robertson–Wright–Dykstra 1988 §1.2), which the q204 oracle
  * evaluates directly over all O(B²) bin windows — each candidate mean
  * is one integer/integer double division, and the achieved optimum is
  * the same two integers divided in both engines, so even the doubles
  * agree bit-for-bit before micro rounding.
  */
object Isotonic {

  /** Calibrate `labelCol` (boolean/0-1) against integer `scoreCol`,
    * binned at `binWidth` and clamped to `maxBin`. Output: one row per
    * non-empty bin — (bin, n, pos, fitted_micro), `fitted_micro`
    * monotone nondecreasing in `bin` with Σ n·fitted = Σ pos within
    * each pool (the PAV invariants).
    */
  def isotonicCalibration(df: DataFrame, scoreCol: String, labelCol: String,
                          binWidth: Long, maxBin: Int): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBin >= 0 && maxBin <= 100000, "maxBin out of metadata scale")
    val spark = df.sparkSession
    import spark.implicits._
    val bins = df.select(
        least(expr(s"`$scoreCol` div ${binWidth}L"), lit(maxBin.toLong)).as("bin"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .as[(Long, Long, Long)]
    bins.repartition(1).sortWithinPartitions(col("bin"))
      .mapPartitions { it =>
        // PAV stack: pools carry (member bins, n, pos); a pool whose
        // mean undercuts its predecessor's merges downward until the
        // means are nondecreasing. ≤ maxBin+1 elements ever live here.
        val stack = scala.collection.mutable.ArrayBuffer
          .empty[(List[(Long, Long, Long)], Long, Long)]
        for (b @ (_, n, pos) <- it) {
          stack += ((List(b), n, pos))
          var merging = true
          while (merging && stack.length >= 2) {
            val (mb2, n2, p2) = stack(stack.length - 1)
            val (mb1, n1, p1) = stack(stack.length - 2)
            // mean1 > mean2  ⇔  p1·n2 > p2·n1 (exact)
            if (BigInt(p1) * n2 > BigInt(p2) * n1) {
              stack.remove(stack.length - 1)
              stack(stack.length - 1) = (mb1 ::: mb2, n1 + n2, p1 + p2)
            } else merging = false
          }
        }
        stack.iterator.flatMap { case (members, n, pos) =>
          val fitted = math.round(pos.toDouble / n.toDouble * 1e6)
          members.iterator.map { case (bin, bn, bp) => (bin, bn, bp, fitted) }
        }
      }
      .toDF("bin", "n", "pos", "fitted_micro")
  }
}
