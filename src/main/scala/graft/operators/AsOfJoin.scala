package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the feature-store / market-data staple
  * Spark lacks as a built-in (beyond-reference; the reference's C#
  * scorer always reads the LATEST silver table, which is the degenerate
  * as-of at t = now).
  *
  * [[backward]] attaches to every left (probe) row the single right
  * (version) row with the greatest `rightTime` ≤ `leftTime` for the same
  * key, null-extended when no version precedes the probe.
  *
  * Plan: instead of a join + per-probe latest-version subquery — which
  * re-scans the version history once per probe and explodes on hot keys —
  * both sides are unioned with a marker and sorted ONCE per key
  * partition; `last(payload, ignoreNulls)` over the running window
  * carries the newest version forward into each probe row. Cost is one
  * shuffle + sort of |probes| + |versions| rows regardless of fan-in, the
  * same shape Flink/kdb use for temporal joins. At equal timestamps the
  * version sorts FIRST (marker order), so a version effective exactly at
  * the probe instant is visible — matching DuckDB/kdb ASOF `>=`
  * semantics, which the oracle exploits.
  *
  * Contracts (documented, not silently broken):
  *   - right must be unique per (key, rightTime) — otherwise "the"
  *     version at a timestamp is ill-defined (pre-aggregate first);
  *   - version payload columns must be non-null — a null payload value
  *     would make `last(ignoreNulls)` reach back to an older version for
  *     that column alone.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.toIndexedSeq.filter(c => c != keyCol && c != rightTime)
    val lCols = left.columns.toIndexedSeq
    require(payload.intersect(lCols).isEmpty,
      s"payload/left column collision: ${payload.intersect(lCols).mkString(",")}")
    val reservedClash = (left.columns ++ right.columns).distinct
      .intersect(Seq("__t", "__m"))
    require(reservedClash.isEmpty,
      s"reserved internal column names in input (rename before joining): " +
        reservedClash.mkString(","))
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap

    // aligned union: left rows carry null payloads, version rows carry
    // null left-only columns; __m orders versions before probes at ties
    val lPrep = left.select(
      lCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__m")) ++
        payload.map(c => lit(null).cast(rTypes(c)).as(c)): _*)
    val rPrep = right
      // SQL ASOF semantics (and the DuckDB oracle): NULL never matches —
      // a null-key or null-time version must not seed any partition's
      // carry. Null-key/null-time PROBES need no filter: a null key forms
      // a version-free partition and a null time sorts before every
      // version, so both null-extend naturally.
      .filter(col(keyCol).isNotNull && col(rightTime).isNotNull)
      .select(
        lCols.map(c =>
          if (c == keyCol) col(keyCol)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(col(rightTime).as("__t"), lit(0).as("__m")) ++
          payload.map(col): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t").asc, col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPrep.unionByName(rPrep)
      .select(lCols.map(col) ++ Seq(col("__m")) ++
        payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__m") === 1)
      .drop("__m")
  }
}
