package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance: keep a per-key
  * aggregate table fresh under a stream of new rows (and optionally
  * retractions) WITHOUT rescanning the base data.
  *
  * The reference recomputes its silver aggregates from scratch on every
  * scheduled run (reference: pyspark_jobs/process_silver_trending_tracks.py
  * rebuilds the full trending table per invocation; SURVEY.md §3.2) —
  * affordable at demo scale, a non-starter at 100 TB where the base fact
  * table dwarfs every delta. The production shape is a mergeable-state
  * refresh: the maintained table stores per-key partial states
  * (`cnt`, per-measure `sum`/`min`/`max`), a delta batch collapses to the
  * same states, and refreshing is a states×states merge — cost
  * O(|delta| + |touched groups|), independent of the base row count.
  *
  * Two refresh strategies, matching what real MV engines do:
  *
  *  - [[refresh]] — pure state merge. Exact for additive states
  *    (count/sum, and avg derived from them) under both inserts and
  *    retractions; exact for min/max under inserts only (min/max are not
  *    subtractable — a retraction of the current minimum cannot be
  *    repaired from the state alone, so the operator refuses that
  *    combination loudly rather than silently drifting).
  *  - [[refreshTouchedGroups]] — recompute ONLY the groups the delta
  *    touches from base rows (semi-join pruned), keep every untouched
  *    group's stored state as-is. Handles any aggregate (including
  *    min/max under deletes) at cost O(|delta| + base rows of touched
  *    groups) — on a table partitioned/bucketed by the group key the
  *    touched-group scan prunes to a sliver of the base.
  *
  * Scale posture: [[aggregateStates]] is one map-side-combinable hash
  * aggregate (one shuffle of partial states, never raw rows);
  * [[refresh]] adds one join keyed on the group key between two
  * groups-sized (not rows-sized) frames — AQE broadcasts whichever side
  * is small, typically the delta states. Nothing touches the driver.
  */
object Incremental {

  private val Reserved = Set("cnt", "__sign")

  /** Collapse raw rows to mergeable per-key aggregate states:
    * `keys..., cnt, <m>_sum [, <m>_min, <m>_max]` for each measure
    * column `m`. Measures must be integral (callers pre-scale doubles to
    * fixed-point longs — see q124's `round(value*10000)` idiom — so that
    * state merging is exact and order-independent; float sums would make
    * "incremental" and "recomputed" disagree in the last bits).
    *
    * `sign` tags each row +1 (insert) or -1 (retract). With any
    * retraction present, min/max states are unsound, so `withMinMax`
    * must be false — enforced at runtime with a named error, because a
    * silently wrong MV is the worst failure mode this operator has.
    */
  def aggregateStates(rows: DataFrame, keys: Seq[String], measures: Seq[String],
                      sign: Column = lit(1L), withMinMax: Boolean = true): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "need at least one key and one measure")
    require(!(keys ++ measures).exists(Reserved), s"reserved column names $Reserved in input")
    measures.foreach { m =>
      val dt = rows.schema(m).dataType
      require(dt == org.apache.spark.sql.types.LongType
          || dt == org.apache.spark.sql.types.IntegerType,
        s"measure '$m' must be integral for exact mergeable states, got $dt " +
          "(pre-scale doubles to fixed-point longs)")
    }
    val signed = rows.withColumn("__sign", sign.cast("long"))
    val guard =
      if (withMinMax)
        // fail in the partial aggregate, before a wrong min/max state exists
        when(col("__sign") =!= 1L,
          raise_error(lit("aggregateStates: retraction (sign != +1) with " +
            "withMinMax=true — min/max states are not subtractable; " +
            "use withMinMax=false or refreshTouchedGroups"))).otherwise(col("__sign"))
      else col("__sign")
    val aggs =
      sum(guard).as("cnt") +:
        measures.flatMap { m =>
          sum(col(m).cast("long") * col("__sign")).as(s"${m}_sum") +:
            (if (withMinMax)
              Seq(min(col(m).cast("long")).as(s"${m}_min"),
                max(col(m).cast("long")).as(s"${m}_max"))
            else Nil)
        }
    signed.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a delta's states into the maintained states: cnt/sum add,
    * min/max combine null-safely, groups whose cnt reaches 0 vanish
    * (the retraction of a group's last row deletes the group, exactly
    * as a full recompute would). Both inputs must be [[aggregateStates]]
    * outputs over the same keys/measures shape.
    */
  def refresh(base: DataFrame, deltaStates: DataFrame, keys: Seq[String],
              measures: Seq[String]): DataFrame = {
    val withMinMax = base.columns.contains(s"${measures.head}_min")
    val stateCols = "cnt" +: measures.flatMap { m =>
      s"${m}_sum" +: (if (withMinMax) Seq(s"${m}_min", s"${m}_max") else Nil)
    }
    require(stateCols.forall(base.columns.contains) &&
        stateCols.forall(deltaStates.columns.contains),
      s"refresh expects state columns $stateCols on both sides")
    val b = stateCols.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
    val d = stateCols.foldLeft(deltaStates)((x, c) => x.withColumnRenamed(c, s"__d_$c"))
    val merged = b.join(d, keys, "full_outer")
    val adds = Seq("cnt") ++ measures.map(m => s"${m}_sum")
    val combined = measures.foldLeft(
      adds.foldLeft(merged)((df, c) =>
        df.withColumn(c, coalesce(col(s"__b_$c"), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L))))
    ) { (df, m) =>
      if (withMinMax)
        df.withColumn(s"${m}_min", least(col(s"__b_${m}_min"), col(s"__d_${m}_min")))
          .withColumn(s"${m}_max", greatest(col(s"__b_${m}_max"), col(s"__d_${m}_max")))
      else df
    }
    combined
      .filter(col("cnt") =!= 0L)
      .select((keys ++ stateCols).map(col): _*)
  }

  /** Recompute-touched-groups refresh: groups present in `delta` are
    * recomputed from `baseRows` (+ delta inserts, − delta deletes by
    * absence: `delta` here carries the POST-image rows of each touched
    * group, the CDC-apply convention of [[graft.operators.Merge]]), all
    * other groups keep their stored `baseStates` untouched. Sound for
    * ANY aggregate shape because touched groups are true recomputes.
    *
    * `touchedRows` must contain every current row of every touched group
    * (e.g. the output of `Merge.applyChanges` semi-joined to the changed
    * keys). Cost: one semi-join-pruned scan + one groups-sized anti-join.
    */
  def refreshTouchedGroups(baseStates: DataFrame, touchedRows: DataFrame,
                           touchedKeys: DataFrame, keys: Seq[String],
                           measures: Seq[String], withMinMax: Boolean = true): DataFrame = {
    val recomputed = aggregateStates(touchedRows, keys, measures, lit(1L), withMinMax)
    val untouched = baseStates.join(touchedKeys.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    untouched.unionByName(recomputed)
  }
}
