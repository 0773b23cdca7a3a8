package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch MERGE-shape operators over plain tables: latest-wins keyed
  * upsert and SCD2 (type-2 slowly-changing-dimension) history building.
  * The reference lands CDC-style updates through Delta MERGE
  * (reference: pyspark_jobs/process_recommendation_events.py's upsert
  * landing; SURVEY.md §3.1) — on bare parquet the same semantics are a
  * union + one keyed window, which is also the MERGE join strategy a
  * table format executes underneath.
  *
  * Scale posture: both operators are a single hash-shuffle on the key
  * followed by a per-key sort — no driver participation, no broadcast of
  * the big side, and the window partitions by the merge key so state per
  * task is one key-group at a time.
  */
object Merge {

  /** Latest-wins upsert: apply `updates` over `base`, keyed by `keys`.
    * Updates always beat the base row for the same key; among multiple
    * updates to one key the greatest `precedence` tuple wins
    * (lexicographic, descending). `precedence` must be a total order
    * within each key or ties would be engine-arbitrary — callers pass a
    * unique trailing column (an id) to guarantee it.
    *
    * Both inputs must share the schema of `base` (the update is a full
    * row replacement, the MERGE `WHEN MATCHED THEN UPDATE SET *` shape).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             precedence: Seq[String]): DataFrame = {
    require(base.columns.toSeq == updates.columns.toSeq,
      s"upsert requires identical schemas: ${base.columns.toSeq} vs ${updates.columns.toSeq}")
    require(!base.columns.contains("__pri") && !base.columns.contains("__rn"),
      "reserved internal column names __pri/__rn in input (rename before merging)")
    val all = base.withColumn("__pri", lit(0))
      .unionByName(updates.withColumn("__pri", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__pri").desc +: precedence.map(col(_).desc): _*)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__pri", "__rn")
  }

  /** CDC apply: land an op-tagged change feed (insert / update / delete)
    * over a base snapshot, keyed by `keys`. Per key only the change with
    * the greatest `precedence` tuple matters (a CDC reader's sequence
    * number / LSN): if it is `deleteOp` the key disappears, otherwise the
    * change row replaces (or inserts) the key; keys with no change keep
    * their base row. This is the full MERGE triad (`WHEN MATCHED UPDATE
    * SET * / WHEN MATCHED AND op='D' DELETE / WHEN NOT MATCHED INSERT *`)
    * that the reference executes through Delta MERGE (reference:
    * pyspark_jobs/process_recommendation_events.py upsert landing,
    * extended with tombstones) — expressed as ONE union + ONE keyed
    * window, the same single hash-shuffle plan as [[upsert]]: no join,
    * no second pass, delete-then-reinsert collapses correctly because
    * only the latest change is consulted.
    *
    * `changes` must carry every `base` column plus `opCol` and any
    * change-only `precedence` columns (base rows rank below all changes
    * regardless, so precedence only orders changes among themselves and
    * must totalize within a key — pass a unique trailing sequence).
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   opCol: String, precedence: Seq[String],
                   deleteOp: String = "D"): DataFrame = {
    val baseCols = base.columns.toSeq
    val extras = changes.columns.toSeq.filterNot(baseCols.contains)
    require(changes.columns.toSeq.filter(baseCols.contains) == baseCols,
      s"changes must carry every base column in order: ${baseCols.mkString(",")}")
    require(extras.contains(opCol), s"changes must carry op column '$opCol'")
    require(extras.forall(c => c == opCol || precedence.contains(c)),
      s"change-only columns beyond '$opCol' must be precedence columns, got: $extras")
    require(precedence.nonEmpty, "precedence must order changes within a key")
    require(!(baseCols ++ extras).exists(Set("__pri", "__rn")),
      "reserved internal column names __pri/__rn in input (rename before merging)")
    val withNulls = extras.foldLeft(base) { (d, c) =>
      d.withColumn(c, lit(null).cast(changes.schema(c).dataType))
    }
    val all = withNulls.withColumn("__pri", lit(0))
      .unionByName(changes.withColumn("__pri", lit(1)))
    // base rows sit alone at __pri=0, so the null precedence values they
    // carry never tie against a change and null ordering cannot matter
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__pri").desc +: precedence.map(col(_).desc): _*)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .filter(col(opCol).isNull || col(opCol) =!= deleteOp)
      .select(baseCols.map(col): _*)
  }

  /** SCD2 history: from a change log (key, event time, tracked attrs),
    * produce one validity interval per run of consecutive identical
    * attribute values: `[valid_from, valid_to)`, open (`null`) on the
    * current row. Consecutive duplicates collapse into the earlier row's
    * interval — re-stating an unchanged value extends, not splits, the
    * interval, which is what makes the output a true type-2 dimension
    * rather than an event log.
    *
    * `tieCol` totalizes the within-key order under equal timestamps.
    */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           tieCol: String, attrCols: Seq[String]): DataFrame = {
    val order = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    // run boundary: first row of the key, or any tracked attribute changed
    // (null-safe compare — a null attr is a value, not a wildcard)
    val changedFromPrev = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(order)))
      .reduce(_ || _)
    val runs = changes
      .withColumn("__boundary",
        when(lag(col(tsCol), 1).over(order).isNull || changedFromPrev, 1L)
          .otherwise(0L))
      .withColumn("__run",
        sum(col("__boundary"))
          .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys :+ "__run").map(col): _*)
      // every row of a run carries the SAME attr tuple (that is what
      // defines a run), so first() is deterministic here
      .agg(min(col(tsCol)).as("valid_from"),
        attrCols.map(a => first(col(a)).as(a)): _*)
    // order runs by __run (event order), not valid_from: two runs of one
    // key can share a valid_from timestamp and the lead() would be
    // engine-arbitrary on the tie
    val runOrder = Window.partitionBy(keys.map(col): _*).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(runOrder))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }
}
