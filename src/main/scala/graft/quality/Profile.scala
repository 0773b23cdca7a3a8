package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-column table profiling — the discovery pass a curation pipeline
  * runs before writing expectations (reference: great_expectations
  * suite bootstrap in the quality gate, SURVEY.md §5 item 4; the
  * reference profiles interactively, here it is one declarative job).
  *
  * One row out per profiled column: row count, null count, distinct
  * count, min/max (stringified so heterogeneous column types share one
  * output schema). The whole profile is ONE aggregate over ONE scan —
  * no per-column jobs, no driver loop over columns.
  *
  * Scale posture: with `exactDistinct = true` (the oracle-checked
  * default) Spark plans the multi-column distinct through an Expand —
  * the scanned rows are replicated (k+1)× through the partial
  * aggregate, the standard exact plan; linear in data × columns, all
  * map-side combinable. For wide tables at 100 TB pass
  * `exactDistinct = false`: `approx_count_distinct` (HLL++) keeps the
  * pass expand-free and constant-memory per column — same envelope
  * trade as [[graft.operators.Sketches]] q42.
  */
object Profile {

  /** Profile `cols` of `df` in one aggregate pass; one output row per
    * column: (col_name, n_rows, n_nulls, n_distinct, min_s, max_s).
    * min/max/distinct ignore nulls (SQL semantics); an all-null column
    * profiles as (n, n, 0, null, null).
    */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(",")}")
    require(cols.forall(!_.startsWith("__")),
      "reserved __ prefix in profiled column names")
    def nd(c: String): Column =
      if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single wide row to one row per column; explode of a
    // k-element literal-shaped array is row-local, no second pass
    val entries = array(cols.map(c => struct(lit(c).as("col_name"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))): _*)
    one.select(col("__n").as("n_rows"), explode(entries).as("__e"))
      .select(col("__e.col_name").as("col_name"), col("n_rows"),
        col("__e.n_nulls").as("n_nulls"),
        col("__e.n_distinct").as("n_distinct"),
        col("__e.min_s").as("min_s"), col("__e.max_s").as("max_s"))
  }
}
