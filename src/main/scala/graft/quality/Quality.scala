package graft.quality

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The reference's Great Expectations suite re-derived as DataFrame
  * assertions (great_expectations_utils.py:19–35; suite JSON at
  * great_expectations/expectations/bronze_fact_listening_events.json.json),
  * fixed to check the REAL bronze schema instead of the suite's stale
  * column list (SURVEY §1.4 item 3).
  *
  * Design: every expectation compiles to ONE conditional aggregate, and
  * [[run]] evaluates the whole suite in a single `agg(...)` pass — one
  * scan, map-side combined, no per-check jobs. At 100 TB the gate costs
  * exactly one pass over the gated table.
  */
object Quality {

  /** One expectation = a display name + a violation-counting aggregate
    * column (0 ⇒ pass). */
  final case class Expectation(name: String, violations: org.apache.spark.sql.Column)

  /** expect_column_values_to_not_be_null */
  def notNull(c: String): Expectation =
    Expectation(s"not_null_$c", sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** expect_column_values_to_be_in_set (suite expectation[4]) */
  def valuesIn(c: String, allowed: Seq[String]): Expectation =
    Expectation(s"values_in_$c",
      sum(when(!col(c).isin(allowed: _*) || col(c).isNull, 1L).otherwise(0L)))

  /** expect_column_values_to_be_unique for a key column: #rows − #distinct. */
  def unique(c: String): Expectation =
    Expectation(s"unique_$c", (count(lit(1)) - countDistinct(col(c))).cast("long"))

  /** expect_table_row_count_to_be_greater_than 0 */
  val nonEmpty: Expectation =
    Expectation("non_empty", when(count(lit(1)) === 0, 1L).otherwise(0L))

  /** expect_column_values_to_be_between (numeric bounds, inclusive). */
  def between(c: String, lo: Double, hi: Double): Expectation =
    Expectation(s"between_$c",
      sum(when(col(c) < lo || col(c) > hi || col(c).isNull, 1L).otherwise(0L)))

  /** expect_table_columns_to_match_ordered_list — schema-level, evaluated
    * without scanning data. */
  def columnsMatch(df: DataFrame, expected: Seq[String]): Expectation =
    Expectation("columns_ordered",
      lit(if (df.columns.toSeq == expected) 0L else 1L))

  /** Evaluate a suite in one aggregate pass →
    * (check_name, violations, passed) rows, ordered by check name. */
  def run(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val aggs = suite.map(e => coalesce(e.violations, lit(0L)).as(e.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one-row wide frame → long (check_name, violations) via stack
    val stacked = wide.select(expr(
      s"stack(${suite.size}, " +
        suite.map(e => s"'${e.name}', ${e.name}").mkString(", ") +
        ") AS (check_name, violations)"))
    stacked.withColumn("passed", col("violations") === 0L)
      .orderBy(col("check_name"))
  }

  /** Referential-integrity coverage of a fact key against a dimension
    * key — the cross-TABLE audit the single-table suite above cannot
    * express: what fraction of fact rows would survive an inner join to
    * the dimension. Output: one row
    * (n_rows, n_matched, n_missing, n_null, coverage) where
    * coverage = n_matched / n_rows (0.0 on an empty fact side). Null
    * fact keys are counted separately — they can never match, and
    * folding them into n_missing hides whether the problem is absent
    * dimension rows or absent keys.
    *
    * Scale posture: the dimension collapses to DISTINCT keys before the
    * join (dimension-cardinality rows move, never dimension payloads);
    * the fact side carries only its key column into one equi-join (AQE
    * broadcasts the key set while it is small) and one counting
    * aggregate — a single pass over the fact table.
    */
  def fkCoverage(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String): DataFrame = {
    val dimKeys = dim.select(col(dimKey).as("__k")).filter(col("__k").isNotNull)
      .distinct().withColumn("__hit", lit(1L))
    fact.select(col(factKey).as("__k"))
      .join(dimKeys, Seq("__k"), "left")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_matched"),
        coalesce(sum(when(col("__k").isNotNull && col("__hit").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_missing"),
        coalesce(sum(when(col("__k").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_null"))
      .select(col("n_rows"), col("n_matched"), col("n_missing"), col("n_null"),
        when(col("n_rows") === 0, lit(0.0))
          .otherwise(col("n_matched").cast("double") / col("n_rows").cast("double"))
          .as("coverage"))
  }

  /** Fail-stop barrier (process_collaborative_filtering.py:17–22 runs the
    * GE checkpoint and raises on violation, killing the job before any
    * downstream write): returns the input frame if the suite passes,
    * throws listing every failed check otherwise.
    */
  def gate(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val failed = run(df, suite).filter(!col("passed"))
      .collect().map { case Row(name: String, v: Long, _) => s"$name ($v violations)" }
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"quality gate failed: ${failed.mkString(", ")}")
    df
  }

  /** The corrected bronze-events suite (SURVEY §1.4 item 3): real columns,
    * real event-type domain. */
  def eventsSuite(df: DataFrame): Seq[Expectation] = Seq(
    columnsMatch(df, Seq("event_id", "ts", "user_id", "event_type", "value", "props")),
    notNull("event_id"),
    notNull("user_id"),
    valuesIn("event_type", Seq("click", "view", "purchase", "signup", "error")),
    unique("event_id"),
    nonEmpty)

  /** Corpus-ingest gate for the documents table: the checks an LLM data
    * pipeline runs before dedup/scoring touches a batch. */
  def documentsSuite(df: DataFrame): Seq[Expectation] = Seq(
    columnsMatch(df, Seq("doc_id", "text", "lang", "source", "n_chars")),
    notNull("doc_id"),
    notNull("text"),
    unique("doc_id"),
    valuesIn("lang", Seq("en", "de", "fr", "es", "zh")),
    between("n_chars", 1, 1e9),
    nonEmpty)
}
