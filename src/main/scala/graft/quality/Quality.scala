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
