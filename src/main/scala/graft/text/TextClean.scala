package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleaning transforms for LLM training data — the C4-style
  * normalization pass that runs between ingest and dedup. All are
  * codegen'd column expressions: the whole pass costs one projection
  * scan at any corpus size.
  */
object TextClean {

  /** Conservative PII patterns (kept RE2-compatible so the same rules
    * port to RE2-based engines): emails, international-ish phone
    * sequences, IPv4 addresses. */
  val EmailRe = "[0-9A-Za-z._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // explicit whitespace class, not \s: Java's \s includes U+000B, RE2's
  // does not — the explicit class means identical matches in both engines
  val PhoneRe = "\\+?[0-9][0-9()\\- \\t\\n\\r\\f]{7,}[0-9]"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Replace emails/phones/IPs with typed placeholder tokens. */
  def redactPii(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Number of PII matches a redaction pass would replace — the audit
    * metric logged before scrubbing. */
  def piiCount(textCol: Column): Column =
    (size(split(textCol, EmailRe)) - 1) +
      (size(split(textCol, Ipv4Re)) - 1) +
      (size(split(textCol, PhoneRe)) - 1)

  /** Corpus-level PII audit: per pattern type, how many documents hit
    * and how many total matches a redaction pass would replace — the
    * monitoring number logged BEFORE scrubbing (and the evidence that
    * scrubbing is/isn't needed). Output: (pii_type, n_docs, n_hits),
    * one row per pattern, ordered by type.
    *
    * One projection computes every type's match count per document
    * (the patterns are RE2-compatible by construction, so the DuckDB
    * oracle runs the IDENTICAL regexes), one aggregate reduces them,
    * and the per-type rows unpivot via a row-local literal-array
    * explode — the whole audit is one scan at any corpus size
    * ([[graft.quality.Profile.profile]]'s shape).
    */
  def piiAudit(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val pats = Seq("email" -> EmailRe, "ipv4" -> Ipv4Re, "phone" -> PhoneRe)
    val hits = docs.select(pats.map { case (n, re) =>
      (size(split(col(textCol), re)) - 1).cast("long").as(s"__h_$n") }: _*)
    val aggs = pats.flatMap { case (n, _) => Seq(
      count(when(col(s"__h_$n") > 0, 1)).as(s"__d_$n"),
      coalesce(sum(col(s"__h_$n")), lit(0L)).as(s"__s_$n")) }
    val one = hits.agg(aggs.head, aggs.tail: _*)
    val entries = array(pats.map { case (n, _) => struct(lit(n).as("pii_type"),
      col(s"__d_$n").as("n_docs"), col(s"__s_$n").as("n_hits")) }: _*)
    one.select(explode(entries).as("__e"))
      .select(col("__e.pii_type").as("pii_type"),
        col("__e.n_docs").as("n_docs"), col("__e.n_hits").as("n_hits"))
      .orderBy(col("pii_type"))
  }

  /** Collapse runs of whitespace to single spaces and trim — the
    * canonicalization that makes fingerprints spacing-insensitive. */
  def collapseWhitespace(textCol: Column): Column =
    trim(regexp_replace(textCol, "[ \\t\\n\\r\\f]+", " "))

  /** Remove duplicate lines WITHIN a document, keeping first occurrence
    * in order (boilerplate killer: nav bars, repeated footers). */
  def dedupLines(textCol: Column): Column =
    array_join(array_distinct(split(textCol, "\\n")), "\n")

  /** Apply the full cleaning pass, preserving the original column under
    * `raw_<name>` for lineage. */
  def clean(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumnRenamed(textCol, s"raw_$textCol")
      .withColumn(textCol,
        collapseWhitespace(dedupLines(redactPii(col(s"raw_$textCol")))))
}
