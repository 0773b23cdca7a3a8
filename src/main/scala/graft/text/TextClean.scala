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
