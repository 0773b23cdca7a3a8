package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the incremental-curation primitive: given
  * the current and previous versions of a keyed corpus, classify every
  * key as added / removed / changed / unchanged by content fingerprint.
  *
  * The reference re-ingests whole tables on every weekly run and lets
  * the bronze overwrite hide what actually changed
  * (process_weekly_trends.py:33–39); at 100 TB the pipeline needs the
  * opposite: an exact, cheap statement of the delta, so downstream
  * stages (dedup, decontamination, re-sharding) re-run only over
  * `added ∪ changed` instead of the world.
  *
  * Scale posture: each side collapses to (key, fingerprint) before the
  * join — a md5 per row computed scan-side, so the shuffle carries 2
  * narrow columns, not document bodies. One co-partitioned full-outer
  * hash join on the key; no broadcast assumption (both sides are
  * corpus-sized), no skew (keys are unique per side by contract).
  */
object Snapshot {

  /** One row per key with a `status` column. Content equality is md5
    * over FIXED-WIDTH per-column blocks: each column hashes to 32 hex
    * chars first (nulls to a non-hex sentinel that cannot collide with
    * any md5 output), so the combined encoding is injective for any
    * column count and any content — including content containing
    * separator bytes, which defeats naive `concat_ws` fingerprints.
    */
  def diff(cur: DataFrame, prev: DataFrame, keyCol: String,
           contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    // a null key can never join with itself (SQL null semantics), so a
    // doc present unchanged on both sides would silently report as
    // added + removed — fail loudly instead
    def checkedKey: Column =
      when(col(keyCol).isNull, raise_error(lit(
        s"Snapshot.diff: null value in key column '$keyCol' — keys must " +
          "be non-null for the delta to be well-defined")))
        .otherwise(col(keyCol)).as(keyCol)
    def fingerprint(df: DataFrame, fpName: String): DataFrame =
      df.select(checkedKey,
        md5(concat(contentCols.map(c =>
          coalesce(md5(col(c).cast("string")), lit("<null-column-block>"))): _*))
          .as(fpName))
    fingerprint(cur, "__fp_cur")
      .join(fingerprint(prev, "__fp_prev"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__fp_prev").isNull, lit("added"))
          .when(col("__fp_cur").isNull, lit("removed"))
          .when(col("__fp_cur") =!= col("__fp_prev"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The delta worklist: keys downstream stages must reprocess. */
  def changedKeys(cur: DataFrame, prev: DataFrame, keyCol: String,
                  contentCols: Seq[String]): DataFrame =
    diff(cur, prev, keyCol, contentCols)
      .filter(col("status").isin("added", "changed"))
      .select(col(keyCol), col("status"))
}
