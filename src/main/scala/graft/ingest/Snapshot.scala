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
    * over the named columns, null-safe (null and empty string hash
    * differently on purpose: a u0001 separator plus a u0002-prefixed
    * null sentinel make the encoding injective for any column count).
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
        md5(concat_ws("\u0001", contentCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0002null"))): _*)).as(fpName))
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
