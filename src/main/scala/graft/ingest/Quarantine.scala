package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Dirty-ingestion quarantine: read semi-structured input in PERMISSIVE
  * mode, route unparseable records to a quarantine frame carrying the
  * raw line, and keep the clean frame strictly typed — the ingestion
  * contract a production landing zone needs (fail-NOTHING, lose
  * nothing, account for everything), complementing the fail-loud
  * `mergeSchema` pin (S4) and the malformed-value decode of the
  * streaming path (S7, from_json null-row handling).
  *
  * The reference's consumer assumes clean producer output
  * (process_recommendation_events.py:57–62 parses unconditionally);
  * this is the hardened form.
  *
  * Scale posture: one pass, no shuffle — lines are read as text and
  * parsed with a projection-level `from_json` carrying its own corrupt
  * column (the S7 streaming-decode shape), so routing is a row-local
  * filter. This deliberately avoids `spark.read.json`'s corrupt-column
  * path: queries referencing only the corrupt column over raw JSON are
  * disallowed (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
  * and the documented workaround is caching the whole raw frame —
  * a non-starter at corpus scale.
  */
object Quarantine {

  val CorruptCol = "_corrupt_record"

  /** Read `path` as JSON lines against `ddl`, splitting clean vs
    * quarantined. Returns (clean, quarantine): clean has exactly the
    * declared columns; quarantine carries the raw offending line.
    * A parseable line with missing fields is clean-with-nulls; a
    * type-mismatched or syntactically broken line quarantines whole.
    */
  def readJsonLines(spark: SparkSession, path: String,
                    ddl: String): (DataFrame, DataFrame) = {
    val schema = StructType.fromDDL(ddl).add(CorruptCol, StringType)
    val parsed = spark.read.text(path)
      .select(col("value").as("raw_line"),
        from_json(col("value"), schema, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
    val clean = parsed.where(col(s"r.$CorruptCol").isNull)
      .select(StructType.fromDDL(ddl).fieldNames.toSeq
        .map(f => col(s"r.$f").as(f)): _*)
    val quarantine = parsed.where(col(s"r.$CorruptCol").isNotNull)
      .select(col("raw_line"))
    (clean, quarantine)
  }

  /** One-row ingestion accounting: every input line is either clean or
    * quarantined (`accounted` pins the conservation law), with a
    * cent-exact sum over the clean side's `valueCol`.
    */
  def auditJsonLines(spark: SparkSession, path: String, ddl: String,
                     valueCol: String): DataFrame = {
    val (clean, quarantine) = readJsonLines(spark, path, ddl)
    val total = spark.read.text(path).count()
    clean.agg(count(lit(1)).as("n_clean"),
        sum(round(col(valueCol) * 100, 0).cast("long")).as("clean_cents"))
      .crossJoin(broadcast(
        quarantine.agg(count(lit(1)).as("n_quarantined"))))
      .select(col("n_clean"), col("n_quarantined"), col("clean_cents"),
        (col("n_clean") + col("n_quarantined") === total).as("accounted"))
  }
}
