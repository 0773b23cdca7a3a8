package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-enforced loaders for the driver-generated test tables
  * (TESTDATA.md). Mirrors the reference's ingest discipline of declaring
  * every schema explicitly instead of inferring
  * (reference: pyspark_jobs/process_historical_data.py:18–37,66).
  *
  * Scale posture: these are plain columnar Parquet scans — Catalyst pushes
  * filters and prunes columns into the scan (`PushedFilters`/`ReadSchema`),
  * so downstream operators should select/filter as early as possible and
  * never cache a full table that is consumed once.
  */
object Tables {

  /** Explicit schemas, declared (not inferred) per the reference's ingest
    * convention. Used by `assertSchema` and by the streaming/ingest paths;
    * batch parquet reads trust the footer but are validated on demand.
    */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      // parquet timestamp[ms] with isAdjustedToUTC=false → Spark reads NTZ
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
  )

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")

  /** `events.ts` normalization to the declared TimestampType (µs, UTC
    * session zone), tolerant of how the generator wrote the column:
    *
    *   - parquet TIMESTAMP(MICROS/MILLIS), adjusted-to-UTC or not → the
    *     table is RE-READ with the declared schema, so `ts` arrives as
    *     TimestampType straight from the scan. This beats a
    *     cast-after-read (which the NTZ inference would force): a cast
    *     wrapped around the column BLOCKS predicate pushdown, while the
    *     schema-coerced read keeps `PushedFilters` on ts working — at
    *     100 TB a time-range predicate must prune at the scan, not
    *     post-scan. Under the UTC session zone the µs values are
    *     identical either way (verified value-for-value at migration).
    *   - parquet TIMESTAMP(NANOS) + `nanosAsLong=true` (older generator
    *     output) → raw ns longs; floored ns→µs via pmod — `div` truncates
    *     toward zero, which differs from floor for pre-epoch timestamps,
    *     and a double roundtrip would lose precision above 2^53 ns.
    *
    * The DuckDB oracles convert with `epoch_ns(ts) // 1000` (floor),
    * which matches every branch at µs resolution.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType | TimestampType =>
        // The schema-coerced read reinterprets the file's local wall-clock
        // micros in the SESSION zone; only under UTC is that the identity
        // mapping the oracles (and the replaced ns-long path, which was
        // zone-independent) assume. Fail loudly rather than shift every
        // timestamp by a zone offset on a misconfigured session.
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts schema-coerced read requires spark.sql.session.timeZone=UTC " +
            s"(got ${spark.conf.get("spark.sql.session.timeZone")})")
        spark.read.schema(schemas("events")).parquet(path(dir, "events"))
      case other =>
        throw new IllegalStateException(s"events.ts arrived as $other; expected " +
          "nanosecond longs, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Schema-enforcement check in the spirit of the reference's non-nullable
    * key declarations (process_historical_data.py:19). Name+type equality,
    * nullability ignored (parquet footers mark everything nullable).
    */
  def assertSchema(df: DataFrame, name: String): DataFrame = {
    val expected = schemas(name).map(f => (f.name, f.dataType))
    val actual = df.schema.map(f => (f.name, f.dataType))
    require(actual == expected,
      s"schema mismatch for $name:\n  expected $expected\n  actual   $actual")
    df
  }
}
