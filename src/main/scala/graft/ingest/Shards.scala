package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Splits

/** Deterministic balanced shard export — the delivery end of a training
  * pipeline: the curated corpus leaves the engine as N stable,
  * group-cohesive shards a downstream loader can consume independently.
  *
  * The reference hands its curated output to consumers as whole
  * bucket-partitioned parquet directories (process_historical_data.py:53,
  * :75; MinioService.cs:120–161 reads them back file-by-file); this module
  * re-derives that contract Spark-first with the properties a 100 TB
  * export actually needs:
  *
  *   - '''Deterministic assignment''': shard = md5-bucket(key) % N
  *     ([[graft.text.Splits.bucket]]) — a pure function of the key, so
  *     the same row lands in the same shard on any cluster size, on every
  *     rerun, and as the corpus grows. No `repartition(N)` round-robin
  *     (layout-dependent) anywhere near the assignment.
  *   - '''Group cohesion''': every row sharing a key lands in one shard
  *     (the leakage property: all of a user's events, all of a document's
  *     chunks, travel together).
  *   - '''Bounded files''': `maxRecordsPerFile` rolls a shard's output
  *     into ceil(rows / cap) files, so no single file exceeds what a
  *     loader wants to map — and because each shard's rows are shuffled
  *     into exactly one task before the write, the file count per shard
  *     is itself deterministic and auditable.
  *
  * Scale posture: one hash shuffle on the shard id (the minimum any
  * cohesive layout can pay), then a streaming write per shard directory.
  * At 100 TB, pick N ≈ data / desired-shard-size; balance follows from
  * the md5 bucket's uniformity and is itself part of the audit.
  */
object Shards {

  /** Stable shard id in [0, nShards) — a pure function of the key.
    * A null key has no home under a pure-function layout (it would land
    * in a silent default-partition directory no loader expects), so it
    * fails the job loudly instead.
    */
  def shardId(key: Column, nShards: Int): Column =
    when(key.isNull, raise_error(lit(
      s"shardId: null shard key — sharding is a pure function of the key; " +
        "filter or impute null keys before export")))
      .otherwise(Splits.bucket(key) % nShards)

  /** Write `df` as `nShards` deterministic shards under `outDir`
    * (directory layout `shard_id=K/part-*.parquet`), every file holding
    * at most `maxRecordsPerFile` rows.
    *
    * The explicit `repartition(nShards, shard_id)` routes each shard's
    * rows into a single task (hash collisions may co-locate two shards
    * in one task; `partitionBy` still splits their directories), which is
    * what makes per-shard file counts exactly ceil(rows / cap).
    *
    * Rows are sorted by (shard_id, key) inside each task — a local sort,
    * no extra shuffle — so every file's key range is an ascending,
    * file-disjoint slice of its shard, and when keys are row-unique the
    * export is fully reproducible: same rows, same files, same order on
    * every run (rows TYING on the key keep arrival order, which the
    * shuffle does not fix). The explicit sort also pre-satisfies the
    * partition-column ordering the dynamic partition writer would
    * otherwise insert itself.
    */
  def writeSharded(df: DataFrame, outDir: String, keyCol: String,
                   nShards: Int, maxRecordsPerFile: Long = 1000000L): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(maxRecordsPerFile > 0,
      s"maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    df.withColumn("shard_id", shardId(col(keyCol), nShards))
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col(keyCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard_id")
      .parquet(outDir)
  }

  /** Exact range-shard boundaries for `keyCol`: the (i/N)-quantiles for
    * i = 1..N−1, computed by [[graft.analytics.Quantiles.exactQuantiles]]
    * (basis points floor(i·10⁴/N)) and collapsed to ONE row holding the
    * ascending boundary array. Exact quantiles — not
    * `repartitionByRange`'s reservoir sampling — so the boundary set, and
    * therefore every row's shard, is a pure function of the data: stable
    * across reruns, cluster sizes, and task layouts.
    */
  def rangeBoundaries(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 2, s"range sharding needs nShards >= 2, got $nShards")
    require(nShards <= 10000, s"basis-point boundaries support at most 10000 shards, got $nShards")
    val bps = (1 until nShards).map(i => i * 10000 / nShards).distinct
    graft.analytics.Quantiles.exactQuantiles(df, keyCol, bps)
      .agg(sort_array(collect_list(col("value"))).as("bs"))
  }

  /** Range-sharded export: shard i holds the keys strictly above
    * boundary i−1 and at most boundary i (ties sit LOW — a boundary
    * value's rows all land below it, keeping the assignment a pure
    * function of the key under duplicates). Shard ids are therefore
    * key-ordered: every shard owns a contiguous, disjoint key range —
    * the layout that gives downstream loaders range pruning and
    * merge-friendly ordered consumption, where [[writeSharded]]'s hash
    * layout gives uniform balance instead.
    *
    * The assignment is a row-local fold over the broadcast boundary
    * array (`aggregate(bs, 0, acc + (key > b))` — O(N) per row, no
    * per-boundary row blowup); everything else (single shuffle on
    * shard_id, in-task sort, per-file cap, exact per-shard file counts)
    * is [[writeSharded]]'s contract.
    */
  def writeRangeSharded(df: DataFrame, outDir: String, keyCol: String,
                        nShards: Int, maxRecordsPerFile: Long = 1000000L): Unit = {
    require(maxRecordsPerFile > 0,
      s"maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    val bounds = rangeBoundaries(df, keyCol, nShards)
    val key = col(keyCol).cast("double")
    df.crossJoin(broadcast(bounds))
      .withColumn("shard_id",
        when(col(keyCol).isNull, raise_error(lit(
          "writeRangeSharded: null shard key — range sharding is a pure " +
            "function of the key; filter or impute null keys before export")))
          .otherwise(aggregate(col("bs"), lit(0),
            (acc, b) => acc + when(key > b, 1).otherwise(0))))
      .drop("bs")
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col(keyCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard_id")
      .parquet(outDir)
  }

  /** [[shardAudit]] plus the range contract: shards read back from disk
    * must form key-ordered, pairwise-disjoint ranges —
    * `range_disjoint` asserts this shard's min key lies strictly above
    * the previous non-empty shard's max (vacuous true for the first).
    * The lag window runs over one row per shard, never data rows.
    */
  def rangeShardAudit(spark: SparkSession, outDir: String, keyCol: String,
                      maxRecordsPerFile: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("shard_id"))
    shardAudit(spark, outDir, keyCol, maxRecordsPerFile)
      .withColumn("range_disjoint",
        coalesce(col("min_key").cast("double") >
          lag(col("max_key").cast("double"), 1).over(w), lit(true)))
  }

  /** Write the audit of a finished export as a single-file JSON-lines
    * manifest under `outDir/_manifest` — the delivery contract a
    * downstream loader reads instead of listing directories: one record
    * per shard with row/key counts, key extents, file count, and the
    * verified per-file cap. Computed from the written bytes via
    * [[shardAudit]], not from the writer's intent; coalesce(1) is safe
    * because the frame is one row per shard.
    */
  def writeManifest(spark: SparkSession, outDir: String, keyCol: String,
                    maxRecordsPerFile: Long): Unit =
    shardAudit(spark, outDir, keyCol, maxRecordsPerFile)
      .coalesce(1)
      .sortWithinPartitions(col("shard_id"))
      .write.mode(SaveMode.Overwrite)
      .json(s"$outDir/_manifest")

  /** Audit a sharded export by reading back the ACTUAL files: per shard,
    * the row count, distinct/min/max key, the real file count, and
    * whether every single file respects the record cap. A downstream
    * loader can trust a manifest derived from this because it is computed
    * from the bytes on disk, not from the writer's intent.
    */
  def shardAudit(spark: SparkSession, outDir: String, keyCol: String,
                 maxRecordsPerFile: Long): DataFrame = {
    val perFile = spark.read.parquet(outDir)
      .groupBy(col("shard_id"), col("_metadata.file_path").as("__file"))
      .agg(count(lit(1)).as("__file_rows"),
        min(col(keyCol)).as("__file_min"), max(col(keyCol)).as("__file_max"))
    perFile
      .groupBy(col("shard_id"))
      .agg(
        sum(col("__file_rows")).as("n_rows"),
        // keys never straddle files of DIFFERENT shards (cohesion), but
        // may straddle files within one shard — distinct keys must be
        // re-derived from the data, not summed per file
        min(col("__file_min")).as("min_key"),
        max(col("__file_max")).as("max_key"),
        count(lit(1)).as("n_files"),
        bool_and(col("__file_rows") <= maxRecordsPerFile).as("files_capped"))
      .join(
        spark.read.parquet(outDir).groupBy(col("shard_id"))
          .agg(count_distinct(col(keyCol)).as("n_keys")),
        Seq("shard_id"))
      .select(col("shard_id").cast("long").as("shard_id"), col("n_rows"),
        col("n_keys"), col("min_key"), col("max_key"), col("n_files"),
        col("files_capped"))
  }
}
