package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned table commits: an ordered metadata log over immutable
  * parquet data files, giving READ-AS-OF time travel and an OPTIMISTIC
  * multi-writer commit protocol — the two storage-layer capabilities
  * the reference gets from its table format and that the bare-path
  * ingest surface (ingest/Ingest.scala) lacks (VERDICT r8 #1/#2).
  * Reference behavior being re-expressed: the serving layer replays a
  * transaction log of add/remove file actions to materialize a chosen
  * version (MinioService.cs:120–161 log replay, :185–209 add/remove
  * accumulation), and concurrent DAG writers rely on the format's
  * optimistic concurrency (spark_utils.py:51–66).
  *
  * Layout under the table root:
  * {{{
  *   _graft_log/v00000001.json      one record per commit, version-named
  *   d-<uuid>/part-*.parquet        immutable data files, one dir/commit
  * }}}
  *
  * Protocol (the standard log-structured design): data files are
  * written FIRST under a fresh uuid directory — invisible to every
  * reader until a log record references them — then the writer claims
  * the next version number by ATOMICALLY creating
  * `_graft_log/v<n+1>.json` with create-if-absent semantics
  * (`O_EXCL`/`CREATE_NEW` locally, `FileSystem.create(overwrite=false)`
  * on HDFS, where it is an atomic namenode op). Exactly one contender
  * wins a version; losers re-read the log, re-validate against the new
  * head (schema pin, snapshot totals) and retry with the next number.
  * A crash between data write and log claim leaves an orphaned data dir
  * that no reader ever sees ([[vacuum]] reclaims it).
  *
  * Each record carries the ADDED files plus the running snapshot totals
  * (`snapshotRows`, `snapshotFp`): because the content fingerprint
  * ([[Fingerprint]]) is ADDITIVE over disjoint row sets, an append's
  * snapshot digest is `prev.snapshotFp + fp(added rows)` — O(added
  * data), never a table rescan, the merkle-style rollup q203 proved.
  * Any later `readAsOf(v)` can therefore be certified against the
  * digest archived AT COMMIT TIME without trusting the replay logic.
  *
  * 100 TB posture: a commit costs one scan of the rows it adds (write +
  * digest) plus one tiny log record; version discovery is a single
  * directory listing of filenames (no record is read to find the head);
  * `readAsOf` reads only the log records (KBs) and then scans exactly
  * the active files. The log directory stays O(commits) — compaction of
  * ancient log prefixes into checkpoints is the standard extension and
  * orthogonal to the query surface.
  */
object Versioned {

  final case class Commit(version: Long, action: String, add: Seq[String],
                          schemaJson: String, nRows: Long, addFp: Long,
                          snapshotRows: Long, snapshotFp: Long,
                          remove: Seq[String] = Nil,
                          txn: Option[(String, Long)] = None,
                          stats: Map[String, Map[String, (Long, Long)]] = Map.empty)

  final val LogDir = "_graft_log"

  private val mapper = new ObjectMapper()

  // ---------- public write surface ----------

  /** Append `df` as a new version; schema must match the current head
    * exactly (the mergeSchema=false pin, enforced at COMMIT time
    * against the head the claim actually serializes after — so two
    * concurrent appends can both succeed but a drifting one fails even
    * if it validated against an older head). Returns the commit. */
  def append(df: DataFrame, path: String, maxRetries: Int = 20): Commit =
    commit(df, path, "append", maxRetries)

  /** Replace the table content as a new version (readers of older
    * versions are unaffected — old files are never touched). */
  def overwrite(df: DataFrame, path: String, maxRetries: Int = 20): Commit =
    commit(df, path, "overwrite", maxRetries)

  /** SCHEMA-EVOLVING append (the `mergeSchema=true` counterpart of the
    * pinned [[append]]): existing columns must keep their exact types,
    * NEW columns are allowed and appended after them — the evolved
    * schema becomes the commit's schema, and every later read fills
    * the old files' missing columns with null (declared-schema parquet
    * reads do this natively, and the fingerprint's injective null
    * sentinel keeps the digest well-defined). Because old rows' digests
    * change under the evolved field list, the additive snapshot rollup
    * cannot extend across the epoch boundary: an evolving commit
    * RECOMPUTES the snapshot totals with one full scan under the new
    * schema — the documented price of a schema change (rare by
    * construction), after which appends are additive again. With no
    * new columns this is exactly [[append]]. */
  def appendEvolve(df: DataFrame, path: String, maxRetries: Int = 20): Commit = {
    val spark = df.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val headOpt = latestCommit(fs, root)
    if (headOpt.isEmpty) return commit(df, path, "overwrite", maxRetries)
    val head = headOpt.get
    val headSchema = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    val incomingTypes = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    headSchema.foreach { f =>
      val in = incomingTypes.getOrElse(f.name, throw new IllegalStateException(
        s"appendEvolve at $path: evolution may only ADD columns — " +
          s"existing column `${f.name}` is missing from the incoming frame"))
      require(in == f.dataType.simpleString,
        s"appendEvolve at $path: existing column `${f.name}` changed type " +
          s"(${f.dataType.simpleString} -> $in) — widening is not supported")
    }
    val newCols = df.schema.filterNot(f => headSchema.fieldNames.contains(f.name))
    if (newCols.isEmpty) return commit(df, path, "append", maxRetries)
    val evolved = StructType(headSchema.fields ++ newCols)
    val ordered = df.select(evolved.fieldNames.toSeq.map(col): _*)

    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val dataDirName = s"d-$uuid"
    val dataDir = new Path(root, dataDirName)
    ordered.write.parquet(dataDir.toString)
    val files = fs.listStatus(dataDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$dataDirName/${s.getPath.getName}").sorted
    val (nRows, addFp, stats) = digestDir(spark, dataDir, dataDirName, evolved)

    var attempt = 0
    while (attempt < maxRetries) {
      val h = latestCommit(fs, root).get
      // a CONCURRENT evolution would make this commit's precomputed
      // schema stale (it was derived from the head at planning time) —
      // fail loudly like the COW rewrites do
      if (h.schemaJson != head.schemaJson) {
        fs.delete(dataDir, true)
        throw new java.util.ConcurrentModificationException(
          s"appendEvolve at $path: the table schema changed concurrently " +
            s"(planned against v${head.version}, head is v${h.version}) — re-plan")
      }
      // the epoch recompute: prior content digested under the EVOLVED
      // schema (missing columns read as null -> the 'N' sentinel)
      val (prevActive, _) = activeAt(fs, root, path, h.version)
      val pr =
        if (prevActive.isEmpty) (0L, 0L)
        else {
          val r = spark.read.schema(evolved)
            .parquet(prevActive.map(f => new Path(root, f).toString): _*)
            .agg(count(lit(1)).as("n"),
              coalesce(sum(Fingerprint.rowDigest(
                evolved.fieldNames.toSeq.map(col))), lit(0L)).as("fp")).head()
          (r.getLong(0), r.getLong(1))
        }
      val c = Commit(h.version + 1L, "append", files, evolved.json, nRows,
        addFp, pr._1 + nRows, pr._2 + addFp, Nil, None, stats)
      if (atomicCreate(fs, recordPath(root, c.version), render(c))) return c
      attempt += 1
    }
    fs.delete(dataDir, true)
    throw new IllegalStateException(
      s"appendEvolve to $path lost the version race $maxRetries times")
  }

  /** Row-level DELETE as a COPY-ON-WRITE commit: only the files that
    * actually hold matching rows are rewritten (their survivors become
    * new files; the affected files land in the record's `remove` list),
    * untouched files stay shared with every older version — at 100 TB
    * a delete of one user's rows costs O(files containing that user),
    * not a table rewrite. Snapshot totals stay exactly certified: the
    * commit subtracts the removed files' digests and adds the
    * survivors' (both O(affected) scans). Returns None when nothing
    * matches (no empty commit). Concurrency: a rewrite validates
    * against the head it planned from and FAILS on a concurrent commit
    * (ConcurrentModificationException) instead of retrying — its file
    * plan may be stale, the standard row-level-conflict semantics;
    * appends keep their retry loop. */
  def deleteWhere(spark: SparkSession, path: String,
                  pred: org.apache.spark.sql.Column): Option[Commit] = {
    val (head, cur, root, fs) = currentWithFiles(spark, path)
    val affected = cur.filter(pred).select(col("__file")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    if (affected.isEmpty) return None
    val survivors = cur
      .filter(col("__file").isin(affected: _*)).filter(!pred).drop("__file")
    Some(rewriteCommit(spark, root, fs, head, survivors, affected))
  }

  /** Row-level UPSERT (merge) as a copy-on-write commit: rows of
    * `updates` REPLACE current rows sharing their `keyCols` and the
    * rest INSERT. Only files holding a matched key are rewritten (their
    * unmatched rows survive into new files); `updates` must match the
    * table schema (the append pin). Same conflict semantics as
    * [[deleteWhere]]. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             keyCols: Seq[String]): Commit = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val (head, cur, root, fs) = currentWithFiles(spark, path)
    val headSchema = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
      .map(f => f.name -> f.dataType.simpleString).toMap
    val incoming = updates.schema.map(f => f.name -> f.dataType.simpleString).toMap
    require(headSchema == incoming,
      s"upsert schema mismatch at $path v${head.version}:\n" +
        s"  table:    ${headSchema.toSeq.sorted.mkString(", ")}\n" +
        s"  incoming: ${incoming.toSeq.sorted.mkString(", ")}")
    val keys = updates.select(keyCols.map(col): _*).distinct()
    val affected = cur.join(broadcast(keys), keyCols, "left_semi")
      .select(col("__file")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val survivors =
      if (affected.isEmpty) updates // pure insert; nothing rewritten
      else cur.filter(col("__file").isin(affected: _*))
        .join(broadcast(keys), keyCols, "left_anti").drop("__file")
        .unionByName(updates)
    rewriteCommit(spark, root, fs, head, survivors, affected)
  }

  /** Head commit + the current table frame tagged with each row's
    * RELATIVE file path (the copy-on-write planning scan). */
  private def currentWithFiles(spark: SparkSession, path: String)
      : (Commit, DataFrame, Path, FileSystem) = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val head = latestCommit(fs, root).getOrElse(
      throw new IllegalStateException(s"no commits at $path"))
    val rootQ = fs.makeQualified(root).toString
    val cur = readAsOf(spark, path, head.version)
      .withColumn("__file",
        expr(s"substring(_metadata.file_path, ${rootQ.length + 2})"))
    (head, cur, root, fs)
  }

  /** Shared copy-on-write commit bookkeeping: write the rebuilt rows,
    * digest both sides, and claim head+1 — failing loudly if another
    * writer got there first (the planned file set would be stale). */
  private def rewriteCommit(spark: SparkSession, root: Path, fs: FileSystem,
                            head: Commit, rebuilt: DataFrame,
                            removed: Seq[String]): Commit = {
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val dataDirName = s"d-$uuid"
    val dataDir = new Path(root, dataDirName)
    rebuilt.write.parquet(dataDir.toString)
    val files = fs.listStatus(dataDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$dataDirName/${s.getPath.getName}").sorted
    val schema = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    val (addRows, addFp, stats) = digestDir(spark, dataDir, dataDirName, schema)
    val (remRows, remFp) =
      if (removed.isEmpty) (0L, 0L)
      else {
        val r = spark.read.schema(schema)
          .parquet(removed.map(f => new Path(root, f).toString): _*)
          .agg(count(lit(1)).as("n"),
            coalesce(sum(Fingerprint.rowDigest(
              schema.fieldNames.toSeq.map(col))), lit(0L)).as("fp")).head()
        (r.getLong(0), r.getLong(1))
      }
    val c = Commit(head.version + 1L, "rewrite", files, head.schemaJson,
      addRows, addFp,
      head.snapshotRows - remRows + addRows,
      head.snapshotFp - remFp + addFp, removed, None, stats)
    if (!atomicCreate(fs, recordPath(root, c.version), render(c))) {
      fs.delete(dataDir, true)
      throw new java.util.ConcurrentModificationException(
        s"rewrite of $root planned against v${head.version} lost the claim " +
          s"for v${c.version} — re-plan against the new head")
    }
    c
  }

  /** Transactionally-tagged append for exactly-once streaming sinks:
    * if a commit tagged (txnApp, txnBatch) already exists in the log
    * the call is a NO-OP (returns None) — so a foreachBatch writer
    * re-delivering a batch after a crash/restart cannot double-commit.
    * Contract: one live writer per txnApp (foreachBatch's model — a
    * batch is retried only after failure, never concurrently). */
  def idempotentAppend(df: DataFrame, path: String, txnApp: String,
                       txnBatch: Long, maxRetries: Int = 20): Option[Commit] = {
    val spark = df.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seen = listVersions(fs, root).view
      .map(v => readCommit(fs, root, v))
      .exists(_.txn.contains((txnApp, txnBatch)))
    if (seen) None
    else Some(commit(df, path, "append", maxRetries, Some((txnApp, txnBatch))))
  }

  /** Exactly-once STREAMING SINK into a versioned table: every
    * micro-batch lands as one idempotent tagged append, so the commit
    * log carries the stream's exact history and a checkpoint-recovery
    * replay of a batch is a no-op instead of a duplicate — the
    * table-format streaming-sink semantics (the reference's Delta
    * streaming writes, spark_utils.py:51–66) on this log. Bounded run
    * (Trigger.AvailableNow); returns the sink's commit count. */
  def runStreamAppend(spark: SparkSession, source: DataFrame, path: String,
                      checkpointPath: String, appId: String): Long = {
    import org.apache.spark.sql.streaming.Trigger
    val q = source.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        idempotentAppend(batch, path, appId, batchId); ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    history(spark, path).count()
  }

  private def commit(df: DataFrame, path: String, action: String,
                     maxRetries: Int, txn: Option[(String, Long)] = None): Commit = {
    val spark = df.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // 1. data first: immutable, invisible until a log record points at it
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val dataDirName = s"d-$uuid"
    val dataDir = new Path(root, dataDirName)
    df.write.parquet(dataDir.toString)
    val files = fs.listStatus(dataDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$dataDirName/${s.getPath.getName}").sorted
    // one scan of the ADDED rows: exact count + additive content digest
    // + per-file zone-map stats (see digestDir)
    val (nRows, addFp, stats) = digestDir(spark, dataDir, dataDirName, df.schema)

    // 2. claim loop: validate against the CURRENT head, try to create
    // the next version's record exclusively, retry on loss
    var attempt = 0
    while (attempt < maxRetries) {
      val head = latestCommit(fs, root)
      head.foreach { h =>
        if (action == "append") {
          val headSchema = DataType.fromJson(h.schemaJson).asInstanceOf[StructType]
            .map(f => f.name -> f.dataType.simpleString).toMap
          val incoming = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
          if (headSchema != incoming) {
            fs.delete(dataDir, true)
            throw new IllegalStateException(
              s"versioned append schema mismatch at $path v${h.version} " +
                s"(mergeSchema is pinned false):\n" +
                s"  table:    ${headSchema.toSeq.sorted.mkString(", ")}\n" +
                s"  incoming: ${incoming.toSeq.sorted.mkString(", ")}")
          }
        }
      }
      val version = head.map(_.version).getOrElse(0L) + 1L
      val (snapRows, snapFp) = action match {
        case "append" => (head.map(_.snapshotRows).getOrElse(0L) + nRows,
          head.map(_.snapshotFp).getOrElse(0L) + addFp)
        case _ => (nRows, addFp)
      }
      val c = Commit(version, action, files, df.schema.json, nRows, addFp,
        snapRows, snapFp, Nil, txn, stats)
      if (atomicCreate(fs, recordPath(root, version), render(c))) return c
      attempt += 1 // lost the race: another writer claimed this version
    }
    fs.delete(dataDir, true)
    throw new IllegalStateException(
      s"versioned commit to $path lost the version race $maxRetries times")
  }

  // ---------- public read surface ----------

  /** Current head version (0 = no commits yet) — one directory listing,
    * no record reads. */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listVersions(fs, root).lastOption.getOrElse(0L)
  }

  /** The table AS OF `version` — the log-replay read
    * (MinioService.cs:120–161 re-expressed): accumulate add-actions,
    * reset on overwrite, scan exactly the active files with the schema
    * archived at that version. Old versions stay readable forever
    * because data files are immutable. */
  def readAsOf(spark: SparkSession, path: String, version: Long): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (active, schema) = activeAt(fs, root, path, version)
    if (active.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .parquet(active.map(f => new Path(root, f).toString): _*)
  }

  /** Replayed (active files, schema) at `version` — from the newest
    * checkpoint at or before it plus the tail records after. */
  private def activeAt(fs: FileSystem, root: Path, path: String,
                       version: Long): (Seq[String], StructType) = {
    val versions = listVersions(fs, root)
    require(versions.contains(version),
      s"version $version does not exist at $path (have: ${versions.mkString(", ")})")
    val ckpt = listCheckpoints(fs, root).filter(_ <= version).lastOption
      .map(v => readCheckpoint(fs, root, v))
    val base = ckpt.map(_._2).getOrElse(Seq.empty[String])
    val fromV = ckpt.map(_._1).getOrElse(0L)
    val commits = versions.filter(v => v > fromV && v <= version)
      .map(v => readCommit(fs, root, v))
    val active = commits.foldLeft(base) { (acc, c) =>
      if (c.action == "overwrite") c.add
      else acc.filterNot(c.remove.toSet) ++ c.add
    }
    val schemaJson = commits.lastOption.map(_.schemaJson)
      .orElse(ckpt.map(_._3))
      .getOrElse(throw new IllegalStateException(s"no schema at $path v$version"))
    (active, DataType.fromJson(schemaJson).asInstanceOf[StructType])
  }

  /** One scan of a freshly staged data directory: exact row count,
    * additive content digest, and PER-FILE ZONE-MAP STATS — min/max of
    * every integral column per file, grouped by `_metadata.file_path`
    * (the scan already runs for the digest, so the stats are free).
    * The per-file partials fold to the totals on the driver — bounded
    * by the commit's file count. */
  private def digestDir(spark: SparkSession, dataDir: Path, dataDirName: String,
                        schema: StructType)
      : (Long, Long, Map[String, Map[String, (Long, Long)]]) = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val statCols = schema.fields
      .filter(f => f.dataType == LongType || f.dataType == IntegerType)
      .map(_.name).toSeq
    val aggs = Seq(count(lit(1)).as("__n"),
      coalesce(sum(Fingerprint.rowDigest(schema.fieldNames.toSeq.map(col))),
        lit(0L)).as("__fp")) ++
      statCols.flatMap(c => Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val rows = spark.read.schema(schema).parquet(dataDir.toString)
      .groupBy(expr("_metadata.file_path").as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val nRows = rows.map(_.getLong(1)).sum
    val fp = rows.map(_.getLong(2)).sum
    val stats = rows.map { r =>
      val rel = s"$dataDirName/${r.getString(0).split('/').last}"
      val colStats = statCols.zipWithIndex.flatMap { case (c, i) =>
        val (mnI, mxI) = (3 + 2 * i, 4 + 2 * i)
        if (r.isNullAt(mnI)) None
        else Some(c -> (r.getAs[Number](mnI).longValue(),
          r.getAs[Number](mxI).longValue()))
      }.toMap
      rel -> colStats
    }.toMap
    (nRows, fp, stats)
  }

  /** [[readAsOf]] with ZONE-MAP FILE SKIPPING: the active files whose
    * archived `[min, max]` stats for `colName` provably exclude
    * `[lo, hi]` are never opened — data skipping decided entirely from
    * LOG METADATA, before any storage I/O (the Delta data-skipping
    * shape; composes with parquet row-group stats once a file IS
    * scanned). Files without archived stats for the column scan
    * conservatively. Returns (frame over the surviving files,
    * files scanned, files total); the frame still contains every
    * surviving file's rows — apply the actual predicate on top. */
  def readAsOfPruned(spark: SparkSession, path: String, version: Long,
                     colName: String, lo: Long, hi: Long)
      : (DataFrame, Int, Int) = {
    require(lo <= hi, s"need lo <= hi, got $lo > $hi")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (active, schema) = activeAt(fs, root, path, version)
    // stats lookup across every record <= version (records are always
    // retained; checkpoints only short-circuit the ACTIVE-SET replay)
    val stats = listVersions(fs, root).filter(_ <= version)
      .flatMap(v => readCommit(fs, root, v).stats).toMap
    val kept = active.filter { f =>
      stats.get(f).flatMap(_.get(colName)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true // unknown stats -> conservative scan
      }
    }
    val df =
      if (kept.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema)
        .parquet(kept.map(f => new Path(root, f).toString): _*)
    (df, kept.size, active.size)
  }

  /** Row-level CHANGE FEED over `(fromVersion, toVersion]` — the
    * change-data-capture read that lets a downstream pipeline process
    * ONLY what a version range changed instead of diffing snapshots:
    * one row per inserted/deleted row, tagged (version, change_type).
    * An update surfaces as its delete+insert pair. Cost is
    * O(files touched by the range's commits), never a snapshot diff:
    * appends emit their added rows directly; rewrites diff ONLY the
    * rewritten files' rows against their replacements (`exceptAll`
    * multiset semantics — rows the rewrite carried over unchanged
    * cancel, so only true changes surface); an overwrite diffs the
    * full before/after content (it touched everything — the honest
    * cost), again with unchanged rows cancelling. */
  def changesBetween(spark: SparkSession, path: String,
                     fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion < toVersion,
      s"need fromVersion < toVersion, got $fromVersion >= $toVersion")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = listVersions(fs, root)
    require(versions.contains(toVersion) &&
      (fromVersion == 0L || versions.contains(fromVersion)),
      s"version range ($fromVersion, $toVersion] not in log at $path")
    def readFiles(files: Seq[String], schema: StructType): DataFrame =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema)
        .parquet(files.map(f => new Path(root, f).toString): _*)
    val parts = versions.filter(v => v > fromVersion && v <= toVersion).map { v =>
      val c = readCommit(fs, root, v)
      val schema = DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
      val added = readFiles(c.add, schema)
      val (ins, del) = c.action match {
        case "append" =>
          (added, readFiles(Nil, schema))
        case "rewrite" =>
          val removed = readFiles(c.remove, schema)
          (added.exceptAll(removed), removed.exceptAll(added))
        case _ => // overwrite: diff full before/after content
          val before =
            if (v == 1L) readFiles(Nil, schema)
            else {
              val (prevActive, prevSchema) = activeAt(fs, root, path, v - 1)
              readFiles(prevActive, prevSchema)
            }
          (added.exceptAll(before), before.exceptAll(added))
      }
      ins.withColumn("_change_type", lit("insert"))
        .unionByName(del.withColumn("_change_type", lit("delete")))
        .withColumn("_version", lit(v))
    }
    // allowMissingColumns: a feed spanning a schema-evolution epoch
    // (appendEvolve) mixes commits with different widths — rows from
    // the narrow epoch carry null in the evolved columns
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** The table at its current head. */
  def read(spark: SparkSession, path: String): DataFrame =
    readAsOf(spark, path, latestVersion(spark, path))

  /** One row per commit: (version, action, n_files, n_rows, add_fp,
    * snapshot_rows, snapshot_fp) — the audit/history surface; metadata
    * only, no data scan. */
  def history(spark: SparkSession, path: String): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = listVersions(fs, root).map(v => readCommit(fs, root, v))
      .map(c => (c.version, c.action, c.add.size.toLong, c.nRows, c.addFp,
        c.snapshotRows, c.snapshotFp))
    import spark.implicits._
    rows.toDF("version", "action", "n_files", "n_rows", "add_fp",
      "snapshot_rows", "snapshot_fp")
  }

  /** The content fingerprint archived when `version` was committed —
    * what a replayed [[readAsOf]] must hash to (metadata read only). */
  def archivedFingerprint(spark: SparkSession, path: String, version: Long): (Long, Long) = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val c = readCommit(fs, root, version)
    (c.snapshotRows, c.snapshotFp)
  }

  /** Write a log CHECKPOINT at the current head: one file carrying the
    * fully-replayed active file list and snapshot totals, so a later
    * [[readAsOf]] replays only the records AFTER it instead of the
    * whole log — the standard log-compaction move that keeps version
    * discovery O(1)-ish as commits accumulate at 100 TB (a daily
    * appender writes ~365 records/year; readers should not re-fold
    * years of history per query). Checkpoints are DERIVED data: they
    * claim no version, change no semantics, and a torn/absent
    * checkpoint only costs a longer replay. Returns the checkpointed
    * version (0 if the table has no commits). */
  def checkpoint(spark: SparkSession, path: String): Long = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = listVersions(fs, root)
    if (versions.isEmpty) return 0L
    val v = versions.last
    val commits = versions.map(readCommit(fs, root, _))
    val active = commits.foldLeft(Seq.empty[String]) { (acc, c) =>
      if (c.action == "overwrite") c.add
      else acc.filterNot(c.remove.toSet) ++ c.add
    }
    val last = commits.last
    val node = mapper.createObjectNode()
    node.put("version", v)
    val arr = node.putArray("active")
    active.foreach(arr.add)
    node.put("schema", last.schemaJson)
    node.put("snapshotRows", last.snapshotRows)
    node.put("snapshotFp", last.snapshotFp)
    val p = ckptPath(root, v)
    // overwrite-create: two racing checkpointers at the same version
    // write identical content, so last-writer-wins is safe
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    v
  }

  /** Delete data directories referenced by NO commit record — the
    * leftovers of crashed writers (data written, claim never made).
    * Caller contract: run only when no writer is mid-commit (a live
    * writer's staged dir is unreferenced by design until its claim
    * lands; production deployments add an age threshold). Returns the
    * removed directory names. */
  def vacuum(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val referenced = listVersions(fs, root)
      .flatMap(v => readCommit(fs, root, v).add)
      .map(_.split("/").head).toSet
    val orphans = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("d-") &&
        !referenced.contains(s.getPath.getName))
      .map(_.getPath)
    orphans.foreach(p => fs.delete(p, true))
    orphans.map(_.getName)
  }

  // ---------- log internals ----------

  private def recordPath(root: Path, version: Long): Path =
    new Path(new Path(root, LogDir), f"v$version%08d.json")

  private def ckptPath(root: Path, version: Long): Path =
    new Path(new Path(root, LogDir), f"ckpt-$version%08d.json")

  private def listCheckpoints(fs: FileSystem, root: Path): Seq[Long] = {
    val dir = new Path(root, LogDir)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("ckpt-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("ckpt-").stripSuffix(".json").toLong).sorted
  }

  /** (version, active files, schema json) of a stored checkpoint. */
  private def readCheckpoint(fs: FileSystem, root: Path,
                             version: Long): (Long, Seq[String], String) = {
    val in = fs.open(ckptPath(root, version))
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(
      new java.io.DataInputStream(in)) finally in.close()
    val t = mapper.readTree(bytes)
    (t.get("version").asLong(),
      (0 until t.get("active").size()).map(i => t.get("active").get(i).asText()),
      t.get("schema").asText())
  }

  private def listVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val dir = new Path(root, LogDir)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong).sorted
  }

  private def latestCommit(fs: FileSystem, root: Path): Option[Commit] =
    listVersions(fs, root).lastOption.map(v => readCommit(fs, root, v))

  private def readCommit(fs: FileSystem, root: Path, version: Long): Commit = {
    val in = fs.open(recordPath(root, version))
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(
      new java.io.DataInputStream(in)) finally in.close()
    val t = mapper.readTree(bytes)
    val rem = Option(t.get("remove"))
      .map(r => (0 until r.size()).map(i => r.get(i).asText()))
      .getOrElse(Seq.empty)
    val txn = Option(t.get("txnApp"))
      .map(a => (a.asText(), t.get("txnBatch").asLong()))
    val stats = Option(t.get("stats")).map { st =>
      import scala.jdk.CollectionConverters._
      st.properties().asScala.map { e =>
        val cols = e.getValue.properties().asScala.map { ce =>
          ce.getKey -> (ce.getValue.get(0).asLong(), ce.getValue.get(1).asLong())
        }.toMap
        e.getKey -> cols
      }.toMap
    }.getOrElse(Map.empty[String, Map[String, (Long, Long)]])
    Commit(
      t.get("version").asLong(), t.get("action").asText(),
      (0 until t.get("add").size()).map(i => t.get("add").get(i).asText()),
      t.get("schema").asText(), t.get("nRows").asLong(),
      t.get("addFp").asLong(), t.get("snapshotRows").asLong(),
      t.get("snapshotFp").asLong(), rem, txn, stats)
  }

  private def render(c: Commit): Array[Byte] = {
    val node = mapper.createObjectNode()
    node.put("version", c.version)
    node.put("action", c.action)
    val arr = node.putArray("add")
    c.add.foreach(arr.add)
    node.put("schema", c.schemaJson)
    node.put("nRows", c.nRows)
    node.put("addFp", c.addFp)
    node.put("snapshotRows", c.snapshotRows)
    node.put("snapshotFp", c.snapshotFp)
    val rem = node.putArray("remove")
    c.remove.foreach(rem.add)
    c.txn.foreach { case (app, batch) =>
      node.put("txnApp", app); node.put("txnBatch", batch) }
    if (c.stats.nonEmpty) {
      val st = node.putObject("stats")
      c.stats.toSeq.sortBy(_._1).foreach { case (f, cols) =>
        val fo = st.putObject(f)
        cols.toSeq.sortBy(_._1).foreach { case (cn, (mn, mx)) =>
          val arr = fo.putArray(cn); arr.add(mn); arr.add(mx) }
      }
    }
    mapper.writeValueAsBytes(node)
  }

  /** The atomic version claim. `file://`: NIO `CREATE_NEW` is an O_EXCL
    * open — kernel-atomic, no check-then-create window (Hadoop's
    * LocalFileSystem.create(overwrite=false) only CHECKS first, a race
    * hole). Other schemes: `FileSystem.create(overwrite=false)`, which
    * HDFS implements as one atomic namenode operation. Returns false
    * when another writer holds the version. */
  private def atomicCreate(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean = {
    fs.mkdirs(p.getParent)
    if ("file" == fs.getScheme) {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        java.nio.file.Files.write(local, bytes,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException if fs.exists(p) => false
      }
    }
  }

}
