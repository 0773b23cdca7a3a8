package graft.vector

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{dot, prep}

/** Persisted IVF+PQ serving index — the ANN counterpart of the q192
  * stored-sketch pattern (VERDICT r8 #6): training and encoding run
  * ONCE at build time and land as three parquet tables; every
  * subsequent top-k query is answered FROM THE STORED INDEX with no
  * scan of the raw embedding corpus (PlanShapeSpec pins this on the
  * executed plan).
  *
  * Layout under `indexPath`:
  * {{{
  *   centroids/                  nCentroids rows: (cent_id, cv, cnorm)
  *   codebooks/                  m·codesPerSub rows: (s, code_id, cv)
  *   codes/cent_id=K/            m rows per corpus vector: (vec_id, s, code_id)
  * }}}
  *
  * `codes` is HIVE-PARTITIONED BY CELL: probing nProbe cells at serve
  * time prunes to those directories — the partition-pruning layout
  * lever (ingest/Ingest.scala's year/month discipline) applied to
  * vector search. A 64-dim float vector stores as 4 one-byte-scale
  * codes + a cell id: the ~60× compression is what makes the serving
  * tier RAM-resident at 100 TB corpus scale while the raw embeddings
  * stay on cold storage.
  *
  * Determinism: training reuses [[Similarity]]'s fixed-point Lloyd's
  * machinery (q35/q135 — bit-exact on any partition layout), so the
  * stored tables and every served score replay in the oracle.
  */
object ServingIndex {

  /** Train + encode + persist. One pass to train centroids, one to
    * train codebooks (both broadcast-join scans with narrow fixed-point
    * partial-mean shuffles), one to encode and write. Overwrites any
    * existing index at `indexPath`. */
  def build(spark: SparkSession, embeddings: DataFrame, indexPath: String,
            nCentroids: Int = 16, m: Int = 4, codesPerSub: Int = 16,
            trainIterations: Int = 2): Unit = {
    val data = prep(embeddings).cache()
    try {
      val dim = data.select(size(col("v"))).head().getInt(0)
      require(dim > 0 && dim % m == 0,
        s"vector dim $dim must split into $m subspaces")
      val sd = dim / m

      val cents = Similarity.trainCentroidsPrepped(data, nCentroids,
          trainIterations)
        .withColumn("cnorm", sqrt(dot("cv", "cv")))
        .localCheckpoint()
      cents.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$indexPath/centroids")

      val subsData = Similarity.pqSubspaces(data, "vec_id", m, sd).cache()
      try {
        val codebooks = Similarity.trainPqCodebooks(data, subsData, m, sd,
          codesPerSub, trainIterations)
        codebooks.coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(s"$indexPath/codebooks")

        // cell assignment (max-cosine, tie -> lowest cent_id; map-side
        // max_by so the shuffle carries N rows, not N x C)
        val cells = data.crossJoin(broadcast(cents))
          .withColumn("__cs",
            round(dot("v", "cv") / (col("norm") * col("cnorm")), 6))
          .groupBy(col("vec_id"))
          .agg(max_by(col("cent_id"),
            struct(col("__cs"), (-col("cent_id")).cast("long"))).as("cent_id"))
        // PQ encode + attach the cell, write partitioned by cell so a
        // probe reads only its directories
        Similarity.pqAssign(subsData, codebooks)
          .select(col("vec_id"), col("s"), col("code_id"))
          .join(cells, Seq("vec_id"))
          .repartition(col("cent_id"))
          .write.mode(SaveMode.Overwrite).partitionBy("cent_id")
          .parquet(s"$indexPath/codes")
      } finally subsData.unpersist()
    } finally data.unpersist()
  }

  /** Incrementally add vectors to an existing index WITHOUT retraining:
    * encode the new batch with the STORED centroids and codebooks and
    * append its codes into the cell partitions — the production
    * steady-state (a daily embedding delta lands in one encode pass;
    * retraining stays a scheduled [[build]] rebuild). Because cell
    * assignment and PQ codes are pure functions of (vector, stored
    * tables), an index grown by appends is IDENTICAL to one whose
    * build encoded all the vectors against the same trained tables —
    * the spec asserts this bit-for-bit. Recall drifts only as the new
    * data drifts from the training distribution: the standard IVF
    * operational trade, solved by scheduled rebuilds. */
  def append(spark: SparkSession, indexPath: String,
             embeddings: DataFrame): Unit = {
    val cents = broadcast(spark.read.parquet(s"$indexPath/centroids"))
    val codebooks = spark.read.parquet(s"$indexPath/codebooks")
    val meta = codebooks.agg(max(col("s")), max(size(col("cv")))).head()
    val (m, sd) = (meta.getInt(0) + 1, meta.getInt(1))
    val data = prep(embeddings)
    val cells = data.crossJoin(cents)
      .withColumn("__cs",
        round(dot("v", "cv") / (col("norm") * col("cnorm")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("__cs"), (-col("cent_id")).cast("long"))).as("cent_id"))
    Similarity.pqAssign(Similarity.pqSubspaces(data, "vec_id", m, sd), codebooks)
      .select(col("vec_id"), col("s"), col("code_id"))
      .join(cells, Seq("vec_id"))
      .repartition(col("cent_id"))
      .write.mode(SaveMode.Append).partitionBy("cent_id")
      .parquet(s"$indexPath/codes")
  }

  /** Top-k from the STORED index only: probe the nProbe max-cosine
    * cells per query against the broadcast centroid table, statically
    * prune the codes scan to the probed cells (the probe list is
    * |queries|·nProbe ids — bounded driver coordination, and the
    * pushdown is what guarantees `PartitionFilters` on the codes scan),
    * then ADC-score the surviving codes from the per-query distance
    * table exactly as [[Similarity.pqTopK]] does. The raw embedding
    * corpus is never touched — `queries` carries its own vectors.
    */
  def serve(spark: SparkSession, indexPath: String, queries: DataFrame,
            k: Int = 10, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = broadcast(spark.read.parquet(s"$indexPath/centroids"))
    val codebooks = spark.read.parquet(s"$indexPath/codebooks")

    // geometry from the stored codebooks (one tiny head collect)
    val meta = codebooks.agg(max(col("s")), max(size(col("cv")))).head()
    val (m, sd) = (meta.getInt(0) + 1, meta.getInt(1))

    val q = prep(queries).select(col("vec_id").as("query_id"), col("v"),
      col("norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cs").desc, col("cent_id").asc)
    val probes = q.crossJoin(cents)
      .withColumn("__cs",
        round(dot("v", "cv") / (col("norm") * col("cnorm")), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("cent_id"), col("v"))
      .localCheckpoint()

    // per-query ADC distance tables from the stored codebooks
    val qsubs = Similarity.pqSubspaces(q, "query_id", m, sd)
      .select(col("query_id"), col("s"), col("sv").as("qsv"))
    val dtab = qsubs.join(broadcast(codebooks), Seq("s"))
      .select(col("query_id"), col("s"), col("code_id"),
        round(dot("qsv", "cv") * 1000000).cast("long").as("pd"))

    // static partition pruning: the probed cell list is tiny by
    // construction — push it into the scan as an IN filter
    val probedCells = probes.select(col("query_id"), col("cent_id"))
    val cellIds = probedCells.select(col("cent_id")).distinct()
      .as[Long].collect().sorted.toIndexedSeq
    val codes = spark.read.parquet(s"$indexPath/codes")
      .filter(col("cent_id").isin(cellIds: _*))

    val scored = codes.join(broadcast(probedCells), Seq("cent_id"))
      .join(broadcast(dtab), Seq("query_id", "s", "code_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd")).as("sp"))
      .select(col("query_id"), col("vec_id"),
        (col("sp").cast("double") / 1000000.0).as("score"))
      .as[Similarity.Scored]
    Similarity.rankTopK(scored, k)
  }
}
