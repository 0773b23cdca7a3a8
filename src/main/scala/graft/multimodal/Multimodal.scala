package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for LLM data pipelines: media payloads as
  * opaque `binary` columns with a typed metadata struct, processed by
  * batch-shaped per-partition feature extraction.
  *
  * The DECODE step is a deliberate stub (this environment ships no
  * image/audio codecs): [[FakeCodec]] computes deterministic
  * pseudo-features from the raw bytes. Everything around it — the
  * (id, media_type, payload, meta) schema, the `Dataset[MediaRecord]`
  * typed boundary, the mapPartitions batch shape, and the downstream
  * relational aggregation — is the real production plumbing: swapping
  * [[FakeCodec.decode]] for a JNI/codec call changes no plan shape.
  *
  * Scale: feature extraction is embarrassingly parallel per partition;
  * payloads never cross a shuffle (features are extracted BEFORE any
  * wide operation, so the shuffle carries fixed-width feature rows, not
  * media bytes — the cardinal rule for multimodal pipelines).
  */
object Multimodal {

  final case class MediaMeta(source: String, n_bytes: Long)
  final case class MediaRecord(doc_id: Long, media_type: String,
                               payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(doc_id: Long, source: String, n_bytes: Long,
                                 head_byte: Long, checksum: Long)

  /** STUB codec — stands in for image/audio decoding, which needs
    * libraries absent from this environment. Deterministic on the payload
    * bytes so results are reproducible and oracle-checkable.
    */
  object FakeCodec {
    def decode(r: MediaRecord): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
      MediaFeatures(r.doc_id, r.meta.source, r.payload.length.toLong,
        if (r.payload.nonEmpty) (r.payload(0) & 0xff).toLong else -1L,
        sum % 1000003L)
    }
  }

  /** Wrap a text corpus as media records: the text bytes stand in for an
    * opaque payload. In production this column comes straight from the
    * binary file source (`spark.read.format("binaryFile")`).
    */
  def toMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    // null text → null payload after encode; every downstream transform
    // dereferences payload bytes, so exclude the row here (matching how
    // SQL replays drop NULLs) instead of NPE-ing in an executor
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(col("source"), length(col("text")).cast("long").as("n_bytes")).as("meta"))
      .as[MediaRecord]
  }

  /** Batch feature extraction: one codec invocation per record, iterated
    * per partition (the JVM analogue of a vectorized-batch UDF — codec
    * state could be initialized once per partition before the iterator
    * is consumed).
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition codec setup would go here (open decoder context once)
      it.map(FakeCodec.decode)
    }
  }

  final case class FrameRecord(doc_id: Long, frame_idx: Int,
                               n_bytes: Long, head_byte: Long)

  /** "Resize" stub — the 1:1 payload-to-payload transform shape (image
    * downscale, audio resample): deterministically truncate the payload
    * to `maxBytes` and update the metadata. Swapping the truncation for
    * a real codec resample changes no plan shape: the transform is
    * partition-local, payloads never cross a shuffle, and metadata
    * stays consistent with the bytes.
    */
  def resizePayload(records: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    require(maxBytes >= 0, s"maxBytes must be >= 0, got $maxBytes")
    records.map { r =>
      val p =
        if (r.payload.length <= maxBytes) r.payload
        else java.util.Arrays.copyOf(r.payload, maxBytes)
      MediaRecord(r.doc_id, r.media_type, p,
        MediaMeta(r.meta.source, p.length.toLong))
    }
  }

  /** Frame-sampling stub — the 1:N record-to-frames shape (video frame
    * extraction, audio windowing): emit a `frameSize`-byte frame every
    * `stride` bytes of the payload (the final frame may be short; an
    * empty payload yields no frames). Output rows carry fixed-width
    * per-frame features, not the frame bytes, so everything downstream
    * of the flatMap shuffles narrow rows — the same cardinal rule as
    * [[extractFeatures]].
    */
  def sampleFrames(records: Dataset[MediaRecord], frameSize: Int,
                   stride: Int): Dataset[FrameRecord] = {
    import records.sparkSession.implicits._
    require(frameSize > 0 && stride > 0,
      s"frameSize and stride must be positive, got $frameSize/$stride")
    records.flatMap { r =>
      Iterator.range(0, r.payload.length, stride).zipWithIndex.map {
        case (off, idx) =>
          val end = math.min(off + frameSize, r.payload.length)
          FrameRecord(r.doc_id, idx, (end - off).toLong,
            (r.payload(off) & 0xff).toLong)
      }
    }
  }

  /** Per-source corpus profile over extracted features — the relational
    * side of the pipeline, operating on fixed-width rows only. */
  def profileBySource(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("checksum")).as("checksum_sum"),
        min(col("head_byte")).as("min_head"))
      .orderBy(col("source"))

  /** Byte-histogram near-duplicate pairs over binary payloads — the
    * perceptual-fingerprint dedup shape for media columns (a real
    * deployment swaps the byte histogram for pHash/chromaprint; the
    * candidate generation, distance filter, and never-shuffle-payloads
    * plumbing are identical). Each payload reduces partition-locally to
    * a 256-bin byte histogram (fixed-width — the only thing that ever
    * crosses a shuffle); near-dups are pairs with L1 histogram distance
    * ≤ `threshold`.
    *
    * Candidate generation is LOSSLESS by arithmetic, not heuristic.
    * Two bounds gate candidacy before any 256-long array moves:
    *
    *  1. grid band — L1 ≥ |Σ_G h₁ − Σ_G h₂| for ANY bin subset G
    *     (drop the |x−y| terms outside G), so total size (G = all
    *     bins) and the two group sums G₀ = classes {0,3,6,…},
    *     G₁ = {1,4,7,…} of the partition sketch below are each
    *     1-Lipschitz under L1. The 3-D banded [[graft.operators
    *     .RangeJoin.withinAll]] joins on (size, g0, g1) with fixed 27×
    *     fan-out — no all-pairs product, and bucket populations shrink
    *     multiplicatively vs the 1-D size band (which melts down when
    *     sizes pile up: at the 10× replay every replica set shares one
    *     size bucket and a 1-D band streamed ~10⁸ candidates, 93 s;
    *     the grid splits them on letter/digit-group mass);
    *  2. partition sketch — for any PARTITION {V₁..Vₖ} of the 256
    *     bins, Σᵢ |Σ_{Vᵢ}h₁ − Σ_{Vᵢ}h₂| ≤ L1 (disjoint classes, one
    *     triangle inequality per class). The classes are letter
    *     4-grams (a–d, e–h, …, u–z), space, each digit 0–9 its own
    *     class, and everything-else — an 18-long sketch whose bound
    *     sits close to the true L1 for text payloads, so the
    *     surviving candidate set is ≈ the answer set. (Per-digit bins
    *     matter: corpora with versioned/serial-numbered duplicates
    *     differ ONLY in digit bytes, and a sketch that pools digits
    *     scores those pairs at bound 0 — every such pair then pays
    *     the full-histogram fetch. Measured at the 10× replay, whose
    *     replicas differ exactly that way: pooled-digit sketch 93 s,
    *     per-digit 18-bin sketch prunes them arithmetically.)
    *
    * The band join runs on these NARROW sketch rows; full histograms
    * are fetched by two id equi-joins ONLY for pairs whose sketch
    * bound passes, then the exact L1 decides. (A first cut shipped the
    * arrays through the size-band join — 2 KB per row × every
    * size-coincident pair — and measured 317 s at sf1; the sketch
    * bound is the fix, same answer by the partition inequality.)
    */
  def histogramNearDup(records: Dataset[MediaRecord],
                       threshold: Long): DataFrame = {
    import records.sparkSession.implicits._
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val hist = records.mapPartitions { it =>
      it.map { r =>
        val h = new Array[Long](256)
        val sk = new Array[Long](18)
        var i = 0
        while (i < r.payload.length) {
          val b = r.payload(i) & 0xff
          h(b) += 1
          sk(
            if (b == 0x20) 6
            else if (b >= 'a' && b <= 'z') math.min((b - 'a') / 4, 5)
            else if (b >= '0' && b <= '9') 7 + (b - '0')
            else 17) += 1
          i += 1
        }
        var g0 = 0L; var g1 = 0L
        var j = 0
        while (j < 18) {
          if (j % 3 == 0) g0 += sk(j) else if (j % 3 == 1) g1 += sk(j)
          j += 1
        }
        (r.doc_id, r.payload.length.toLong, g0, g1, sk, h)
      }
    }.toDF("doc_id", "n_bytes", "g0", "g1", "sketch", "hist")
      .localCheckpoint() // histograms computed once, reused by 3 branches
    val narrow = hist.select(col("doc_id"), col("n_bytes"), col("g0"),
      col("g1"), col("sketch"))
    val a = narrow.select(col("doc_id").as("doc_id_1"),
      col("n_bytes").as("nb_1"), col("g0").as("g0_1"), col("g1").as("g1_1"),
      col("sketch").as("sk_1"))
    val b = narrow.select(col("doc_id").as("doc_id_2"),
      col("n_bytes").as("nb_2"), col("g0").as("g0_2"), col("g1").as("g1_2"),
      col("sketch").as("sk_2"))
    val cands = graft.operators.RangeJoin.withinAll(a, b,
        Seq("nb_1", "g0_1", "g1_1"), Seq("nb_2", "g0_2", "g1_2"), threshold)
      .where(col("doc_id_1") < col("doc_id_2"))
      .withColumn("__lb", expr(
        "aggregate(zip_with(sk_1, sk_2, (x, y) -> abs(x - y)), " +
          "0L, (acc, x) -> acc + x)"))
      .where(col("__lb") <= threshold)
      .select(col("doc_id_1"), col("doc_id_2"))
    cands
      .join(hist.select(col("doc_id").as("doc_id_1"), col("hist").as("hist_1")),
        Seq("doc_id_1"))
      .join(hist.select(col("doc_id").as("doc_id_2"), col("hist").as("hist_2")),
        Seq("doc_id_2"))
      .withColumn("l1", expr(
        "aggregate(zip_with(hist_1, hist_2, (x, y) -> abs(x - y)), " +
          "0L, (acc, x) -> acc + x)"))
      .where(col("l1") <= threshold)
      .select(col("doc_id_1"), col("doc_id_2"), col("l1"))
  }
}
