package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim

/** DataFrame-API entry points for the custom Catalyst expressions (usable
  * in any session; [[GraftExtensions]] additionally exposes them to SQL
  * text). */
package object functions {

  /** Fused-loop dot product over two `array<double>` columns. */
  def vector_dot(a: Column, b: Column): Column =
    ColumnShim.column(VectorDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Morton (Z-order) interleave of two bigint columns' low `bits` bits. */
  def z_value(x: Column, y: Column, bits: Int = 21): Column =
    ColumnShim.column(ZValue(ColumnShim.expression(x), ColumnShim.expression(y), bits))

  /** N-dimensional Morton interleave (n·bits <= 63); for two columns
    * the codes are bit-identical to [[z_value]]. */
  def z_value_n(cols: Seq[Column], bits: Int): Column =
    ColumnShim.column(ZValueN(cols.map(ColumnShim.expression), bits))

  /** k-view MinHash signature of an `array<string>` shingle column. */
  def minhash_sig(shingles: Column, k: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(shingles), k))

  /** k-view MinHash signature of the n-token shingle set, fused straight
    * over the token array (no shingle strings materialize). */
  def minhash_sig_ngrams(toks: Column, n: Int, k: Int): Column =
    ColumnShim.column(MinHashSigNgrams(ColumnShim.expression(toks), n, k))

  /** Distinct space-joined n-token shingles (compiled `ngrams`). */
  def ngrams(toks: Column, n: Int): Column =
    ColumnShim.column(NGrams(ColumnShim.expression(toks), n))

  /** 60-bit SimHash fingerprint of an `array<string>` token column. */
  def simhash60(toks: Column): Column =
    ColumnShim.column(SimHash60(ColumnShim.expression(toks)))

  /** All `nbits` sign-LSH hyperplane bits of an `array<double>` vector,
    * fused into one pass (deterministic xxhash-derived planes). */
  def sign_bits(v: Column, nbits: Int): Column =
    ColumnShim.column(SignBits(ColumnShim.expression(v), nbits))

  /** Jaro–Winkler similarity of two string columns (byte-level; exact
    * for ASCII — the record-linkage scorer). */
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinkler(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Unicode NFC normalization of a string column (JDK Normalizer). */
  def nfc_normalize(text: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(text)))

  /** `collect_set` that FAILS (naming `opName` and the cap) the moment
    * any group's distinct size would exceed `cap` — inside the
    * aggregation buffer, before the over-cap group materializes. */
  def bounded_collect_set(c: Column, cap: Int, opName: String): Column =
    ColumnShim.column(
      BoundedCollectSet(ColumnShim.expression(c), cap, opName).toAggregateExpression())

  /** Misra–Gries heavy-hitter summary (≤ k counters, mergeable,
    * deterministic): map<item, est> with est ≤ true ≤ est + n/(k+1). */
  def misra_gries(c: Column, k: Int): Column =
    ColumnShim.column(
      MisraGries(ColumnShim.expression(c), k).toAggregateExpression())

  /** Avro binary encoding of a struct column under an Avro schema JSON;
    * `schemaId >= 0` adds the 5-byte Confluent Schema Registry frame. */
  def avro_encode(c: Column, schemaJson: String, schemaId: Int = -1): Column =
    ColumnShim.column(AvroEncode(ColumnShim.expression(c), schemaJson, schemaId))

  /** Inverse of [[avro_encode]]; with `schemaId >= 0` the Confluent frame
    * is required and verified (fail-loud on corrupt payloads). */
  def avro_decode(c: Column, schemaJson: String, schemaId: Int = -1): Column =
    ColumnShim.column(AvroDecode(ColumnShim.expression(c), schemaJson, schemaId))

  /** Mergeable first/second moments of an `array<double>` column:
    * struct<n, s[d], s2[d(d+1)/2 upper triangle]> — one constant-size
    * partial per partition (the distributed half of PCA/standardize). */
  def vector_moments(v: Column): Column =
    ColumnShim.column(VectorMoments(ColumnShim.expression(v)).toAggregateExpression())

  /** Shannon entropy of a string's codepoint distribution in integer
    * micro-bits (row-local, zero shuffle — the character-entropy
    * quality gate). */
  def char_entropy(text: Column): Column =
    ColumnShim.column(CharEntropy(ColumnShim.expression(text)))

  /** HyperLogLog registers of a column as a PERSISTABLE binary sketch
    * (2^p bytes; merge-tree/partitioning/replay invariant). */
  def hll_sketch(c: Column, p: Int = 12): Column =
    ColumnShim.column(HllSketch(ColumnShim.expression(c), p).toAggregateExpression())

  /** Element-wise max merge of stored [[hll_sketch]] blocks — the
    * no-rescan range union. */
  def hll_union(c: Column): Column =
    ColumnShim.column(HllUnion(ColumnShim.expression(c)).toAggregateExpression())

  /** Cardinality estimate of a stored sketch block (±1.04/√(2^p)). */
  def hll_count(c: Column): Column =
    ColumnShim.column(HllCount(ColumnShim.expression(c)))

  /** Pairwise register-wise max of two sketch columns (sketch algebra:
    * overlap by inclusion–exclusion without a per-pair explode). */
  def hll_merge2(a: Column, b: Column): Column =
    ColumnShim.column(HllMerge2(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Count-min sketch with exposed counters (depth×width longs) — the
    * join-size-planning summary; merge is element-wise add. */
  def cms_sketch(c: Column, depth: Int = 5, width: Int = 2048): Column =
    ColumnShim.column(CmsSketch(ColumnShim.expression(c), depth, width)
      .toAggregateExpression())

  /** CMS inner product `min_j Σ_w a·b` — a HARD overestimate of the
    * join output size between the two sketched key columns. */
  def cms_inner(a: Column, b: Column): Column =
    ColumnShim.column(CmsInnerProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** KMV / theta sketch: the k minimum distinct hash values — the
    * distinct sketch whose samples answer intersections and differences
    * DIRECTLY (HLL can only inclusion–exclusion an intersection). */
  def kmv_sketch(c: Column, k: Int): Column =
    ColumnShim.column(KmvSketch(ColumnShim.expression(c), k).toAggregateExpression())

  /** Union of two stored KMV blobs (keep k smallest distinct). */
  def kmv_merge2(a: Column, b: Column): Column =
    ColumnShim.column(KmvMerge2(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Cardinality estimate of a stored KMV blob — exact below k. */
  def kmv_count(c: Column): Column =
    ColumnShim.column(KmvCount(ColumnShim.expression(c)))

  /** Direct |A∩B| estimate from two stored KMV blobs. */
  def kmv_intersect(a: Column, b: Column): Column =
    ColumnShim.column(KmvIntersect(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Direct |A∖B| estimate from two stored KMV blobs. */
  def kmv_difference(a: Column, b: Column): Column =
    ColumnShim.column(KmvDifference(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** FLOOR division of two integral columns — the engine-side half of
    * the declared floor-quotient contract for signed integer math
    * (ADVICE r8: a negative daily micro-sum must not silently change a
    * mean's rounding direction). NOTE both Spark's `div` and the oracle
    * engine's integer `//` TRUNCATE toward zero — so the oracle spells
    * floor explicitly via the subtract-the-floor-remainder idiom
    * (SparkEntry.sqlFloorDiv) wherever operands can go negative.
    * Branch-free exact form:
    * `pmod(num, den)` is the floor-remainder (sign of `den`), so
    * `num − pmod(num, den)` is an exact multiple of `den` and the
    * truncating `div` of that multiple IS the floor quotient — no
    * double arithmetic, exact over the full long range. */
  def floor_div(num: Column, den: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.functions.pmod
    ColumnShim.column(IntegralDivide(
      ColumnShim.expression(num - pmod(num, den)), ColumnShim.expression(den)))
  }
}
