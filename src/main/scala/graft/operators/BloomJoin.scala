package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pre-filtered semi-join — the "runtime filter" /
  * dynamic-partition-pruning pattern: build a compact bloom filter over
  * the (selective) dim side's join keys, push a cheap membership test
  * into the fact scan, then make the result EXACT with a residual
  * semi-join over the survivors. The reference's serving path filters a
  * big fact by a small model key-set the same way, only without the
  * pre-filter (reference: RecommendationService.cs:63–65 candidate
  * filtering; SURVEY.md §4 runtime-filter note).
  *
  * Why this shape at 100 TB: a plain semi-join shuffles every fact row
  * that MIGHT match; with a bloom pre-filter the fact scan discards
  * (1 − fpp) of the non-matching rows before the exchange, so shuffle
  * volume tracks the true match rate, not the table size. This is
  * exactly what Spark's own InjectRuntimeFilter does for eligible plans —
  * expressed here as an explicit operator so it applies to any
  * DataFrame, not only where the optimizer's heuristics fire.
  *
  * The filter itself is built distributed (per-word `bit_or` partials —
  * ONE aggregation over the dim keys) and only the finished ~`numBits/64`
  * longs land on the driver: that is the broadcast of the build side,
  * identical in role (and size) to the bloom Spark broadcasts for its
  * runtime filters. The membership test is pure integer bit arithmetic on
  * a literal array — fully codegen'd, no UDF, no per-row join.
  */
object BloomJoin {

  /** Number of 64-bit words backing a filter of `numBits` bits. */
  private def words(numBits: Int): Int = (numBits + 63) / 64

  /** k hash positions for a key column: xxhash64 seeded per probe index,
    * reduced mod `numBits`. pmod keeps the position non-negative on the
    * full hash range. */
  private def positions(key: Column, numBits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(s => pmod(xxhash64(lit(s), key), lit(numBits.toLong)))

  /** 1L << (column) — the DSL `shiftleft` only accepts a literal count. */
  private def oneShl(n: Column): Column = call_function("shiftleft", lit(1L), n.cast("int"))

  /** Build the filter over `dim.dimKey`: Array of numBits/64 longs.
    * One distributed aggregation (explode k positions → per-word bit_or);
    * the collect is the fixed-size broadcast of the finished filter, NOT
    * a data collect — its size is `numBits/64` regardless of dim rows.
    */
  def build(dim: DataFrame, dimKey: String, numBits: Int, numHashes: Int): Array[Long] = {
    val w = words(numBits)
    val posCol = explode(array(positions(col(dimKey), numBits, numHashes): _*)).as("pos")
    val wordBits = dim.select(posCol)
      .select((col("pos") / 64).cast("int").as("word"),
        oneShl(pmod(col("pos"), lit(64L))).as("bit"))
      .groupBy("word").agg(bit_or(col("bit")).as("bits"))
      .collect()
    val arr = new Array[Long](w)
    wordBits.foreach(r => arr(r.getAs[Int]("word")) = r.getAs[Long]("bits"))
    arr
  }

  /** The codegen'd membership predicate for `key` against a built filter. */
  def mightContain(key: Column, filter: Array[Long], numBits: Int, numHashes: Int): Column = {
    val bitsLit = lit(filter)
    positions(key, numBits, numHashes).map { p =>
      (element_at(bitsLit, (p / 64).cast("int") + 1)
        .bitwiseAND(oneShl(pmod(p, lit(64L))))) =!= 0L
    }.reduce(_ && _)
  }

  /** Exact semi-join of `fact` against `dim`'s keys, bloom-pre-filtered.
    * The residual left-semi join removes the filter's false positives, so
    * the result equals `fact ⋉ dim` exactly — the bloom only shrinks what
    * reaches the exchange. Defaults: 2^16 bits / 5 hashes ≈ 1.5e-5 fpp at
    * 1.5k keys; size the bits to ~10× the expected key count.
    */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
               numBits: Int = 1 << 16, numHashes: Int = 5): DataFrame = {
    val filter = build(dim, dimKey, numBits, numHashes)
    fact.filter(mightContain(col(factKey), filter, numBits, numHashes))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }
}
