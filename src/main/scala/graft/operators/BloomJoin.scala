package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

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
  * volume tracks the true match rate, not the table size.
  *
  * The filter is Spark's own: `BloomFilterAggregate` builds the sketch
  * distributed (mergeable partials, one aggregation over the dim keys)
  * and `BloomFilterMightContain` probes it — the same expression pair
  * `InjectRuntimeFilter` wires up for eligible plans, expressed here as
  * an explicit operator so it applies to any DataFrame, not only where
  * the optimizer's heuristics fire. The built filter reaches the probe
  * side as a SCALAR SUBQUERY result, not a plan literal: a 2^26-bit
  * (8 MB) filter adds bytes to the executed subquery result, not to the
  * plan tree or the generated code, so sizing the filter to a 100 TB dim
  * side never bloats the driver's plan. (The previous revision embedded
  * the bitset as a `lit(Array[Long])` — correct at 2^16 bits, a plan
  * bomb at 2^30.)
  */
object BloomJoin {

  private def hash64(key: Column): Column =
    ColumnShim.column(new XxHash64(Seq(ColumnShim.expression(key))))

  /** Aggregate column building the serialized bloom sketch over
    * `xxhash64(key)`. Mergeable constant-size partials; the finished
    * sketch is one binary value. `numBits` is capped by
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 2^26).
    */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnShim.column(new BloomFilterAggregate(
      ColumnShim.expression(hash64(key)),
      ColumnShim.expression(lit(expectedItems)),
      ColumnShim.expression(lit(numBits))).toAggregateExpression())

  /** A one-row-one-column plan producing the finished bloom sketch over
    * `dim.dimKey`, exposed as a scalar-subquery Column: usable in any
    * probe-side `filter` without materializing the sketch in the plan.
    * An empty dim yields a null sketch → `mightContain` is null → the
    * filter keeps nothing, which is the correct empty-dim semi-join.
    */
  def bloomOf(dim: DataFrame, dimKey: String, expectedItems: Long, numBits: Long): Column = {
    val built = dim.select(bloomAgg(col(dimKey), expectedItems, numBits).as("bloom"))
    ColumnShim.column(ScalarSubquery(built.queryExecution.analyzed))
  }

  /** Codegen'd membership probe of `key` against a built sketch column
    * (a [[bloomOf]] subquery, or any foldable binary sketch). */
  def mightContain(bloom: Column, key: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      ColumnShim.expression(bloom), ColumnShim.expression(hash64(key))))

  /** Exact semi-join of `fact` against `dim`'s keys, bloom-pre-filtered.
    * The residual left-semi join removes the filter's false positives, so
    * the result equals `fact ⋉ dim` exactly — the bloom only shrinks what
    * reaches the exchange. Size `expectedItems` to the dim-side distinct
    * key count and `numBits` to ~10× that (fpp ≈ 1%@10 bits/key).
    */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
               expectedItems: Long = 1L << 13, numBits: Long = 1L << 16): DataFrame = {
    fact.filter(mightContain(bloomOf(dim, dimKey, expectedItems, numBits), col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }
}
