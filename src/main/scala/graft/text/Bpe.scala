package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) vocabulary learning — the
  * merge-table side of the tokenizer a training pipeline ships with its
  * data. Classic word-dictionary BPE (Sennrich et al., ACL 2016): the
  * corpus collapses once into (word, count); every merge round then
  * operates on the DISTINCT-WORD symbol table, whose size is bounded by
  * the vocabulary — not the corpus — so 100 TB of text costs one
  * tokenize+count shuffle, and each round is one vocab-sized pair
  * aggregation. For truly gigantic vocabularies the dictionary composes
  * with [[graft.operators.Sampling.ppsSystematic]] (count-weighted word
  * sampling), the standard sampled-BPE practice.
  *
  * Merge semantics are the reference implementation's greedy
  * left-to-right pass. r14 optimization (guide §2.4 "remove shuffles
  * outright"): the pass is a per-word ARRAY FOLD (`aggregate` over the
  * symbol array — append, or fuse with the previous element when it
  * closes an un-consumed (l, r) adjacency), fully codegen'd and
  * shuffle-free, replacing the exploded-row islands-and-parity
  * formulation (per round: 3 window functions over (word) plus two
  * self-joins plus a re-densify — ~3 exchanges and a checkpoint per
  * round, ~36 exchanges for a 6-round learn+segment; now ZERO — the
  * only per-round distributed work left is the vocab-sized pair-count
  * argmax, which is irreducible because greedy BPE is sequential in the
  * merge table). The fold reproduces the same greedy parity (`aaaa` +
  * merge(a,a) → `[aa][aa]`, `aaa` → `[aa]a`): a merged symbol never
  * serves as the LEFT half of another merge in the same pass, which is
  * exactly what the fold's just-merged flag enforces. BpeSpec
  * property-checks both the merge table and the segmentation against a
  * sequential driver reference.
  *
  * Ties in pair counts break lexicographically (count desc, left asc,
  * right asc), so the learned table is a pure function of the
  * dictionary. Per round the driver sees exactly ONE row (the argmax
  * pair) — the same scalar-per-round coordination as
  * Dedup.duplicateClusters; the symbol table itself never leaves the
  * cluster.
  */
object Bpe {

  /** Corpus → (word, n) dictionary, whitespace-lowercase tokens.
    * `wordPattern` (optional regex) restricts which words train the
    * vocabulary — e.g. "^[a-z]+$" to exclude punctuation/digit noise.
    */
  def wordDict(docs: DataFrame, textCol: String = "text",
               wordPattern: String = ""): DataFrame = {
    val words = docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
    (if (wordPattern.nonEmpty) words.filter(col("word").rlike(wordPattern)) else words)
      .groupBy("word").agg(count(lit(1)).as("n"))
  }

  /** One greedy merge pass of (l, r) over a symbol array: a single
    * left-to-right fold — append the element, or replace the array's
    * last element with `l+r` when it equals `l`, the element equals
    * `r`, and the last element was not itself produced by THIS pass
    * (the just-merged flag; greedy consumption skips the pair). */
  private def mergeOnce(arr: Column, l: String, r: String): Column =
    aggregate(
      arr,
      struct(typedlit(Seq.empty[String]).as("out"), lit(false).as("just")),
      (acc, x) => {
        // get() is out-of-bounds-null (empty array → null → false)
        val canMerge = !acc("just") &&
          get(acc("out"), size(acc("out")) - 1) === lit(l) && (x === lit(r))
        struct(
          when(canMerge,
            concat(slice(acc("out"), lit(1), size(acc("out")) - 1), array(lit(l + r))))
            .otherwise(concat(acc("out"), array(x))).as("out"),
          coalesce(canMerge, lit(false)).as("just"))
      },
      acc => acc("out"))

  /** All adjacent symbol pairs of an array (overlaps counted — the
    * reference's pair statistics). */
  private def adjacentPairs(arr: Column): Column = {
    val len = greatest(size(arr) - 1, lit(0))
    zip_with(slice(arr, lit(1), len), slice(arr, lit(2), len),
      (a, b) => struct(a.as("l"), b.as("r")))
  }

  /** Re-anchor the accumulated merge fold into a materialized symbol
    * array every this-many merges: bounds Catalyst expression depth
    * (nested higher-order lambdas grow per round — hundreds of rounds
    * would blow analysis/codegen limits) and bounds total learn work at
    * O(rounds · AnchorEvery) fold applications instead of O(rounds²).
    * Declared queries learn ≤ 6 rounds and never hit this, so their
    * plans are unchanged; a vocab-scale learn (30k merges) stays flat. */
  private[graft] val AnchorEvery = 32

  /** Learn up to `rounds` merges from a (word, n) dictionary. Returns
    * (round, lhs, rhs, pair_count) — one row per realized merge; stops
    * early when no adjacent pair remains (every word fully merged).
    */
  def learnMerges(spark: SparkSession, dict: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    // one materialization of the dictionary; each round's argmax re-plays
    // the accumulated merge folds as expressions over it (word-length
    // array work per row — no per-round checkpoint or shuffle). Every
    // AnchorEvery merges the fold collapses into a fresh checkpointed
    // symbol array so expression depth (and per-round replay work)
    // stays bounded.
    var base = dict.select(col("word"), col("n").cast("long").as("n"),
      split(col("word"), "").as("syms")).localCheckpoint()
    var arr: Column = col("syms")
    var depth = 0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val best = base
        .select(col("n"), explode(adjacentPairs(arr)).as("p"))
        .groupBy(col("p.l").as("sym"), col("p.r").as("nxt"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym").asc, col("nxt").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, l, r, cnt))
        arr = mergeOnce(arr, l, r)
        depth += 1
        if (depth >= AnchorEvery) {
          base = base.select(col("word"), col("n"), arr.as("syms"))
            .localCheckpoint()
          arr = col("syms")
          depth = 0
        }
      }
    }
    import spark.implicits._
    merges.result().toDF("round", "lhs", "rhs", "pair_count")
  }

  /** Apply a learned merge table to a dictionary and report the final
    * segmentation: (word, n, pieces) — the encoder counterpart of
    * [[learnMerges]], replaying the same greedy rounds in merge order.
    * One shuffle-free pass: the whole merge chain folds per word.
    */
  def segment(spark: SparkSession, dict: DataFrame, mergeTable: DataFrame): DataFrame = {
    val ordered = mergeTable.orderBy(col("round"))
      .select(col("lhs"), col("rhs")).collect()
    if (ordered.length <= AnchorEvery) {
      // small tables (every declared query): one lazy expression chain,
      // plan identical to the pre-cap formulation
      val pieces = ordered.foldLeft(split(col("word"), ""): Column) { (a, row) =>
        mergeOnce(a, row.getString(0), row.getString(1))
      }
      dict.select(col("word"), col("n").cast("long").as("n"), pieces.as("pieces"))
    } else {
      // vocab-scale tables: fold AnchorEvery merges at a time, re-anchoring
      // each chunk on a checkpointed array so expression depth is bounded
      // (the last chunk stays lazy — same column shape either way)
      val start = dict.select(col("word"), col("n").cast("long").as("n"),
        split(col("word"), "").as("pieces"))
      val groups = ordered.grouped(AnchorEvery).toSeq
      groups.zipWithIndex.foldLeft(start) { case (cur, (chunk, i)) =>
        val folded = chunk.foldLeft(col("pieces"): Column) { (a, row) =>
          mergeOnce(a, row.getString(0), row.getString(1))
        }
        val next = cur.select(col("word"), col("n"), folded.as("pieces"))
        if (i == groups.size - 1) next else next.localCheckpoint()
      }
    }
  }
}
