package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) vocabulary learning — the
  * merge-table side of the tokenizer a training pipeline ships with its
  * data. Classic word-dictionary BPE (Sennrich et al., ACL 2016): the
  * corpus collapses once into (word, count); every merge round then
  * operates on the DISTINCT-WORD symbol table, whose size is bounded by
  * the vocabulary — not the corpus — so 100 TB of text costs one
  * tokenize+count shuffle, and each round is windows over a
  * vocab-sized frame (millions of rows, not trillions). For truly
  * gigantic vocabularies the dictionary composes with
  * [[graft.operators.Sampling.ppsSystematic]] (count-weighted word
  * sampling), the standard sampled-BPE practice.
  *
  * Merge semantics are the reference implementation's greedy
  * left-to-right pass, expressed relationally: match positions →
  * gaps-and-islands on consecutive matches → odd-parity selection
  * within each island (`aaaa` + merge(a,a) → `[aa][aa]`, `aaa` →
  * `[aa]a`). Ties in pair counts break lexicographically (count desc,
  * left asc, right asc), so the learned table is a pure function of
  * the dictionary.
  *
  * Per round the driver sees exactly ONE row (the argmax pair) — the
  * same scalar-per-round coordination as Dedup.duplicateClusters; the
  * symbol table itself never leaves the cluster and is
  * localCheckpoint'ed per round to keep plans flat.
  */
object Bpe {

  private val byPos = Window.partitionBy("word").orderBy("pos")

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

  /** (word, n) dictionary → initial per-character symbol table. */
  private def initialSymbols(dict: DataFrame): DataFrame = dict
    .select(col("word"), col("n").cast("long").as("n"),
      posexplode(split(col("word"), "")).as(Seq("pos", "sym")))
    .localCheckpoint()

  /** One greedy merge pass of (l, r) over the symbol table: islands of
    * consecutive matches, odd ranks win, right halves drop, positions
    * re-densify. `flagged` must carry the `nxt` lead column.
    */
  private def applyMerge(flagged: DataFrame, l: String, r: String): DataFrame = {
    val selected = flagged
      .filter(col("sym") === lit(l) && col("nxt") === lit(r))
      .withColumn("grp", col("pos") - row_number().over(byPos))
      .withColumn("rn",
        row_number().over(Window.partitionBy("word", "grp").orderBy("pos")))
      .filter(col("rn") % 2 === 1)
      .select(col("word"), col("pos"), lit(true).as("issel"))
    val dropped = selected.select(col("word"),
      (col("pos") + 1).as("pos"), lit(true).as("isdrop"))
    flagged
      .join(selected, Seq("word", "pos"), "left")
      .join(dropped, Seq("word", "pos"), "left")
      .filter(col("isdrop").isNull)
      .withColumn("sym",
        when(col("issel"), concat(lit(l), lit(r))).otherwise(col("sym")))
      .withColumn("pos", row_number().over(byPos) - 1)
      .select(col("word"), col("n"), col("pos"), col("sym"))
      .localCheckpoint()
  }

  /** Learn up to `rounds` merges from a (word, n) dictionary. Returns
    * (round, lhs, rhs, pair_count) — one row per realized merge; stops
    * early when no adjacent pair remains (every word fully merged).
    */
  def learnMerges(spark: SparkSession, dict: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    var syms = initialSymbols(dict)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(byPos))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym").asc, col("nxt").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, l, r, cnt))
        syms = applyMerge(withNext, l, r)
      }
    }
    import spark.implicits._
    merges.result().toDF("round", "lhs", "rhs", "pair_count")
  }

  /** Apply a learned merge table to a dictionary and report the final
    * segmentation: (word, n, pieces) — the encoder counterpart of
    * [[learnMerges]], replaying the same greedy rounds in merge order.
    */
  def segment(spark: SparkSession, dict: DataFrame, mergeTable: DataFrame): DataFrame = {
    val ordered = mergeTable.orderBy(col("round"))
      .select(col("lhs"), col("rhs")).collect()
    var syms = initialSymbols(dict)
    ordered.foreach { row =>
      syms = applyMerge(
        syms.withColumn("nxt", lead(col("sym"), 1).over(byPos)),
        row.getString(0), row.getString(1))
    }
    syms.groupBy(col("word"), col("n"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, sym))), e -> e.sym)")
        .as("pieces"))
  }
}
