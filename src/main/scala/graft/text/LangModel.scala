package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model scoring: rank documents by how
  * typical their token transitions are of the corpus itself — the
  * fluency axis of quality filtering (the reference's pipeline has no LM
  * scorer; this is the count-based stand-in for a perplexity filter, in
  * the same spirit as [[TextStats]]'s heuristic quality score).
  *
  * A real LM perplexity is exp of an order-dependent float sum of logs —
  * neither deterministic under Spark's partial aggregation nor
  * reproducible across engines. The count-based form keeps the module's
  * discipline: per-doc totals are exact integer sums of corpus bigram
  * counts, with ONE double division at the end, so scores are
  * bit-identical at any parallelism and the DuckDB oracle can demand
  * hash equality. Mean corpus-frequency is a monotone fluency proxy:
  * documents full of transitions the corpus has never seen score low.
  */
object LangModel {

  /** Mean corpus-frequency of each document's token bigrams.
    * Output: (doc_id, n_bigrams, mean_freq) for EVERY input document —
    * docs with fewer than two tokens get (0, 0.0) rather than vanishing,
    * so the score is usable as a quality-filter column.
    *
    * Scale posture: three keyed shuffles, all map-side combinable — the
    * corpus bigram count on the bigram key (frequent bigrams combine
    * heavily), the doc-bigram ⋈ count equi-join on the same key, and the
    * per-doc aggregation on the doc key. The bigram vocabulary is
    * corpus-sized but never collected or broadcast; no all-pairs stage
    * anywhere. Bodies leave the scan once, as tokens.
    */
  def bigramFluency(docs: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      // NOT sequence(1, size-1): Spark's sequence STEPS BACKWARD when
      // start > stop (sequence(1, 0) = [1, 0]), so a one-token doc would
      // index past the array instead of yielding no bigrams
      .select(col("doc_id"), expr(
        "CASE WHEN size(toks) < 2 THEN array() ELSE transform(" +
          "sequence(1, size(toks) - 1), i -> concat(toks[i - 1], ' ', toks[i])) END")
        .as("bgs"))
      .select(col("doc_id"), explode(col("bgs")).as("bigram"))
    val counts = bg.groupBy("bigram").agg(count(lit(1)).as("__c"))
    val perDoc = bg.join(counts, Seq("bigram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__c")).as("__s"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNull, lit(0.0))
          .otherwise(col("__s").cast("double") / col("n_bigrams")).as("mean_freq"))
      .orderBy(col("doc_id"))
  }

  /** Top adjacent-token collocations — the phrase-mining pass behind
    * multiword tokenizer vocabularies ("new york"-style units). Each
    * bigram with support ≥ `minCount` is scored by the pointwise lift
    * ratio (= e^PMI, the monotone un-logged form per the module's
    * no-transcendentals discipline):
    * {{{ score = (c_xy / N_bi) / (c_x / N_uni) / (c_y / N_uni) }}}
    * — observed bigram probability over the independence expectation.
    * Output: top `k` rows (w1, w2, n_xy, score_micro) by
    * (score_micro desc, w1, w2).
    *
    * Determinism: all counts exact integers; the score is a FIXED chain
    * of three correctly-rounded double divisions (never the
    * c_xy·N²/(N_bi·c_x·c_y) integer form, whose N² overflows any fixed
    * width at corpus scale), rounded once to micro-units.
    *
    * Scale posture: one bigram-keyed and one token-keyed
    * map-side-combinable count; marginals are vocabulary-sized and join
    * the (support-filtered) bigram counts on each word end; the two
    * corpus-total scalars ride a broadcast cross join; top-k is a
    * TakeOrderedAndProject.
    */
  def collocations(docs: DataFrame, minCount: Long = 5, k: Int = 20,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toksDf = docs
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .localCheckpoint() // unigram and bigram passes both read it
    val uni = toksDf.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bg = toksDf
      .select(explode(expr(
        "CASE WHEN size(toks) < 2 THEN array() ELSE transform(" +
          "sequence(1, size(toks) - 1), i -> concat(toks[i - 1], ' ', toks[i])) END"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_xy"))
    val scalars = uni.agg(sum(col("c")).as("__nuni"))
      .crossJoin(bg.agg(sum(col("n_xy")).as("__nbi")))
    val score =
      (col("n_xy").cast("double") / col("__nbi").cast("double")) /
        (col("__cx").cast("double") / col("__nuni").cast("double")) /
        (col("__cy").cast("double") / col("__nuni").cast("double"))
    bg.filter(col("n_xy") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c").as("__cx")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("__cy")), Seq("w2"))
      .crossJoin(broadcast(scalars))
      .select(col("w1"), col("w2"), col("n_xy"),
        round(score * 1e6).cast("long").as("score_micro"))
      .orderBy(col("score_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Out-of-vocabulary rate of an eval corpus against a train corpus's
    * token vocabulary: what fraction of eval token OCCURRENCES use a
    * token the training data never produced — the number that tells you
    * whether a tokenizer/vocab trained on `train` covers `eval`.
    * Output: one row (n_eval_tokens, n_oov_tokens, n_train_vocab,
    * oov_rate); an empty eval corpus scores 0.0.
    *
    * Scale posture: the train side collapses to its DISTINCT vocabulary
    * (one token-keyed shuffle, heavy map-side combine), the eval side to
    * (token, occurrence-count) — so the anti-join that finds unseen
    * tokens moves vocabularies, never corpora. Everything after is
    * three one-row aggregates cross-joined broadcast.
    */
  def oovRate(train: DataFrame, eval: DataFrame,
              textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def toks(df: DataFrame) = df
      .select(explode(Dedup.tokens(col(textCol))).as("token"))
    // both frames feed two consumers each — checkpoint so each corpus is
    // tokenized and shuffled ONCE, not once per consumer
    val vocab = toks(train).distinct().localCheckpoint()
    val evalCounts = toks(eval).groupBy("token").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val tot = evalCounts.agg(coalesce(sum(col("__c")), lit(0L)).as("n_eval_tokens"))
    val oov = evalCounts.join(vocab, Seq("token"), "left_anti")
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_oov_tokens"))
    val tv = vocab.agg(count(lit(1)).as("n_train_vocab"))
    tot.crossJoin(broadcast(oov)).crossJoin(broadcast(tv))
      .select(col("n_eval_tokens"), col("n_oov_tokens"), col("n_train_vocab"),
        when(col("n_eval_tokens") === 0, lit(0.0))
          .otherwise(col("n_oov_tokens").cast("double") /
            col("n_eval_tokens").cast("double")).as("oov_rate"))
  }

  /** Distinct n-gram ratio of the corpus for each window size in `ns` —
    * the distinct-n diversity metric (low ratio ⇔ repetitive/collapsed
    * text; the corpus-level cousin of the per-doc Gopher repetition
    * filters in [[TextStats]]). Output: (n, n_total, n_distinct, ratio)
    * per window size, ordered by n; a corpus with no n-token window
    * reports (0, 0, 0.0).
    *
    * Scale posture: ONE pass over the corpus — every window size's
    * n-grams are emitted from the same row-local token array (tagged
    * structs, flattened, exploded) — and ONE shuffle keyed (n, gram),
    * map-side combinable; the distinct count is the grouped table's row
    * count, never a count_distinct over raw occurrences. Memory per row
    * is Σ_n (len−n+1) gram strings, the same order as the document
    * itself.
    */
  def distinctNgramRatio(docs: DataFrame, ns: Seq[Int] = Seq(1, 2, 3),
                         textCol: String = "text"): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be positive window sizes")
    require(ns.distinct.size == ns.size, "duplicate window sizes")
    // same CASE guard as bigramFluency: sequence(1, 0) steps BACKWARD
    val tagged = ns.map { n =>
      s"CASE WHEN size(toks) < $n THEN array() ELSE transform(" +
        s"sequence(1, size(toks) - $n + 1), " +
        s"i -> struct(CAST($n AS BIGINT) AS n, array_join(slice(toks, i, $n), ' ') AS gram)) END"
    }.mkString("flatten(array(", ", ", "))")
    val grams = docs
      .select(Dedup.tokens(col(textCol)).as("toks"))
      .select(explode(expr(tagged)).as("__g"))
      .select(col("__g.n").as("n"), col("__g.gram").as("gram"))
    val grouped = grams.groupBy("n", "gram").agg(count(lit(1)).as("__c"))
    val stats = grouped.groupBy("n")
      .agg(count(lit(1)).as("n_distinct"), sum(col("__c")).as("n_total"))
    // left join from the requested sizes so an over-long n still reports
    val spine = docs.sparkSession.createDataFrame(
      ns.map(n => Tuple1(n.toLong))).toDF("n")
    spine.join(stats, Seq("n"), "left")
      .select(col("n"),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        when(coalesce(col("n_total"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_distinct").cast("double") /
            col("n_total").cast("double")).as("ratio"))
      .orderBy(col("n"))
  }
}
