package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval primitives over the tokenized document table: BM25
  * ranking, conjunctive (all-terms) search, and the vocabulary-growth
  * curve — the query side of the training-data pipeline that
  * [[Relevance]] (TF-IDF) and [[TextStats]] feed (reference:
  * ROADMAP.md:85–90 content-based features; the reference has no search
  * surface, so the operator set follows the standard IR formulation).
  *
  * Determinism note (shared with [[Relevance]]): BM25's classic
  * ln((N−df+0.5)/(df+0.5)) idf is a transcendental and engines differ in
  * the last ulp. We keep the rational core — idf_ratio =
  * (N−df+0.5)/(df+0.5) — un-logged: every arithmetic step is +,−,×,÷
  * (all correctly rounded under IEEE-754), per-term scores are fixed to
  * integer micro-units, and the per-doc total is an exact integer sum —
  * bit-identical on any engine evaluating the same expression tree, and
  * monotone in df/tf exactly where BM25's ranking intuition lives.
  */
object Search {

  /** BM25-style top-`k` documents for `terms` (rational idf variant, see
    * object doc). Per (doc, term):
    * {{{
    *   tf_norm = tf·(k1+1) / (tf + k1·(1 − b + b·(dl/avgdl)))
    *   score   = tf_norm · (N − df + 0.5)/(df + 0.5)
    * }}}
    * fixed to micro-units (`round(score·1e6)` as long) before the
    * per-doc sum, so the total is an order-independent exact integer.
    * Output: (doc_id, n_terms_hit, bm25_micro), top `k` by
    * (bm25_micro desc, doc_id asc).
    *
    * Scale posture: tf/df/dl are three hash aggregations on (doc, token)
    * / token / doc keys; `terms` filters the tf side BEFORE the shuffle
    * (only query-term postings move), df and the N/avgdl scalars ride a
    * broadcast one-row cross join. No all-pairs stage; top-k is a
    * TakeOrderedAndProject.
    */
  def bm25TopDocs(docs: DataFrame, terms: Seq[String], k: Int = 10,
                  k1: Double = 1.2, b: Double = 0.75,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25TopDocs needs at least one query term")
    val tok = docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // df over the full corpus but only for query terms: the filter runs
    // before the (doc, token) shuffle, so non-query postings never move
    val qtf = tok.filter(col("token").isInCollection(terms))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val qdf = qtf.groupBy("token").agg(count(lit(1)).as("df"))
    val scalars = docs.agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(dl.agg(avg(col("dl")).as("__avgdl"))))
    val tfn = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("__avgdl"))))
    val idfRatio = (col("__n") - col("df") + 0.5) / (col("df") + 0.5)
    qtf.join(qdf, Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(scalars))
      .withColumn("score_micro", round(tfn * idfRatio * 1e6, 0).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("score_micro")).as("bm25_micro"))
      .orderBy(col("bm25_micro").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion of two retrieval legs — the standard hybrid
    * of a lexical ranker and a second signal without score calibration:
    * here [[bm25TopDocs]] fused with a length-normalized term-frequency
    * ranking (`tf_micro = Σtf·10⁶ div dl` — a deliberately different
    * lexical view: BM25's idf weighting and tf saturation vs raw
    * density). Each leg contributes `10⁹ div (kFuse + rank)` in exact
    * integer nano-units (floor division — engines agree; the classic
    * kFuse = 60 of Cormack et al., SIGIR'09), a doc missing from a leg
    * contributes 0, and the fused top-`k` orders by
    * (rrf_nano desc, doc_id asc).
    *
    * Scale posture: both legs end in TakeOrderedAndProject top-`k`, so
    * the rank windows and the outer join below run on two k-row frames
    * — serving-sized by construction, the same bounded-input argument
    * as MMR's candidate pool. The corpus-scale work is inside
    * [[bm25TopDocs]]'s three hash aggregations, shared posting filter
    * included; nothing here re-touches the corpus.
    */
  def rrfFusion(docs: DataFrame, terms: Seq[String], k: Int = 10,
                kFuse: Int = 60, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "rrfFusion needs at least one query term")
    require(kFuse >= 1, s"kFuse must be >= 1, got $kFuse")
    val legA = bm25TopDocs(docs, terms, k, textCol = textCol, idCol = idCol)
      .select(col("doc_id"),
        row_number().over(
          Window.orderBy(col("bm25_micro").desc, col("doc_id").asc))
          .cast("long").as("bm25_rank"))
    val tok = docs.select(col(idCol).as("doc_id"),
        Dedup.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val legB = tok.filter(col("token").isInCollection(terms))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("qtf"))
      .join(dl, Seq("doc_id"))
      .select(col("doc_id"), expr("(qtf * 1000000) div dl").as("tf_micro"))
      .orderBy(col("tf_micro").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"),
        row_number().over(
          Window.orderBy(col("tf_micro").desc, col("doc_id").asc))
          .cast("long").as("tf_rank"))
    legA.join(legB, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("tf_rank"),
        (coalesce(expr(s"1000000000 div ($kFuse + bm25_rank)"), lit(0L)) +
         coalesce(expr(s"1000000000 div ($kFuse + tf_rank)"), lit(0L)))
          .as("rrf_nano"))
      .orderBy(col("rrf_nano").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Pseudo-relevance-feedback query expansion (Rocchio's positive
    * half, tf·idf-weighted): run the query, assume the top
    * `feedbackDocs` BM25 hits are relevant, and rank the terms they
    * contain — feedback term frequency × the rational idf of [[Search]]
    * (un-logged, micro-rounded) — excluding the original query terms.
    * The top `expansionK` terms are what a retrieval pipeline appends
    * for the second-pass query. Ties break on the term string.
    *
    * Scale posture: the feedback doc set is k rows ([[bm25TopDocs]]'s
    * TakeOrderedAndProject); its token explosion is k documents' worth,
    * and the corpus-side document frequencies move ONLY candidate-term
    * postings (semi-join pushed before the df shuffle — the
    * query-term-filter discipline of BM25 applied to the expansion
    * vocabulary). No corpus-sized window, no driver loop.
    */
  def prfExpansion(docs: DataFrame, terms: Seq[String], feedbackDocs: Int = 3,
                   expansionK: Int = 5, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(feedbackDocs >= 1 && expansionK >= 1,
      s"need feedbackDocs >= 1 and expansionK >= 1")
    val top = bm25TopDocs(docs, terms, feedbackDocs,
        textCol = textCol, idCol = idCol)
      .select(col("doc_id"))
    val tok = docs.select(col(idCol).as("doc_id"),
        Dedup.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val fbTf = tok.join(top, Seq("doc_id"), "left_semi")
      .where(!col("token").isInCollection(terms))
      .groupBy(col("token")).agg(count(lit(1)).as("fb_tf"))
    val candDf = tok.join(fbTf.select(col("token")), Seq("token"), "left_semi")
      .select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    fbTf.join(candDf, Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("token").as("term"),
        round(col("fb_tf") * (col("__n") - col("df") + 0.5) /
          (col("df") + 0.5) * 1e6, 0).cast("long").as("score_micro"))
      .orderBy(col("score_micro").desc, col("term").asc)
      .limit(expansionK)
  }

  /** Conjunctive (AND) search: documents containing EVERY term in
    * `terms`, with their token length. The posting-list intersection is
    * expressed as distinct-(doc, term) membership counted up to
    * |terms| — one shuffle on the doc key over query-term postings only.
    * Output: (doc_id, dl), ordered by doc_id.
    */
  /** Keyword-in-context (KWIC) concordance: every occurrence of `term`
    * in the corpus with up to `width` tokens of left and right context —
    * the classic corpus-linguistics inspection surface (and the "show me
    * how this token is actually used" debugging view of a tokenizer /
    * filter pipeline). Matching is on the shared [[Dedup.tokens]]
    * normalization; context never crosses document boundaries.
    *
    * Scale posture: one narrow projection pass — tokenize, posexplode,
    * filter to the term's postings, row-local slices for the contexts.
    * No shuffle at all (callers order the result if they need to); the
    * explode's width is bounded by tokens-per-doc and only matching
    * rows survive it.
    */
  def kwic(docs: DataFrame, term: String, width: Int = 3,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(term.nonEmpty, "kwic needs a non-empty term")
    require(width >= 0, s"width must be >= 0, got $width")
    docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(col("toks")).as(Seq("pos", "token")))
      .where(col("token") === lower(lit(term)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        concat_ws(" ", slice(col("toks"),
          greatest(col("pos") - width, lit(0)) + 1,
          least(col("pos"), lit(width)))).as("left_ctx"),
        concat_ws(" ", slice(col("toks"),
          col("pos") + 2, lit(width))).as("right_ctx"))
  }

  def conjunctiveSearch(docs: DataFrame, terms: Seq[String],
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "conjunctiveSearch needs at least one term")
    val tok = docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val hits = tok.filter(col("token").isInCollection(terms))
      .select("doc_id", "token").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("__hit"))
      .filter(col("__hit") === terms.distinct.size)
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    hits.join(dl, Seq("doc_id")).select(col("doc_id"), col("dl"))
      .orderBy(col("doc_id"))
  }

  /** Exact phrase search over a positional inverted index: documents
    * where the token sequence `phrase` occurs contiguously, with the
    * occurrence count. Output: (doc_id, n_occurrences), doc-id order.
    *
    * Plan shape is the ALIGNMENT JOIN, not an m-way self-join of the
    * postings list: each posting of a phrase term maps to the anchor
    * position its occurrence would start at (`pos − i` for the i-th
    * phrase slot, every slot when the phrase repeats a word), and one
    * hash aggregation on (doc, anchor) counts distinct matched slots —
    * `= m` means every slot aligned, i.e. one true occurrence. One
    * shuffle keyed by (doc, anchor), volume = postings of the QUERY
    * terms only (the `isInCollection` filter runs before the explode's
    * output moves); the classic m−1 consecutive-position self-joins
    * would shuffle the same postings m−1 times and skew on frequent
    * terms. Overlapping occurrences are counted (each anchor is its own
    * group), which is exactly the brute-force contiguous-window count
    * the oracle replays.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs a non-empty phrase")
    val m = phrase.size
    val session = docs.sparkSession
    import session.implicits._
    val slots = phrase.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("__slot", "token")
    val pos = docs
      .select(col(idCol).as("doc_id"), posexplode(Dedup.tokens(col(textCol))))
      .toDF("doc_id", "__pos", "token")
      .filter(col("token").isInCollection(phrase))
    pos.join(broadcast(slots), Seq("token"))
      .select(col("doc_id"), (col("__pos") - col("__slot")).as("__anchor"),
        col("__slot"))
      .groupBy(col("doc_id"), col("__anchor"))
      .agg(countDistinct(col("__slot")).as("__hit"))
      .filter(col("__hit") === m.toLong)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("doc_id"))
  }

  /** Vocabulary-growth curve (Heaps-law view): for each document in
    * doc-id order, the number of tokens first seen in it and the
    * cumulative vocabulary size up to and including it. Output:
    * (doc_id, new_tokens, vocab_size), one row per document.
    *
    * Scale posture: a global running sum is inherently sequential, so the
    * naive `sum over (order by doc_id)` window collapses to ONE
    * partition holding every document. This implements the classic
    * two-pass distributed prefix sum instead: docs land in
    * `bucketWidth`-wide id ranges, per-bucket totals (≈|docs|/width rows)
    * take a tiny single-partition window to become bucket offsets, and
    * the offsets broadcast back so the heavy within-bucket window runs
    * partitioned by bucket. Both passes are exact integer sums — results
    * identical to the single-partition form at any parallelism.
    */
  def vocabGrowth(docs: DataFrame, bucketWidth: Long = 64,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val tok = docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
    val newByDoc = tok.groupBy("token").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("new_tokens"))
    val spine = docs.select(col(idCol).as("doc_id"))
      .join(newByDoc, Seq("doc_id"), "left")
      .withColumn("new_tokens", coalesce(col("new_tokens"), lit(0L)))
      .withColumn("__b", expr(s"doc_id div ${bucketWidth}L"))
    val perBucket = spine.groupBy("__b").agg(sum(col("new_tokens")).as("__bsum"))
    val wB = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = perBucket
      .withColumn("__off", sum(col("__bsum")).over(wB) - col("__bsum"))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(broadcast(offsets), Seq("__b"))
      .withColumn("vocab_size", sum(col("new_tokens")).over(wIn) + col("__off"))
      .select(col("doc_id"), col("new_tokens"), col("vocab_size"))
      .orderBy(col("doc_id"))
  }
}
