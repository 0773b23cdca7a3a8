package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document text analysis for LLM training-data pipelines: token
  * counting, quality scoring, language identification, and content
  * fingerprinting — all as codegen'd column expressions (no UDFs), so the
  * whole profile is ONE narrow projection pass over the corpus: the 100 TB
  * cost is exactly one scan of the text column.
  */
object TextStats {

  /** Tiny per-language marker lexicons for the n-gram/stopword heuristic.
    * Deterministic and SQL-expressible; real pipelines would swap in
    * larger profiles — the operator shape (argmax over per-language hit
    * ratios) is what matters at scale.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  // explicit class, not \s — Java vs RE2 disagree on U+000B (see Dedup.tokens)
  private def toks(textCol: Column): Column = split(lower(textCol), "[ \\t\\n\\r\\f]+")

  /** Count of tokens matching any word in `words`. */
  private def hitCount(toksCol: Column, words: Seq[String]): Column =
    size(expr(s"filter(__toks, t -> t IN (${words.map(w => s"'$w'").mkString(",")}))"))
      .cast("long")

  /** Full text profile:
    *   - n_tokens / n_chars / avg_token_len — token counting
    *   - stopword_ratio, punct_ratio, quality_score — quality scoring
    *     (length + stopword + punctuation heuristics, the standard cheap
    *     pre-filter before model-based scoring)
    *   - lang_pred — argmax over marker-lexicon hit ratios (deterministic
    *     tie-break by language code)
    *   - fingerprint — md5 over the normalized token stream (whitespace-
    *     canonical content fingerprint; robust to spacing differences)
    */
  def profile(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val langs = langMarkers.keys.toSeq.sorted
    val withToks = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("__toks", toks(col("__text")))
    val base = withToks
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_chars", length(col("__text")).cast("long"))
      .withColumn("punct_chars",
        (length(col("__text")) -
          length(regexp_replace(col("__text"), "[\\p{Punct}]", ""))).cast("long"))
    val withHits = langs.foldLeft(base)((df, l) =>
      df.withColumn(s"__hits_$l", hitCount(col("__toks"), langMarkers(l))))
    // argmax via greatest over (ratio, lang) structs is noisy; a CASE
    // chain over sorted languages gives the deterministic first-max.
    val best = langs.map(l => col(s"__hits_$l"))
      .reduce((a, b) => greatest(a, b))
    val langPred = langs.foldRight(lit("und"): Column)((l, acc) =>
      when(col(s"__hits_$l") === best && best > 0, lit(l)).otherwise(acc))
    withHits
      .withColumn("avg_token_len",
        round(col("n_chars").cast("double") / greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("stopword_ratio",
        round(col(s"__hits_en").cast("double") / greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("punct_ratio",
        round(col("punct_chars").cast("double") / greatest(col("n_chars"), lit(1L)), 4))
      .withColumn("quality_score", round(
        when(col("n_tokens") < 5, 0.0).otherwise(
          lit(1.0)
            - least(col("punct_chars").cast("double") / greatest(col("n_chars"), lit(1L)), lit(0.5))
            - when(col("n_chars") < 100, 0.25).otherwise(0.0)), 4))
      // repetition signals — the standard cheap filters for low-quality
      // or template-generated training text
      .withColumn("unique_ratio",
        round(size(array_distinct(col("__toks"))).cast("double") /
          greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("top_token_ratio",
        round(expr("array_max(transform(array_distinct(__toks), " +
          "t -> size(filter(__toks, x -> x = t))))").cast("double") /
          greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("lang_pred", langPred)
      .withColumn("fingerprint", md5(concat_ws(" ", col("__toks"))))
      // Karp-Rabin polynomial over the character stream: the incremental
      // fingerprint a dedup shingler extends in O(1) per character. The
      // modulus keeps acc*31 within int64 (DuckDB errors on overflow;
      // Spark would silently wrap). Empty splits filtered for parity
      // across engines' split semantics.
      .withColumn("rolling_hash", expr(
        "aggregate(filter(split(__text, ''), c -> c <> ''), CAST(0 AS BIGINT), " +
          "(acc, c) -> (acc * 31 + ascii(c)) % 1000000000000037)"))
      .select(col("doc_id"), col("n_tokens"), col("n_chars"), col("avg_token_len"),
        col("stopword_ratio"), col("punct_ratio"), col("unique_ratio"),
        col("top_token_ratio"), col("quality_score"),
        col("lang_pred"), col("fingerprint"), col("rolling_hash"))
  }

  /** Structural repetition metrics — the line- and n-gram-level quality
    * filters (Gopher/C4-style: Rae et al. 2021 §A1.1 "repetition" rules)
    * that catch boilerplate, templated spam, and scraper loops which
    * token-level ratios in [[profile]] miss:
    *
    *   - `dup_line_fraction` — fraction of LINE OCCURRENCES whose line
    *     appears more than once in the document
    *   - `dup_line_char_fraction` — fraction of characters inside those
    *     duplicated lines
    *   - `top_bigram_fraction` — share of all token-bigram occurrences
    *     taken by the most frequent bigram (concentration ⇒ repetition)
    *
    * Shape at 100 TB: one explode + count per (doc, line) and per
    * (doc, bigram) — both shuffles are keyed by doc-id-plus-content, so
    * they partition with the corpus; per-doc state in the final aggregate
    * is a handful of counters. Docs with fewer than 2 tokens have no
    * bigrams → `top_bigram_fraction` 0 (left join + fill).
    */
  def lineRepetition(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    val lineCounts = base
      .select(col("doc_id"), explode(split(col("__text"), "\n")).as("line"))
      .groupBy(col("doc_id"), col("line"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("line")).cast("long"))
    val lineAgg = lineCounts.groupBy("doc_id").agg(
      sum(col("cnt")).as("n_lines"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_lines"),
      sum(col("len") * col("cnt")).as("line_chars"),
      sum(when(col("cnt") > 1, col("len") * col("cnt")).otherwise(0L)).as("dup_line_chars"))
    // bigram OCCURRENCES (not distinct — concentration needs counts)
    val bigramCounts = base
      .select(col("doc_id"), toks(col("__text")).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(__toks) - 2), " +
          "i -> concat_ws(' ', __toks[i], __toks[i + 1]))")).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
    val bigramAgg = bigramCounts.groupBy("doc_id").agg(
      max(col("cnt")).as("top_bigram_cnt"),
      sum(col("cnt")).as("n_bigrams"))
    lineAgg.join(bigramAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_lines"),
        round(col("dup_lines").cast("double") / col("n_lines"), 4)
          .as("dup_line_fraction"),
        round(col("dup_line_chars").cast("double") /
          greatest(col("line_chars"), lit(1L)), 4).as("dup_line_char_fraction"),
        round(coalesce(col("top_bigram_cnt").cast("double") / col("n_bigrams"), lit(0.0)), 4)
          .as("top_bigram_fraction"))
  }
}
