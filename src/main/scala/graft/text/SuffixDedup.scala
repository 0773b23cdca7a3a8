package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT repeated-substring detection via distributed suffix-rank
  * prefix doubling (VERDICT r8 #4) — the exact form of Lee et al.
  * 2022's substring dedup that the hash-windowed q95 approximates:
  * every token position covered by a length-`minLen` window occurring
  * ≥ 2 times ANYWHERE in the corpus is found by actual token-sequence
  * equality, never by hash (q95's 128-bit xxhash key has a ~2⁻⁴⁰
  * corpus-wide collision budget; this has zero), and ALL occurrences
  * are reported — q95's keep-first semantics never shows the first
  * occurrence of a repeat, so "which documents share this content" is
  * unanswerable there (SuffixDedupSpec demonstrates the miss).
  *
  * Construction (Manber–Myers prefix doubling, re-expressed for a
  * shuffle engine): positions get global ids with an inter-document
  * gap of `minLen` missing ids, so no equality test can ever read
  * across a document boundary. Level-0 "rank" of a position is a
  * canonical id of its token — the MINIMUM global id holding that
  * token (group-representative ids, not sorted ranks: window equality
  * only needs equal⟺equal, which frees every round from global
  * sorting). Each doubling round builds the pair
  * `(r_k[g], r_k[g + 2^k])` (missing neighbor → −1 sentinel) and
  * replaces it by its group-representative id: after round k,
  * `r_k[g] = r_k[g'] ⟺ the 2^k-token sequences at g and g' are
  * identical` — provable by induction, and positions whose documents
  * end early only ever feed keys through offsets that stay in-range.
  * The final window key for length L with 2^j ≤ L < 2^{j+1} is the
  * classic sparse-table pair `(r_j[g], r_j[g + L − 2^j])`.
  *
  * Scale shape: ⌈log₂ L⌉ rounds, each = one equi-self-join on shifted
  * ids + one group-by + one id join-back, all over narrow (gid, rank)
  * longs — no global sort, no single-partition window, no driver data
  * collection (document offsets come from the 256-bucket two-pass
  * prefix sum, [[Splits.trainingOrder]]'s pattern). Rounds are
  * localCheckpoint'ed so the loop's lineage stays constant-size. The
  * only per-document stage is the final island merge
  * ([[Dedup.mergeIslands]]).
  *
  * Output: `(doc_id, span_start, span_end, n_tokens)` — maximal merged
  * spans of covered positions, every occurrence included.
  */
object SuffixDedup {

  def maximalRepeatSpans(docs: DataFrame, minLen: Int = 10,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(minLen >= 1 && minLen <= 4096, s"minLen in [1, 4096], got $minLen")
    val L = minLen.toLong

    val toksDf = docs
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .withColumn("len", size(col("toks")).cast("long"))
      .filter(col("len") >= L)

    // document start offsets in the global id space, gap L between
    // docs (no window can reference across a boundary): 256-bucket
    // two-pass prefix sum over (len + L) — the offsets frame is <= 256
    // rows, the in-bucket window partitions by bucket
    val lens = toksDf.select(col("doc_id"), col("len"))
      .withColumn("__h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("__b", shiftright(col("__h"), 52))
    val bw = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = lens.groupBy(col("__b"))
      .agg(sum(col("len") + L).as("__c"))
      .withColumn("__off", sum(col("__c")).over(bw) - col("__c"))
      .select(col("__b"), col("__off"))
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val docStart = lens.join(broadcast(offsets), Seq("__b"))
      .withColumn("__cum", sum(col("len") + L).over(inBucket))
      .select(col("doc_id"),
        (col("__off") + col("__cum") - (col("len") + L)).as("start"))

    // (doc_id, pos, gid, len) position rows + the level-0 ranks
    val positions = toksDf.join(docStart, Seq("doc_id"))
      .select(col("doc_id"), col("len"), col("start"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("len"), col("pos").cast("long").as("pos"),
        (col("start") + col("pos")).as("gid"), col("tok"))
      .localCheckpoint()
    val tokIds = positions.groupBy(col("tok")).agg(min(col("gid")).as("r"))
    var ranks = positions.join(tokIds, Seq("tok"))
      .select(col("gid"), col("r")).localCheckpoint()

    // doubling rounds up to the largest power of two <= L
    var width = 1L
    while (width * 2 <= L) {
      val right = ranks.select((col("gid") - width).as("gid"), col("r").as("r2"))
      val paired = ranks.join(right, Seq("gid"), "left")
        .select(col("gid"), col("r"), coalesce(col("r2"), lit(-1L)).as("r2"))
      val ids = paired.groupBy(col("r"), col("r2")).agg(min(col("gid")).as("nr"))
      ranks = paired.join(ids, Seq("r", "r2"))
        .select(col("gid"), col("nr").as("r")).localCheckpoint()
      width *= 2
    }

    // length-L window key: the sparse-table pair at offset L - width
    val off = L - width
    val winKeys = positions.filter(col("pos") <= col("len") - L)
      .select(col("doc_id"), col("pos"), col("gid"))
      .join(ranks, Seq("gid"))
      .withColumn("gid2", col("gid") + off)
      .join(ranks.select(col("gid").as("gid2"), col("r").as("r2")), Seq("gid2"))
      .select(col("doc_id"), col("pos"), col("r"), col("r2"))
    val dups = winKeys.groupBy(col("r"), col("r2"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("r"), col("r2"))
    val cov = winKeys.join(dups, Seq("r", "r2"), "left_semi")
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + L).as("e"))
    Dedup.mergeIslands(cov)
  }
}
