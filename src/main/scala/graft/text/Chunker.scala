package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking: split each document into overlapping token windows
  * — the example-preparation step between cleaning ([[TextClean]]) and
  * packing ([[Splits.packByBudget]]) in a training/retrieval corpus
  * pipeline (BASELINE north star; the reference's ROADMAP.md:85–90
  * content-features direction).
  *
  * Windows start every `stride` tokens and span `chunkSize` tokens, so
  * consecutive chunks overlap by `chunkSize − stride` — the overlap that
  * keeps boundary-straddling context visible to at least one chunk. The
  * final window may be shorter (bounded slice), matching every standard
  * chunker's tail behavior.
  *
  * Scale posture: one projection + one generator per document — chunking
  * is embarrassingly parallel, never shuffles, and emits ≈ n/stride rows
  * per n-token document. Chunk ids are derivable (start/stride), so the
  * output is deterministic under any partitioning.
  */
object Chunker {

  def chunks(docs: DataFrame, chunkSize: Int, stride: Int,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    docs
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, greatest(size(toks) - 1, 0), $stride)")).as("start"))
      .select(col("doc_id"), (col("start") / stride).cast("long").as("chunk_id"),
        expr(s"slice(toks, start + 1, $chunkSize)").as("chunk_toks"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk_toks")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"))
  }
}
