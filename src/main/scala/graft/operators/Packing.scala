package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training: assign documents to fixed-capacity
  * context windows. The suite already covers the PLANNING views —
  * padding-efficiency ladders (q176), source budgets (q40), curriculum
  * order (q182) — but not the packing ASSIGNMENT itself, which is what
  * a dataloader actually consumes.
  *
  * Design: shard-local NEXT-FIT in id order. Packing is inherently
  * sequential, so the 100 TB answer is to make the sequential unit a
  * SHARD, not the corpus: one shuffle partitions docs by shard, then
  * each shard packs independently in a single ordered pass (Spark's
  * `flatMapSortedGroups` — the group iterator arrives doc_id-sorted, no
  * per-group materialization). Shards pack in parallel across the
  * cluster and the result is a pure function of (shard, id order, token
  * lengths) — no planner state, no RNG — so the ENTIRE assignment
  * replays in the q207 oracle as a per-shard recursive CTE (full hash
  * gate). Next-fit is chosen over first-fit-decreasing deliberately:
  * same single-pass shape as a streaming dataloader, guarantees
  * windows ≥ Σtok/(2C) (each adjacent window pair holds > C), and keeps
  * id-locality inside windows (FFD scrambles curriculum order).
  *
  * Docs longer than the capacity get their own window, flagged
  * `oversize` (the caller truncates or splits upstream); non-positive
  * token counts fail loudly.
  */
object Packing {

  /** Encoder carrier — public because Catalyst's generated projections
    * cannot touch a private class (the Similarity.Scored precedent). */
  final case class Doc(shard: Long, doc_id: Long, tok: Long)

  /** Pack into `capacity`-token windows, `shards` parallel sequential
    * units. Output per doc: (shard, doc_id, tok, window_id ≥ 1 within
    * shard, used_after = window fill after placing the doc, oversize).
    */
  def nextFitPack(df: DataFrame, idCol: String, tokCol: String,
                  shards: Int, capacity: Long): DataFrame = {
    require(shards > 0, "shards must be positive")
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val docs = df.select(
        (col(idCol).cast("long") % shards).as("shard"),
        col(idCol).cast("long").as("doc_id"),
        when(col(tokCol).cast("long") <= 0,
          raise_error(concat(lit(s"nextFitPack: non-positive length in '$tokCol' at id "),
            col(idCol).cast("string"))))
          .otherwise(col(tokCol).cast("long")).as("tok"))
      .as[Doc]
    docs.groupByKey(_.shard)
      .flatMapSortedGroups(col("doc_id")) { (shard, it) =>
        var window = 0L
        var used = capacity // forces a fresh window on the first doc
        it.map { d =>
          if (used + d.tok > capacity) { window += 1; used = d.tok }
          else used += d.tok
          (shard, d.doc_id, d.tok, window, used)
        }
      }
      .toDF("shard", "doc_id", "tok", "window_id", "used_after")
      .withColumn("oversize", col("tok") > capacity)
  }
}
