package graft

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.streaming.StreamAgg

/** Incremental-drain observability for q50's dedup path (VERDICT r6 #4):
  * the 100 TB streaming failure mode is STATE GROWTH, and until now the
  * suite asserted state layout, not state dynamics — every bounded run
  * consumed its backlog as one AvailableNow batch, so no test ever saw
  * `numRowsTotal` across triggers. Here the backlog is six time-sliced
  * files drained one file per micro-batch (`maxFilesPerTrigger = 1`;
  * AvailableNow honors the source rate limit), and the per-batch
  * `StreamingQueryProgress.stateOperators` metrics must show the
  * watermark EVICTING as fast as the slices arrive: per-batch input
  * bounded by the rate limit, state plateauing at ~two slices (current
  * + one awaiting the next watermark advance), never accumulating
  * toward the full key count.
  */
class StreamBackpressureSpec extends SparkTestBase {

  private val SliceKeys = 1000
  private val Slices = 6
  private val BaseUs = 1700000000000000L // fixed epoch anchor, determinism
  private val SliceGapUs = 600000000L    // 10 min between slices; 1 min watermark

  /** Six JSON-lines files, slice i holding keys [i*1000, (i+1)*1000) at
    * time BaseUs + i*10min, every event duplicated (at-least-once
    * delivery). Ascending mod-times pin the file source's drain order.
    */
  private def stageSlicedBacklog(dir: Path): Unit = {
    Files.createDirectories(dir)
    (0 until Slices).foreach { i =>
      val ts = BaseUs + i * SliceGapUs
      val lines = (0 until SliceKeys).flatMap { k =>
        val id = i * SliceKeys + k
        val row = s"""{"event_id":$id,"user_id":${id % 97},"event_type":"click","ts_us":$ts,"value":1.0}"""
        Seq(row, row) // the duplicate copy, same slice
      }
      val f = dir.resolve(f"slice_$i%02d.json")
      Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
      Files.setLastModifiedTime(f, FileTime.fromMillis(1700000000000L + i * 1000L))
    }
  }

  test("dedup state stays bounded across >=3 incremental triggers (eviction keeps up)") {
    val base = Files.createTempDirectory("graft_backpressure")
    stageSlicedBacklog(base.resolve("in"))
    val (sink, progress) = StreamAgg.runDedupIncremental(spark,
      base.resolve("in").toString, base.resolve("sink").toString,
      base.resolve("ckpt").toString, statePartitions = Some(4),
      maxFilesPerTrigger = 1)

    // correctness of the drain itself: one copy per key survived
    assert(sink.count() == (Slices * SliceKeys).toLong)
    assert(sink.select(countDistinct(col("event_id"))).head().getLong(0) ==
      (Slices * SliceKeys).toLong)

    val dataBatches = progress.filter(_.numInputRows > 0)
    assert(dataBatches.size >= 3,
      s"backlog must drain incrementally: saw ${dataBatches.size} data batches")
    // source-side backpressure: no batch may exceed one slice's rows
    dataBatches.foreach(p => assert(p.numInputRows <= 2L * SliceKeys,
      s"rate limit breached: batch read ${p.numInputRows} rows"))

    val stateTotals = dataBatches.flatMap(_.stateOperators.toSeq).map(_.numRowsTotal)
    val removed = dataBatches.flatMap(_.stateOperators.toSeq).map(_.numRowsRemoved).sum
    assert(stateTotals.nonEmpty, "dedup must report a stateful operator in progress")
    // the bound: state plateaus at current slice + the one awaiting the
    // next watermark advance — NEVER the full 6000-key backlog. An
    // unbounded-state regression (watermark not applied, eviction
    // broken) fails here long before it would OOM a real deploy.
    assert(stateTotals.max <= 2L * SliceKeys + 200,
      s"state grew past two slices: per-batch totals = $stateTotals")
    assert(stateTotals.max < (Slices * SliceKeys).toLong,
      "state accumulated toward the full key count")
    // eviction actually happened, batch over batch, roughly a slice at a
    // time (all but the last two slices must have been expired by end)
    assert(removed >= (Slices - 2L) * SliceKeys,
      s"watermark eviction fell behind: only $removed rows removed; totals = $stateTotals")
  }
}
