package graft

import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private val Gap = 100L // µs, for readable fixtures

  test("gaps strictly over the threshold split sessions; ties stay together") {
    val ev = Seq(
      (1L, 10L, 0L), (1L, 11L, 50L), (1L, 12L, 150L), // gap 100 = NOT over
      (1L, 13L, 251L),                                // gap 101 > 100 → new
      (2L, 20L, 0L)
    ).toDF("user_id", "event_id", "us")
    val got = Sessionize.assign(ev, "user_id", "us", "event_id", Gap)
      .select("user_id", "event_id", "session_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 1L),
      (1L, 13L, 2L), (2L, 20L, 1L)))
  }

  test("stats aggregates per session with correct bounds") {
    val ev = Seq((1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 500L))
      .toDF("user_id", "event_id", "us")
    val got = Sessionize.stats(ev, "user_id", "us", "event_id", Gap)
      .orderBy("session_no")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq((1L, 2L, 0L, 10L, 10L), (2L, 1L, 500L, 500L, 0L)))
  }

  test("batch sessions equal streaming sessions on randomized gaps") {
    // VERDICT r4 #4: the batch islands construction and the
    // flatMapGroupsWithState sessionizer implement ONE contract (split
    // strictly over the gap, ties stay together) — assert they produce
    // identical (user, n, start, end, sum) sessions on a randomized
    // fixture whose gaps cluster around the threshold, including exact
    // ties and exactly-at-gap steps.
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamAgg
    import graft.streaming.StreamAgg.Event
    val rnd = new scala.util.Random(20260813L)
    val gapSeconds = 60L
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val events: Seq[Event] = (1L to 8L).flatMap { uid =>
      var t = 1000L + rnd.nextInt(500)
      (1 to 25).map { i =>
        if (i > 1) t += (rnd.nextInt(4) match {
          case 0 => 1L + rnd.nextInt(59)        // inside the gap
          case 1 => gapSeconds                  // exactly at the gap → same session
          case 2 => gapSeconds + 1              // one over → split
          case _ => gapSeconds + 1 + rnd.nextInt(300)
        })
        // whole-number values keep every partial sum exact, so the
        // fold order (sequential state vs shuffled agg) cannot differ
        Event(uid, "e", ts(t), (1 + rnd.nextInt(100)).toDouble)
      }
    }

    // streaming: time-ordered chunks (state carries sessions across
    // batches), generous watermark delay so no event is late, then two
    // far-future sentinel batches to advance the watermark and fire the
    // event-time timeouts that close the remaining open sessions
    val ms = MemoryStream[Event]
    val name = s"session_parity_${System.nanoTime()}"
    val q = StreamAgg.sessionize(ms.toDS(), gapSeconds, watermarkDelay = "10000 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val streamed = try {
      events.sortBy(_.ts.getTime).grouped((events.size + 2) / 3).foreach { chunk =>
        ms.addData(rnd.shuffle(chunk): _*)
        q.processAllAvailable()
      }
      ms.addData(Event(999L, "sentinel", ts(10000000L), 0.0))
      q.processAllAvailable()
      ms.addData(Event(999L, "sentinel", ts(10000010L), 0.0))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
          r.getTimestamp(3).getTime, r.getDouble(4)))
        .filter(_._1 != 999L).toSeq.sorted
    } finally q.stop()

    val batch = Sessionize.assign(
        events.map(e => (e.user_id, e.ts.getTime, e.value)).toDF("user_id", "ms", "value"),
        "user_id", "ms", "value", gapUs = gapSeconds * 1000)
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n"), min(col("ms")).as("s"),
        max(col("ms")).as("e"), sum(col("value")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq.sorted

    assert(streamed.nonEmpty && streamed == batch,
      s"streaming and batch sessions diverge: ${streamed.size} vs ${batch.size} sessions")
  }

  test("equal timestamps order by the tie column deterministically") {
    val ev = Seq((1L, 5L, 100L), (1L, 4L, 100L), (1L, 3L, 0L))
      .toDF("user_id", "event_id", "us")
    val got = Sessionize.assign(ev, "user_id", "us", "event_id", 99L)
      .select("event_id", "session_no")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 3@0 starts s1; 4@100 gap 100 > 99 → s2; 5@100 gap 0 → stays s2
    assert(got == Map(3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("native session_window boundary semantics match the islands rule (empirical pin)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gapUs = 60L * 1000000L // 1 minute
    // user 1: pauses strictly under/over the gap; user 2: a pause of EXACTLY the gap
    val evs = Seq(
      (1L, 1L, 0L), (1L, 2L, 30L * 1000000L), (1L, 3L, 200L * 1000000L),
      (2L, 4L, 0L), (2L, 5L, gapUs))
    val df = evs.map { case (u, e, us) => (u, e, new java.sql.Timestamp(us / 1000L)) }
      .toDF("user_id", "event_id", "ts")
    val native = df
      .groupBy(col("user_id"), session_window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // Spark merges CLOSED intervals (next.start <= current.end): the
    // exactly-gap-sized pause of user 2 stays ONE session — the same
    // `gap > threshold` rule as the islands form. This pin is what
    // licenses q129's oracle to reuse q69's split rule.
    assert(native == Seq((1L, 0L, 2L), (1L, 200000000L, 1L), (2L, 0L, 2L)))
    val islands = graft.operators.Sessionize.stats(
        df.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us")),
        "user_id", "us", "event_id", gapUs = gapUs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(islands.count(_._1 == 2L) == 1, s"islands must agree: $islands")
  }
}
