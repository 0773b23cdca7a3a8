package graft

import graft.operators.Sessionize
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

  test("equal timestamps order by the tie column deterministically") {
    val ev = Seq((1L, 5L, 100L), (1L, 4L, 100L), (1L, 3L, 0L))
      .toDF("user_id", "event_id", "us")
    val got = Sessionize.assign(ev, "user_id", "us", "event_id", 99L)
      .select("event_id", "session_no")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 3@0 starts s1; 4@100 gap 100 > 99 → s2; 5@100 gap 0 → stays s2
    assert(got == Map(3L -> 1L, 4L -> 2L, 5L -> 2L))
  }
}
