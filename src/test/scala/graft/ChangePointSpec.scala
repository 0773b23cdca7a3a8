package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.ChangePoint

class ChangePointSpec extends SparkTestBase {
  import spark.implicits._

  /** One event per (day, value-micro/1e6); day 1-based in Jan 2024. */
  private def series(dayMeans: Seq[Long]) =
    dayMeans.zipWithIndex.map { case (m, i) =>
      (Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), m.toDouble / 1e6)
    }.toDF("ts", "value")

  /** Driver recursion replay: the textbook sequential CUSUM. */
  private def brute(xs: Seq[Long], baselineDays: Int = 7): Seq[(Long, Long)] = {
    val mu0 = xs.take(baselineDays).sum / math.min(baselineDays, xs.size)
    val delta = mu0 * 5 / 100
    xs.scanLeft((0L, 0L)) { case ((sp, sn), x) =>
      (math.max(0L, sp + (x - mu0 - delta)), math.max(0L, sn + (mu0 - delta - x)))
    }.drop(1)
  }

  test("closed form == sequential recursion on a shifted series") {
    // 7 flat baseline days at 100, then a +8% sustained shift
    val xs = Seq.fill(7)(100000000L) ++ Seq.fill(8)(108000000L)
    val got = ChangePoint.cusumDaily(series(xs), "ts", "value")
      .orderBy("day").select("s_pos", "s_neg").as[(Long, Long)].collect().toSeq
    assert(got == brute(xs))
  }

  test("a sustained small shift alarms within days; flat series never does") {
    val shifted = Seq.fill(7)(100000000L) ++ Seq.fill(12)(108000000L)
    val alarms = ChangePoint.cusumDaily(series(shifted), "ts", "value")
      .orderBy("day").select("alarm_up").as[Boolean].collect()
    // delta = 5% of 100 → drift rate 3/day vs h = 30: alarms from day 7+10ε
    assert(alarms.takeRight(2).forall(identity), "sustained shift must alarm")
    assert(!alarms.take(7).exists(identity), "baseline must not alarm")
    val flat = Seq.fill(15)(100000000L)
    val flatRows = ChangePoint.cusumDaily(series(flat), "ts", "value")
      .select("alarm_up", "alarm_down").as[(Boolean, Boolean)].collect()
    assert(flatRows.forall(r => !r._1 && !r._2))
  }

  test("downward shifts trip alarm_down symmetrically") {
    val xs = Seq.fill(7)(100000000L) ++ Seq.fill(12)(92000000L)
    val rows = ChangePoint.cusumDaily(series(xs), "ts", "value")
      .orderBy("day").select("alarm_up", "alarm_down").as[(Boolean, Boolean)]
      .collect()
    assert(rows.takeRight(2).forall(_._2))
    assert(!rows.exists(_._1))
  }
}
