package graft

import java.time.LocalDate
import org.scalacheck.Gen
import graft.analytics.Smoothing

/** Brute-force oracle for the exact-kernel daily EWMA
  * ([[graft.analytics.Smoothing]]): BigInt weights 2^(63−Δ) over observed
  * calendar days, one final double division.
  */
class SmoothingSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(days: Seq[(LocalDate, Long)]): Seq[(String, Long, Long)] =
    days.sortBy(_._1.toString).map { case (d, _) =>
      val window = days.filter { case (s, _) =>
        val delta = d.toEpochDay - s.toEpochDay
        delta >= 0 && delta <= 63
      }
      val num = window.map { case (s, x) =>
        BigInt(x) * (BigInt(1) << (63 - (d.toEpochDay - s.toEpochDay)).toInt)
      }.sum
      val den = window.map { case (s, _) =>
        BigInt(1) << (63 - (d.toEpochDay - s.toEpochDay)).toInt
      }.sum
      val x = days.find(_._1 == d).get._2
      (d.toString, x,
        math.round(num.toDouble / den.toDouble * 1e6))
    }

  private def toDf(days: Seq[(LocalDate, Long)]) =
    days.flatMap { case (d, n) => Seq.fill(n.toInt)(d.toString) }
      .toDF("dt").selectExpr("cast(dt as date) as dt")

  test("dailyEwma == brute-force BigInt kernel on random sparse series") {
    val dayGen = for {
      off <- Gen.chooseNum(0, 100) // gaps: observed-day semantics exercised
      n <- Gen.chooseNum(1, 5)
    } yield (LocalDate.of(2024, 1, 1).plusDays(off.toLong), n.toLong)
    samples(Gen.listOfN(25, dayGen), n = 4).foreach { raw =>
      val days = raw.groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }.toSeq
      val got = Smoothing.dailyEwma(toDf(days), "dt").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == brute(days), s"days=$days")
    }
  }

  test("dailyEwma: constant series smooths to itself; first day equals its own count") {
    val days = (0 until 80).map(i => (LocalDate.of(2024, 1, 1).plusDays(i.toLong), 7L))
    val got = Smoothing.dailyEwma(toDf(days), "dt").collect()
    // every weight multiplies the same x: ewma == x exactly
    assert(got.forall(_.getLong(2) == 7L * 1000000L))
    val first = got.map(r => (r.getString(0), r.getLong(2))).min
    assert(first == ("2024-01-01", 7000000L))
  }

  test("dailyEwma: a step change decays by halves (alpha = 1/2, dense days)") {
    // 64 days at 0 then day with 64: next days halve the weight share
    val days = (0 until 64).map(i => (LocalDate.of(2024, 3, 1).plusDays(i.toLong), 2L)) :+
      (LocalDate.of(2024, 3, 1).plusDays(64L), 100L)
    val got = Smoothing.dailyEwma(toDf(days), "dt").collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val ewmaLast = got("2024-05-04") // day 64
    // spike day: ewma = (100·2^63 + 2·(2^63 − 1)) / (2^64 − 1) ≈ 51
    assert(ewmaLast > 50000000L && ewmaLast < 52000000L)
  }
}
