package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.operators.Sampling
import graft.text.Splits

/** PPS systematic sampling ([[graft.operators.Sampling]]) and
  * water-filling budget allocation ([[graft.text.Splits.waterfill]])
  * against driver-side integer replays. Both operators are pure integer
  * functions of their inputs, so every assertion is exact.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------- PPS

  private def ppsBrute(rows: Seq[(Long, Long)], n: Int): Seq[(Long, Long, Long)] = {
    val sorted = rows.sortBy(_._1)
    val w = sorted.map(_._2).sum
    val step = w / n
    val off = step / 2
    def ticksUpTo(x: Long): Long =
      math.min(n.toLong, math.max(0L, if (x >= off) (x - off) / step + 1 else 0L))
    sorted.scanLeft((0L, 0L, 0L)) { case ((_, _, c), (id, wt)) => (id, wt, c + wt) }
      .drop(1)
      .map { case (id, wt, c) => (id, wt, ticksUpTo(c) - ticksUpTo(c - wt)) }
      .filter(_._3 >= 1)
  }

  private val wRows: Gen[Seq[(Long, Long)]] =
    Gen.listOfN(40, Gen.chooseNum(1L, 30L)).map(_.zipWithIndex.map {
      case (w, i) => ((i * 7 + 3).toLong, w) // sparse, non-contiguous ids
    })

  test("ppsSystematic == integer brute force; Σ copies == n exactly") {
    samples(wRows, n = 5).foreach { rows0 =>
      Seq(5, 13).foreach { n =>
        val got = Sampling.ppsSystematic(rows0.toDF("doc_id", "wt"),
          "doc_id", "wt", n, bucketWidth = 16)
        assert(rowSet(got) ==
          ppsBrute(rows0, n).map { case (a, b, c) => Seq[Any](a, b, c) }.toSet)
        assert(got.agg(sum("copies")).as[Long].head() == n.toLong)
      }
    }
  }

  test("heavy rows catch multiple ticks") {
    // one row holds ~90% of the mass: with n=10 it must carry ~9 copies
    val rows0 = Seq((1L, 900L), (2L, 40L), (3L, 30L), (4L, 30L))
    val got = Sampling.ppsSystematic(rows0.toDF("doc_id", "wt"), "doc_id", "wt", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got(1L) == 9L)
    assert(got.values.sum == 10L)
  }

  test("non-positive weight fails loudly with the offending id") {
    val e = intercept[Exception] {
      Sampling.ppsSystematic(Seq((7L, 0L), (8L, 5L)).toDF("doc_id", "wt"),
        "doc_id", "wt", 2).collect()
    }
    assert(messages(e).exists(m => m.contains("non-positive weight") && m.contains("7")))
  }

  test("sample size larger than total weight fails loudly") {
    val e = intercept[Exception] {
      Sampling.ppsSystematic(Seq((1L, 2L), (2L, 1L)).toDF("doc_id", "wt"),
        "doc_id", "wt", 10).collect()
    }
    assert(messages(e).exists(_.contains("smaller than sample size")))
  }

  test("bucket width does not change the sample (prefix layout is global)") {
    val rows0 = (0 until 50).map(i => (i.toLong * 3, (i % 9 + 1).toLong))
    val a = rowSet(Sampling.ppsSystematic(rows0.toDF("doc_id", "wt"), "doc_id", "wt", 7,
      bucketWidth = 4))
    val b = rowSet(Sampling.ppsSystematic(rows0.toDF("doc_id", "wt"), "doc_id", "wt", 7,
      bucketWidth = 1000))
    assert(a == b)
  }

  // ------------------------------------------------------- waterfill

  private def waterfillBrute(cnts: Seq[(String, Long)], budget: Long): Seq[(String, Long, Long, Boolean)] = {
    val sorted = cnts.sortBy { case (k, c) => (c, k) }
    val n = sorted.size.toLong
    val prefix = sorted.scanLeft(0L)(_ + _._2)
    val istar = sorted.zipWithIndex.indexWhere { case ((_, c), i) =>
      prefix(i) + c * (n - i) > budget
    }
    if (istar < 0) cnts.map { case (k, c) => (k, c, c, false) }
    else {
      val r = n - istar
      val t = (budget - prefix(istar)) / r
      val leftover = budget - prefix(istar) - t * r
      sorted.zipWithIndex.map { case ((k, c), i) =>
        if (i < istar) (k, c, c, false)
        else (k, c, t + (if (i < istar + leftover) 1L else 0L), true)
      }
    }
  }

  private val cntRows: Gen[Seq[(String, Long)]] =
    Gen.listOfN(12, Gen.chooseNum(0L, 500L)).map(_.zipWithIndex.map {
      case (c, i) => (s"s$i", c)
    })

  test("waterfill == integer brute force; Σ alloc == budget when Σ cnt >= budget") {
    samples(Gen.zip(cntRows, Gen.chooseNum(1L, 3000L)), n = 6).foreach {
      case (cnts, budget) =>
        val got = Splits.waterfill(cnts.toDF("src", "c"), "src", "c", lit(budget))
        assert(rowSet(got) ==
          waterfillBrute(cnts, budget).map { case (a, b, c, d) => Seq[Any](a, b, c, d) }.toSet)
        val total = cnts.map(_._2).sum
        val allocated = got.agg(sum("alloc")).as[Long].head()
        assert(allocated == math.min(total, budget) ||
          (total < budget && allocated == total))
    }
  }

  test("budget from tot: 60% budget allocates exactly 60% of the mass") {
    val cnts = Seq(("a", 100L), ("b", 300L), ("c", 600L))
    val got = Splits.waterfill(cnts.toDF("src", "c"), "src", "c",
      expr("(tot * 6) div 10"))
    assert(got.agg(sum("alloc")).as[Long].head() == 600L)
    // small source survives uncapped; the dominant one is capped
    val m = got.collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(m("a") == ((100L, false)))
    assert(m("c")._2)
  }

  test("negative budget fails loudly") {
    val e = intercept[Exception] {
      Splits.waterfill(Seq(("a", 5L)).toDF("src", "c"), "src", "c", lit(-1L)).collect()
    }
    assert(messages(e).exists(_.contains("negative budget")))
  }

  // -------------------------------------------------- priority sample

  /** Driver transcription of the md5 midpoint draw and the DLT
    * estimator — same hex slice, same double-op chain. */
  private def priBrute(rows: Seq[(Long, Long)], k: Int): Seq[(Long, Long, Long)] = {
    def u(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    }
    val byPri = rows.map { case (id, w) => (id, w, w.toDouble / u(id)) }
      .sortBy { case (id, _, pri) => (-pri, id) }
    val tau = if (byPri.size >= k + 1) byPri(k)._3 else 0.0
    byPri.take(k).map { case (id, w, _) =>
      (id, w, math.round(math.max(w.toDouble, tau) * 1e6))
    }.sortBy(_._1)
  }

  test("prioritySample == driver brute force (sample, tau, estimates)") {
    samples(wRows, n = 5).foreach { rows0 =>
      Seq(7, 20).foreach { k =>
        val got = Sampling.prioritySample(rows0.toDF("doc_id", "wt"),
            "doc_id", "wt", k)
          .select("id", "w", "est_micro")
        assert(rowSet(got) ==
          priBrute(rows0, k).map { case (a, b, c) => Seq[Any](a, b, c) }.toSet)
      }
    }
  }

  test("population smaller than k: all rows kept, estimates exact (tau=0)") {
    val rows0 = Seq((1L, 10L), (2L, 20L), (3L, 30L))
    val got = Sampling.prioritySample(rows0.toDF("doc_id", "wt"), "doc_id", "wt", 5)
      .orderBy("id").collect()
    assert(got.length == 3)
    assert(got.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 10L * 1000000L), (2L, 20L * 1000000L), (3L, 30L * 1000000L)))
    assert(got.forall(_.getBoolean(3))) // exact estimates are always in band
  }

  test("priority sample: non-positive weight fails loudly") {
    val e = intercept[Exception] {
      Sampling.prioritySample(Seq((1L, 0L)).toDF("doc_id", "wt"),
        "doc_id", "wt", 2).collect()
    }
    assert(messages(e).exists(m => m != null && m.contains("non-positive weight")))
  }
}
