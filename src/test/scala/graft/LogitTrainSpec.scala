package graft

import org.apache.spark.sql.functions._

import graft.quality.LogitTrain

class LogitTrainSpec extends SparkTestBase {
  import spark.implicits._

  // natural prose vs punctuation soup — linearly separable by the
  // stopword/punct features
  private val docs = Seq(
    (1L, "en", "the cat sat on the mat and the dog is a friend of the cat"),
    (2L, "en", "a tale of the sea and the wind is told by the old sailor"),
    (3L, "en", "the quick brown fox is a friend of the lazy dog and the hen"),
    (4L, "xx", "%%% ### !!! ??? *** ((( ))) @@@ &&& ^^^ $$$ ~~~"),
    (5L, "xx", "zzz qqq zzz qqq zzz qqq zzz qqq zzz qqq zzz qqq"),
    (6L, "xx", "!!! *** !!! *** !!! *** !!! *** !!! *** !!! ***")
  ).toDF("doc_id", "lang", "text")

  /** Driver replay of the documented integer recipe straight from the
    * profile features — independent of the Column expression chain. */
  private def brute(steps: Int, lr: Long): Seq[(Long, Long, Long, Array[Long])] = {
    val M = 1000000L
    val f = graft.text.TextStats.profile(docs, "text", "doc_id")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("lang"), col("stopword_ratio"), col("punct_ratio"),
        col("unique_ratio"), col("n_chars"))
      .collect()
      .map { r =>
        val y = if (r.getString(0) == "en") M else 0L
        (y, Array(M, Math.round(r.getDouble(1) * 1e6),
          Math.round(r.getDouble(2) * 1e6), Math.round(r.getDouble(3) * 1e6),
          math.min(r.getLong(4), 2000L) * 500L))
      }
    val w = Array.fill(5)(0L)
    (1 to steps).map { t =>
      var nKeep = 0L
      val g = Array.fill(5)(0L)
      f.foreach { case (y, x) =>
        val z = Math.floorDiv((0 until 5).map(j => x(j) * w(j)).sum, M)
        val p = M / 2 + Math.floorDiv(z * (M / 2), M + math.abs(z))
        if (p >= M / 2) nKeep += 1
        for (j <- 0 until 5) g(j) += Math.floorDiv((p - y) * x(j), M)
      }
      for (j <- 0 until 5)
        w(j) -= Math.floorDiv(lr * Math.floorDiv(g(j), f.length), M)
      (t.toLong, f.length.toLong, nKeep, w.clone())
    }
  }

  test("trajectory equals the driver integer replay, step for step") {
    for (lr <- Seq(1000000L, 4000000L)) {
      val got = LogitTrain.train(docs, steps = 4, lrMicro = lr)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Array(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
            r.getLong(7))))
      val want = brute(4, lr)
      assert(got.length == want.length)
      got.zip(want).foreach { case ((gs, gn, gk, gw), (ws, wn, wk, ww)) =>
        assert(gs == ws && gn == wn && gk == wk, s"step $gs header mismatch")
        assert(gw.toSeq == ww.toSeq, s"step $gs weights: ${gw.toSeq} vs ${ww.toSeq}")
      }
    }
  }

  test("training separates prose from soup: learned weights move the keep cut") {
    val t = LogitTrain.train(docs, steps = 8).orderBy("step").collect()
    val wFinal = t.last
    // stopword coefficient ends positive (prose reward), punct does not
    // dominate it, and the step-8 incoming-weight keep count is no
    // longer the degenerate all-keep of step 1
    assert(t.head.getLong(2) == docs.count(), "step 1 sees the all-zero boundary")
    assert(wFinal.getLong(4) > 0L, s"stopword weight should be positive: ${wFinal.getLong(4)}")
    // result is invariant to partition layout (integer sums commute)
    val repart = LogitTrain.train(docs.repartition(7), steps = 3)
      .orderBy("step").collect().map(_.toSeq)
    val single = LogitTrain.train(docs.coalesce(1), steps = 3)
      .orderBy("step").collect().map(_.toSeq)
    assert(repart.toSeq == single.toSeq)
  }

  test("parameter validation is loud") {
    intercept[IllegalArgumentException](LogitTrain.train(docs, steps = 0))
    intercept[IllegalArgumentException](LogitTrain.train(docs, lrMicro = 0L))
    val empty = docs.filter(lit(false))
    intercept[IllegalArgumentException](LogitTrain.train(empty, steps = 1))
  }
}
