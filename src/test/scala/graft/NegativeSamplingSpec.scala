package graft

import org.scalacheck.Gen

import graft.recommend.NegativeSampling

class NegativeSamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def draw(u: Long, t: Int, nItems: Long): Long =
    java.lang.Long.parseLong(md5hex(s"$u-$t").take(8), 16) % nItems

  private def brute(pos: Seq[(Long, Long)], nItems: Long, k: Int,
                    trials: Int): Seq[(Long, Long, Long)] = {
    val byUser = pos.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    byUser.keys.toSeq.sorted.flatMap { u =>
      val picks = (0 until trials).map(t => (t.toLong, draw(u, t, nItems)))
        .filterNot { case (_, it) => byUser(u)(it) }
        .foldLeft(Vector.empty[(Long, Long)]) { case (acc, (t, it)) =>
          if (acc.exists(_._2 == it)) acc else acc :+ (t, it)
        }
        .take(k)
      picks.map { case (t, it) => (u, t, it) }
    }
  }

  private def run(pos: Seq[(Long, Long)], nItems: Long, k: Int,
                  trials: Int): Seq[(Long, Long, Long)] =
    NegativeSampling.sample(pos.toDF("user_id", "track_id"), nItems, k, trials)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))

  test("sample == the md5-draw brute force on random positives") {
    val gen = for {
      nItems <- Gen.chooseNum(3L, 40L)
      nPos <- Gen.chooseNum(1, 60)
      pos <- Gen.listOfN(nPos, Gen.zip(
        Gen.chooseNum(0L, 8L), Gen.chooseNum(0L, 39L)))
    } yield (nItems, pos.map { case (u, i) => (u, i % nItems) })
    for ((nItems, pos) <- samples(gen, n = 8))
      assert(run(pos, nItems, 3, 12) == brute(pos, nItems, 3, 12),
        s"nItems=$nItems pos=$pos")
  }

  test("negatives never overlap positives; draws are distinct per user") {
    val pos = (0L to 4L).flatMap(u => (0L to 6L).map(i => (u, i)))
    val got = run(pos, nItems = 20L, k = 5, trials = 25)
    val posSet = pos.toSet
    assert(got.forall { case (u, _, it) => !posSet((u, it)) })
    got.groupBy(_._1).foreach { case (u, rows) =>
      assert(rows.map(_._3).distinct.size == rows.size, s"user $u duplicates")
      assert(rows.size == 5, s"user $u: ${rows.size} draws")
    }
  }

  test("a saturated catalog yields short rows, never recycled positives") {
    // user likes ALL 3 items: zero legal negatives exist
    val pos = Seq((7L, 0L), (7L, 1L), (7L, 2L))
    assert(run(pos, nItems = 3L, k = 5, trials = 25).isEmpty)
    // user likes 2 of 3: at most the one remaining item, regardless of k
    val pos2 = Seq((7L, 0L), (7L, 1L))
    val got = run(pos2, nItems = 3L, k = 5, trials = 25)
    assert(got.map(_._3).distinct == Seq(2L) || got.isEmpty)
    assert(got.size <= 1)
  }

  test("keyOffset shifts draws onto a 1-based catalog (ADVICE r8)") {
    val pos = (0L to 4L).map(u => (u, 1L + u))
    val shifted = NegativeSampling.sample(
      pos.toDF("user_id", "track_id"), nItems = 9L, k = 3, trials = 12,
      keyOffset = 1L).as[(Long, Long, Long)].collect().toSeq
    // every draw lands on the 1-based catalog [1, nItems]
    assert(shifted.forall { case (_, _, it) => it >= 1L && it <= 9L })
    // and is exactly the 0-based draw + 1 BEFORE rejection, i.e. the
    // same md5 arithmetic with the documented offset: re-run the brute
    // force in shifted space
    val bruteShifted = brute(pos.map { case (u, i) => (u, i - 1) }, 9L, 3, 12)
      .map { case (u, t, it) => (u, t, it + 1L) }
    assert(shifted.sortBy(r => (r._1, r._2)) == bruteShifted.sortBy(r => (r._1, r._2)))
  }

  test("parameter validation is loud") {
    val df = Seq((1L, 2L)).toDF("user_id", "track_id")
    intercept[IllegalArgumentException](NegativeSampling.sample(df, 0L, 1, 1))
    intercept[IllegalArgumentException](NegativeSampling.sample(df, 5L, 3, 2))
  }
}
