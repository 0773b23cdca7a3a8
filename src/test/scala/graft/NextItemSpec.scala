package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.recommend.NextItem

/** Order-2 next-item model vs a pure-Scala brute-force replay. */
class NextItemSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // (user, eventId, ts, item)
  private val raw: Seq[(Long, Long, Timestamp, Long)] = Seq(
    // user 1: a b c a b c a b  (strong order-2 pattern: (a,b)->c)
    (1L, 1L, ts(1), 10L), (1L, 2L, ts(2), 20L), (1L, 3L, ts(3), 30L),
    (1L, 4L, ts(4), 10L), (1L, 5L, ts(5), 20L), (1L, 6L, ts(6), 30L),
    (1L, 7L, ts(7), 10L), (1L, 8L, ts(8), 20L),
    // user 2: b c b c b      (last two: c b)
    (2L, 9L, ts(1), 20L), (2L, 10L, ts(2), 30L), (2L, 11L, ts(3), 20L),
    (2L, 12L, ts(4), 30L), (2L, 13L, ts(5), 20L),
    // user 3: single event — no context, excluded
    (3L, 14L, ts(1), 40L),
    // ts tie inside user 4, broken by event id: order is 10 then 20
    (4L, 15L, ts(1), 10L), (4L, 16L, ts(1), 20L))

  private def events = raw.toDF("user_id", "event_id", "ts", "item")

  /** The model, replayed in plain Scala collections. */
  private def bruteForce(k: Int): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val byUser = raw.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._3.getTime, e._2)).map(_._4).toList).toMap
    def ngrams(n: Int) = byUser.values.flatMap(_.sliding(n).filter(_.size == n))
    val c3 = ngrams(3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2pre = ngrams(3).groupBy(_.take(2)).view.mapValues(_.size.toLong).toMap
    val c2 = ngrams(2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1pre = ngrams(2).groupBy(_.take(1)).view.mapValues(_.size.toLong).toMap
    val vocab = raw.map(_._4).distinct.sorted
    val v = vocab.size.toLong
    byUser.toSeq.filter(_._2.size >= 2).flatMap { case (u, seq) =>
      val (a, b) = (seq(seq.size - 2), seq.last)
      val scored = vocab.map { x =>
        val num = (c3.getOrElse(List(a, b, x), 0L) + 1L) *
            (c1pre.getOrElse(List(b), 0L) + v) +
          (c2.getOrElse(List(b, x), 0L) + 1L) *
            (c2pre.getOrElse(List(a, b), 0L) + v)
        (x, num)
      }.sortBy { case (x, num) => (-num, x) }.take(k)
      scored.zipWithIndex.map { case ((x, num), i) =>
        (u, a, b, (i + 1).toLong, x, num)
      }
    }.sortBy(t => (t._1, t._4))
  }

  test("ranked output matches the brute-force replay exactly") {
    val got = NextItem.nextItems(events, "user_id", "item", "ts", "event_id", k = 3)
      .select("user_id", "prev2", "prev1", "rank", "next_item", "score_num")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(t => (t._1, t._4))
    assert(got == bruteForce(3))
  }

  test("order-2 evidence dominates: user 1's (10,20) context predicts 30") {
    val top = NextItem.nextItems(events, "user_id", "item", "ts", "event_id", k = 1)
      .filter(col("user_id") === 1L).select("prev2", "prev1", "next_item")
      .head()
    assert((top.getLong(0), top.getLong(1), top.getLong(2)) == ((10L, 20L, 30L)))
  }

  test("single-event users have no context; ts ties break on the tie column") {
    val out = NextItem.nextItems(events, "user_id", "item", "ts", "event_id", k = 2)
    assert(out.filter(col("user_id") === 3L).count() == 0)
    val u4 = out.filter(col("user_id") === 4L).select("prev2", "prev1").head()
    assert((u4.getLong(0), u4.getLong(1)) == ((10L, 20L)))
  }

  test("backoff only: an unseen order-2 context still ranks by bigram counts") {
    // user 5's context (30,10) never appears as a trigram prefix ->
    // P2 is uniform and the bigram backoff decides: 10->20 occurs twice
    // (users 1 and 4... user 4 contributes one), so 20 wins over 30/40
    val ev2 = (raw ++ Seq((5L, 17L, ts(1), 30L), (5L, 18L, ts(2), 10L)))
      .toDF("user_id", "event_id", "ts", "item")
    val top = NextItem.nextItems(ev2, "user_id", "item", "ts", "event_id", k = 1)
      .filter(col("user_id") === 5L).select("next_item").head().getLong(0)
    assert(top == 20L)
  }

  test("restrictCandidates produces bit-identical output to the full cross join") {
    for (k <- Seq(1, 3, 7)) {
      val full = NextItem
        .nextItems(events, "user_id", "item", "ts", "event_id", k = k)
        .collect().map(_.toSeq).toSet
      val restricted = NextItem
        .nextItems(events, "user_id", "item", "ts", "event_id", k = k,
          restrictCandidates = true)
        .collect().map(_.toSeq).toSet
      assert(restricted == full, s"k=$k")
    }
  }

  test("scores are the single-division blend of the integer rationals") {
    val r = NextItem.nextItems(events, "user_id", "item", "ts", "event_id", k = 1)
      .filter(col("user_id") === 1L)
      .select("score_num", "score").head()
    // recompute the denominator from the brute-force tables
    val den = {
      val byUser = raw.groupBy(_._1).view.mapValues(
        _.sortBy(e => (e._3.getTime, e._2)).map(_._4).toList).toMap
      def ngrams(n: Int) = byUser.values.flatMap(_.sliding(n).filter(_.size == n))
      val c2pre = ngrams(3).groupBy(_.take(2)).view.mapValues(_.size.toLong).toMap
      val c1pre = ngrams(2).groupBy(_.take(1)).view.mapValues(_.size.toLong).toMap
      val v = raw.map(_._4).distinct.size.toLong
      (c2pre.getOrElse(List(10L, 20L), 0L) + v) *
        (c1pre.getOrElse(List(20L), 0L) + v)
    }
    assert(r.getDouble(1) == r.getLong(0).toDouble / den)
  }
}
