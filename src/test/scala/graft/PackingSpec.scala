package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.Packing

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver next-fit replay over the same (shard, id order). */
  private def brute(rows: Seq[(Long, Long)], shards: Int, cap: Long)
      : Set[(Long, Long, Long, Long, Long, Boolean)] =
    rows.groupBy(_._1 % shards).flatMap { case (shard, docs) =>
      var window = 0L
      var used = cap
      docs.sortBy(_._1).map { case (id, tok) =>
        if (used + tok > cap) { window += 1; used = tok } else used += tok
        (shard, id, tok, window, used, tok > cap)
      }
    }.toSet

  private val gen: Gen[Seq[(Long, Long)]] =
    Gen.listOfN(60, Gen.chooseNum(1L, 40L)).map(_.zipWithIndex.map {
      case (tok, i) => ((i * 3 + 1).toLong, tok)
    })

  test("nextFitPack == driver brute force, any partitioning") {
    samples(gen, n = 5).foreach { rows =>
      val got = Packing.nextFitPack(rows.toDF("doc_id", "tok").repartition(7),
        "doc_id", "tok", shards = 4, capacity = 64)
      assert(rowSet(got) == brute(rows, 4, 64).map(t =>
        Seq[Any](t._1, t._2, t._3, t._4, t._5, t._6)))
    }
  }

  test("every window fits unless the doc itself is oversize; windows are dense") {
    samples(gen, n = 3).foreach { rows =>
      val got = Packing.nextFitPack(rows.toDF("doc_id", "tok"),
        "doc_id", "tok", shards = 4, capacity = 64).collect()
      assert(got.forall(r => r.getLong(4) <= 64 || r.getBoolean(5)))
      // windows within a shard are 1..max with no gaps
      got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
        val ws = rs.map(_.getLong(3)).toSet
        assert(ws == (1L to ws.max).toSet)
      }
    }
  }

  test("an oversize doc takes its own window and is flagged") {
    val rows = Seq((1L, 10L), (5L, 100L), (9L, 10L)) // shard 1 at shards=4
    val got = Packing.nextFitPack(rows.toDF("doc_id", "tok"),
        "doc_id", "tok", shards = 4, capacity = 64)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getBoolean(5)).toSeq == Seq(false, true, false))
  }

  test("non-positive token count fails loudly") {
    val e = intercept[Exception] {
      Packing.nextFitPack(Seq((1L, 0L)).toDF("doc_id", "tok"),
        "doc_id", "tok", shards = 2, capacity = 10).collect()
    }
    assert(messages(e).exists(m => m != null && m.contains("non-positive length")))
  }
}
