package graft

import graft.quality.Quality

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private val goodRows = List(
    (1L, "2024-01-01T00:00:00", 10L, "click", 1.0, "{}"),
    (2L, "2024-01-01T00:00:01", 11L, "view", 2.0, "{}"))

  private def frame(rows: List[(Long, String, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("clean frame passes the gate and is returned unchanged") {
    val df = frame(goodRows)
    assert(Quality.gate(df, Quality.eventsSuite(df)).collect().length == 2)
  }

  test("run reports zero violations per check on a clean frame") {
    val df = frame(goodRows)
    val out = Quality.run(df, Quality.eventsSuite(df)).collect()
    assert(out.length == 6 && out.forall(_.getBoolean(2)))
  }

  test("gate rejects a frame with a forbidden event_type, naming the check") {
    val df = frame(goodRows :+ (3L, "2024-01-01T00:00:02", 12L, "BOGUS", 0.0, "{}"))
    val e = intercept[IllegalStateException](Quality.gate(df, Quality.eventsSuite(df)))
    assert(e.getMessage.contains("values_in_event_type"))
  }

  test("gate rejects null user ids and duplicate event ids together") {
    val bad = List(
      (1L, "t", 10L, "click", 1.0, "{}"),
      (1L, "t", 10L, "click", 1.0, "{}")) // dup event_id
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[IllegalStateException](Quality.gate(bad, Quality.eventsSuite(bad)))
    assert(e.getMessage.contains("unique_event_id"))
  }

  test("gate rejects a misordered column list") {
    val df = frame(goodRows).select("ts", "event_id", "user_id", "event_type", "value", "props")
    val e = intercept[IllegalStateException](Quality.gate(df, Quality.eventsSuite(df)))
    assert(e.getMessage.contains("columns_ordered"))
  }

  test("documents suite passes the real corpus and rejects an empty-lang batch") {
    val good = List((1L, "hello world", "en", "s1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Quality.gate(good, Quality.documentsSuite(good)).count() == 1)
    val bad = List((1L, "hello", "xx", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[IllegalStateException](
      Quality.gate(bad, Quality.documentsSuite(bad)))
    assert(e.getMessage.contains("values_in_lang"))
  }

  test("empty frame fails non_empty") {
    val df = frame(Nil)
    val e = intercept[IllegalStateException](Quality.gate(df, Quality.eventsSuite(df)))
    assert(e.getMessage.contains("non_empty"))
  }

  test("fkCoverage: matched/missing/null partition the fact side exactly") {
    val fact = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .map(Tuple1(_)).toDF("fk")
    val dim = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("k")
    val r = Quality.fkCoverage(fact, "fk", dim, "k").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) ==
      (5L, 3L, 1L, 1L, 3.0 / 5.0))
    // duplicate dimension keys must not double-count fact matches
    val dupDim = Seq(1L, 1L, 2L).map(Tuple1(_)).toDF("k")
    val d = Quality.fkCoverage(fact, "fk", dupDim, "k").collect().head
    assert((d.getLong(0), d.getLong(1)) == (5L, 3L))
    // empty fact side: zero coverage, not NaN
    val empty = Seq.empty[Tuple1[Long]].toDF("fk")
    assert(Quality.fkCoverage(empty, "fk", dim, "k").collect().head.getDouble(4) == 0.0)
  }

  test("fkCoverage == brute force on random fact/dim key sets") {
    import org.scalacheck.Gen
    val factGen = Gen.listOfN(25, Gen.option(Gen.chooseNum(1L, 12L)))
    val dimGen = Gen.listOfN(8, Gen.chooseNum(1L, 12L))
    samples(Gen.zip(factGen, dimGen), n = 4).foreach { case (fks, dks) =>
      val fact = fks.map(Tuple1(_)).toDF("fk")
      val dim = dks.map(Tuple1(_)).toDF("k")
      val dset = dks.toSet
      val nNull = fks.count(_.isEmpty).toLong
      val nMatched = fks.count(_.exists(dset.contains)).toLong
      val nMissing = fks.count(f => f.isDefined && !dset.contains(f.get)).toLong
      val r = Quality.fkCoverage(fact, "fk", dim, "k").collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) ==
        (fks.size.toLong, nMatched, nMissing, nNull,
          nMatched.toDouble / fks.size.toLong), s"fks=$fks dks=$dks")
    }
  }
}
