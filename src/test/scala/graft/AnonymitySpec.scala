package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.quality.Anonymity

/** k-anonymity audit and minimal generalization
  * ([[graft.quality.Anonymity]]) against a driver-side brute-force
  * replay of the local-recoding semantics.
  */
class AnonymitySpec extends SparkTestBase {
  import spark.implicits._

  private val recGen: Gen[(String, String, Long)] = for {
    city <- Gen.oneOf("u", "v", "w", "x")
    job <- Gen.oneOf("eng", "med")
    age <- Gen.chooseNum(20L, 49L)
  } yield (city, job, age)

  private def ladder3 = Seq(
    Seq("city" -> col("city"), "job" -> col("job"),
      "age_band" -> (col("age") - col("age") % 10)),
    Seq("city" -> col("city"), "job" -> col("job"), "age_band" -> lit("*")),
    Seq("city" -> col("city"), "job" -> lit("*"), "age_band" -> lit("*")))

  /** Driver-side replay: release at the first level whose group (counted
    * over still-unreleased records) reaches k.
    */
  private def brute(recs: Seq[(String, String, Long)], k: Int) = {
    def enc(r: (String, String, Long), lvl: Int): Seq[String] = lvl match {
      case 0 => Seq(r._1, r._2, (r._3 - r._3 % 10).toString)
      case 1 => Seq(r._1, r._2, "*")
      case 2 => Seq(r._1, "*", "*")
    }
    var remaining = recs
    val out = Seq.newBuilder[Seq[Any]]
    for (lvl <- 0 to 2) {
      val groups = remaining.groupBy(enc(_, lvl))
      val (ok, esc) = groups.partition(_._2.size >= k)
      ok.foreach { case (g, rs) => out += (g ++ Seq(lvl, rs.size.toLong, false)) }
      if (lvl == 2)
        esc.foreach { case (g, rs) => out += (g ++ Seq(lvl, rs.size.toLong, true)) }
      else remaining = esc.values.flatten.toSeq
    }
    out.result().sortBy(_.mkString("|"))
  }

  test("generalizeToK == brute-force local recoding, property") {
    samples(Gen.listOfN(60, recGen), n = 5).foreach { recs =>
      val got = Anonymity.generalizeToK(recs.toDF("city", "job", "age"), ladder3, k = 5)
      assert(rows(got) == brute(recs, 5))
    }
  }

  test("every released group meets k or is suppressed; record mass is conserved") {
    samples(Gen.listOfN(80, recGen), n = 3).foreach { recs =>
      val got = Anonymity.generalizeToK(recs.toDF("city", "job", "age"), ladder3, k = 8)
      val bad = got.filter(!col("suppressed") && col("cnt") < 8).count()
      assert(bad == 0L)
      // each record released exactly once: counts sum to the input size
      assert(got.agg(sum("cnt")).as[Long].head() == recs.size.toLong)
    }
  }

  test("audit flags exactly the under-k groups") {
    val df = Seq.fill(6)(("u", "eng")).++(Seq(("v", "med"), ("v", "med"), ("w", "eng")))
      .toDF("city", "job")
    val got = Anonymity.audit(df, Seq("city" -> col("city"), "job" -> col("job")), k = 3)
    assert(rowSet(got) == Set(
      Seq("u", "eng", 6L, false), Seq("v", "med", 2L, true), Seq("w", "eng", 1L, true)))
  }

  test("ladder levels must encode identical column names") {
    val e = intercept[IllegalArgumentException] {
      Anonymity.generalizeToK(Seq(("u", 1L)).toDF("city", "age"),
        Seq(Seq("city" -> col("city")), Seq("town" -> lit("*"))), k = 2)
    }
    assert(e.getMessage.contains("same columns"))
  }

  test("lDiversity flags homogeneous groups that k-anonymity passes") {
    // group u: 4 records, ONE sensitive value — k-safe at k=3, l-risky
    // at l=2; group v: 2 records, 2 values — l-safe, k-risky
    val df = (Seq.fill(4)(("u", "cancer")) ++ Seq(("v", "flu"), ("v", "cold")))
      .toDF("city", "diag")
    val got = Anonymity.lDiversity(df, Seq("city" -> col("city")),
      col("diag"), l = 2)
    assert(rowSet(got) == Set(
      Seq("u", 4L, 1L, true), Seq("v", 2L, 2L, false)))
    val audit = Anonymity.audit(df, Seq("city" -> col("city")), k = 3)
    assert(rowSet(audit).contains(Seq("u", 4L, false)),
      "the homogeneous group must be k-anonymous — that IS the gap l-diversity closes")
  }

  test("lDiversity == brute distinct count per group on random records") {
    for (recs <- samples(org.scalacheck.Gen.listOfN(60, recGen), n = 6)) {
      val df = recs.toDF("city", "job", "age")
      val got = Anonymity.lDiversity(df,
        Seq("city" -> col("city")), col("job"), l = 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSeq.sortBy(_._1)
      val want = recs.groupBy(_._1).map { case (city, rows) =>
        val distinct = rows.map(_._2).distinct.size.toLong
        (city, rows.size.toLong, distinct, distinct < 3)
      }.toSeq.sortBy(_._1)
      assert(got == want)
    }
  }
}
