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
}
