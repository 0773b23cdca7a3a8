package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.text.Importance

class ImportanceSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver transcription: same md5 bucket, same add-half smoothing,
    * same single-rounding-per-bucket nano discipline. */
  private def brute(docs: Seq[(Long, String, String)], target: String,
                    b: Int): Map[Long, (Long, Long)] = {
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % b
    }
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, text.toLowerCase.split("[ \t\n\r\f]+", -1).toSeq.map(bucket)) }
    val all = toks.flatMap(_._3)
    val tgt = toks.filter(_._2 == target).flatMap(_._3)
    val ns = all.size.toDouble
    val nt = tgt.size.toDouble
    val cs = all.groupBy(identity).view.mapValues(_.size).toMap
    val ct = tgt.groupBy(identity).view.mapValues(_.size).toMap
    val half = b * 0.5
    val nano = cs.map { case (bk, c) =>
      bk -> BigDecimal(math.log(((ct.getOrElse(bk, 0) + 0.5) / (nt + half)) /
        ((c + 0.5) / (ns + half))) * 1000000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }
    toks.map { case (id, _, bs) =>
      id -> ((bs.size.toLong, bs.map(nano).sum)) }.toMap
  }

  private val langs = Seq("en", "de", "fr")

  test("matches the brute transcription on random corpora") {
    val word = Gen.oneOf("spark", "join", "scan", "row", "filter", "agg", "der", "das")
    val doc = for {
      n <- Gen.chooseNum(1, 20)
      ws <- Gen.listOfN(n, word)
      lang <- Gen.oneOf(langs)
    } yield (lang, ws.mkString(" "))
    val corpus = Gen.chooseNum(2, 15).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) })
    for (docs <- samples(corpus, n = 6); b <- Seq(16, 4096)) {
      val got = Importance.tokenImportanceNano(
          docs.toDF("doc_id", "lang", "text"), col("lang") === "en", nBuckets = b)
        .select("doc_id", "n_toks", "imp_nano")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == brute(docs, "en", b), s"b=$b")
    }
  }

  test("target-domain docs score above out-of-domain docs when vocabularies differ") {
    val docs = (
      (1 to 10).map(i => (i.toLong, "en", "spark join filter scan")) ++
      (11 to 20).map(i => (i.toLong, "de", "der das und aber"))).toSeq
    val got = Importance.tokenImportanceNano(
        docs.toDF("doc_id", "lang", "text"), col("lang") === "en")
      .select("lang", "imp_nano").as[(String, Long)].collect()
    val byLang = got.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    assert(byLang("en") > 0 && byLang("de") < 0)
    assert(byLang("en") > byLang("de"))
  }

  test("result is partitioning-invariant (integer sums, single rounding per bucket)") {
    val docs = (1 to 30).map(i =>
      (i.toLong, langs(i % 3), s"w${i % 7} w${i % 5} w${i % 3}")).toSeq
    val df = docs.toDF("doc_id", "lang", "text")
    val a = Importance.tokenImportanceNano(df.repartition(1), col("lang") === "en")
    val c = Importance.tokenImportanceNano(df.repartition(11), col("lang") === "en")
    assert(rows(a.select("doc_id", "n_toks", "imp_nano")) ==
      rows(c.select("doc_id", "n_toks", "imp_nano")))
  }

  test("an empty target domain is well-defined through smoothing") {
    val docs = Seq((1L, "de", "a b c"), (2L, "fr", "a d"))
    val got = Importance.tokenImportanceNano(
        docs.toDF("doc_id", "lang", "text"), col("lang") === "en")
      .select("doc_id", "imp_nano").as[(Long, Long)].collect().toMap
    assert(got.size == 2)
    assert(got.values.forall(_ < 0)) // everything is out-of-domain
    intercept[IllegalArgumentException](Importance.tokenImportanceNano(
      docs.toDF("doc_id", "lang", "text"), col("lang") === "en", nBuckets = 1))
  }
}
