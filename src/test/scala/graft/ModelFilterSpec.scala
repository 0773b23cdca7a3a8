package graft

import graft.quality.ModelFilter

/** Brute-force replay of the logistic scorer on in-memory docs. */
class ModelFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toList.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def r4(d: Double) =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def brute(t: String): Long = {
    val toks = t.toLowerCase.split("[ \t\n\r\f]+").toSeq
    val nTok = math.max(toks.size, 1).toDouble
    val nCh = math.max(t.length, 1).toDouble
    val punct = t.count(c => "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".contains(c))
    val stopR = r4(toks.count(Set("the", "a", "of", "and", "is")).toDouble / nTok)
    val punctR = r4(punct.toDouble / nCh)
    val uniqR = r4(toks.distinct.size.toDouble / nTok)
    val lenNorm = math.min(t.length, 2000).toDouble / 2000.0
    val z = -2.0 + 6.0 * stopR + -8.0 * punctR + 3.0 * uniqR + 2.0 * lenNorm
    math.round(1.0 / (1.0 + math.exp(-z)) * 1e6)
  }

  test("logitQuality == brute-force sigmoid over the rounded features") {
    val texts = Seq(
      (1L, "the cat sat of the mat and it is a cat"),
      (2L, "!!! ??? ,,, ;;; :::"),
      (3L, "x " * 40 + "x"),
      (4L, "the quick brown fox jumps over the lazy dog and runs away"))
    val got = ModelFilter.logitQuality(docs(texts: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val want = texts.map { case (id, t) =>
      val s = brute(t); (id, s, s >= 500000L)
    }
    assert(got == want)
  }

  test("logitQuality separates prose from punctuation soup") {
    val d = docs(
      (1L, "the story of a fox and a dog is one of the best the world " +
        "knows and it is told again and again"),
      (2L, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"))
    val byId = ModelFilter.logitQuality(d).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(byId(1L) && !byId(2L))
  }
}
