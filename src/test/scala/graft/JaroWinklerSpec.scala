package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.jaro_winkler

/** The native Jaro–Winkler scorer: published textbook values, the oracle
  * engine's conventions at the edges (probed once against
  * jaro_winkler_similarity and pinned here), metric properties on random
  * ASCII words, and the codegen/interpreted agreement that every custom
  * expression owes.
  */
class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b"))).head().getDouble(0)

  test("textbook and oracle-probed values match to 1e-12") {
    // (a, b, expected) — classic Winkler pairs plus edge cases probed
    // against the oracle engine's jaro_winkler_similarity
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964), // j>0.7 but prefix 0
      ("duane", "dwayne", 0.8400000000000001),
      ("aaaaaab", "aaaaaac", 0.9428571428571428), // prefix capped at 4
      ("spark", "sprak", 0.9466666666666665),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0), // oracle convention: both-empty is 0, not 1
      ("ab", "ba", 0.0), // window 0 ⇒ no matches
      ("abcd", "badc", 0.8333333333333334), // pure transpositions
      ("abcdef", "cabdef", 0.9444444444444445)) // odd mismatch count: floored (prefix 0)
    for ((a, b, want) <- cases)
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
  }

  test("metric properties on random ASCII words") {
    val word = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'e')).map(_.mkString))
    val pairs = samples(Gen.zip(word, word), n = 60)
    val df = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      jaro_winkler(col("a"), col("b")).as("ab"),
      jaro_winkler(col("b"), col("a")).as("ba"),
      jaro_winkler(col("a"), col("a")).as("aa"))
    for (r <- df.collect()) {
      val (ab, ba, aa) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(ab >= 0.0 && ab <= 1.0)
      assert(ab == ba, s"symmetry: ${r.getString(0)} vs ${r.getString(1)}")
      assert(aa == 1.0)
    }
  }

  test("interpreted eval equals codegen") {
    val word = Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'd')).map(_.mkString))
    val pairs = samples(Gen.zip(word, word), n = 40)
    val df = pairs.toDF("a", "b")
    val gen = df.select(jaro_winkler(col("a"), col("b"))).collect().map(_.getDouble(0))
    val interp = pairs.map { case (a, b) =>
      graft.functions.JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
    assert(gen.toSeq == interp)
  }

  test("null propagates; GraftExtensions registers jaro_winkler for SQL text") {
    val out = Seq((Some("abc"), None: Option[String])).toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val v = s2.sql("SELECT jaro_winkler('martha', 'marhta') AS s")
        .head().getDouble(0)
      assert(math.abs(v - 0.9611111111111111) < 1e-12)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
    }
  }
}
