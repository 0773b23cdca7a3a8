package graft

import org.apache.spark.sql.functions._
import graft.functions.nfc_normalize

/** The NFC normalization expression vs the JDK normalizer it wraps:
  * planted decomposed Unicode (explicit \u escapes — no fragile literal
  * combining characters in source), idempotence, null/ASCII passthrough,
  * and SQL-text registration.
  */
class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  // "Café naïve Å" with every accent DECOMPOSED (base + combining mark)
  private val decomposed = "Café naïve Å"
  private val composed = java.text.Normalizer
    .normalize(decomposed, java.text.Normalizer.Form.NFC)

  test("composes decomposed sequences; composed text passes through byte-identical") {
    assert(composed != decomposed) // the fixture really is decomposed
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "t")
      .select(col("id"), nfc_normalize(col("t")).as("n"), col("t"))
    val out = df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == composed)
    assert(out(2L)._1 == out(2L)._2)
    assert(out(3L)._1 == "plain ascii")
    // idempotent: normalizing twice changes nothing
    val twice = Seq(Tuple1(decomposed)).toDF("t")
      .select(nfc_normalize(nfc_normalize(col("t"))).as("n"))
      .collect().head.getString(0)
    assert(twice == composed)
  }

  test("ASCII fast path returns the input UTF8String by reference (zero-alloc)") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("plain ascii, no marks 123!")
    assert(graft.functions.NfcNormalize.compute(ascii) eq ascii)
    // non-ASCII but already-NFC also passes through by reference (one
    // String materialization for the isNormalized check, no re-encode)
    val nfc = UTF8String.fromString("café")
    assert(graft.functions.NfcNormalize.compute(nfc) eq nfc)
    // decomposed input must NOT take the fast path
    val dec = UTF8String.fromString("café")
    assert(graft.functions.NfcNormalize.compute(dec).toString == "café")
  }

  test("normalized-vs-raw comparison finds exactly the decomposed docs") {
    val df = Seq((1L, decomposed), (2L, composed), (3L, "x")).toDF("id", "t")
    val changed = df.filter(nfc_normalize(col("t")) =!= col("t"))
      .collect().map(_.getLong(0)).toSeq
    assert(changed == Seq(1L))
  }

  test("null input yields null; random mark soup matches the JDK normalizer") {
    val n = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(nfc_normalize(col("t")).as("n")).collect().head
    assert(n.isNullAt(0))
    val rnd = new scala.util.Random(42)
    val pieces = Vector("a", "e", "é" /* composed é */ ,
      "é" /* decomposed é */ , "́" /* lone combining mark */ , " ")
    val strs = (1 to 30).map(_ =>
      (1 to 8).map(_ => pieces(rnd.nextInt(pieces.size))).mkString)
    val got = strs.map(Tuple1(_)).toDF("t")
      .select(nfc_normalize(col("t")).as("n")).collect().map(_.getString(0)).toSeq
    val want = strs.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got == want)
  }

  test("GraftExtensions registers nfc_normalize for SQL text") {
    val base = spark // ensure the shared session (and its context) exists
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // the combining mark is substituted into the SQL text by Scala,
      // so no reliance on SQL-level escape handling
      val got = s2.sql("SELECT nfc_normalize('Cafe\u0301') AS n")
        .head().getString(0)
      assert(got == "Caf\u00e9")
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
    }
  }
}
