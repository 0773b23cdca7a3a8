package graft

import org.apache.spark.sql.functions._
import graft.text.TextClean

class TextCleanSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String): String =
    Seq(Tuple1(text)).toDF("text")
      .select(TextClean.redactPii(col("text"))).collect().head.getString(0)

  test("redacts emails, phones, and IPs with typed placeholders") {
    assert(one("mail me at jane.doe+x@example.co.uk today") ==
      "mail me at <EMAIL> today")
    assert(one("server at 192.168.0.1 port 80") == "server at <IP> port 80")
    assert(one("call +1 (555) 123-4567 now") == "call <PHONE> now")
  }

  test("clean text passes through unchanged") {
    assert(one("just some ordinary words") == "just some ordinary words")
  }

  test("piiCount counts matches without redacting") {
    val n = Seq(Tuple1("a@b.com and c@d.org at 10.0.0.1"))
      .toDF("text").select(TextClean.piiCount(col("text"))).collect().head.getInt(0)
    assert(n == 3)
  }

  test("dedupLines removes repeated lines keeping first occurrence order") {
    val cleaned = Seq(Tuple1("header\nbody one\nheader\nbody two\nheader"))
      .toDF("text").select(TextClean.dedupLines(col("text")))
      .collect().head.getString(0)
    assert(cleaned == "header\nbody one\nbody two")
  }

  test("clean composes the full pass and preserves the raw column") {
    val df = Seq((1L, "x@y.io   spaced\nx@y.io   spaced")).toDF("doc_id", "text")
    val out = TextClean.clean(df).collect().head
    assert(out.getString(out.fieldIndex("text")) == "<EMAIL> spaced")
    assert(out.getString(out.fieldIndex("raw_text")).contains("x@y.io"))
  }

  test("piiAudit counts docs and matches per type; clean corpus reports zeros") {
    val docs = Seq(
      (1L, "contact me at a@b.com or c@d.org thanks"),  // 2 emails
      (2L, "server at 10.0.0.1 and 192.168.1.254"),     // 2 ipv4
      (3L, "call +1 (555) 123-4567 now"),               // 1 phone
      (4L, "a@b.com again"),                            // 1 email
      (5L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val got = TextClean.piiAudit(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("email", 2L, 3L), ("ipv4", 1L, 2L), ("phone", 1L, 1L)), got)
    val clean = Seq((1L, "hello world")).toDF("doc_id", "text")
    assert(TextClean.piiAudit(clean).collect().forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == 0L))
  }
}
