package graft

import graft.text.Relevance
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("rare terms outscore common ones; repeated terms outscore single hits") {
    val d = docs(
      (1L, "shared shared rare1"),
      (2L, "shared other rare2"),
      (3L, "shared other filler"))
    val top = Relevance.tfidfTopTerms(d, k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("token")).toMap
    // doc 1: rare1 (tf1·N3/df1 = 3) vs shared (tf2·N3/df3 = 2) → rare1
    assert(top(1L) == "rare1")
    assert(top(2L) == "rare2")
  }

  test("scores are the exact (tf·N)/df rational and ties break by token") {
    val d = docs((1L, "b a"), (2L, "a b"))
    val got = Relevance.tfidfTopTerms(d, k = 2)
      .filter(col("doc_id") === 1L).orderBy("rn")
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Double]("score")))
    // both terms score (1·2)/2 = 1.0 — rn order must be alphabetical
    assert(got.toSeq == Seq(("a", 1.0), ("b", 1.0)))
  }

  test("k truncates per document, not globally") {
    val d = docs((1L, "a b c d e f g"), (2L, "h"))
    val byDoc = Relevance.tfidfTopTerms(d, k = 3)
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 3L, 2L -> 1L))
  }
}
