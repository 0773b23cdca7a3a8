package graft

import org.apache.spark.sql.functions._
import graft.text.Splits

class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = (1L to 2000L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")

  test("assignment is deterministic across invocations and repartitionings") {
    val a = Splits.assign(docs, "doc_id").select("doc_id", "split").collect().toSet
    val b = Splits.assign(docs.repartition(13), "doc_id")
      .select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("fractions land near their weights and cover every row") {
    val counts = Splits.assign(docs, "doc_id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1450 && counts("train") < 1750)
    assert(counts("val") > 100 && counts("val") < 320)
    assert(counts("test") > 100 && counts("test") < 320)
  }

  test("group-keyed splits keep every row of a group in one split") {
    val assigned = Splits.assign(docs, "source")
    val perGroup = assigned.groupBy("source")
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L))
  }

  test("existing assignments are stable when the corpus grows") {
    val before = Splits.assign(docs, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = (1L to 4000L).map(i => (i, "s")).toDF("doc_id", "source")
    val after = Splits.assign(grown, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before.forall { case (id, s) => after(id) == s })
  }
}
