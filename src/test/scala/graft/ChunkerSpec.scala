package graft

import graft.text.Chunker
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("windows start every stride tokens, overlap, and bound the tail") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val got = Chunker.chunks(doc(text), chunkSize = 4, stride = 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (0L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, "t4 t5 t6 t7"),   // 1-token overlap with chunk 0
      (2L, 4L, "t7 t8 t9 t10"),
      (3L, 1L, "t10")))          // bounded tail
  }

  test("every token appears in at least one chunk (no coverage gaps)") {
    val text = (1 to 97).map(i => s"w$i").mkString(" ")
    val covered = Chunker.chunks(doc(text), chunkSize = 10, stride = 7)
      .select(explode(split(col("chunk_text"), " ")).as("t"))
      .distinct().count()
    assert(covered == 97L)
  }

  test("a document shorter than one chunk yields exactly one bounded chunk") {
    val got = Chunker.chunks(doc("only three tokens"), chunkSize = 50, stride = 40).collect()
    assert(got.length == 1 && got(0).getLong(2) == 3L)
  }

  test("stride > chunkSize is rejected (it would drop tokens silently)") {
    intercept[IllegalArgumentException] {
      Chunker.chunks(doc("a b c"), chunkSize = 3, stride = 4)
    }
  }
}
