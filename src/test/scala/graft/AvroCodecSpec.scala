package graft

import org.apache.spark.sql.functions._
import graft.functions.{avro_decode, avro_encode}
import graft.streaming.StreamIngest.RecommendationEventAvroSchema

class AvroCodecSpec extends SparkTestBase {
  import spark.implicits._

  private val Sch = RecommendationEventAvroSchema

  private def events = Seq(
    (3L, Seq(1L, 2L), "ab"),
    (0L, Seq.empty[Long], ""),
    (1234567L, Seq(64L, 8191L, 8192L), "2024-01-02T03:04:05"))
    .toDF("requestedUserId", "recommendations", "timestamp")
    .select(struct(col("requestedUserId"), col("recommendations"),
      col("timestamp")).as("e"))

  test("encode→decode round-trips the RecommendationEvent schema") {
    val out = events
      .select(avro_decode(avro_encode(col("e"), Sch, 7), Sch, 7).as("d"))
      .select(col("d.requestedUserId"), col("d.recommendations"),
        col("d.timestamp"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getString(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, Seq.empty[Long], ""),
      (3L, Seq(1L, 2L), "ab"),
      (1234567L, Seq(64L, 8191L, 8192L), "2024-01-02T03:04:05")))
  }

  test("wire bytes match the Avro 1.x binary spec, hand-computed") {
    // uid 3 → zigzag 6; array block: count 2 (zigzag 4), items 1→2, 2→4,
    // terminator 0; string "ab": len 2 (zigzag 4) + bytes. Frame: magic 0
    // + big-endian id 7.
    val bytes = events.where(col("e.requestedUserId") === 3L)
      .select(avro_encode(col("e"), Sch, 7)).head().getAs[Array[Byte]](0)
    val expected = Array[Byte](0, 0, 0, 0, 7, // Confluent frame, id = 7
      6, 4, 2, 4, 0, 4, 'a'.toByte, 'b'.toByte)
    assert(bytes.toSeq == expected.toSeq)
    // empty array = just the 0x00 terminator, no count block
    val empty = events.where(col("e.requestedUserId") === 0L)
      .select(avro_encode(col("e"), Sch, -1)).head().getAs[Array[Byte]](0)
    assert(empty.toSeq == Seq[Byte](0, 0, 0))
  }

  test("unframed mode omits the Confluent prefix entirely") {
    val framed = events.select(avro_encode(col("e"), Sch, 7).as("b"))
      .select(length(col("b"))).as[Int].collect()
    val bare = events.select(avro_encode(col("e"), Sch, -1).as("b"))
      .select(length(col("b"))).as[Int].collect()
    assert(framed.toSeq.map(_ - 5) == bare.toSeq)
    val rt = events.select(
      avro_decode(avro_encode(col("e"), Sch, -1), Sch, -1).as("d"))
      .where(col("d.requestedUserId") === 3L)
      .select(col("d.timestamp")).head().getString(0)
    assert(rt == "ab")
  }

  test("nullable unions and nested records round-trip, nulls preserved") {
    val sch =
      """{"type":"record","name":"N","fields":[
        |{"name":"k","type":"long"},
        |{"name":"tag","type":["null","string"]},
        |{"name":"inner","type":{"type":"record","name":"I","fields":[
        |  {"name":"x","type":"double"},
        |  {"name":"flags","type":{"type":"array","items":"boolean"}}]}}]}"""
        .stripMargin
    val df = Seq((1L, Option("t"), 1.5, Seq(true, false)),
                 (2L, None: Option[String], -0.25, Seq.empty[Boolean]))
      .toDF("k", "tag", "x", "flags")
      .select(struct(col("k"), col("tag"),
        struct(col("x"), col("flags")).as("inner")).as("e"))
    val out = df.select(avro_decode(avro_encode(col("e"), sch, -1), sch, -1).as("d"))
      .select(col("d.k"), col("d.tag"), col("d.inner.x"), col("d.inner.flags"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDouble(2), r.getSeq[Boolean](3))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, Some("t"), 1.5, Seq(true, false)),
                            (2L, None, -0.25, Seq.empty[Boolean])))
  }

  test("corrupt frames fail loudly instead of decoding garbage") {
    val cases = Seq(
      ("wrong magic", Array[Byte](1, 0, 0, 0, 7, 6), "not Confluent-framed"),
      ("wrong schema id", Array[Byte](0, 0, 0, 0, 9, 6), "schema id 9"),
      ("truncated frame", Array[Byte](0, 0), "not Confluent-framed"))
    cases.foreach { case (label, payload, needle) =>
      val e = intercept[Exception] {
        Seq(payload).toDF("b").select(avro_decode(col("b"), Sch, 7)).collect()
      }
      assert(messages(e).exists(_.contains(needle)),
        s"$label: ${messages(e).mkString("; ")}")
    }
  }

  test("GraftExtensions registers avro_encode/avro_decode for SQL text") {
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val schemaLit = Sch.replace("'", "''").replace("\n", " ")
      val r = s2.sql(
        s"""SELECT d.requestedUserId AS uid, d.timestamp AS ts FROM (
           |  SELECT avro_decode(avro_encode(
           |    named_struct('requestedUserId', 9L,
           |      'recommendations', array(1L, 2L), 'timestamp', 'x'),
           |    '$schemaLit', 7), '$schemaLit', 7) AS d)""".stripMargin)
        .collect().head
      assert(r.getLong(0) == 9L && r.getString(1) == "x")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("unsupported Avro shapes are rejected at bind time, not mid-stream") {
    val multi =
      """{"type":"record","name":"M","fields":[
        |{"name":"v","type":["long","string"]}]}""".stripMargin
    val e = intercept[Exception] {
      Seq(1L).toDF("v").select(struct(col("v")).as("e"))
        .select(avro_encode(col("e"), multi, -1)).collect()
    }
    assert(messages(e).exists(_.contains("union")), messages(e).mkString("; "))
  }
}
