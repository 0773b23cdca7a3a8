package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ingest.Fingerprint

class FingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private def digest(fields: Seq[String]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    // the injective canonical encoding: `len:value` per field (codepoint
    // length, like both engines' length()), null -> "N"
    val enc = fields.map { f =>
      if (f == null) "N" else s"${f.codePointCount(0, f.length)}:$f"
    }
    val hex = d.digest(enc.mkString("").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  private val rows: Gen[Seq[(Long, String, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.alphaStr.map(_.take(6)), Gen.oneOf("a", "b", "c")))
      .map(_.zipWithIndex.map { case ((t, s), i) => (i.toLong, s, t) })

  test("fingerprint == driver md5 replay, per slice") {
    samples(rows, n = 4).foreach { rs =>
      val df = rs.toDF("id", "slice", "t")
      val got = Fingerprint.fingerprint(df, "slice",
          Seq(col("id").cast("string"), col("t")))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = rs.groupBy(_._2).map { case (s, g) =>
        s -> ((g.size.toLong, g.map(r => digest(Seq(r._1.toString, r._3))).sum))
      }
      assert(got == want)
    }
  }

  test("invariant to partitioning; additive across disjoint slices") {
    val rs = (1L to 400L).map(i => (i, s"s${i % 3}", s"text$i"))
    val cols = Seq(col("id").cast("string"), col("t"))
    val a = Fingerprint.fingerprint(rs.toDF("id", "slice", "t").repartition(17), "slice", cols)
    val b = Fingerprint.fingerprint(rs.toDF("id", "slice", "t").coalesce(1), "slice", cols)
    assert(rowSet(a) == rowSet(b))
    // rollup: sum of slice fps == global fp over the same rows
    val global = Fingerprint.fingerprint(
      rs.toDF("id", "slice", "t").withColumn("g", lit("all")), "g", cols)
      .head().getLong(2)
    assert(a.agg(sum("fp")).as[Long].head() == global)
  }

  test("any single-row edit moves the slice fingerprint") {
    val rs = (1L to 50L).map(i => (i, "s", s"text$i"))
    val cols = Seq(col("id").cast("string"), col("t"))
    val fp0 = Fingerprint.fingerprint(rs.toDF("id", "slice", "t"), "slice", cols)
      .head().getLong(2)
    val edited = rs.map { case (i, s, t) => (i, s, if (i == 37L) t + "X" else t) }
    val fp1 = Fingerprint.fingerprint(edited.toDF("id", "slice", "t"), "slice", cols)
      .head().getLong(2)
    assert(fp0 != fp1)
    // a compensating count/sum-preserving swap still moves the digest
    val swapped = rs.map { case (i, s, t) =>
      (i, s, if (i == 10L) "text11" else if (i == 11L) "text10" else t) }
    val fp2 = Fingerprint.fingerprint(swapped.toDF("id", "slice", "t"), "slice", cols)
      .head().getLong(2)
    assert(fp0 != fp2)
  }

  test("null fields and embedded separators stay unambiguous (ADVICE r8)") {
    val cols = Seq(col("a"), col("b"))
    def fp(rows: Seq[(String, String)]): Long =
      Fingerprint.fingerprint(
        rows.toDF("a", "b").withColumn("s", lit("x")), "s", cols)
        .head().getLong(2)
    // (null,"x") vs ("x",null): a bare concat_ws would encode both as "x"
    assert(fp(Seq((null, "x"))) != fp(Seq(("x", null))))
    // driver replay agrees on the null sentinel
    assert(fp(Seq((null, "x"))) == digest(Seq(null, "x")))
    // a field CONTAINING the U+0001 separator cannot masquerade as two
    // fields: ("a\u0001b", "c") vs ("a", "b\u0001c") differ
    assert(fp(Seq(("a\u0001b", "c"))) != fp(Seq(("a", "b\u0001c"))))
  }
}
