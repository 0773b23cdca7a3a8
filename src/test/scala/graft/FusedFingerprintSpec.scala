package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{minhash_sig, simhash60}
import graft.text.Dedup

/** The two row-local text fingerprints ([[graft.functions.MinHashSig]],
  * [[graft.functions.SimHash60]]) that replaced the explode + wide
  * aggregation pipelines in round 4.
  */
class FusedFingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private def arr(rows: (Long, Seq[String])*) = rows.toList.toDF("id", "sh")

  test("minhash_sig is deterministic and order/duplicate-insensitive") {
    val d = arr(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d")), // permutation of 1
      (3L, Seq("a b c", "a b c", "b c d", "c d e"))) // 1 with a duplicate
    val sigs = d.select(col("id"), minhash_sig(col("sh"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L) && sigs(1L) == sigs(3L))
    assert(sigs(1L).length == 8)
  }

  test("minhash_sig is min-stable: sig(A ∪ B) = element-min(sig(A), sig(B))") {
    val a = Seq("s1", "s2", "s3")
    val b = Seq("s4", "s5")
    val d = arr((1L, a), (2L, b), (3L, a ++ b))
    val sigs = d.select(col("id"), minhash_sig(col("sh"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val elementMin = sigs(1L).zip(sigs(2L)).map { case (x, y) => math.min(x, y) }
    assert(sigs(3L) == elementMin)
  }

  test("minhash_sig: empty arrays and null inputs yield null; null elements are skipped") {
    val d = Seq(
      (1L, Option(Seq[Option[String]](Some("x"), None))),
      (2L, Option(Seq.empty[Option[String]])),
      (3L, Option(Seq[Option[String]](None))),
      (4L, None))
      .toDF("id", "sh")
    val out = d.select(col("id"), minhash_sig(col("sh"), 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L) && out(3L) && out(4L))
    // the null element contributed nothing: equals the signature of just "x"
    val just = arr((9L, Seq("x"))).select(minhash_sig(col("sh"), 4))
      .collect().head.getSeq[Long](0)
    val withNull = d.filter(col("id") === 1L)
      .select(minhash_sig(col("sh"), 4)).collect().head.getSeq[Long](0)
    assert(just == withNull)
  }

  test("minhash_sig collision rate tracks Jaccard similarity") {
    // J(A,B) = 0.8 (8 shared of 10 union) → ~80% of positions collide
    val shared = (1 to 8).map(i => s"sh$i")
    val d = arr((1L, shared :+ "onlyA"), (2L, shared :+ "onlyB"))
    val sigs = d.select(col("id"), minhash_sig(col("sh"), 128).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }
    assert(agree > 128 * 0.6 && agree < 128, s"agree=$agree of 128, expected ≈0.8·128")
  }

  test("simhash60 is bit-identical to the relational explode + sign-sum form") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // identical
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "a a a b"), // duplicate tokens must count per occurrence
      (5L, ""))        // empty text → single empty token
    // the pre-round-4 relational definition, inlined: explode tokens,
    // md5-top-15-hex per token, per-bit ±1 sums, sign → bit
    val tok = d.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("token"))
      .withColumn("h", Dedup.tokenHash60(col("token")))
    val bitSums = (0 until Dedup.SimhashBits).map(i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i"))
    val relational = tok.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until Dedup.SimhashBits).map(i =>
          when(col(s"b$i") > 0, expr(s"CAST(1 AS BIGINT) << $i")).otherwise(0L))
          .reduce(_ bitwiseOR _).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == relational)
    assert(fused(1L) == fused(2L) && fused(1L) != fused(3L))
  }

  test("ngrams is byte-identical to the array_distinct∘transform∘concat_ws form") {
    val d = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b")),              // too short for n=3 → empty
      (3L, Seq("x", "", "y", "", "x")), // zero-length tokens keep separators
      (4L, Seq("r", "r", "r", "r")))    // duplicate shingles collapse
      .toDF("id", "toks")
    val sqlForm = expr(
      """CASE WHEN size(toks) >= 3
        |  THEN array_distinct(transform(sequence(0, size(toks) - 3),
        |       i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))
        |  ELSE array()
        |END""".stripMargin)
    val out = d.select(col("id"),
      graft.functions.ngrams(col("toks"), 3).as("fused"), sqlForm.as("sql"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"id=${r.getLong(0)}: ${r.getSeq[String](1)} != ${r.getSeq[String](2)}")
    }
    assert(out.find(_.getLong(0) == 2L).get.getSeq[String](1).isEmpty)
    assert(out.find(_.getLong(0) == 4L).get.getSeq[String](1) == Seq("r r r"))
  }

  test("minhash_sig_ngrams equals minhash_sig over the materialized shingles") {
    val d = Seq(
      (1L, Seq("the", "quick", "brown", "fox", "jumps")),
      (2L, Seq("a", "", "b", "", "c")),
      (3L, Seq("lone", "pair")), // too short → both null
      (4L, (1 to 50).map(i => s"tok$i")))
      .toDF("id", "toks")
    val out = d.select(col("id"),
      graft.functions.minhash_sig_ngrams(col("toks"), 3, 32).as("fused"),
      minhash_sig(graft.functions.ngrams(col("toks"), 3), 32).as("twostep"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) && r.isNullAt(2), s"id=${r.getLong(0)} null mismatch")
      else assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    assert(out.find(_.getLong(0) == 3L).get.isNullAt(1))
  }

  test("property: fused forms equal relational forms on random unicode token arrays") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // multi-byte UTF-8, zero-length tokens, and whitespace-free symbols —
    // the byte-assembly paths must agree with concat_ws/md5 on all of them
    val tokenGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.const(""),
      Gen.oneOf("héllo", "日本語", "Ω≈ç√", "emoji🙂", "ß", "ñaño"))
    val arrGen = Gen.listOfN(12, tokenGen)
    val cases = (1 to 10).flatMap(i =>
      arrGen.apply(Gen.Parameters.default, Seed(i.toLong))).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }
    val d = cases.toDF("id", "toks")
    val sqlNgrams = expr(
      """CASE WHEN size(toks) >= 3
        |  THEN array_distinct(transform(sequence(0, size(toks) - 3),
        |       i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))
        |  ELSE array()
        |END""".stripMargin)
    val out = d.select(col("id"),
      graft.functions.ngrams(col("toks"), 3).as("ng_fused"), sqlNgrams.as("ng_sql"),
      graft.functions.minhash_sig_ngrams(col("toks"), 3, 16).as("mh_fused"),
      minhash_sig(sqlNgrams, 16).as("mh_sql"),
      simhash60(col("toks")).as("sh_fused"))
      .collect()
    // simhash relational replay, driver-side, from the documented definition
    def md5Top60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    cases.foreach { case (id, ts) =>
      val r = out.find(_.getLong(0) == id).get
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"ngrams mismatch id=$id")
      if (r.isNullAt(3) || r.isNullAt(4))
        assert(r.isNullAt(3) && r.isNullAt(4), s"minhash null mismatch id=$id")
      else assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"minhash mismatch id=$id")
      val sums = new Array[Int](60)
      ts.foreach { t =>
        val h = md5Top60(t)
        (0 until 60).foreach(i => sums(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1))
      }
      val want = (0 until 60).foldLeft(0L)((acc, i) =>
        if (sums(i) > 0) acc | (1L << i) else acc)
      assert(r.getLong(5) == want, s"simhash mismatch id=$id")
    }
  }

  test("minhash_sig and simhash60 are registered for SQL text") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      val r = s2.sql(
        """SELECT size(minhash_sig(array('a', 'b'), 4)) AS n,
          |       simhash60(array('a')) AS s""".stripMargin)
        .collect().head
      assert(r.getInt(0) == 4)
      // simhash of one token = its 60-bit hash (every set bit sums to +1)
      val h = s2.sql("SELECT conv(substring(md5('a'), 1, 15), 16, 10)")
        .collect().head.getString(0).toLong
      assert(r.getLong(1) == h)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def docs(rows: (Long, String)*) =
    rows.toList.map { case (id, t) => (id, t) }.toDF("doc_id", "text")
}
