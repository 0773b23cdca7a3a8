package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.vector.Project

class ProjectSpec extends SparkTestBase {
  import spark.implicits._

  private val D = 8
  private val DP = 4

  /** Driver transcription: same md5-parity signs, same micro
    * fixed-point multiply-accumulate. */
  private def brute(vec: Seq[Float]): (Long, Long, Long) = {
    val xm = vec.map(x => math.round(x.toDouble * 1e6))
    val xNorm2 = xm.map(v => v * v).sum
    val p = (0 until DP).map(j => (0 until D).map(i => xm(i) * Project.sign(i, j)).sum)
    (xNorm2, p.map(v => v * v).sum, p.zipWithIndex.map { case (v, j) => v * (j + 1) }.sum)
  }

  private val vecs: Gen[Seq[Seq[Float]]] =
    Gen.listOfN(12, Gen.listOfN(D, Gen.chooseNum(-0.6f, 0.6f)))

  test("projection norms and checksum == driver brute force") {
    samples(vecs, n = 4).foreach { rows =>
      val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = Project.jlSketch(df, "vec_id", "embedding", D, DP)
        .orderBy("id").collect()
      got.zip(rows).foreach { case (r, v) =>
        val (xn, pn, ck) = brute(v)
        assert(r.getLong(1) == xn && r.getLong(2) == pn && r.getLong(3) == ck,
          s"id=${r.getLong(0)}: got (${r.getLong(1)},${r.getLong(2)},${r.getLong(3)}) want ($xn,$pn,$ck)")
      }
    }
  }

  test("sign matrix is balanced enough to be a plausible Rademacher draw") {
    // not a property of any single cell — but an all-+1 matrix (a broken
    // hash) would fail instantly, which is the regression this pins
    val total = (0 until 64).flatMap(i => (0 until 16).map(j => Project.sign(i, j))).sum
    assert(math.abs(total) < 200, s"sign sum $total")
  }

  test("wrong input dimension fails loudly") {
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Project.jlSketch(df, "vec_id", "embedding", D, DP).collect()
    }
    assert(messages(e).exists(m => m != null && m.contains("expected 8 dims")))
  }
}
