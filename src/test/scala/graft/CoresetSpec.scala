package graft

import org.scalacheck.Gen

import graft.vector.Coreset

class CoresetSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver transcription with the IDENTICAL float recipe: sequential
    * left-to-right dots, d = (sq − 2·dot) + csq, argmax by (md, −id). */
  private def brute(vecs: Seq[(Long, Seq[Double])], k: Int): Seq[(Int, Long, Double)] = {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0)((s, p) => s + p._1 * p._2)
    val live = vecs.filter(v => math.sqrt(dot(v._2, v._2)) > 0).sortBy(_._1)
    if (live.isEmpty) return Seq.empty
    val sq = live.map { case (id, v) => id -> dot(v, v) }.toMap
    val byId = live.toMap
    var picked = List((0, live.head._1, 0.0))
    var md = live.map { case (id, v) =>
      id -> (sq(id) - 2.0 * dot(v, byId(live.head._1)) + sq(live.head._1)) }.toMap
    var r = 1
    while (r < k && picked.size < live.size) {
      val chosen = picked.map(_._2).toSet
      val (id, d) = md.filterNot(p => chosen(p._1)).toSeq
        .maxBy { case (i, m) => (m, -i) }
      picked ::= ((r, id, d))
      md = md.map { case (i, m) =>
        i -> math.min(m, sq(i) - 2.0 * dot(byId(i), byId(id)) + sq(id)) }
      r += 1
    }
    picked.reverse.map { case (rd, id, d) =>
      (rd, id, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
  }

  private def run(vecs: Seq[(Long, Seq[Double])], k: Int): Seq[(Int, Long, Double)] =
    Coreset.kCenterGreedy(vecs.toDF("vec_id", "embedding"), k)
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)

  test("picks the corners first on a crafted 2-D layout") {
    // note id 1 is zero-norm and excluded by prep, so the seed is id 2
    val vecs = Seq(
      1L -> Seq(0.0, 0.0), 2L -> Seq(0.1, 0.0), 3L -> Seq(0.0, 0.1),
      4L -> Seq(10.0, 10.0), 5L -> Seq(10.0, 0.0), 6L -> Seq(0.2, 0.1))
    val got = run(vecs, 3)
    assert(got.map(_._2) == Seq(2L, 4L, 5L))
    assert(got.head._3 == 0.0 && got(1)._3 == 198.01 && got(2)._3 == 98.01)
  }

  test("matches the brute transcription on random vector sets") {
    val gen = for {
      n <- Gen.chooseNum(3, 40)
      dim <- Gen.chooseNum(2, 6)
      vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-3.0, 3.0)))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v: Seq[Double]) }
    for (vecs <- samples(gen, n = 6); k <- Seq(1, 3, 7))
      assert(run(vecs, k) == brute(vecs, k), s"k=$k n=${vecs.size}")
  }

  test("k beyond the candidate count stops early with every point selected once") {
    val vecs = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0), 3L -> Seq(1.0, 1.0))
    val got = run(vecs, 10)
    assert(got.map(_._2).sorted == Seq(1L, 2L, 3L))
    assert(got.map(_._1) == Seq(0, 1, 2))
  }

  test("zero-norm vectors are excluded by the module-wide prep contract") {
    val vecs = Seq(1L -> Seq(0.0, 0.0), 2L -> Seq(1.0, 0.0), 3L -> Seq(0.0, 2.0))
    val got = run(vecs, 5)
    assert(got.map(_._2).sorted == Seq(2L, 3L))
  }

  test("duplicate vectors are still picked deterministically at distance 0") {
    val vecs = Seq(1L -> Seq(1.0, 1.0), 2L -> Seq(1.0, 1.0), 3L -> Seq(1.0, 1.0))
    val got = run(vecs, 3)
    assert(got == Seq((0, 1L, 0.0), (1, 2L, 0.0), (2, 3L, 0.0)))
  }

  test("empty input yields an empty frame; k is validated") {
    assert(run(Seq.empty, 3).isEmpty)
    intercept[IllegalArgumentException](
      Coreset.kCenterGreedy(Seq((1L, Seq(1.0))).toDF("vec_id", "embedding"), 0))
  }
}
