package graft

import org.scalacheck.Gen

import graft.vector.Mmr

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0)((s, p) => s + p._1 * p._2)

  /** Driver transcription with the identical float recipe. */
  private def brute(cands: Seq[(Long, Seq[Double])], qv: Seq[Double], k: Int,
                    lamMicro: Int): Seq[(Int, Long, Double)] = {
    val lam = lamMicro / 1000000.0
    val qn = math.sqrt(dot(qv, qv))
    val live = cands.filter(c => math.sqrt(dot(c._2, c._2)) > 0)
    val norm = live.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = live.toMap
    val rel = live.map { case (id, v) => id -> dot(v, qv) / (norm(id) * qn) }.toMap
    var ms = live.map(c => c._1 -> -1.0).toMap
    var picked = List.empty[(Int, Long, Double)]
    var r = 0
    // Spark (and SQL engines generally) normalize -0.0 to 0.0 in
    // comparisons and storage; mirror that or a ±0.0 score tie-breaks
    // differently here than everywhere else
    def n0(x: Double): Double = if (x == 0.0) 0.0 else x
    while (r < k && picked.size < live.size) {
      val chosen = picked.map(_._2).toSet
      val (id, sc) = live.map(_._1).filterNot(chosen)
        .map(i => i -> n0(lam * rel(i) - (1.0 - lam) * (1.0 + ms(i))))
        .maxBy { case (i, s) => (s, -i) }
      picked ::= ((r, id, sc))
      ms = ms.map { case (i, m) =>
        i -> math.max(m, dot(byId(i), byId(id)) / (norm(i) * norm(id))) }
      r += 1
    }
    picked.reverse.map { case (rd, id, s) =>
      (rd, id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
  }

  private def run(cands: Seq[(Long, Seq[Double])], qv: Seq[Double], k: Int,
                  lamMicro: Int = 500000): Seq[(Int, Long, Double)] =
    Mmr.rerank(cands.toDF("vec_id", "embedding"), qv, k, lamMicro)
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)

  test("diversification: the near-duplicate of the first pick is passed over") {
    // at λ=0.3 the redundancy penalty outweighs the near-dup's higher
    // relevance; at λ=0.5 relevance still wins (both asserted, so the
    // trade-off knob demonstrably moves the decision)
    val qv = Seq(1.0, 0.0)
    val cands = Seq(
      1L -> Seq(1.0, 0.05),   // most relevant
      2L -> Seq(1.0, 0.06),   // near-dup of 1 — high rel, high redundancy
      3L -> Seq(0.6, 0.8))    // less relevant but diverse
    assert(run(cands, qv, 2, lamMicro = 300000).map(_._2) == Seq(1L, 3L))
    assert(run(cands, qv, 2, lamMicro = 500000).map(_._2) == Seq(1L, 2L))
  }

  test("lambda = 1 degenerates to pure relevance order") {
    val qv = Seq(1.0, 0.0)
    val cands = Seq(1L -> Seq(1.0, 0.1), 2L -> Seq(1.0, 0.11), 3L -> Seq(0.0, 1.0))
    val got = run(cands, qv, 3, lamMicro = 1000000)
    val rel = cands.map { case (id, v) =>
      id -> dot(v, qv) / math.sqrt(dot(v, v)) }.sortBy { case (i, r) => (-r, i) }
    assert(got.map(_._2) == rel.map(_._1))
  }

  test("matches the brute transcription on random pools") {
    val gen = for {
      n <- Gen.chooseNum(3, 30)
      dim <- Gen.chooseNum(2, 5)
      vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-2.0, 2.0)))
      qv <- Gen.listOfN(dim, Gen.chooseNum(-2.0, 2.0))
        .suchThat(v => v.exists(_ != 0.0))
    } yield (vs.zipWithIndex.map { case (v, i) => (i.toLong, v: Seq[Double]) },
      qv: Seq[Double])
    for ((cands, qv) <- samples(gen, n = 6); k <- Seq(1, 4); lam <- Seq(0, 300000, 1000000))
      assert(run(cands, qv, k, lam) == brute(cands, qv, k, lam),
        s"k=$k lam=$lam n=${cands.size}")
  }

  test("k beyond the pool stops early; arguments validated") {
    val cands = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    assert(run(cands, Seq(1.0, 1.0), 9).map(_._2).sorted == Seq(1L, 2L))
    val df = cands.toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](Mmr.rerank(df, Seq(1.0, 0.0), 0))
    intercept[IllegalArgumentException](Mmr.rerank(df, Seq(1.0, 0.0), 1, -1))
    intercept[IllegalArgumentException](Mmr.rerank(df, Seq(0.0, 0.0), 1))
  }
}
