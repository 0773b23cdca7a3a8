package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{vector_moments, VectorMoments}
import graft.vector.Stats

class VectorStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def df(vs: Seq[Seq[Double]], parts: Int = 5): DataFrame =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding").repartition(parts)

  private def moments(vs: Seq[Seq[Double]], parts: Int) = {
    val r = df(vs, parts).agg(vector_moments(col("embedding")).as("m"))
      .select("m.n", "m.s", "m.s2").head()
    (r.getLong(0), r.getSeq[Double](1), r.getSeq[Double](2))
  }

  test("moments match brute force across partition layouts") {
    val gen = for {
      d <- Gen.chooseNum(1, 9)
      n <- Gen.chooseNum(1, 60)
      vs <- Gen.listOfN(n, Gen.listOfN(d, Gen.chooseNum(-3.0, 3.0)))
    } yield vs
    for (vs <- samples(gen, n = 5); parts <- Seq(1, 7)) {
      val d = vs.head.size
      val (n, s, s2) = moments(vs, parts)
      assert(n == vs.size)
      for (i <- 0 until d)
        assert(math.abs(s(i) - vs.map(_(i)).sum) < 1e-9, s"s($i)")
      for (i <- 0 until d; j <- i until d) {
        val brute = vs.map(v => v(i) * v(j)).sum
        assert(math.abs(s2(VectorMoments.triIdx(i, j, d)) - brute) < 1e-9,
          s"s2($i,$j)")
      }
    }
  }

  test("null vectors are skipped; null elements count as zero") {
    val vs = Seq((1L, Seq[java.lang.Double](2.0, null)), (2L, null))
    val r = vs.toDF("vec_id", "embedding")
      .agg(vector_moments(col("embedding").cast("array<double>")).as("m"))
      .select("m.n", "m.s", "m.s2").head()
    assert(r.getLong(0) == 1L)
    assert(r.getSeq[Double](1) == Seq(2.0, 0.0))
    assert(r.getSeq[Double](2) == Seq(4.0, 0.0, 0.0))
  }

  test("zero-dimension vectors fail loudly (ADVICE r8)") {
    val e = intercept[Exception] {
      Seq(Seq.empty[Double]).toDF("v")
        .agg(graft.functions.vector_moments(col("v"))).collect()
    }
    assert(e.getMessage.contains("zero-dimension"))
  }

  test("ragged dimensions fail loudly") {
    val e = intercept[Exception] {
      Seq((1L, Seq(1.0)), (2L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
        .agg(vector_moments(col("embedding")).as("m")).collect()
    }
    assert(messages(e).exists(m => m != null && m.contains("ragged")))
  }

  test("standardizeAudit: constant dimension has zero std and no outliers") {
    // dim 0 constant 5; dim 1 has one far outlier among tight values
    val vs = Seq.fill(30)(Seq(5.0, 0.0)) :+ Seq(5.0, 100.0)
    val got = Stats.standardizeAudit(df(vs)).orderBy("dim").collect()
    assert(got.length == 2)
    val d0 = got(0)
    assert(d0.getLong(1) == 5000000L && d0.getLong(2) == 0L && d0.getLong(3) == 0L)
    val d1 = got(1)
    // mean 100/31 ≈ 3.2258, std ≈ 17.68 → |100 − 3.23| ≈ 96.8 > 3·17.68
    assert(d1.getLong(3) == 1L, s"expected the single spike flagged: $d1")
  }

  test("pcaTopComponent recovers a planted dominant direction") {
    // points spread along (1, 1)/√2 with tiny orthogonal noise
    val dir = Array(1.0 / math.sqrt(2), 1.0 / math.sqrt(2))
    val vs = (0 until 80).map { i =>
      val t = (i - 40) / 10.0
      val eps = (i % 5 - 2) / 100.0
      Seq(t * dir(0) - eps * dir(1), t * dir(1) + eps * dir(0))
    }
    val got = Stats.pcaTopComponent(df(vs)).orderBy("dim").collect()
    assert(got.length == 2)
    val v = got.map(_.getLong(1).toDouble / 1e6)
    // unit norm up to micro rounding
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3)
    // aligned with the planted direction (sign-free)
    val cos = math.abs(v(0) * dir(0) + v(1) * dir(1))
    assert(cos > 0.999, s"cos=$cos v=${v.toSeq}")
    // eigenvalue ≈ planted variance: Var(t) = Σt²/n with t = (i−40)/10
    val lam = got.head.getLong(2).toDouble / 1e6
    val ts = (0 until 80).map(i => (i - 40) / 10.0)
    val planted = ts.map(t => t * t).sum / 80 - math.pow(ts.sum / 80, 2)
    assert(math.abs(lam - planted) / planted < 0.05, s"lam=$lam planted=$planted")
  }

  test("pcaTopComponent is invariant to partition layout") {
    val gen = Gen.listOfN(50, Gen.listOfN(4, Gen.chooseNum(-2.0, 2.0)))
    for (vs <- samples(gen, n = 3)) {
      val a = rows(Stats.pcaTopComponent(df(vs, parts = 1)))
      val b = rows(Stats.pcaTopComponent(df(vs, parts = 8)))
      assert(a == b)
    }
  }

  test("quantizeInt8: anchors, error bound, constant-dim guard") {
    // dim 0 spans [0, 255] (scale 1 — codes are the values themselves);
    // dim 1 constant (scale 0 — code 0, zero error)
    val vs = Seq(Seq(0.0, 7.0), Seq(51.0, 7.0), Seq(255.0, 7.0))
    val got = Stats.quantizeInt8(df(vs)).orderBy("vec_id").collect()
    assert(got.map(_.getSeq[Int](1)).toSeq ==
      Seq(Seq(0, 0), Seq(51, 0), Seq(255, 0)))
    assert(got.forall(_.getLong(2) == 0L), "exact grid quantizes losslessly")
    assert(got.forall(_.getBoolean(3)))
  }

  test("quantizeInt8: round-trip error within scale/2 on random corpora") {
    val gen = for {
      d <- Gen.chooseNum(1, 6)
      vs <- Gen.listOfN(40, Gen.listOfN(d, Gen.chooseNum(-10.0, 10.0)))
    } yield vs
    for (vs <- samples(gen, n = 4)) {
      val got = Stats.quantizeInt8(df(vs)).collect()
      assert(got.length == vs.size)
      assert(got.forall(_.getBoolean(3)), "within_bound must hold everywhere")
      // cross-check one error against a driver-side recompute
      val d = vs.head.size
      val lo = (0 until d).map(i => vs.map(_(i)).min)
      val sc = (0 until d).map(i => (vs.map(_(i)).max - lo(i)) / 255.0)
      got.foreach { r =>
        val v = vs(r.getLong(0).toInt)
        val err = (0 until d).map { i =>
          if (sc(i) == 0) 0.0
          else {
            val c = math.min(255.0, math.max(0.0, math.round((v(i) - lo(i)) / sc(i)).toDouble))
            math.abs((v(i) - lo(i)) - c * sc(i))
          }
        }.max
        assert(math.abs(r.getLong(2) - math.floor(err * 1e6 + 0.5)) <= 1,
          s"vec ${r.getLong(0)}")
      }
    }
  }

  test("int8TopK ranks by exact integer dot and agrees with a driver recompute") {
    val gen = Gen.listOfN(30, Gen.listOfN(5, Gen.chooseNum(-4.0, 4.0)))
    for (vs <- samples(gen, n = 3)) {
      val corpus = df(vs)
      val got = Stats.int8TopK(corpus, corpus.filter(col("vec_id") < 2), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // driver replay of the whole chain
      val d = vs.head.size
      val lo = (0 until d).map(i => vs.map(_(i)).min)
      val sc = (0 until d).map(i => (vs.map(_(i)).max - lo(i)) / 255.0)
      def codes(v: Seq[Double]): Seq[Long] = (0 until d).map { i =>
        if (sc(i) == 0) 0L
        else math.min(255L, math.max(0L, math.round((v(i) - lo(i)) / sc(i))))
      }
      val want = (0 until 2).flatMap { qid =>
        val qc = codes(vs(qid))
        vs.indices.filter(_ != qid)
          .map(j => (j.toLong, codes(vs(j)).zip(qc).map { case (a, b) => a * b }.sum))
          .sortBy { case (id, dt) => (-dt, id) }.take(5).zipWithIndex
          .map { case ((id, dt), r) => (qid.toLong, (r + 1).toLong, id, dt) }
      }
      assert(got.toSeq == want, s"got=${got.toSeq}")
    }
  }
}
