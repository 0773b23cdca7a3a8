package graft

import org.apache.spark.sql.functions._
import graft.vector.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toList.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")

  test("cosineTopK ranks by exact cosine with deterministic tie-break") {
    val vs = emb(
      (0L, Seq(1f, 0f)),   // query
      (1L, Seq(1f, 0f)),   // cos 1.0
      (2L, Seq(1f, 1f)),   // cos √2/2 ≈ 0.7071
      (3L, Seq(0f, 1f)),   // cos 0
      (4L, Seq(1f, 0f)))   // cos 1.0 — ties with 1, later id
    val out = rows(Similarity.cosineTopK(spark, vs, vs.filter(col("vec_id") === 0), k = 3)
      .select("rank", "vec_id", "score"))
    assert(out == Seq(Seq(1L, 1L, 1.0), Seq(2L, 4L, 1.0), Seq(3L, 2L, 0.707107)))
  }

  test("TopKAgg buffer never exceeds k and merges correctly") {
    val agg = new Similarity.TopKAgg(2)
    val b = (1 to 10).foldLeft(agg.zero)((buf, i) =>
      agg.reduce(buf, Similarity.Scored(0L, i.toLong, i.toDouble)))
    assert(b.size == 2 && b.map(_._1) == List(10.0, 9.0))
    val merged = agg.merge(b, List((20.0, 99L)))
    assert(merged == List((20.0, 99L), (10.0, 10L)))
  }

  test("lshTopK: identical vectors share a bucket and rank first") {
    val vs = emb(
      (0L, Seq(1f, 2f, 3f, 4f)),
      (1L, Seq(1f, 2f, 3f, 4f)),   // identical to query → same bucket, cos 1
      (2L, Seq(-1f, -2f, -3f, -4f))) // opposite → different bucket
    val out = rows(Similarity.lshTopK(spark, vs, vs.filter(col("vec_id") === 0),
      k = 5, nbits = 4).select("vec_id", "score"))
    assert(out.contains(Seq(1L, 1.0)))
    assert(!out.exists(_.head == 2L))
  }

  test("embeddingNearDup finds planted near-identical vectors, nothing else") {
    val base = Seq(0.3f, -0.7f, 0.5f, 0.9f, -0.1f, 0.4f, 0.2f, -0.6f)
    val nearDup = base.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val vs = emb(
      (1L, base), (2L, nearDup),                       // planted pair, cos ≈ 1
      (3L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),       // unrelated
      (4L, base.map(-_)))                              // antipodal — cos = -1
    val out = rows(Similarity.embeddingNearDup(vs, threshold = 0.95)
      .select("vec_id_1", "vec_id_2"))
    assert(out == Seq(Seq(1L, 2L)))
  }

  test("sizeBands: identity at gate scales, log-growth with recall preserved beyond") {
    // every oracle-gated SF (and the r7 sf0.1 bench) stays on the fixed
    // geometry — byte-identical buckets, untouched gate behavior
    assert(Similarity.sizeBands(220L, 8, 8, 0.95, 16) == ((8, 8)))
    assert(Similarity.sizeBands(2020L, 8, 8, 0.95, 16) == ((8, 8)))
    // the sf1 replay size: 11 bits pin occupancy at ~10, 12 bands
    // restore the miss bound
    assert(Similarity.sizeBands(20020L, 8, 8, 0.95, 16) == ((12, 11)))
    // occupancy bound holds as n grows; recall at the threshold is
    // preserved by construction: (1 - p^r)^b never worse than the base
    val p = 1.0 - math.acos(0.95) / math.Pi
    val baseMiss = math.pow(1.0 - math.pow(p, 8), 8)
    Seq(1e5, 1e6, 1e8, 1e10).map(_.toLong).foreach { n =>
      val (b, r) = Similarity.sizeBands(n, 8, 8, 0.95, 16)
      assert(n.toDouble / math.pow(2.0, r) <= 16.0 + 1e-9,
        s"n=$n (b=$b, r=$r): occupancy ${n / math.pow(2.0, r)}")
      val miss = math.pow(1.0 - math.pow(p, r), b)
      assert(miss <= baseMiss * 1.05, s"n=$n (b=$b, r=$r): miss $miss > base $baseMiss")
    }
  }

  test("embeddingNearDup at an auto-sized corpus still finds exactly the planted pairs") {
    // 5000 hash-derived pseudo-random 64-dim vectors (null cosines
    // concentrate near 0; max over 12.5M pairs ~0.7) + 10 planted
    // near-identical pairs. n pushes sizeBands past the fixed geometry
    // ((8,8) -> (9,9) at threshold 0.999) and the result must STILL be
    // exactly the planted pairs — auto-sizing changes candidate load,
    // never output.
    val dim = 64
    // MurmurHash3 for real avalanche: a weak multiplicative hash leaves
    // every row on one additive orbit mod the modulus — rows with close
    // orbit offsets are near-identical, planting accidental pairs
    def comp(i: Int, j: Int): Float =
      ((scala.util.hashing.MurmurHash3.caseClassHash((i, j)) % 1000 + 1000) % 1000
        / 1000.0f) - 0.5f
    val baseVecs = (0 until 5000).map { i =>
      (i.toLong + 10000L, (0 until dim).map(j => comp(i, j)))
    }
    val planted = (0 until 10).map { i =>
      val (id, v) = baseVecs(i * 137)
      (id + 1000000L, v.updated(0, v.head + 0.001f))
    }
    val vs = emb((baseVecs ++ planted): _*)
    val got = rowSet(Similarity.embeddingNearDup(vs, threshold = 0.999)
      .select("vec_id_1", "vec_id_2"))
    val want = (0 until 10).map { i =>
      val id = baseVecs(i * 137)._1
      Seq[Any](id, id + 1000000L)
    }.toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("sign_bits equals the per-plane vector_dot form bit-for-bit") {
    import graft.functions.{sign_bits, vector_dot}
    import org.apache.spark.sql.functions.typedLit
    // same left-to-right accumulation per plane -> identical doubles ->
    // identical bits; this pins the fused expression to the composable
    // form the oracles conceptually replay
    val dim = 16
    val nbits = 24
    val vs = (0 until 50).map { i =>
      (i.toLong, (0 until dim).map(j =>
        ((scala.util.hashing.MurmurHash3.caseClassHash((i, j)) % 997).toDouble / 997.0) - 0.5))
    }.toDF("vec_id", "v")
    def planeD(p: Int): Seq[Double] =
      Similarity.planeMicro(p, dim).map(_.toDouble / 1000.0 - 0.5).toSeq
    val fused = vs.select(col("vec_id"), sign_bits(col("v"), nbits).as("bits"))
    val perPlane = vs.select(col("vec_id"),
      array((0 until nbits).map(p =>
        (vector_dot(col("v"), typedLit(planeD(p))) > 0).cast("int")): _*).as("bits"))
    assert(rows(fused) == rows(perPlane))
    // null vector -> null; null elements contribute zero like vector_dot
    val withNull = Seq((1L, Option.empty[Seq[Double]]),
      (2L, Some(Seq(0.5, -0.25)))).toDF("vec_id", "v")
    val n = withNull.select(sign_bits(col("v"), 4).as("b")).collect()
    assert(n.exists(_.isNullAt(0)) && n.exists(!_.isNullAt(0)))
  }

  test("embeddingNearDup fails loudly when a bucket overflows maxBucket") {
    // 5 identical vectors land in one bucket in every band; cap 3 → the
    // overflow must be an error (silent truncation would report the
    // overflow docs as unique — VERDICT r4 finding #2)
    val v = Seq(0.3f, -0.7f, 0.5f, 0.9f)
    val vs = emb((1L to 5L).map(i => (i, v)): _*)
    val ex = intercept[Exception] {
      Similarity.embeddingNearDup(vs, threshold = 0.95, maxBucket = 3).collect()
    }
    assert(messages(ex).exists(m => m != null && m.contains("maxGroupSize=3")))
    // and the observable-truncation opt-out still completes, truncating
    assert(Similarity.embeddingNearDup(vs, threshold = 0.95, maxBucket = 3,
      failOnOverflow = false).count() >= 1L)
  }

  test("crossNearDup finds the planted cross-corpus leak, nothing else") {
    val base = Seq(0.3f, -0.7f, 0.5f, 0.9f, -0.1f, 0.4f, 0.2f, -0.6f)
    val nearDup = base.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val corpus = emb(
      (1L, nearDup),                                   // leaked probe, cos ≈ 1
      (2L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),       // unrelated
      (3L, base.map(-_)))                              // antipodal — cos = -1
    val probes = emb(
      (10L, base),
      (11L, Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val out = rows(Similarity.crossNearDup(corpus, probes, threshold = 0.95)
      .select("corpus_id", "probe_id"))
    assert(out == Seq(Seq(1L, 10L)))
  }

  test("crossNearDup never pairs corpus vectors with each other") {
    // two identical corpus vectors, probe unrelated: a self-pairing bug
    // would emit (1, 2); the cross contract must emit nothing
    val v = Seq(0.3f, -0.7f, 0.5f, 0.9f)
    val corpus = emb((1L, v), (2L, v))
    val probes = emb((10L, Seq(0.9f, 0.1f, -0.4f, -0.2f)))
    assert(Similarity.crossNearDup(corpus, probes, threshold = 0.95).count() == 0)
  }

  test("crossNearDup fails loudly on a probe bucket overflow; truncation opt-out completes") {
    val v = Seq(0.3f, -0.7f, 0.5f, 0.9f)
    val corpus = emb((1L, v))
    val probes = emb((10L to 14L).map(i => (i, v)): _*)
    val ex = intercept[Exception] {
      Similarity.crossNearDup(corpus, probes, threshold = 0.95, maxBucket = 3).collect()
    }
    assert(messages(ex).exists(m => m != null && m.contains("maxGroupSize=3")))
    val truncated = Similarity.crossNearDup(corpus, probes, threshold = 0.95,
      maxBucket = 3, failOnOverflow = false)
    assert(truncated.count() == 3) // deterministic smallest-ids kept
  }

  test("crossNearDup rejects mismatched vector dimensions") {
    val corpus = emb((1L, Seq(1f, 0f, 0f)))
    val probes = emb((10L, Seq(1f, 0f)))
    val ex = intercept[IllegalArgumentException] {
      Similarity.crossNearDup(corpus, probes)
    }
    assert(ex.getMessage.contains("equal vector dimensions"))
    // empty sides are fine — no pairs, no error
    assert(Similarity.crossNearDup(emb(), probes).count() == 0)
    assert(Similarity.crossNearDup(corpus, emb()).count() == 0)
  }

  test("ivfTopK with full probing equals brute force exactly") {
    val vs = emb((0 until 24).map(i =>
      (i.toLong, Seq(math.sin(i * 1.3).toFloat, math.cos(i * 0.7).toFloat,
        math.sin(i * 0.5 + 2).toFloat))): _*)
    val q = vs.filter(col("vec_id") < 2)
    val exact = rows(Similarity.cosineTopK(spark, vs, q, k = 5))
    // nProbe == nCentroids: every cell probed → must match brute force
    val ivf = rows(Similarity.ivfTopK(spark, vs, q, k = 5,
      nCentroids = 4, nProbe = 4))
    assert(ivf == exact)
  }

  test("ivfTopK with trained centroids and full probing still equals brute force") {
    val vs = emb((0 until 24).map(i =>
      (i.toLong, Seq(math.sin(i * 1.3).toFloat, math.cos(i * 0.7).toFloat,
        math.sin(i * 0.5 + 2).toFloat))): _*)
    val q = vs.filter(col("vec_id") < 2)
    val exact = rows(Similarity.cosineTopK(spark, vs, q, k = 5))
    val ivf = rows(Similarity.ivfTopK(spark, vs, q, k = 5,
      nCentroids = 4, nProbe = 4, trainIterations = 2))
    assert(ivf == exact)
  }

  test("trainCentroids improves IVF recall over first-N seeding on clustered data") {
    // Four tight clusters around orthogonal axes; ids 0–3 ALL sit in
    // cluster 0, so first-N-by-id seeding starts degenerate (every seed in
    // one cluster) while two Lloyd's rounds should separate the cells.
    def v(axis: Int, eps: Float): Seq[Float] =
      (0 until 4).map(d =>
        (if (d == axis) 1f else 0f) + (if (d == (axis + 1) % 4) eps else 0f))
    val pts = (0 until 32).map { i =>
      val axis = if (i < 4) 0 else i % 4
      (i.toLong, v(axis, 0.01f * (i % 7 + 1)))
    }
    val vs = emb(pts: _*)
    val q = vs.filter(col("vec_id") >= 28) // one query per cluster
    def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      rows(df.select("query_id", "vec_id"))
        .groupBy(_.head.asInstanceOf[Long])
        .view.mapValues(_.map(_(1).asInstanceOf[Long]).toSet).toMap
    val exact = topkSets(Similarity.cosineTopK(spark, vs, q, k = 5))
    def recall(found: Map[Long, Set[Long]]): Double =
      exact.map { case (qid, want) =>
        found.getOrElse(qid, Set.empty).intersect(want).size.toDouble / want.size
      }.sum / exact.size
    val stub = recall(topkSets(Similarity.ivfTopK(spark, vs, q, k = 5,
      nCentroids = 4, nProbe = 1)))
    val trained = recall(topkSets(Similarity.ivfTopK(spark, vs, q, k = 5,
      nCentroids = 4, nProbe = 1, trainIterations = 2)))
    assert(trained >= stub, s"trained recall $trained < stub recall $stub")
    assert(trained >= 0.9, s"trained recall $trained below 0.9")
  }

  test("empty inputs return empty frames, not errors (vecDim guard)") {
    val none = emb()
    assert(Similarity.embeddingNearDup(none, threshold = 0.9).count() == 0)
    assert(Similarity.lshTopK(spark, none, none, k = 3, nbits = 4).count() == 0)
  }

  test("lshTopK results are a subset of brute-force results with equal scores") {
    val vs = emb((0 until 20).map(i =>
      (i.toLong, Seq(math.sin(i * 1.7).toFloat, math.cos(i * 0.9).toFloat,
        math.sin(i * 0.3 + 1).toFloat))): _*)
    val q = vs.filter(col("vec_id") < 2)
    val exact = rows(Similarity.cosineTopK(spark, vs, q, k = 19)
      .select("query_id", "vec_id", "score")).map(r => (r(0), r(1)) -> r(2)).toMap
    val lsh = rows(Similarity.lshTopK(spark, vs, q, k = 19, nbits = 2)
      .select("query_id", "vec_id", "score"))
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      assert(exact((r(0), r(1))) == r(2), s"score mismatch for ${r(0)}→${r(1)}")
    }
  }

  test("kmeansClusterProfile: partitions all vectors, coherent on planted clusters") {
    // four tight orthogonal clusters of 8 vectors each
    def v(axis: Int, eps: Float): Seq[Float] =
      (0 until 4).map(d =>
        (if (d == axis) 1f else 0f) + (if (d == (axis + 1) % 4) eps else 0f))
    val pts = (0 until 32).map(i => (i.toLong, v(i % 4, 0.01f * (i % 5 + 1))))
    val vs = emb(pts: _*)
    val got = rows(Similarity.kmeansClusterProfile(vs, nCentroids = 4,
      iterations = 2).select("cent_id", "n_vecs", "min_vec_id", "cohesion_micro"))
    // every vector lands in exactly one report row
    assert(got.map(_(1).asInstanceOf[Long]).sum == 32L)
    // seeds are the 4 smallest ids; on planted clusters each cell holds
    // exactly one axis's 8 members, and each member is near-parallel to
    // its centroid: cohesion_micro ≈ 8 × 10⁶ per cell
    assert(got.size == 4)
    got.foreach { r =>
      assert(r(1).asInstanceOf[Long] == 8L, s"unbalanced cell: $r")
      val coh = r(3).asInstanceOf[Long]
      assert(coh > 7900000L && coh <= 8000000L, s"low cohesion: $r")
    }
    // fixed-point determinism: bit-identical across partitionings
    val again = rows(Similarity.kmeansClusterProfile(vs.repartition(7),
      nCentroids = 4, iterations = 2)
      .select("cent_id", "n_vecs", "min_vec_id", "cohesion_micro"))
    assert(got == again)
  }
}
