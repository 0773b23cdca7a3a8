package graft

import org.apache.spark.sql.functions._
import graft.vector.Similarity

/** Product-quantization ADC ANN ([[graft.vector.Similarity.pqTopK]]).
  * The oracle-gated q135 checks the full train/encode/score dataflow
  * against DuckDB; these tests pin the algebraic properties that gate
  * cannot see: exact recovery at zero quantization error, ranking
  * contract, and determinism.
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  /** dim-8 vectors with only `distinct` distinct values, ids 0..n-1 —
    * the first `distinct` ids enumerate every distinct vector, so the
    * smallest-id seeding covers the whole value set. Components are
    * multiples of 0.125: exact in float, in double, AND on the
    * operator's 1e-6 fixed-point grid, so "zero quantization error"
    * really is zero (a 0.1-style value would drift by a float-vs-grid
    * ulp through centroid averaging and flake the exactness assert).
    */
  private def corpus(n: Int, distinct: Int) =
    (0 until n).map { i =>
      val b = i % distinct
      (i.toLong, Array.tabulate(8)(j => (1.0f + b + j * (b % 3)) * 0.125f))
    }.toDF("vec_id", "embedding")

  test("zero quantization error => PQ ranking == exact inner-product ranking") {
    // 6 distinct vectors, 8 codes per subspace: after seeding, every
    // distinct subvector IS a codebook entry, so ADC scores are exact
    val emb = corpus(30, 6)
    val q = emb.filter(col("vec_id") < 2)
    val got = Similarity.pqTopK(spark, emb, q, k = 5, m = 2, codesPerSub = 8,
      trainIterations = 2)

    val raw = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    val expected = (0L until 2L).flatMap { qid =>
      raw.toSeq.filter(_._1 != qid)
        .map { case (id, v) =>
          val ip = v.zip(raw(qid)).map { case (a, b) => a * b }.sum
          // the operator's fixed-point grid, applied per subspace
          val fp = (0 until 2).map { s =>
            math.round(v.slice(s * 4, s * 4 + 4).zip(raw(qid).slice(s * 4, s * 4 + 4))
              .map { case (a, b) => a * b }.sum * 1e6)
          }.sum
          (qid, id, fp / 1e6, ip)
        }
        .sortBy { case (_, id, s, _) => (-s, id) }.take(5)
        .zipWithIndex.map { case ((_, id, s, _), r) => Seq[Any](qid, (r + 1).toLong, id, s) }
    }
    assert(rows(got) == expected.sortBy(_.mkString("|")))
  }

  test("ranking contract: k rows per query, ranks 1..k, never self") {
    val emb = corpus(40, 15)
    val got = Similarity.pqTopK(spark, emb, emb.filter(col("vec_id") < 3), k = 7)
      .cache()
    try {
      assert(got.count() == 21)
      assert(got.groupBy("query_id").agg(count(lit(1)).as("n"), min("rank").as("lo"),
          max("rank").as("hi"))
        .filter(col("n") =!= 7 || col("lo") =!= 1 || col("hi") =!= 7).count() == 0)
      assert(got.filter(col("query_id") === col("vec_id")).count() == 0)
    } finally got.unpersist()
  }

  test("deterministic across runs") {
    val emb = corpus(25, 9)
    val q = emb.filter(col("vec_id") === 0)
    val a = rows(Similarity.pqTopK(spark, emb, q, k = 6, m = 4, codesPerSub = 4))
    val b = rows(Similarity.pqTopK(spark, emb, q, k = 6, m = 4, codesPerSub = 4))
    assert(a == b)
  }

  test("dimension must split evenly into subspaces") {
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(spark, corpus(10, 3), corpus(1, 1), m = 3)
    }
    assert(e.getMessage.contains("subspaces"))
  }
}
