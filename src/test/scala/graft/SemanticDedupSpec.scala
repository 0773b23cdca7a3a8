package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.vector.Similarity

class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def df(vs: Seq[(Long, Seq[Double])]): DataFrame =
    vs.toDF("vec_id", "embedding").repartition(4)

  // two tight bundles on orthogonal axes plus a lone far point: the
  // bundles are within-cell duplicates, the lone point a singleton
  private val data = Seq(
    1L -> Seq(1.0, 0.0, 0.0),
    2L -> Seq(0.999, 0.01, 0.0), // dup of 1
    3L -> Seq(0.998, -0.01, 0.0), // dup of 1 and 2
    10L -> Seq(0.0, 1.0, 0.0),
    11L -> Seq(0.01, 0.999, 0.0), // dup of 10
    20L -> Seq(0.0, 0.0, 1.0)) // singleton

  test("duplicate bundles collapse to one kept representative each") {
    val got = Similarity.semanticDedup(df(data), nCentroids = 3,
      iterations = 1, threshold = 0.99)
      .orderBy("vec_id").collect()
    assert(got.length == 6)
    val byGroup = got.groupBy(_.getLong(3))
    // exactly one keeper per group
    byGroup.foreach { case (gid, rows) =>
      assert(rows.count(_.getBoolean(4)) == 1, s"group $gid")
    }
    // bundle {1,2,3} is one group labeled by its min id
    val g1 = got.filter(r => Set(1L, 2L, 3L).contains(r.getLong(0)))
    assert(g1.map(_.getLong(3)).distinct.toSeq == Seq(1L))
    val g10 = got.filter(r => Set(10L, 11L).contains(r.getLong(0)))
    assert(g10.map(_.getLong(3)).distinct.toSeq == Seq(10L))
    // the singleton keeps itself
    val lone = got.find(_.getLong(0) == 20L).get
    assert(lone.getLong(3) == 20L && lone.getBoolean(4))
    // keep rule: the kept member minimizes (ccos_micro, vec_id)
    byGroup.foreach { case (gid, rows) =>
      val rep = rows.minBy(r => (r.getLong(2), r.getLong(0)))
      assert(rep.getBoolean(4), s"group $gid keeper not the ccos argmin")
    }
  }

  test("threshold above every pair cosine yields all-singleton keeps") {
    val got = Similarity.semanticDedup(df(data), nCentroids = 3,
      iterations = 1, threshold = 0.999999)
      .collect()
    assert(got.forall(_.getBoolean(4)))
    assert(got.forall(r => r.getLong(0) == r.getLong(3)))
  }

  test("maxCellSize guard fails loudly on a degenerate clustering") {
    val e = intercept[Exception] {
      Similarity.semanticDedup(df(data), nCentroids = 1,
        iterations = 0, threshold = 0.99, maxCellSize = 3).collect()
    }
    assert(messages(e).exists(m => m != null && m.contains("maxCellSize")))
  }

  test("result is invariant to partition layout") {
    val a = rows(Similarity.semanticDedup(
      df(data).repartition(1), nCentroids = 3, iterations = 1, threshold = 0.99))
    val b = rows(Similarity.semanticDedup(
      df(data).repartition(7), nCentroids = 3, iterations = 1, threshold = 0.99))
    assert(a == b)
  }
}
