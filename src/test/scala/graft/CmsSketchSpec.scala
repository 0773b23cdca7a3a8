package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{cms_inner, cms_sketch, CmsSketch}

class CmsSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def sk(vals: Seq[Long], depth: Int = 5, width: Int = 512,
                 parts: Int = 5): Array[Byte] =
    vals.toDF("x").repartition(parts)
      .agg(cms_sketch(col("x"), depth, width)).head().getAs[Array[Byte]](0)

  private def inner(a: Array[Byte], b: Array[Byte]): Long = CmsSketch.inner(a, b)

  test("inner product is a hard overestimate of the true join size") {
    val gen = for {
      as <- Gen.listOfN(150, Gen.chooseNum(1L, 60L))
      bs <- Gen.listOfN(200, Gen.chooseNum(1L, 60L))
    } yield (as, bs)
    for (((as, bs), idx) <- samples(gen, n = 5).zipWithIndex) {
      val ca = as.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = bs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val truth = ca.keysIterator.map(k => ca(k) * cb.getOrElse(k, 0L)).sum
      val est = inner(sk(as, parts = 1 + idx), sk(bs))
      assert(est >= truth, s"est=$est truth=$truth")
      // ε bound with width 512: slack = (e/512)·|A|·|B|
      assert(est <= truth + (math.E / 512 * as.size * bs.size).toLong + 1,
        s"est=$est truth=$truth")
    }
  }

  test("wide sketch on small key space is exact; layout invariant") {
    val as = (1L to 40L) ++ (1L to 40L) // every key twice
    val bs = (20L to 60L).toSeq
    val truth = 21L * 2 // keys 20..40 shared, each 2×1
    assert(inner(sk(as, width = 4096, parts = 1), sk(bs, width = 4096)) == truth)
    assert(sk(as, parts = 1).sameElements(sk(as, parts = 9)))
  }

  test("merge across partitions is element-wise exact (counts sum to n)") {
    val vals = (1L to 300L).toSeq
    val arr = CmsSketch.fromBytes(sk(vals, depth = 3, width = 64, parts = 8))
    assert(arr(0) == 3 && arr(1) == 64)
    for (j <- 0 until 3)
      assert((0 until 64).map(w => arr(2 + j * 64 + w)).foldLeft(0L)(_ + _) == 300L,
        s"row $j must hold all counts")
  }

  test("mixed geometries fail loudly on inner product") {
    val e = intercept[Exception] {
      inner(sk(Seq(1L), width = 64), sk(Seq(1L), width = 128))
    }
    assert(messages(e).exists(m => m != null && m.contains("mixed geometries")))
  }

  test("nulls are skipped") {
    val got = Seq[Option[Long]](Some(1L), None).toDF("x")
      .agg(cms_sketch(col("x"), 2, 32)).head().getAs[Array[Byte]](0)
    val arr = CmsSketch.fromBytes(got)
    assert(arr.drop(2).sum == 2L, "one value x two depth rows")
  }

  test("cms_inner works as a column expression") {
    val a = sk(Seq(1L, 2L, 3L))
    val b = sk(Seq(2L, 3L, 4L))
    val got = Seq((a, b)).toDF("a", "b")
      .select(cms_inner(col("a"), col("b"))).head().getLong(0)
    assert(got >= 2L)
  }
}
