package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.char_entropy

class CharEntropySpec extends SparkTestBase {
  import spark.implicits._

  private def ent(s: String): Long =
    Seq(s).toDF("t").select(char_entropy(col("t"))).head().getLong(0)

  /** Reference implementation straight off the definition. */
  private def naive(s: String): Long = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) return 0L
    val n = cps.length.toDouble
    val h = -cps.groupBy(identity).values.map { g =>
      val p = g.length / n
      p * (math.log(p) / math.log(2))
    }.sum
    math.floor(h * 1e6 + 0.5).toLong
  }

  test("closed-form anchors") {
    assert(ent("") == 0L)
    assert(ent("aaaa") == 0L)
    assert(ent("ab") == 1000000L) // 1 bit
    assert(ent("abcd") == 2000000L) // 2 bits
    assert(ent("aab") == 918296L) // H(1/3) = 0.918296 bits
  }

  test("null propagates") {
    val got = Seq[Option[String]](None).toDF("t")
      .select(char_entropy(col("t"))).head()
    assert(got.isNullAt(0))
  }

  test("supplementary codepoints count once, not as surrogate pairs") {
    // U+1F600 twice + 'a' twice = two symbols, uniform → 1 bit
    assert(ent("😀a😀a") == 1000000L)
  }

  test("matches the naive definition and is permutation-invariant") {
    val gen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'z', '0', ' ', 'é'))
      .map(_.mkString)
    for (s <- samples(gen, n = 10, size = 40)) {
      assert(ent(s) == naive(s), s"s=$s")
      assert(ent(s) == ent(new String(s.toCharArray.sorted)), s"perm s=$s")
    }
  }

  test("bounds: 0 ≤ H ≤ log2(n) over random strings") {
    val gen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    for (s <- samples(gen, n = 10, size = 30)) {
      val h = ent(s)
      val lim = math.floor(math.log(s.length.toDouble) / math.log(2) * 1e6 + 0.5).toLong
      assert(h >= 0L && h <= lim, s"s=$s h=$h lim=$lim")
    }
  }
}
