package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("semiJoin equals the plain semi-join exactly (false positives removed)") {
    val fact = (1L to 2000L).map(i => (i, i % 97)).toDF("id", "key")
    val dim = Seq(3L, 7L, 11L, 96L).toDF("dkey")
    val got = BloomJoin.semiJoin(fact, "key", dim, "dkey", numBits = 256, numHashes = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = fact.join(dim.select(col("dkey").as("key")), Seq("key"), "left_semi")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("the bloom pre-filter has no false negatives and real selectivity") {
    val dim = (0L until 500L).map(k => k * 13).toDF("dkey")
    val filter = BloomJoin.build(dim, "dkey", numBits = 1 << 14, numHashes = 5)
    val probes = (0L until 5000L).toDF("key")
    val kept = probes
      .filter(BloomJoin.mightContain(col("key"), filter, 1 << 14, 5))
      .collect().map(_.getLong(0)).toSet
    val truth = (0L until 500L).map(_ * 13).filter(_ < 5000L).toSet
    assert(truth.subsetOf(kept), "bloom dropped a true key — impossible for a correct bloom")
    // with 14 bits / 500 keys the filter must reject the vast majority of
    // the 4615 non-members (fpp ~ 1e-3); 10% slack for hash accidents
    assert(kept.size <= truth.size + 462, s"filter too dense: ${kept.size} kept")
  }

  test("mightContain is an empty-dim constant false, so the semi-join is empty") {
    val fact = (1L to 50L).toDF("key")
    val dim = Seq.empty[Long].toDF("dkey")
    assert(BloomJoin.semiJoin(fact, "key", dim, "dkey").count() == 0L)
  }
}
