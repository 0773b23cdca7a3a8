package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("semiJoin equals the plain semi-join exactly (false positives removed)") {
    val fact = (1L to 2000L).map(i => (i, i % 97)).toDF("id", "key")
    val dim = Seq(3L, 7L, 11L, 96L).toDF("dkey")
    val got = BloomJoin.semiJoin(fact, "key", dim, "dkey", expectedItems = 8, numBits = 256)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = fact.join(dim.select(col("dkey").as("key")), Seq("key"), "left_semi")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("the bloom pre-filter has no false negatives and real selectivity") {
    val dim = (0L until 500L).map(k => k * 13).toDF("dkey")
    val bloom = BloomJoin.bloomOf(dim, "dkey", expectedItems = 500, numBits = 1L << 14)
    val probes = (0L until 5000L).toDF("key")
    val kept = probes
      .filter(BloomJoin.mightContain(bloom, col("key")))
      .collect().map(_.getLong(0)).toSet
    val truth = (0L until 500L).map(_ * 13).filter(_ < 5000L).toSet
    assert(truth.subsetOf(kept), "bloom dropped a true key — impossible for a correct bloom")
    // with 14 bits / 500 keys the filter must reject the vast majority of
    // the 4615 non-members (fpp ~ 1e-3); 10% slack for hash accidents
    assert(kept.size <= truth.size + 462, s"filter too dense: ${kept.size} kept")
  }

  test("mightContain is null on an empty dim, so the semi-join is empty") {
    val fact = (1L to 50L).toDF("key")
    val dim = Seq.empty[Long].toDF("dkey")
    assert(BloomJoin.semiJoin(fact, "key", dim, "dkey").count() == 0L)
  }

  test("semiJoin == plain semi-join on randomized key sets and filter sizes") {
    val rnd = new scala.util.Random(0x5eed5L)
    for (trial <- 1 to 4) {
      val factKeys = Seq.fill(800)(rnd.nextLong() % 2000)
      val dimKeys = Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong() % 2000)
      val fact = factKeys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
      val dim = dimKeys.toDF("dkey")
      val bits = 1L << (10 + rnd.nextInt(8)) // 2^10 .. 2^17: dense and sparse filters
      val got = BloomJoin.semiJoin(fact, "key", dim, "dkey",
          expectedItems = dimKeys.size.toLong.max(1), numBits = bits)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = factKeys.zipWithIndex.collect {
        case (k, i) if dimKeys.contains(k) => i.toLong
      }.toSet
      assert(got == want, s"trial $trial (numBits=$bits) diverged from the exact semi-join")
    }
  }

  test("a 2^26-bit filter stays out of the plan: subquery-backed, no literal bloat") {
    // 2^26 bits = 8 MB of sketch. Embedded as a plan literal that is a
    // multi-MB constant copied into every plan string and task; as a
    // scalar-subquery result it costs the plan NOTHING beyond the
    // subquery node. Assert both correctness and plan size.
    val fact = (1L to 10000L).map(i => (i, i % 1009)).toDF("id", "key")
    val dim = (0L until 400L).map(_ * 2 + 1).toDF("dkey")
    val joined = BloomJoin.semiJoin(fact, "key", dim, "dkey",
      expectedItems = 1L << 22, numBits = 1L << 26)
    val got = joined.select("id").collect().map(_.getLong(0)).toSet
    val want = fact.join(dim.select(col("dkey").as("key")), Seq("key"), "left_semi")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want)
    val planChars = joined.queryExecution.executedPlan.toString.length
    // 8 MB of bitset rendered into the plan would be >8e6 chars; the
    // subquery form stays in the tens of KB regardless of numBits.
    assert(planChars < 100000, s"plan string unexpectedly large: $planChars chars")
  }
}
