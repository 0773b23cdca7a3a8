package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.silver.Pipelines
import graft.text.Dedup

/** Hot-key stress for the pair/dedup family (VERDICT r6 #2): every capped
  * candidate generator is fed a distribution with ONE pathological key —
  * the 10^5-track playlist / 10^5-duplicate document shape that
  * generate_seed_data.py's zipf-ish playlist sizes (reference:
  * generate_seed_data.py:97–116) produce at scale — and must either
  * fail loudly BEFORE the hot group materializes (failOnOverflow paths)
  * or complete with work bounded by the cap (truncation paths) / by
  * map-side combine (keep-best). Plus one direct AQE skew-join
  * engagement assertion: the mechanism the non-capped joins rely on for
  * hot keys actually fires on this build's config surface.
  *
  * Wall-time here is bounded by construction, not asserted by clock:
  * each fail-loud case plants a hot group whose FULL materialization
  * would be quadratic (10^10 pairs), so the test finishing at all —
  * with the cap's named error — is the proof the cap fires in the
  * aggregation buffer rather than after the blow-up.
  */
class SkewStressSpec extends SparkTestBase {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** One playlist with `hotSize` distinct tracks + normal playlists. */
  private def hotBridge(hotSize: Int): DataFrame =
    spark.range(hotSize).select(lit(0L).as("playlist_id"), col("id").as("track_id"))
      .unionByName(spark.range(40).select(
        (col("id") % 8 + 1).as("playlist_id"), (col("id") * 131 % 37).as("track_id")))

  // ------------------------------------------------- q11 family: cooccurrence

  test("cooccurrence: 1e5-track hot playlist fails loudly in-buffer at the cap") {
    val e = intercept[Exception] {
      Pipelines.cooccurrence(hotBridge(100000), "playlist_id", "track_id",
        maxGroupSize = 10000, failOnOverflow = true).count()
    }
    val msg = messages(e).mkString("\n")
    assert(msg.contains("cooccurrence") && msg.contains("maxGroupSize=10000"), msg)
  }

  test("cooccurrence: truncation mode bounds the hot playlist to C(cap,2) pairs, smallest ids") {
    val out = Pipelines.cooccurrence(hotBridge(100000), "playlist_id", "track_id",
      maxGroupSize = 200, failOnOverflow = false)
    // hot group truncated to its 200 SMALLEST track ids -> every pair is
    // within [0, 200) and there are exactly C(200,2) of them with score 1
    val hot = out.filter(col("track_id_1") < 1000 || col("track_id_2") < 1000)
      .filter(col("track_id_1") >= 0)
    val pairs = hot.filter(col("track_id_1") < 200 && col("track_id_2") < 200)
    assert(pairs.count() >= 199L * 200L / 2 - 40L * 40L) // normal playlists overlap the id range
    assert(out.filter(col("track_id_1") >= 200 && col("track_id_1") < 100000 &&
      col("track_id_2") >= 200).filter(col("track_id_2") >= 1000).count() == 0,
      "a track id beyond the 200 smallest leaked into the hot group's pairs")
  }

  // ------------------------------------------------ q25 family: ngramJaccard

  /** >cap docs all sharing ONE stop-shingle, each otherwise unique. */
  private def hotShingleDocs(n: Int): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat(lit("u"), col("id"), lit(" v"), col("id"), lit(" hot shingle common"))
        .as("text"))

  test("ngramJaccard: a stop-shingle in >cap docs fails loudly, not a silent under-count") {
    val e = intercept[Exception] {
      Dedup.ngramJaccard(hotShingleDocs(10050), n = 3).count()
    }
    val msg = messages(e).mkString("\n")
    assert(msg.contains("maxGroupSize=10000"), msg)
  }

  test("ngramJaccard: maxShingleDf de-hot-keys explicitly and completes bounded") {
    val dup = Seq(
      (20001L, "dup dup body alpha beta gamma delta"),
      (20002L, "dup dup body alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccard(hotShingleDocs(10050).unionByName(dup),
      n = 3, maxShingleDf = Some(100)).collect()
    // the planted exact-duplicate pair survives (its shingles have df=2);
    // the 10050 hot-shingle docs share nothing once the stop-shingle is
    // dropped, so they produce no pairs at all
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((20001L, 20002L, 1.0)))
  }

  // ------------------------------------------------- q26 family: minhashLsh

  test("minhashLsh: a >cap flood of identical docs fails loudly at the band bucket") {
    val docs = spark.range(10050).select(col("id").as("doc_id"),
      lit("identical body text repeated across the whole flood").as("text"))
    val e = intercept[Exception] { Dedup.minhashLsh(docs).count() }
    val msg = messages(e).mkString("\n")
    assert(msg.contains("maxGroupSize=10000"), msg)
  }

  // -------------------------------------------- q118 family: exactKeepBest

  test("exactKeepBest: a 1e6-duplicate key completes map-side-combined with one survivor") {
    val docs = spark.range(1000000).select(
      lit("hot-key").as("k"), col("id").as("doc_id"),
      (col("id") % 1000).cast("double").as("q"))
      .unionByName(Seq(("cold-key", 5000000L, 1.0)).toDF("k", "doc_id", "q"))
    val out = Dedup.exactKeepBest(docs, "k", "q")
    // partial aggregation must be present: the hot group reduces to one
    // row per map task BEFORE the shuffle, which is what bounds this at
    // any duplication factor (a rank-window formulation would shuffle
    // all 1e6 copies into one partition instead). max_by's struct-typed
    // ordering buffer is not hash-aggregatable, so the planner picks
    // SortAggregate here — still partial+final, still map-side combined.
    val aggs = executedPlanNodes(out).count {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
      case _ => false
    }
    assert(aggs >= 2, s"expected partial+final aggregation, saw $aggs aggregate nodes")
    val hot = out.filter(col("content_key") === "hot-key").collect().head
    // best quality 999.0; ties broken by smallest doc_id -> 999
    assert(hot.getLong(1) == 999L && hot.getDouble(2) == 999.0 && hot.getLong(3) == 1000000L)
    assert(out.count() == 2)
  }

  // ---------------------------------------------- q151 family: blockDedup

  test("blockDedup: a 1e5-copy boilerplate block completes map-side-combined") {
    // one block content repeated 100k times across docs + fresh material;
    // the keep-first decision is min(struct) per block hash — O(1) partial
    // state per group regardless of duplication, so no cap is needed and
    // the hot group must combine BEFORE the shuffle
    val hot = spark.range(100000).select(col("id").as("doc_id"),
      lit("the same boilerplate line repeats").as("text"))
    val fresh = Seq((500000L, "aa bb cc dd ee"), (500001L, "ff gg hh ii jj"))
      .toDF("doc_id", "text")
    val out = Dedup.blockDedup(hot.unionByName(fresh), blockTokens = 5)
    val aggs = executedPlanNodes(out).count {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
      case _ => false
    }
    assert(aggs >= 2, s"expected partial+final aggregation, saw $aggs aggregate nodes")
    val kept = out.where(col("n_kept") > 0).collect()
    // doc 0 owns the boilerplate; the two fresh docs keep their content
    assert(kept.map(_.getLong(0)).sorted.toSeq == Seq(0L, 500000L, 500001L))
    assert(out.count() == 100002L)
  }

  // --------------------------------------------- q154 family: Misra–Gries

  test("misra_gries: a 1e6-copy hot item stays exact under constant memory") {
    import graft.functions.misra_gries
    val items = spark.range(1000000).select(lit(7L).as("x"))
      .unionByName(spark.range(3000).select((col("id") % 30 + 100).as("x")))
      .repartition(16)
    val got = items.agg(misra_gries(col("x"), 5).as("mg"))
      .select(explode(col("mg"))).as[(Long, Long)].collect().toMap
    // the hot item's estimate can only be depressed by n/(k+1) total
    assert(got.contains(7L), "guaranteed-heavy item missing")
    assert(got(7L) <= 1000000L && (1000000L - got(7L)) * 6 <= 1003000L)
    assert(got.size <= 5)
  }

  // ------------------------------------- q128 family: crossMinhashNearDup

  test("crossMinhashNearDup: a >maxBucket identical-doc batch fails loudly") {
    val corpus = Seq((1L, "some corpus document body here")).toDF("doc_id", "text")
    val batch = spark.range(10050).select((col("id") + 100000).as("doc_id"),
      lit("identical batch text repeated across the whole flood").as("text"))
    val e = intercept[Exception] {
      Dedup.crossMinhashNearDup(corpus, batch).count()
    }
    val msg = messages(e).mkString("\n")
    assert(msg.contains("crossMinhashNearDup") && msg.contains("maxGroupSize=10000"), msg)
  }

  // ---------------------------------------------- AQE skew-join engagement

  test("AQE splits a skewed sort-merge join partition (skew=true in the final plan)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "262144") {
      // one key carries ~1.2M of 1.4M rows -> its shuffle partition dwarfs
      // the median and must be split by OptimizeSkewedJoin
      val left = spark.range(1400000).select(
        when(col("id") < 1200000, 0L).otherwise(pmod(col("id"), lit(997)) + 1).as("k"),
        col("id").as("payload"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("r"))
      val joined = left.join(right, "k")
      val skewed = executedPlanNodes(joined).exists {
        case smj: SortMergeJoinExec => smj.isSkewJoin
        case _ => false
      }
      assert(skewed, "expected OptimizeSkewedJoin to mark the SMJ skew=true; " +
        "the hot partition was not split")
    }
  }
}
// temp debug appended — will remove
