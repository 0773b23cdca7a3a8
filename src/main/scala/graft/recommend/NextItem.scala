package graft.recommend

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SEQUENCE-AWARE next-item recommendation — the reference roadmap's
  * "treat a user's listening history as a sequence ... predict the next
  * song" (ROADMAP.md:90, Phase 4 "Sequence-Aware Recommendations"),
  * re-expressed as the exact count-based form that underlies the neural
  * version: an ORDER-2 MARKOV transition model with additive (Laplace)
  * smoothing and order-1 backoff, scored in exact integers so ranking
  * is engine-independent and oracle-replayable.
  *
  * Model. Over every user's event sequence (ordered by `ts`, tie-broken
  * by `eventId` — a total order), count
  *   c3(a,b,x) = trigrams, c2pre(a,b) = trigram prefixes,
  *   c2(b,x)   = bigrams,  c1pre(b)  = bigram prefixes,
  * and with vocabulary size V score each candidate next item x for a
  * user whose last two items are (a, b):
  *
  *   P2(x|a,b) = (c3(a,b,x)+1) / (c2pre(a,b)+V)     smoothed order-2
  *   P1(x|b)   = (c2(b,x)+1)   / (c1pre(b)+V)       smoothed backoff
  *   score     = P2 + P1
  *
  * Ranking needs only the common-denominator NUMERATOR
  *   N(x) = (c3+1)·(c1pre+V) + (c2+1)·(c2pre+V)
  * — an exact BIGINT per (context, candidate) (both factors are bounded
  * by the transition count; at trillion-event scale swap the products
  * to DECIMAL(38,0), a type change, not a plan change). Ties break on
  * item id ascending, the repo-wide T4 convention.
  *
  * Plan shape at 100 TB: the sequence windows partition by user (no
  * global sort); the count tables are map-side-combined aggregates; the
  * per-user context is one row; candidates come from a CROSS JOIN with
  * the broadcast item vocabulary (catalog-sized, not corpus-sized) and
  * the count lookups are broadcast-able dimension joins keyed on the
  * context — no corpus rescan per user, no driver loop.
  */
object NextItem {

  /** Ranked next-item candidates per user: (user, prev2, prev1, rank,
    * item, score_num, score) — `score_num` the exact integer rank key,
    * `score` the single-division readable blend.
    *
    * `restrictCandidates = true` is the marketplace-vocabulary scale
    * path (VERDICT r10): instead of crossing every context with the
    * FULL broadcast vocabulary (U × V), candidates are only the items
    * with a nonzero order-2 or backoff count for the context, plus the
    * deterministic smoothed tail — the k smallest-id unseen items.
    * EXACTLY equivalent output: any observed candidate (c3>0 or c2>0)
    * outscores every unseen one (both smoothed terms are monotone in
    * the counts), and unseen candidates all tie at the context's
    * smoothed floor, where ranking falls to item id ascending — so the
    * k smallest unseen ids are precisely the tail the full cross join
    * would rank. Candidate space drops from U × V to
    * U × (observed transitions + k). */
  def nextItems(events: DataFrame, userCol: String, itemCol: String,
                tsCol: String, tieCol: String, k: Int = 3,
                restrictCandidates: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col("u")).orderBy(col("__ts"), col("__tie"))
    val seq = events.select(col(userCol).as("u"), col(itemCol).as("i0"),
        col(tsCol).as("__ts"), col(tieCol).as("__tie"))
      .withColumn("i1", lead(col("i0"), 1).over(w))
      .withColumn("i2", lead(col("i0"), 2).over(w))
      .withColumn("__rn_desc",
        row_number().over(Window.partitionBy(col("u"))
          .orderBy(col("__ts").desc, col("__tie").desc)))

    // count tables (exact integers, map-side combined)
    val tri = seq.filter(col("i2").isNotNull)
      .groupBy(col("i0").as("a"), col("i1").as("b"), col("i2").as("x"))
      .agg(count(lit(1)).as("c3"))
    val triPre = seq.filter(col("i2").isNotNull)
      .groupBy(col("i0").as("a"), col("i1").as("b"))
      .agg(count(lit(1)).as("c2pre"))
    val bi = seq.filter(col("i1").isNotNull)
      .groupBy(col("i0").as("b"), col("i1").as("x"))
      .agg(count(lit(1)).as("c2"))
    val biPre = seq.filter(col("i1").isNotNull)
      .groupBy(col("i0").as("b"))
      .agg(count(lit(1)).as("c1pre"))
    val vocab = events.select(col(itemCol).as("x")).filter(col("x").isNotNull)
      .distinct()
    val vCount = vocab.count()

    // one context row per user with >= 2 events: (prev2, prev1)
    val last = seq.filter(col("__rn_desc") === 1)
      .select(col("u"), col("i0").as("prev1"))
    val second = seq.filter(col("__rn_desc") === 2)
      .select(col("u"), col("i0").as("prev2"))
    val ctx = second.join(last, "u")

    // candidate scoring: broadcast vocabulary + broadcast-able count
    // lookups keyed on the (small) context set.
    // SCALE NOTE (VERDICT r10): the candidate space is U x V — every
    // user's context crossed with the FULL broadcast vocabulary. That
    // is the right shape for a music CATALOG (vocab fits one
    // broadcast; Laplace smoothing means unseen items legitimately
    // score > 0, so no candidate can be dropped without changing the
    // ranking). At marketplace-scale vocabularies (V in the hundreds
    // of millions) the smoothed tail ties anyway: restrict candidates
    // to items with a nonzero backoff count for the context (join on
    // `bi`/`tri` instead of crossJoin(vocab)) and append the
    // deterministic smoothed tail only when fewer than k survive.
    val triC = tri.withColumnRenamed("a", "prev2")
      .withColumnRenamed("b", "prev1")
    val biC = bi.withColumnRenamed("b", "prev1")
    val triPreC = triPre.withColumnRenamed("a", "prev2")
      .withColumnRenamed("b", "prev1")
    val biPreC = biPre.withColumnRenamed("b", "prev1")
    def withScores(df: DataFrame): DataFrame = df
      .join(broadcast(triPreC), Seq("prev2", "prev1"), "left")
      .join(broadcast(biPreC), Seq("prev1"), "left")
      .withColumn("score_num",
        (coalesce(col("c3"), lit(0L)) + 1L) *
          (coalesce(col("c1pre"), lit(0L)) + vCount) +
        (coalesce(col("c2"), lit(0L)) + 1L) *
          (coalesce(col("c2pre"), lit(0L)) + vCount))
      .withColumn("score_den",
        (coalesce(col("c2pre"), lit(0L)) + vCount) *
          (coalesce(col("c1pre"), lit(0L)) + vCount))

    val scored = if (!restrictCandidates)
      withScores(ctx
        .crossJoin(broadcast(vocab))
        .join(triC, Seq("prev2", "prev1", "x"), "left")
        .join(biC, Seq("prev1", "x"), "left"))
    else {
      // observed candidates: one shuffle-free pass over each count
      // table probed by the (small, broadcast) context set
      val ctxB = broadcast(ctx)
      val obs3 = ctxB.join(triC, Seq("prev2", "prev1"))
        .select(col("u"), col("prev2"), col("prev1"), col("x"), col("c3"))
      val obs2 = ctxB.join(biC, Seq("prev1"))
        .select(col("u"), col("prev2"), col("prev1"), col("x"), col("c2"))
      // prev2/prev1 are functionally dependent on u (one context/user),
      // so the four-key outer join cannot mis-pair. Materialized once:
      // three consumers (tail bound, anti-join, the scored union) —
      // recomputing the probe joins per consumer erased the restricted
      // plan's win at 10x data (measured)
      val observed = obs3
        .join(obs2, Seq("u", "prev2", "prev1", "x"), "full_outer")
        .localCheckpoint()
      // the smoothed tail: the k smallest-id items the context never
      // saw — all unseen items tie at the context's floor, ranked by
      // id, so only these can enter the top k. The slice is bounded by
      // k + the largest per-context observed set.
      val maxObs = observed.groupBy(col("u"))
        .agg(count(lit(1)).as("nobs"))
        .agg(coalesce(max(col("nobs")), lit(0L))).head().getLong(0)
      require(maxObs + k <= 10000000L,
        s"restricted next-item tail slice k+$maxObs exceeds the 1e7 " +
          "in-memory bound — the context with the most transitions is " +
          "catalog-scale; use restrictCandidates=false")
      val smallVocab = vocab.orderBy(col("x")).limit((k + maxObs).toInt)
      val tail = ctxB.crossJoin(broadcast(smallVocab))
        .join(observed.select(col("u"), col("x")), Seq("u", "x"),
          "left_anti")
        .withColumn("c3", lit(null).cast("long"))
        .withColumn("c2", lit(null).cast("long"))
      withScores(observed.unionByName(tail
        .select(col("u"), col("prev2"), col("prev1"), col("x"),
          col("c3"), col("c2"))))
    }

    val rank = Window.partitionBy(col("u"))
      .orderBy(col("score_num").desc, col("x"))
    scored
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
      // one division of the same two exact integers: bit-identical
      // across engines (selection, not accumulation)
      .select(col("u").as(userCol), col("prev2"), col("prev1"),
        col("rank").cast("long").as("rank"), col("x").as("next_item"),
        col("score_num"),
        (col("score_num").cast("double") / col("score_den")).as("score"))
  }
}
