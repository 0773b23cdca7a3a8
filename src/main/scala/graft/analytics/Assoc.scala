package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Association and sequence analytics over the event stream: pairwise
  * lift, per-user diversity, and first-order transition structure — the
  * statistical layer above [[Behavior]]'s funnels (reference:
  * pyspark_jobs/analyze_listening_data.py aggregates per-user activity;
  * these are the standard market-basket / sequence formulations of the
  * same data).
  *
  * Determinism: every score here is exact-integer counts composed with a
  * SINGLE double division (division is correctly rounded under
  * IEEE-754) — no transcendentals, no float accumulation order — so
  * results are bit-identical at any parallelism and across engines. PMI
  * = ln(lift) is deliberately left un-logged: ln is not
  * correctly-rounded and lift is a monotone transform of it.
  */
object Assoc {

  /** Pairwise lift between item values co-occurring in the same group
    * (market-basket association): for item pair (a, b), a < b,
    * {{{ lift = (n_ab · n_groups) / (n_a · n_b) }}}
    * over DISTINCT group membership. lift > 1 ⇔ positive association
    * (PMI > 0). Output: (item_1, item_2, n_ab, lift), ordered by
    * (item_1, item_2).
    *
    * Scale posture: rides [[graft.silver.Pipelines.cooccurrence]]'s
    * grouped-generator plan (one shuffle on the group key, fail-loud
    * group cap), plus an item-marginal aggregation joined on each end —
    * marginals are |vocabulary| rows, AQE-broadcast while small.
    */
  def liftPairs(df: DataFrame, groupCol: String, itemCol: String,
                maxGroupSize: Int = 10000): DataFrame = {
    val pairs = graft.silver.Pipelines
      .cooccurrence(df, groupCol, itemCol, maxGroupSize, failOnOverflow = true)
      .select(col("track_id_1").as("item_1"), col("track_id_2").as("item_2"),
        col("score").as("n_ab"))
    val marginals = df.select(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .distinct()
    val perItem = marginals.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val total = marginals.agg(count_distinct(col("__g")).as("__tot"))
    pairs
      .join(perItem.select(col("__i").as("item_1"), col("__n").as("__n1")), Seq("item_1"))
      .join(perItem.select(col("__i").as("item_2"), col("__n").as("__n2")), Seq("item_2"))
      .crossJoin(broadcast(total))
      .withColumn("lift",
        (col("n_ab") * col("__tot")).cast("double") / (col("__n1") * col("__n2")))
      .select(col("item_1"), col("item_2"), col("n_ab"), col("lift"))
      .orderBy(col("item_1"), col("item_2"))
  }

  /** Per-group Gini–Simpson diversity over item occurrences:
    * {{{ simpson = 1 − Σ c_i² / (Σ c_i)² }}}
    * (0 = single item, → 1 = evenly spread; the polynomial stand-in for
    * Shannon entropy — same extremes, no transcendental). Output:
    * (group, n_events, n_items, simpson), ordered by group. Two keyed
    * aggregations, exact integers until the one final division.
    */
  def simpsonDiversity(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col("__g"))
      .agg(sum(col("__c")).as("n_events"),
        count(lit(1)).as("n_items"),
        sum(col("__c") * col("__c")).as("__sq"))
      .withColumn("simpson",
        lit(1.0) - col("__sq").cast("double") / (col("n_events") * col("n_events")))
      .select(col("__g").as(groupCol), col("n_events"), col("n_items"), col("simpson"))
      .orderBy(col(groupCol))
  }

  /** First-order transition matrix over per-group ordered sequences:
    * count of (state → next state) steps, with the conditional
    * probability p = n / Σ_dst n per source state. `tieCol` makes the
    * per-group order total (same-timestamp events would otherwise make
    * `lead` nondeterministic). Output: (src, dst, n, p), ordered by
    * (src, dst).
    *
    * Scale posture: ONE shuffle on the group key feeds the lead()
    * window (per-group state, no global sort), then a keyed count;
    * the per-source normalizer joins back on src — state-vocabulary
    * rows, AQE-broadcast while small.
    */
  def transitions(df: DataFrame, groupCol: String, stateCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(tsCol), col(tieCol))
    val steps = df
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("src"), col("__next").as("dst"))
      .agg(count(lit(1)).as("n"))
    val perSrc = steps.groupBy(col("src")).agg(sum(col("n")).as("__srcn"))
    steps.join(perSrc, Seq("src"))
      .withColumn("p", col("n").cast("double") / col("__srcn"))
      .select(col("src"), col("dst"), col("n"), col("p"))
      .orderBy(col("src"), col("dst"))
  }
}
