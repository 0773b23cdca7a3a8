package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity auditing and minimal-generalization for training-data
  * governance: find quasi-identifier groups small enough to re-identify
  * a person, and coarsen the quasi-identifiers just enough that every
  * released group reaches size ≥ k.
  *
  * Companion to the PII string audit (reference motivation: the
  * reference publishes per-user listening aggregates through its
  * analytics surface, music_analytics.json:47, with no small-group
  * suppression — the classic re-identification gap; SURVEY.md §6 flags
  * export governance as out of reference scope but required for a
  * training-data pipeline). The PII audit (q127) finds *direct*
  * identifiers inside text; this operator measures *indirect*
  * identification risk from attribute combinations.
  *
  * Scale posture: [[audit]] is one map-side-combinable hash aggregate.
  * [[generalizeToK]] runs one such aggregate per ladder level, but each
  * level sees ONLY the records that failed every finer level — on real
  * distributions the level-0 pass releases the bulk and the escalation
  * sets shrink geometrically, so total work is a small constant times
  * one scan. Nothing is collected to the driver; the per-level loop is
  * plan construction only (ladder length is 2–4).
  */
object Anonymity {

  /** Per-group k-anonymity audit over the given quasi-identifier
    * expressions: group count and an `at_risk` flag for groups of size
    * < k. Input expressions are (name, column) pairs so callers can
    * bucket continuous attributes (a raw unique value is its own
    * re-identifier).
    */
  def audit(df: DataFrame, quasi: Seq[(String, Column)], k: Int): DataFrame = {
    require(quasi.nonEmpty && k >= 2, "need quasi-identifiers and k >= 2")
    df.select(quasi.map { case (n, c) => c.cast("string").as(n) }: _*)
      .groupBy(quasi.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("at_risk", col("cnt") < k)
  }

  /** Distinct l-diversity audit — k-anonymity's sequel: a group can be
    * comfortably large and still disclose everyone's sensitive value if
    * that value is (near-)constant inside it (the homogeneity attack).
    * Per quasi-identifier group: size, number of DISTINCT sensitive
    * values, and `at_risk = n_sensitive < l`. A group passes k-anonymity
    * with cnt ≥ k yet flags here when all its members share one
    * sensitive value.
    *
    * Scale posture: one exact distinct aggregate — Spark plans it as the
    * standard two-phase expand/partial-agg (the (group, sensitive) key
    * shuffles once, then the group key); no collect_set materializes a
    * hot group's value list. At extreme cardinalities swap the exact
    * count for approx_count_distinct and the envelope-oracle pattern.
    */
  def lDiversity(df: DataFrame, quasi: Seq[(String, Column)],
                 sensitive: Column, l: Int): DataFrame = {
    require(quasi.nonEmpty && l >= 2, "need quasi-identifiers and l >= 2")
    df.select(quasi.map { case (n, c) => c.cast("string").as(n) } :+
        sensitive.cast("string").as("__sens"): _*)
      .groupBy(quasi.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("cnt"),
        count_distinct(col("__sens")).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** Minimal generalization to k-anonymity over a ladder of
    * progressively coarser quasi-identifier encodings.
    *
    * `ladder(i)` is level i's encoding of the SAME named columns
    * (level 0 finest); a record is released at the FIRST level where its
    * group reaches size ≥ k, and records that fail even the coarsest
    * level are emitted as one fully-suppressed group per coarsest-level
    * key with `suppressed = true` (release decision left to the caller
    * — k-anonymity's residual set must stay visible, not vanish).
    *
    * Output: one row per released group — the level's quasi-identifier
    * values (as strings), `level`, `cnt`, `suppressed`. Group counts at
    * level i are computed over the records still unreleased at level i,
    * exactly the semantics of iterative local-recoding generalization.
    */
  def generalizeToK(df: DataFrame, ladder: Seq[Seq[(String, Column)]],
                    k: Int): DataFrame = {
    require(ladder.size >= 2, "ladder needs at least a finest and a coarsest level")
    val names = ladder.head.map(_._1)
    require(ladder.forall(_.map(_._1) == names),
      s"every ladder level must encode the same columns $names")
    require(!names.exists(Set("cnt", "level", "suppressed")),
      "reserved output column name among quasi-identifiers")
    require(!df.columns.exists(_.startsWith("__qi_")),
      "reserved internal __qi_ column prefix in input")
    // internal key names: a QI output name may coincide with a source
    // column the NEXT level still needs, so levels key on __qi_* and the
    // output renames only at emission
    val qi = names.map(n => s"__qi_$n")
    val qiCols = qi.map(col)

    var remaining = df
    val released = Seq.newBuilder[DataFrame]
    for ((level, i) <- ladder.zipWithIndex) {
      val keyed = level.foldLeft(remaining) { case (d, (n, c)) =>
        d.withColumn(s"__qi_$n", c.cast("string"))
      }
      val counts = keyed.groupBy(qiCols: _*).agg(count(lit(1)).as("cnt"))
      val isLast = i == ladder.size - 1
      val ok = counts.filter(col("cnt") >= k)
        .withColumn("level", lit(i)).withColumn("suppressed", lit(false))
      released += (
        if (isLast)
          // coarsest level: under-k groups surface as suppressed rows
          ok.unionByName(counts.filter(col("cnt") < k)
            .withColumn("level", lit(i)).withColumn("suppressed", lit(true)))
        else ok)
      if (!isLast)
        remaining = keyed
          .join(counts.filter(col("cnt") < k).select(qiCols: _*), qi, "left_semi")
          .drop(qi: _*)
    }
    val out = released.result().reduce(_ unionByName _)
    names.zip(qi).foldLeft(out) { case (d, (n, q)) => d.withColumnRenamed(q, n) }
      .select((names :+ "level" :+ "cnt" :+ "suppressed").map(col): _*)
  }
}
