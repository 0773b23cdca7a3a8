package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's three silver analytics pipelines, re-derived as pure
  * `DataFrame => DataFrame` functions over the test star schema.
  *
  * Domain mapping (applied consistently across the whole library):
  *   - user      = customer  (`c_custkey` / `o_custkey`)
  *   - track     = part      (`p_partkey` / `l_partkey`)
  *   - playlist  = order     (`o_orderkey` / `l_orderkey`)
  *   - listen    = lineitem  (event time = `l_shipdate`)
  *   - like      = distinct (user, track) purchase pair
  *
  * Reference citations:
  *   - weekly trending: pyspark_jobs/process_silver_trending_tracks.py:15–36
  *   - playlist co-occurrence: pyspark_jobs/process_song_similarity.py:22–48
  *   - collaborative filtering: pyspark_jobs/process_collaborative_filtering.py:25–43
  *   - likes analysis (left join + fill 0): pyspark_jobs/analyze_listening_data.py:12–34
  *
  * All pipelines take already-loaded DataFrames so unit tests can inject
  * tiny in-memory frames (SURVEY.md §7.1 item 3).
  */
object Pipelines {

  /** Deterministic time anchor: the reference filters on
    * `current_date() - 7` (process_silver_trending_tracks.py:26–27), which
    * is non-reproducible on static data (SURVEY.md §7.5 item 2). We anchor
    * on `max(timeCol)` instead, attached via a broadcast single-row cross
    * join — the scalar aggregate is one extra (cheap, column-pruned) scan
    * and the join adds no shuffle at any scale.
    */
  def withMaxAnchor(df: DataFrame, timeCol: String): DataFrame =
    df.crossJoin(broadcast(df.agg(max(col(timeCol)).as("__anchor"))))

  def recentWindow(df: DataFrame, timeCol: String, days: Int): DataFrame =
    withMaxAnchor(df, timeCol)
      .filter(col(timeCol) >= col("__anchor") - expr(s"INTERVAL $days DAYS"))
      .drop("__anchor")

  /** Weekly-trending: recent listens → count per track → enrich with the
    * track dimension → deterministic rank order.
    * Canonical output schema per SURVEY.md §1.4 resolution 1:
    * (track_id, track_name, play_count).
    *
    * Scale: the groupBy pre-aggregates to |tracks| rows before the dim
    * join; the dim is explicitly broadcast so the fact table never
    * shuffles on track_id.
    */
  def trending(listens: DataFrame, tracks: DataFrame, days: Int): DataFrame =
    recentWindow(listens, "l_shipdate", days)
      .groupBy(col("l_partkey").as("track_id"))
      .agg(count(lit(1)).as("play_count"))
      .join(broadcast(tracks.select(col("p_partkey").as("track_id"),
        col("p_name").as("track_name"))), Seq("track_id"))
      .orderBy(col("play_count").desc, col("track_id").asc)

  /** Distinct like-pairs (user_id, track_id) — the `.distinct()` BEFORE the
    * self-join is the reference's key manual optimization
    * (process_collaborative_filtering.py:25): it cuts the quadratic pair
    * explosion at its source. */
  def likes(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_partkey").as("track_id"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey").as("user_id")), Seq("l_orderkey"))
      .select(col("user_id"), col("track_id"))
      .distinct()

  /** (playlist_id, track_id) bridge, deduplicated. */
  def playlistTracks(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("playlist_id"),
      col("l_partkey").as("track_id")).distinct()

  /** Canonical unordered-pair co-occurrence: self equi-join on the grouping
    * key with the `t1 < t2` residual INSIDE the join condition
    * (process_song_similarity.py:30–34) — halves the pair space and
    * drops self-pairs before they materialize.
    *
    * Scale: the equi key carries the shuffle (hash/SMJ); the theta is a
    * residual filter. Pair fan-out is quadratic per group — callers must
    * dedup their input first (see `likes`) and can cap group size upstream;
    * at 100 TB the top skewed keys should be salted or capped (AQE skew
    * join handles moderate skew automatically).
    */
  def cooccurrence(pairs: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val a = pairs.select(col(groupCol).as("g"), col(itemCol).as("track_id_1"))
    val b = pairs.select(col(groupCol).as("g"), col(itemCol).as("track_id_2"))
    a.join(b, a("g") === b("g") && col("track_id_1") < col("track_id_2"))
      .groupBy(col("track_id_1"), col("track_id_2"))
      .agg(count(lit(1)).as("score"))
  }

  /** Playlist-based song similarity (process_song_similarity.py). */
  def playlistSimilarity(lineitem: DataFrame): DataFrame =
    cooccurrence(playlistTracks(lineitem), "playlist_id", "track_id")

  /** Collaborative filtering pairs (process_collaborative_filtering.py). */
  def collaborativeFiltering(likesDf: DataFrame): DataFrame =
    cooccurrence(likesDf, "user_id", "track_id")

  /** Symmetrize canonical `t1 < t2` pairs into both directions — the C#
    * scorer registers both orders before probing
    * (RecommendationService.cs:225–236). Input MUST be canonical
    * (`t1 < t2`) or pairs double-count; `cooccurrence` guarantees it.
    */
  def symmetrize(sim: DataFrame): DataFrame =
    sim.unionByName(sim.select(
      col("track_id_2").as("track_id_1"),
      col("track_id_1").as("track_id_2"),
      col("score")))

  /** Likes-analysis (analyze_listening_data.py): per-user total likes vs
    * likes that land on tracks known to the similarity model; absent →
    * left join null → fill 0.
    */
  def likesAnalysis(likesDf: DataFrame, sim: DataFrame): DataFrame = {
    val modelTracks = sim.select(col("track_id_1").as("track_id"))
      .union(sim.select(col("track_id_2").as("track_id"))).distinct()
    val total = likesDf.groupBy("user_id")
      .agg(count(lit(1)).as("total_likes_count"))
    val relevant = likesDf.join(modelTracks, Seq("track_id"), "left_semi")
      .groupBy("user_id").agg(count(lit(1)).as("relevant_likes_count"))
    total.join(relevant, Seq("user_id"), "left")
      .na.fill(0L, Seq("relevant_likes_count"))
  }

  /** Social graph edges derived deterministically from the customer dim:
    * users follow the (up to 4) nearest customer keys within their nation.
    * Stands in for the reference's generated follow edges, which are
    * materialized in both directions (generate_seed_data.py:139–145) — the
    * `!=` + abs-distance predicate is naturally symmetric.
    */
  def follows(customer: DataFrame): DataFrame = {
    val a = customer.select(col("c_custkey").as("user_id_a"),
      col("c_nationkey").as("nk"))
    val b = customer.select(col("c_custkey").as("user_id_b"),
      col("c_nationkey").as("nk"))
    a.join(b, Seq("nk"))
      .filter(col("user_id_a") =!= col("user_id_b") &&
        abs(col("user_id_a") - col("user_id_b")) <= 2)
      .select(col("user_id_a"), col("user_id_b"))
  }

  /** Normalized trending (RecommendationService.cs:86–93): each track's
    * play_count divided by the global max. The global max is attached via
    * a window over an empty partitioning, which Spark plans as a
    * single-partition exchange over the ALREADY-aggregated (tiny) trending
    * table — not over the fact table.
    */
  def normalizedTrending(trendingDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    trendingDf.withColumn("norm_score",
      col("play_count") / max(col("play_count")).over(Window.partitionBy()))
  }
}
