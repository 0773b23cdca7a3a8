package graft.recommend

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-based filtering — the reference roadmap's last relational
  * recommendation shape (ROADMAP.md Phase 4.1, first bullet:
  * "recommends songs based on shared attributes like artist and
  * genre", slated for ML.NET inside the C# service): score candidate
  * tracks by how much their ATTRIBUTES overlap the user's liked
  * tracks, no interaction data about the candidate itself needed —
  * the model that can recommend a brand-new track the moment its
  * metadata lands, where collaborative filtering is cold.
  *
  * Model: the user profile is the pair of attribute histograms over
  * the liked set — per-artist like counts and per-genre like counts.
  * A candidate's score is
  *   `wArtist * profile(artist) + wGenre * profile(genre)`
  * — exact integers (counts × integer weights), so ranking is
  * bit-deterministic across engines and partial-aggregation orders
  * (the q15 lesson); ties break by track_id ascending.
  *
  * Scale posture (100 TB): everything after the like-set filter is
  * CATALOG-sized, not corpus-sized. The profile is `O(distinct
  * attributes of one user's likes)` — broadcast; scoring is the track
  * catalog left-joined against two broadcast histograms (no shuffle of
  * the catalog), the liked-set exclusion is a broadcast anti-join, and
  * the top-k is a `TakeOrderedAndProject`. The corpus-sized `likes`
  * table is touched exactly once, by a pushed-down single-user filter.
  */
object ContentBased {

  /** Per-attribute like-count profiles of one user: (artist histogram,
    * genre histogram) over the liked subset of `tracks`. */
  def profiles(tracks: DataFrame, userLikes: DataFrame)
      : (DataFrame, DataFrame) = {
    val liked = tracks.join(broadcast(userLikes), Seq("track_id"), "left_semi")
    (liked.groupBy("artist").agg(count(lit(1)).as("a_cnt")),
      liked.groupBy("genre").agg(count(lit(1)).as("g_cnt")))
  }

  /** Top-k content-based recommendations for `userId`.
    *
    * @param likes  (user_id, track_id) interaction set — only the
    *               single-user slice is read (pushed-down filter)
    * @param tracks (track_id, artist, genre) catalog dimension
    */
  def recommend(likes: DataFrame, tracks: DataFrame, userId: Long,
                k: Int = 5, wArtist: Long = 2L, wGenre: Long = 1L)
      : DataFrame = {
    // one user's like set: tiny, reused by the profile semi-join and
    // the exclusion anti-join — materialized once (the q15 pattern)
    val userLikes = likes.filter(col("user_id") === userId)
      .select("track_id").localCheckpoint()
    val (aProf, gProf) = profiles(tracks, userLikes)
    tracks
      .join(broadcast(aProf), Seq("artist"), "left")
      .join(broadcast(gProf), Seq("genre"), "left")
      .select(col("track_id"),
        (coalesce(col("a_cnt"), lit(0L)) * wArtist
          + coalesce(col("g_cnt"), lit(0L)) * wGenre).as("score"))
      .filter(col("score") > 0L) // zero attribute overlap = not a candidate
      .join(broadcast(userLikes), Seq("track_id"), "left_anti")
      .orderBy(col("score").desc, col("track_id").asc)
      .limit(k)
  }
}
