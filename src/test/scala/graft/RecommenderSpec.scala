package graft

import org.apache.spark.sql.functions._
import graft.recommend.Recommender

/** Known-answer tests for the hybrid scorer, mirroring the reference's
  * endpoint tests (RecommendationEndpointTests.cs:16–37: user 101 likes
  * 101→[102, 105] via the alsoLiked fixture; unknown user → empty).
  */
class RecommenderSpec extends SparkTestBase {
  import spark.implicits._

  private def emptySim = Seq.empty[(Long, Long, Long)]
    .toDF("track_id_1", "track_id_2", "score")
  private def emptyFollows = Seq.empty[(Long, Long)].toDF("user_id_a", "user_id_b")
  private def emptyTrending = Seq.empty[(Long, Long)].toDF("track_id", "play_count")

  test("similarity candidates recommend neighbors of liked tracks, weighted") {
    val playlistSim = Seq((101L, 102L, 3L), (101L, 105L, 1L), (200L, 201L, 9L))
      .toDF("track_id_1", "track_id_2", "score")
    val likes = Seq((1L, 101L)).toDF("user_id", "track_id")
    val out = Recommender.recommend(playlistSim, emptySim, emptyTrending,
      emptyFollows, likes, userId = 1L, k = 5).collect().toSeq.map(_.toSeq)
    // neighbors of 101: 102 (3·0.6), 105 (1·0.6); 101 anti-joined out.
    // Expectations computed with the same IEEE ops the engine performs.
    assert(out == Seq(Seq(102L, 3.0 * 0.6), Seq(105L, 1.0 * 0.6)))
  }

  test("already-liked tracks are excluded (anti-join) even when high-scoring") {
    val playlistSim = Seq((101L, 102L, 50L)).toDF("track_id_1", "track_id_2", "score")
    val likes = Seq((1L, 101L), (1L, 102L)).toDF("user_id", "track_id")
    val out = Recommender.recommend(playlistSim, emptySim, emptyTrending,
      emptyFollows, likes, userId = 1L, k = 5).collect()
    assert(out.isEmpty)
  }

  test("social + trending compose with CF weights into one score") {
    val cfSim = Seq((101L, 103L, 2L)).toDF("track_id_1", "track_id_2", "score")
    val follows = Seq((1L, 2L)).toDF("user_id_a", "user_id_b")
    val likes = Seq((1L, 101L), (2L, 103L)).toDF("user_id", "track_id")
    val trending = Seq((103L, 10L), (104L, 5L)).toDF("track_id", "play_count")
    val out = Recommender.recommend(emptySim, cfSim, trending, follows, likes,
      userId = 1L, k = 5).collect().toSeq.map(_.toSeq)
    // 103: cf 2·1.5 + social 1·0.5 + trend 1.0·0.2 = 3.7; 104: trend 0.5·0.2
    assert(out == Seq(Seq(103L, 3.7), Seq(104L, 0.1)))
  }

  test("ties break by ascending track id for deterministic top-k") {
    val trending = Seq((5L, 10L), (3L, 10L), (9L, 10L)).toDF("track_id", "play_count")
    val likes = Seq.empty[(Long, Long)].toDF("user_id", "track_id")
    val out = Recommender.recommend(emptySim, emptySim, trending, emptyFollows,
      likes, userId = 1L, k = 2).collect().toSeq.map(_.toSeq)
    assert(out == Seq(Seq(3L, 0.2), Seq(5L, 0.2)))
  }

  test("likeless user still receives trending candidates (documented divergence)") {
    // The C# service returns empty here (RecommendationService.cs:43–47);
    // our cold-start behavior is deliberate — see Recommender scaladoc.
    val trending = Seq((7L, 4L)).toDF("track_id", "play_count")
    val likes = Seq((99L, 1L)).toDF("user_id", "track_id")
    val out = Recommender.recommend(emptySim, emptySim, trending, emptyFollows,
      likes, userId = 1L, k = 5).collect()
    assert(out.length == 1 && out.head.getLong(0) == 7L)
  }
}
