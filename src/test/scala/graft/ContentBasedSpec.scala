package graft

import graft.recommend.ContentBased

/** Content-based filtering: attribute-overlap scoring, liked-set
  * exclusion, deterministic ranking, cold-start emptiness. */
class ContentBasedSpec extends SparkTestBase {
  import spark.implicits._

  private val tracks = Seq(
    (1L, "A", "rock"), (2L, "A", "pop"), (3L, "A", "rock"),
    (4L, "B", "rock"), (5L, "B", "jazz"))
    .toDF("track_id", "artist", "genre")

  private val likes = Seq((1L, 1L), (1L, 2L), (9L, 5L))
    .toDF("user_id", "track_id")

  test("scores = wArtist*artist_overlap + wGenre*genre_overlap; liked excluded") {
    // user 1 profile: artist A×2; genre rock×1, pop×1
    // t3 = 2*2 + 1*1 = 5; t4 = 0 + 1 = 1; t5 = 0 (dropped); t1/t2 liked
    val got = ContentBased.recommend(likes, tracks, userId = 1L, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 5L), (4L, 1L)))
  }

  test("k truncates after the deterministic (score desc, id asc) order") {
    val got = ContentBased.recommend(likes, tracks, userId = 1L, k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L))
  }

  test("cold start: a user with no likes gets an empty result") {
    // matches the reference endpoint's no-likes early return
    // (RecommendationService.cs:43–47) — zero overlap = zero candidates
    assert(ContentBased.recommend(likes, tracks, userId = 42L, k = 5).isEmpty)
  }

  test("weights shift the ranking") {
    // genre-heavy weights: t4 (rock, 1 genre hit) loses to t3 anyway
    // (t3 has both), but t4 now beats nothing at wArtist=0 except by id
    val got = ContentBased.recommend(likes, tracks, userId = 1L, k = 5,
      wArtist = 0L, wGenre = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 10L), (4L, 10L)))
  }
}
