package graft

class ViewsSpec extends SparkTestBase {

  test("registered views serve SQL over base and silver tables") {
    Views.register(spark, "/root/testdata/sf0.001")
    val top = spark.sql(
      """SELECT track_id, play_count FROM weekly_trending_tracks
        |ORDER BY play_count DESC, track_id LIMIT 3""".stripMargin).collect()
    assert(top.length == 3 && top(0).getLong(1) >= top(2).getLong(1))
    val sim = spark.sql(
      "SELECT count(*) FROM song_similarity_by_playlist WHERE track_id_1 >= track_id_2")
      .collect().head.getLong(0)
    assert(sim == 0, "canonical t1 < t2 violated in the view")
    val joined = spark.sql(
      """SELECT count(*) FROM user_likes l
        |JOIN graph_user_follows f ON l.user_id = f.user_id_b""".stripMargin)
      .collect().head.getLong(0)
    assert(joined > 0)
  }
}
