package graft

import org.apache.spark.sql.SparkSession
import graft.silver.Pipelines

/** SQL-surface registration (§3.4): the reference exposes its silver
  * tables to dashboards over the Thrift server by path
  * (music_analytics.json:47); this registers the same surface as named
  * temp views — base tables plus the three silver pipelines under their
  * canonical names (SURVEY §1.4 resolution 1) — so any SQL client of the
  * session can query them as tables.
  *
  * Views are lazy logical plans: registering costs nothing; silver views
  * recompute per query unless the caller materializes them (the
  * production deploy writes them as tables per the medallion layout —
  * see ingest.Ingest).
  */
object Views {

  val BaseTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    BaseTables.foreach { t =>
      (if (t == "events") Tables.events(spark, dir) else Tables.load(spark, dir, t))
        .createOrReplaceTempView(t)
    }
    val li = Tables.lineitem(spark, dir)
    Pipelines.trending(li, Tables.part(spark, dir), days = 30)
      .createOrReplaceTempView("weekly_trending_tracks")
    Pipelines.playlistSimilarity(li)
      .createOrReplaceTempView("song_similarity_by_playlist")
    Pipelines.collaborativeFiltering(
        Pipelines.likes(Tables.orders(spark, dir), li))
      .createOrReplaceTempView("song_collaborative_filtering")
    Pipelines.likes(Tables.orders(spark, dir), li)
      .createOrReplaceTempView("user_likes")
    Pipelines.follows(Tables.customer(spark, dir))
      .createOrReplaceTempView("graph_user_follows")
  }
}
