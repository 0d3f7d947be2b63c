package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Serving-read queries (reference §2.9, api_gateway_service.py:285-344):
 * the three API endpoints as DataFrame functions over the engine's output
 * tables, plus SQL views so any SQL client serves the same queries.
 */
object Serve {

  /**
   * GET /recommendations/{user}: point-lookup precomputed recs, hydrate
   * stories (J3 semi-join shape, inner to keep scores), fallback to the
   * latest-N stories for unknown users (T2).
   *
   * ONE plan / one job per lookup: the personalized rows and the bounded
   * fallback rows union with a priority tag, and a global min-priority
   * window keeps the fallback only when no personalized row exists — no
   * separate `isEmpty` pre-action. The window's single partition holds at
   * most (user's recs + fallbackN) rows, bounded by construction.
   */
  def recommendationsFor(recs: DataFrame, stories: DataFrame, userId: String,
                         fallbackN: Int = 10): DataFrame = {
    val mine = recs.filter(col("user_id") === userId)
      .join(stories, "story_id")
      .select(col("story_id"), col("score"), lit(0).as("__pri"),
        col("score").as("__ord"))
    val latest = stories
      .orderBy(desc("last_updated"), col("story_id")).limit(fallbackN)
      .select(col("story_id"), lit(null).cast("double").as("score"), lit(1).as("__pri"),
        unix_timestamp(col("last_updated")).cast("double").as("__ord"))
    mine.unionByName(latest)
      .withColumn("__best", min(col("__pri")).over(Window.partitionBy(lit(1))))
      .filter(col("__pri") === col("__best"))
      .orderBy(desc("__ord"), col("story_id"))
      .select(col("story_id"), col("score"))
  }

  /** GET /stories/{id}: point lookup + projection (P18 casts). */
  def storyById(stories: DataFrame, storyId: String): DataFrame =
    stories.filter(col("story_id") === storyId)
      .select(col("story_id").cast("string"), col("summary"), col("last_updated"))

  /** GET /drift_score: A2 on demand over the interactions table. */
  def driftScore(interactions: DataFrame, recentCutoff: org.apache.spark.sql.Column): DataFrame =
    graft.operators.Recommend.drift(interactions,
      graft.operators.Recommend.score(col("event_type")),
      col("event_time") >= recentCutoff)

  /** Register output tables as SQL views: `SELECT * FROM recommendations ...`. */
  def registerViews(spark: SparkSession, tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
}
