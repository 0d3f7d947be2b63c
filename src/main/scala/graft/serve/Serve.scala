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

  // ── Bucket-pruned lookups over PERSISTED TableSink tables ──────────────
  //
  // The DataFrame forms above are storage-agnostic; at scale the serving
  // tables live in TableSink and a point lookup should open one bucket's
  // FILES, not scan the table. Two addressing modes:
  //  - stories: keyed by story_id (key-hash) → `keyBucketIdsFor` resolves
  //    the single bucket a story id hashes to. (A CELL-layout stories
  //    table — the streaming job's — addresses by cell, not id; these
  //    serving reads fall back to the full scan there, correct but
  //    unpruned: the §3.3 serving table is the batch pipeline's, written
  //    key-hash.)
  //  - recommendations: keyed by (user_id, story_id) so each rec row is
  //    its own upsert target, with user_id as the LAYOUT column
  //    ([[writeRecommendations]] pins it) — all of one user's rows share
  //    a bucket, so a user lookup reads exactly that bucket.

  /** Canonical persisted recommendations table: keyed (user_id,
    * story_id), laid out by user_id — the write side of the pruned
    * [[recommendationsForStored]] read path. */
  def writeRecommendations(spark: SparkSession, dir: String, recs: DataFrame,
                           version: Long,
                           numBuckets: Int = graft.sources.TableSink.DefaultBuckets): Unit =
    graft.sources.TableSink.upsert(spark, dir,
      recs.withColumn("__v", lit(version)),
      Seq("user_id", "story_id"), "__v", numBuckets,
      layoutCol = Some("user_id"))

  /** The (story_id → cell) sidecar table a CELL-layout stories table
    * keeps next to itself so point lookups can resolve which bucket to
    * open ([[storyByIdStored]]). Key-hash by story_id; maintained by
    * the same micro-batch that writes the stories delta
    * ([[graft.streaming.StreamingJob]]), upserted BEFORE the stories
    * commit and carrying `prev_cell`, so under ANY single-commit crash
    * window a stored story sits in the bucket of its sidecar `cell` or
    * `prev_cell` — the lookup opens both (≤ 2 buckets) and keeps the
    * exact id filter on top. */
  def idMapDir(storiesDir: String): String = storiesDir + "_idmap"

  /** Adopt a PRE-EXISTING cell-layout stories table into the sidecar
    * contract: one O(table) scan projecting (story_id, cell) into a
    * fresh sidecar. Run once before serving point lookups against a
    * table whose history predates the sidecar — [[storyByIdStored]]
    * treats a sidecar miss as "story does not exist". */
  def backfillIdMap(spark: SparkSession, storiesDir: String): Unit = {
    import graft.sources.TableSink
    require(TableSink.layoutColOf(storiesDir).isDefined,
      s"table at '$storiesDir' has no layout column — key-hash tables " +
        "resolve point lookups directly (keyBucketIdsFor), no sidecar needed")
    val like = spark.range(0).select(lit("").as("story_id"), lit("").as("cell"))
    TableSink.overwrite(spark, idMapDir(storiesDir),
      TableSink.read(spark, storiesDir, like)
        .select(col("story_id"), col("cell"),
          lit(null).cast("string").as("prev_cell"), lit(0L).as("__v")),
      Seq("story_id"))
  }

  /** [[storyById]] against a persisted stories table, opening only the
    * bucket(s) holding the id:
    *  - key-hash table → the single bucket the id hashes to;
    *  - cell-layout table WITH its [[idMapDir]] sidecar → one sidecar
    *    bucket resolves the story's cell (+ its previous cell, covering
    *    the one-commit crash window), then only those cells' stories
    *    buckets open — a sidecar miss is authoritative (the sidecar
    *    commits before the story ever lands), so absent stories cost
    *    one tiny sidecar bucket read, never a table scan;
    *  - cell-layout table WITHOUT a sidecar (pre-sidecar history) →
    *    correct full-scan fallback; run [[backfillIdMap]] to adopt. */
  def storyByIdStored(spark: SparkSession, storiesDir: String, storyId: String): DataFrame = {
    import spark.implicits._
    import graft.sources.TableSink
    // A missing table must fail loudly: an empty bucket set would make
    // "wrong path" indistinguishable from "story does not exist".
    require(TableSink.tableExists(storiesDir),
      s"no stories table at '$storiesDir' — nothing is served from a " +
        "path that was never written")
    val like = spark.range(0).select(lit("").as("story_id"),
      lit("").as("summary"), lit(null).cast("timestamp").as("last_updated"))
    val pruned =
      if (TableSink.layoutColOf(storiesDir).isEmpty)
        TableSink.readBuckets(spark, storiesDir, like,
          TableSink.keyBucketIdsFor(storiesDir, Seq(storyId).toDF("story_id")))
      else if (TableSink.tableExists(idMapDir(storiesDir))) {
        val idxLike = spark.range(0).select(lit("").as("story_id"),
          lit("").as("cell"), lit(null).cast("string").as("prev_cell"))
        // One bucket of the tiny sidecar; the collect is ≤ 1 row.
        val hit = TableSink.readBuckets(spark, idMapDir(storiesDir), idxLike,
            TableSink.keyBucketIdsFor(idMapDir(storiesDir), Seq(storyId).toDF("story_id")))
          .filter(col("story_id") === storyId)
          .select(col("cell"), col("prev_cell")).collect()
        val cells = hit.toSeq.flatMap(r =>
          Option(r.getString(0)).toSeq ++ Option(r.getString(1)).toSeq).distinct
        if (cells.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)
        else
          TableSink.readBuckets(spark, storiesDir, like,
            TableSink.bucketIdsFor(spark, storiesDir, cells))
      }
      else TableSink.read(spark, storiesDir, like)
    storyById(pruned, storyId)
  }

  /** [[recommendationsFor]] with the personalized side read from the
    * persisted recommendations table via its user_id layout — exactly
    * one bucket's files for the lookup key. The stories frame is shared
    * with the fallback arm (which is a top-N over stories either way),
    * so the caller passes it once. */
  def recommendationsForStored(spark: SparkSession, recsDir: String,
                               stories: DataFrame, userId: String,
                               fallbackN: Int = 10): DataFrame = {
    import graft.sources.TableSink
    // A wrong recs path would silently serve every warm user the
    // cold-start fallback — refuse instead.
    require(TableSink.tableExists(recsDir),
      s"no recommendations table at '$recsDir' — write it with " +
        "writeRecommendations before serving")
    val like = spark.range(0).select(lit("").as("user_id"),
      lit("").as("story_id"), lit(0.0).as("score"))
    val recs = TableSink.layoutColOf(recsDir) match {
      case Some("user_id") => TableSink.readBuckets(spark, recsDir, like,
        TableSink.bucketIdsFor(spark, recsDir, Seq(userId)))
      case _ => TableSink.read(spark, recsDir, like) // unpruned but correct
    }
    recommendationsFor(recs, stories, userId, fallbackN)
  }

  /** GET /drift_score: A2 on demand over the interactions table. */
  def driftScore(interactions: DataFrame, recentCutoff: org.apache.spark.sql.Column): DataFrame =
    graft.operators.Recommend.drift(interactions,
      graft.operators.Recommend.score(col("event_type")),
      col("event_time") >= recentCutoff)

  /** Register output tables as SQL views: `SELECT * FROM recommendations ...`. */
  def registerViews(spark: SparkSession, tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
}
