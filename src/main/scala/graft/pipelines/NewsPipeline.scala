package graft.pipelines

import graft.functions.{text, VectorMeanFast}
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * End-to-end Newsify-equivalent pipelines, composed from the operator
 * modules — the complete batch paths a user of the reference runs today
 * (SURVEY §3.1-3.2), each as ONE distributed plan.
 */
object NewsPipeline {

  /**
   * M1 stand-in: deterministic hashing embedding — each token votes ±1
   * into one of dim buckets, L2-normalized (SURVEY §2.7 M1: semantic model
   * swapped for a deterministic projection; same column contract
   * array<double>, unit norm). Backed by the codegen
   * [[graft.functions.HashEmbedding]] expression: O(tokens) per row.
   */
  def hashEmbedding(textCol: Column, dim: Int = 64): Column =
    graft.functions.HashEmbed(textCol, dim)

  /**
   * §3.1 batch form: raw articles → projection/filters (P1-P3) →
   * dedup (D1 batch) → featurize (M1/M2) → nearest-centroid story
   * assignment (J1) → story build (A3+A5+A6).
   *
   * @param articles columns: link, title, txt, ingestion_time
   * @return (articleFeatures, stories)
   */
  def ingestAndCluster(articles: DataFrame, existingStories: DataFrame,
                       simThreshold: Double = 0.8): (DataFrame, DataFrame) = {
    val cleaned = articles
      .filter(col("link").isNotNull)                       // P2
      .filter(length(trim(col("txt"))) > 0)                // P3
    val deduped = DedupOps.keepFirst(cleaned, Seq("link"), Seq(col("ingestion_time")))
    val featured = deduped
      .withColumn("content", concat_ws(" ", col("title"), col("txt")))  // P14
      .withColumn("embedding", hashEmbedding(col("content")))            // M1
      .withColumn("entities", text.entities(col("content")))             // M2
    // J1 batch: assign to nearest existing centroid or open a new story
    // (stable ids for unmatched articles come from their own link hash).
    val assigned =
      if (existingStories.isEmpty) featured.withColumn("story_id", concat(lit("s-"), md5(col("link"))))
      else {
        val a = SimilarityOps.assignNearestCentroid(
          featured.withColumn("__rid", md5(col("link"))), existingStories,
          "__rid", "embedding", "story_num", "centroid", simThreshold)
        featured.withColumn("__rid", md5(col("link")))
          .join(a.select(col("item_id").as("__rid"),
            when(col("assigned_id") >= 0, concat(lit("story-"), col("assigned_id")))
              .otherwise(concat(lit("s-"), col("__rid"))).as("story_id")), "__rid")
          .drop("__rid")
      }
    val stories = StoryOps.buildStories(assigned, "story_id", "link", "embedding", "entities")
    (assigned, stories)
  }

  /**
   * §3.2: the full hybrid recommendation batch — ALS ∪ content-kNN ∪
   * popularity fallback with freshness decay and min-max normalization,
   * top-N per user. Entirely set-oriented: no per-user loops, one plan.
   *
   * @param interactions (user_id, story_id, event_type, event_time)
   * @param stories      (story_id, centroid, last_updated)
   * @return (user_id, story_id, score, rank) — rank ≤ topN per user
   */
  def hybridRecommend(interactions: DataFrame, stories: DataFrame,
                      now: Column, topN: Int = 10, candK: Int = 50): DataFrame = {
    val scored = interactions
      .withColumn("score", Recommend.score(col("event_type")))           // P10
      .filter(col("score").isNotNull && col("score") >= 0)               // P6
    val ratings = DedupOps.keepFirst(scored, Seq("user_id", "story_id"),
        Seq(desc("score"), col("event_time")))                           // D2 deterministic
      .groupBy("user_id", "story_id").agg(sum(col("score")).as("score"))
    // ALS arm (M7-M9)
    val als = RecommendML.alsTopK(ratings, "user_id", "story_id", "score", candK)
      .select(col("user_id"), col("story_id"), col("score").as("als_score"))
    // Content arm: user profile = mean centroid of liked stories (J4+A4),
    // then exact kNN against story centroids (J8).
    val profiles = interactions.filter(col("event_type") === "like")
      .join(stories.select(col("story_id"), col("centroid")), "story_id")
      .groupBy("user_id")
      .agg(VectorMeanFast(col("centroid").cast("array<double>")).as("profile"))
    // All-users path: profiles are unbounded, the active-story corpus is
    // the bounded relation — broadcast the corpus, stream the profiles.
    // excludeSelf = false: query ids are USER ids and neighbor ids are
    // STORY ids — different domains, so an id-value collision must not
    // drop that story from the user's candidates (the reference's FAISS
    // search has no cross-domain self-exclusion either,
    // recommendation-trainer.py:89-100).
    val knn = SimilarityOps.knnJoinCosine(
        profiles.select(col("user_id").as("qid"), col("profile")),
        stories.select(col("story_id").as("qid"), col("centroid").cast("array<double>").as("profile")),
        "qid", "profile", candK, excludeSelf = false, broadcastQueries = false)
      .select(col("query_id").as("user_id"), col("neighbor_id").as("story_id"),
        col("sim").as("knn_score"))
    // J5 hybrid merge + P11 freshness + P12 normalization
    val merged = Recommend.hybrid(als, knn, Seq("user_id", "story_id"),
        "als_score", "knn_score", 0.5, 0.5)
      .join(stories.select(col("story_id"), col("last_updated")), Seq("story_id"), "left")
      .withColumn("fresh", coalesce(Recommend.freshness(col("last_updated"), now), lit(1.0)))
      .withColumn("score", col("score") * col("fresh"))
    val normed = Recommend.minMaxNorm(merged, "user_id", "score", "norm_score")
    // T1 per-user top-N with deterministic tie-break
    Recommend.topKPerKey(normed, "user_id",
        Seq(desc("norm_score"), col("story_id")), topN)
      .withColumn("rank", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("norm_score"), col("story_id"))))
      .select(col("user_id"), col("story_id"), col("norm_score").as("score"), col("rank"))
  }

  /**
   * Popularity fallback for users without collaborative/content signal
   * (reference recommendation-trainer.py:253-256): global top-N stories
   * by interaction count, served to every user in `coldUsers`.
   */
  def popularityFallback(interactions: DataFrame, coldUsers: DataFrame, topN: Int): DataFrame =
    coldUsers.crossJoin(broadcast(
      Recommend.popularity(interactions, "story_id", topN)
        .select(col("story_id"), col("cnt").cast("double").as("score"))))

  /**
   * The complete §3.2 output: hybrid recommendations for users the model
   * can serve, popularity fallback for everyone else (cold users = in
   * `allUsers` but absent from the hybrid output — the reference's
   * "no likes" branch generalized). One union, still no per-user loops.
   */
  def recommendAll(interactions: DataFrame, stories: DataFrame, allUsers: DataFrame,
                   now: Column, topN: Int = 10, candK: Int = 50): DataFrame = {
    val warm = hybridRecommend(interactions, stories, now, topN, candK)
    val cold = allUsers.join(warm.select("user_id").distinct(), Seq("user_id"), "left_anti")
    val fallback = popularityFallback(interactions, cold, topN)
      .withColumn("rank", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("score"), col("story_id"))))
    warm.withColumn("src", lit("hybrid"))
      .unionByName(fallback.withColumn("src", lit("popularity")))
  }

  /**
   * Batch cluster refinement with STABLE STORY IDENTITY (reference
   * batch-cluster-service.py:205-232 + 45-70): re-cluster all articles
   * (M4-M6 surrogate), then match new clusters to existing stories by
   * greedy 1-to-1 Jaccard overlap of member sets — matched clusters KEEP
   * the old story id, unmatched clusters mint fresh ids, unmatched old
   * stories are dropped (J7 anti-join delete). Noise articles (cluster -1)
   * leave their stories (reference P7).
   *
   * @param articles (link, embedding) — current corpus
   * @param oldStories (story_id, members array<string>)
   * @return (assignment (link, story_id), stories rebuilt via buildStories)
   */
  def refreshStories(articles: DataFrame, oldStories: DataFrame,
                     jaccardThreshold: Double = 0.5, numClusters: Int = 10,
                     minClusterSize: Int = 5): (DataFrame, DataFrame) = {
    val clustered = ClusterRefine.refine(
        articles, "link", "embedding", numClusters = numClusters,
        minClusterSize = minClusterSize)
      .filter(col("cluster") =!= -1)                                      // P7
    val newMembers = clustered.select(col("cluster"), col("link"))
    val oldMembers = oldStories.select(col("story_id"),
      explode(col("members")).as("link"))
    val cand = SimilarityOps.jaccardJoin(
      newMembers.withColumnRenamed("cluster", "id_a"),
      oldMembers.withColumnRenamed("story_id", "id_b"),
      "id_a", "id_b", "link", jaccardThreshold)
    val matches = StoryOps.greedyMatch(cand, "id_a", "id_b", "jaccard")     // J6
      .select(col("id_a").cast("int").as("cluster"), col("id_b").as("story_id"))
    val assignment = clustered
      .join(broadcast(matches), Seq("cluster"), "left")
      .withColumn("story_id",
        coalesce(col("story_id"), concat(lit("story-c"), col("cluster"))))  // J9
      .select(col("link"), col("story_id"))
    val stories = StoryOps.buildStories(
      assignment.join(articles, "link").withColumn("entities", array().cast("array<string>")),
      "story_id", "link", "embedding", "entities")
    (assignment, stories)
  }

  /**
   * P4+J2+A7: incremental summarization input — stories needing (re)summary
   * hydrated with member text, lead-k extractive summary (M10 stand-in).
   */
  def summarize(stories: DataFrame, articles: DataFrame, k: Int = 2): DataFrame = {
    val due = StoryOps.needsSummary(stories, "last_updated", "last_summarized")
    val memberText = StoryOps.explodeJoinMembers(
        due.select(col("story_id"), col("members")), articles.select(col("link"), col("txt")),
        "story_id", "members", "link")
      .select(col("story_id"), struct(col("link"), col("txt")).as("r"))
      .groupBy("story_id")
      .agg(concat_ws(" ", transform(array_sort(collect_list(col("r"))), x => x("txt"))).as("full_text"))
    memberText.select(col("story_id"), text.leadKSummary(col("full_text"), k).as("summary"))
  }
}
