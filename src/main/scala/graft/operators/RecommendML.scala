package graft.operators

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.ml.feature.{StringIndexer, StringIndexerModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * ALS collaborative-filtering pipeline (reference M7-M9,
 * recommendation-trainer.py:219-237,102-120), fully set-oriented: one
 * `recommendForAllUsers` over ALL users instead of the reference's
 * one-Spark-job-per-user driver loop.
 */
object RecommendML {

  /** Fitted ALS + the id↔index mappings needed to serve it (reference
    * keeps the indexer models in process; here they persist together). */
  case class AlsArtifacts(model: ALSModel, userIndexer: StringIndexerModel,
                          itemIndexer: StringIndexerModel)

  /**
   * Train ALS on (user, item, score). Ids may be arbitrary (indexed
   * internally — reference M8). Deterministic via fixed seed.
   */
  def fit(ratings: DataFrame, userCol: String, itemCol: String,
          scoreCol: String, rank: Int = 5, maxIter: Int = 5,
          regParam: Double = 0.1, seed: Long = 42L): AlsArtifacts = {
    // Cache the ratings projection FIRST: the two indexer fits and the
    // transform below each re-ran the caller's whole upstream plan (for
    // the hybrid pipeline that is a window + groupBy over the full event
    // log — three times). One materialization, three cheap cache reads.
    val needed = ratings
      .select(col(userCol), col(itemCol), col(scoreCol)).cache()
    val ui = new StringIndexer().setInputCol(userCol).setOutputCol("u_idx").setHandleInvalid("skip")
    val ii = new StringIndexer().setInputCol(itemCol).setOutputCol("i_idx").setHandleInvalid("skip")
    try {
      val uiM = ui.fit(needed)
      val iiM = ii.fit(needed)
      // Cached: ALS scans the ratings once per iteration per factor side.
      val indexed = iiM.transform(uiM.transform(needed))
        .select(col("u_idx").cast("int").as("user"), col("i_idx").cast("int").as("item"),
          col(scoreCol).cast("float").as("rating"))
        .cache()
      try {
        // Block count scales with data: MLlib's default 10 blocks costs ~4×
        // wall-clock in scheduling overhead on small inputs, while huge inputs
        // want at least one block per core (count is cheap — `indexed` is
        // cached and consumed many times by ALS anyway).
        val nRatings = indexed.count()
        val maxBlocks = math.max(10, ratings.sparkSession.sparkContext.defaultParallelism)
        val blocks = math.max(2, math.min(maxBlocks.toLong, nRatings / 25000L).toInt)
        val als = new ALS()
          .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
          .setImplicitPrefs(true).setColdStartStrategy("drop").setSeed(seed)
          .setNumUserBlocks(blocks).setNumItemBlocks(blocks)
          .setUserCol("user").setItemCol("item").setRatingCol("rating")
        AlsArtifacts(als.fit(indexed), uiM, iiM)
      } finally indexed.unpersist()
    } finally needed.unpersist()
  }

  /** S11: persist the model + indexers (reference
    * recommendation-trainer.py:237 `model.write().overwrite().save`).
    * Everything a serving job needs reloads from `dir` alone. */
  def save(a: AlsArtifacts, dir: String): Unit = {
    a.model.write.overwrite().save(s"$dir/als")
    a.userIndexer.write.overwrite().save(s"$dir/user_indexer")
    a.itemIndexer.write.overwrite().save(s"$dir/item_indexer")
  }

  /** S11: reload a persisted model for serving/incremental scoring. */
  def load(dir: String): AlsArtifacts =
    AlsArtifacts(ALSModel.load(s"$dir/als"),
      StringIndexerModel.load(s"$dir/user_indexer"),
      StringIndexerModel.load(s"$dir/item_indexer"))

  /**
   * Top-k recommendations per user as (user, item, score, rank) from a
   * fitted (or reloaded) model — reference M9 `recommendForAllUsers` +
   * index→id back-mapping, as broadcast joins against the tiny label
   * tables instead of driver-side dicts.
   */
  def topK(a: AlsArtifacts, spark: SparkSession, userCol: String,
           itemCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val recs = a.model.recommendForAllUsers(k)
      .select(col("user"), posexplode(col("recommendations")).as(Seq("rk", "r")))
      .select(col("user").as("__u"), col("r.item").as("__i"), col("r.rating").as("score"),
        (col("rk") + 1).as("rank"))
    // Internal index columns use reserved names so caller column names
    // (e.g. an item column literally called "item") never collide.
    val uLabels = a.userIndexer.labelsArray(0).zipWithIndex.map { case (l, i) => (i, l) }
      .toSeq.toDF("__u", userCol)
    val iLabels = a.itemIndexer.labelsArray(0).zipWithIndex.map { case (l, i) => (i, l) }
      .toSeq.toDF("__i", itemCol)
    recs.join(broadcast(uLabels), "__u").join(broadcast(iLabels), "__i")
      .select(col(userCol), col(itemCol), col("score").cast("double").as("score"), col("rank"))
  }

  /** One-shot train → top-k (the M7 query shape). */
  def alsTopK(ratings: DataFrame, userCol: String, itemCol: String,
              scoreCol: String, k: Int, rank: Int = 5, maxIter: Int = 5,
              regParam: Double = 0.1, seed: Long = 42L): DataFrame =
    topK(fit(ratings, userCol, itemCol, scoreCol, rank, maxIter, regParam, seed),
      ratings.sparkSession, userCol, itemCol, k)

  /** M13: drift-gated retraining decision (reference recommendation-trainer.py:269-284). */
  def shouldRetrain(interactions: DataFrame, scoreCol: org.apache.spark.sql.Column,
                    isRecent: org.apache.spark.sql.Column, threshold: Double = 0.2): Boolean = {
    val d = Recommend.drift(interactions, scoreCol, isRecent).collect()(0).getDouble(0)
    d > threshold
  }
}
