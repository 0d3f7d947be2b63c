package graft.operators

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.ml.feature.StringIndexer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ALS collaborative-filtering pipeline (reference M7-M9,
 * recommendation-trainer.py:219-237,102-120), fully set-oriented: one
 * `recommendForUserSubset` over ALL users instead of the reference's
 * one-Spark-job-per-user driver loop.
 */
object RecommendML {

  /**
   * Train ALS on (user, item, score) and return top-k recommendations per
   * user as (user, item, score, rank). Ids may be arbitrary (indexed and
   * mapped back internally — reference M8/M9). Deterministic via fixed seed.
   */
  def alsTopK(ratings: DataFrame, userCol: String, itemCol: String,
              scoreCol: String, k: Int, rank: Int = 5, maxIter: Int = 5,
              regParam: Double = 0.1, seed: Long = 42L): DataFrame = {
    val ui = new StringIndexer().setInputCol(userCol).setOutputCol("u_idx").setHandleInvalid("skip")
    val ii = new StringIndexer().setInputCol(itemCol).setOutputCol("i_idx").setHandleInvalid("skip")
    val uiM = ui.fit(ratings)
    val iiM = ii.fit(ratings)
    // Cached: ALS scans the ratings once per iteration per factor side.
    val indexed = iiM.transform(uiM.transform(ratings))
      .select(col("u_idx").cast("int").as("user"), col("i_idx").cast("int").as("item"),
        col(scoreCol).cast("float").as("rating"))
      .cache()
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
    val model = als.fit(indexed)
    val recs = model.recommendForAllUsers(k)
      .select(col("user"), posexplode(col("recommendations")).as(Seq("rk", "r")))
      .select(col("user").as("__u"), col("r.item").as("__i"), col("r.rating").as("score"),
        (col("rk") + 1).as("rank"))
    // Map indices back to original ids via the indexer label arrays
    // (broadcast join against tiny label tables — no driver-side dicts).
    // Internal index columns use reserved names so caller column names
    // (e.g. an item column literally called "item") never collide.
    val spark = ratings.sparkSession
    import spark.implicits._
    val uLabels = uiM.labelsArray(0).zipWithIndex.map { case (l, i) => (i, l) }
      .toSeq.toDF("__u", userCol)
    val iLabels = iiM.labelsArray(0).zipWithIndex.map { case (l, i) => (i, l) }
      .toSeq.toDF("__i", itemCol)
    recs.join(broadcast(uLabels), "__u").join(broadcast(iLabels), "__i")
      .select(col(userCol), col(itemCol), col("score").cast("double").as("score"), col("rank"))
  }

  /** M13: drift-gated retraining decision (reference recommendation-trainer.py:269-284). */
  def shouldRetrain(interactions: DataFrame, scoreCol: org.apache.spark.sql.Column,
                    isRecent: org.apache.spark.sql.Column, threshold: Double = 0.2): Boolean = {
    val d = Recommend.drift(interactions, scoreCol, isRecent).collect()(0).getDouble(0)
    d > threshold
  }
}
