package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One incoming item for online assignment. */
case class Incoming(id: String, vec: Array[Double])
/** A story's running state: centroid and member count (for running mean). */
case class StoryState(storyId: String, centroid: Array[Double], n: Long)
/** Assignment result row. */
case class Assigned(id: String, storyId: String, sim: Double, isNew: Boolean)

/**
 * ST4 — the reference's hardest operator: online nearest-centroid story
 * assignment where each record can CREATE a story that later records join
 * (duplication_service.py:74-92, state hydration at :142-149). The
 * semantics are inherently sequential (article i may join the story
 * created by article i−1), so the reference runs a single consumer.
 *
 * Our shape: per micro-batch, `foreachBatch` folds the (bounded) batch
 * sequentially against the broadcast current-story state, exactly the
 * reference's guarantee (Kafka-offset order, single logical consumer);
 * the surrounding pipeline — decode, featurize, dedup, sink MERGE — stays
 * fully distributed. Story state lives in the stories table, re-read each
 * batch, so recovery after failure is just re-hydration (same as the
 * reference's startup path).
 */
object OnlineClustering {

  /** Pure sequential fold (unit-testable): assign or create per record. */
  def foldBatch(batch: Seq[Incoming], stories: Seq[StoryState], threshold: Double,
                newId: Int => String): (Seq[Assigned], Seq[StoryState]) = {
    val state = scala.collection.mutable.LinkedHashMap[String, StoryState](
      stories.map(s => s.storyId -> s): _*)
    var created = 0
    val out = batch.map { a =>
      var bestId: String = null
      var bestSim = -2.0
      state.values.foreach { s =>
        val sim = cosine(a.vec, s.centroid)
        if (sim > bestSim || (sim == bestSim && (bestId == null || s.storyId < bestId))) {
          bestSim = sim; bestId = s.storyId
        }
      }
      if (bestId != null && bestSim >= threshold) {
        val s = state(bestId)
        // running mean update of the centroid (batch-cluster refinement
        // recomputes exactly later; this matches the reference's upsert)
        val c = s.centroid.clone()
        var i = 0
        while (i < c.length && i < a.vec.length) { c(i) = (c(i) * s.n + a.vec(i)) / (s.n + 1); i += 1 }
        state(bestId) = StoryState(bestId, c, s.n + 1)
        Assigned(a.id, bestId, bestSim, isNew = false)
      } else {
        val id = newId(created); created += 1
        state(id) = StoryState(id, a.vec, 1L)
        Assigned(a.id, id, bestSim, isNew = true)
      }
    }
    (out, state.values.toSeq)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  /**
   * DataFrame adapter for foreachBatch: batch must expose (idCol, vecCol);
   * stories (storyId, centroid, n). Batch is collected to the driver — it
   * is bounded by the trigger interval, the same working set the
   * reference holds in its consumer process; everything upstream and
   * downstream stays distributed.
   */
  def processBatch(batch: DataFrame, stories: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, batchEpoch: Long): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    import spark.implicits._
    val in = batch.select(col(idCol).cast("string"),
        col(vecCol).cast("array<double>")).as[(String, Seq[Double])]
      .collect().map { case (i, v) => Incoming(i, v.toArray) }
    val st = stories.select(col("story_id"), col("centroid").cast("array<double>"), col("n"))
      .as[(String, Seq[Double], Long)]
      .collect().map { case (s, c, n) => StoryState(s, c.toArray, n) }
    val (assigned, newState) = foldBatch(in.toSeq, st.toSeq, threshold,
      i => s"story-$batchEpoch-$i")
    (spark.createDataFrame(assigned.toIndexedSeq).toDF(),
      spark.createDataFrame(newState.map(s => (s.storyId, s.centroid.toSeq, s.n)).toIndexedSeq)
        .toDF("story_id", "centroid", "n"))
  }
}
