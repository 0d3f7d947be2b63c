package graft.operators

import org.apache.spark.ml.feature.{PCA, Normalizer}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch cluster refinement (reference batch-cluster-service.py:205-232):
 * L2-normalize (M4) → dimensionality reduction (M5: PCA surrogate for
 * UMAP) → clustering (M6: KMeans surrogate for HDBSCAN) → small clusters
 * relabeled as noise (-1), preserving the reference's noise contract.
 *
 * Documented divergence (SURVEY §7.4): UMAP/HDBSCAN have no Spark
 * equivalents; the correctness contract here is stable cluster-id
 * semantics + noise filtering, not identical memberships (the reference
 * is itself nondeterministic — unseeded UMAP).
 */
object ClusterRefine {

  /**
   * @param dim vector dimensionality when the caller knows it (it almost
   *            always does — embeddings have a fixed width). `None` falls
   *            back to probing one cached row, the only extra job left.
   * @return input + `cluster` column (int; -1 = noise, clusters with
   *         fewer than minClusterSize members are noise — reference
   *         min_cluster_size=5, batch-cluster-service.py:28)
   */
  def refine(items: DataFrame, idCol: String, vecCol: String,
             pcaK: Int = 5, numClusters: Int = 10, minClusterSize: Int = 5,
             seed: Long = 42L, dim: Option[Int] = None): DataFrame = {
    val vecs = items.select(col(idCol), array_to_vector(col(vecCol).cast("array<double>")).as("v"))
    // Cache before the iterative fitters: PCA and KMeans each scan their
    // input many times (per power/Lloyd iteration) — uncached they re-run
    // the whole upstream plan every pass.
    val normed = new Normalizer().setInputCol("v").setOutputCol("vn").setP(2.0)
      .transform(vecs).cache()
    // One limit(1) probe on the CACHED frame (populates a partition the
    // fitters reuse — unlike the old `.first()` on the raw input, this is
    // not a separate upstream scan). It doubles as the empty-input check:
    // an empty corpus refines to an empty result instead of an opaque
    // MLlib failure. Clamp the PCA target to the vector dimensionality.
    val firstLen = normed.select(size(vector_to_array(col("v")))).limit(1).collect().headOption
    if (firstLen.isEmpty) {
      normed.unpersist()
      return items.select(col(idCol)).withColumn("cluster", lit(-1)).limit(0)
    }
    val k = math.min(pcaK, dim.getOrElse(firstLen.get.getInt(0)))
    val pca = new PCA().setInputCol("vn").setOutputCol("vp").setK(k).fit(normed)
    val reduced = pca.transform(normed).select(col(idCol), col("vp")).cache()
    val km = new KMeans().setK(numClusters).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("vp").setPredictionCol("raw_cluster").fit(reduced)
    val labeled = km.transform(reduced).select(col(idCol), col("raw_cluster"))
    // Both caches exist for the iterative fitters, which have now
    // consumed them; release before returning so a long Verify run does
    // not accumulate plans. The caller's single final pass recomputes the
    // (map-only) transform chain once — the honest trade vs. leaking.
    normed.unpersist()
    reduced.unpersist()
    // Noise semantics: clusters below min size → -1 (one windowless
    // groupBy on the small (cluster → count) side, broadcast back).
    val sizes = labeled.groupBy("raw_cluster").agg(count(lit(1)).as("n"))
    labeled.join(broadcast(sizes), "raw_cluster")
      .select(col(idCol),
        when(col("n") >= minClusterSize, col("raw_cluster")).otherwise(-1).as("cluster"))
  }
}
