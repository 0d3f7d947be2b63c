package graft.operators

import graft.functions.vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SemDeDup — semantic deduplication of an embedding corpus by
 * cluster-partitioned pairwise pruning (Abbas et al. 2023, "SemDeDup:
 * Data-efficient learning at web-scale through semantic deduplication").
 * Complements the EXACT embedding near-dup paths ([[SimilarityOps
 * .nearDupByCosine]]'s epsilon grid, the cosine-LSH sketch): those find
 * pairs above a tight threshold anywhere in the corpus; SemDeDup trades
 * global exactness for a clustering that BOUNDS the quadratic work, which
 * is what makes perceptual-duplicate pruning (eps well below near-dup
 * thresholds) feasible at corpus scale — the paper prunes half of LAION
 * at eps where the grid's cells would cover the whole sphere.
 *
 * Semantics (faithful to the paper's released formulation): assign every
 * vector to its nearest centroid (max cosine, lowest-id tie-break);
 * within each cluster order members by similarity-to-centroid ASCENDING
 * (rounded to 6 decimals for run-to-run reproducibility; id tie-break) —
 * the paper's keep-low-centroid-similarity policy, which
 * preferentially keeps the cluster's EDGE examples and prunes its dense
 * core; drop a member iff ANY earlier member (kept or not — the paper
 * thresholds the upper-triangular similarity matrix, not a greedy chain)
 * has cosine ≥ `eps` with it. No sequential dependency: the drop
 * predicate is a pure ∃-earlier-neighbor test, so the whole operator is
 * joins + aggregations — no iteration, no driver loop.
 *
 * Scale posture: centroids ride the plan as literals (they are few —
 * the paper uses O(10^4) for O(10^8) vectors — and the collect is as
 * bounded as broadcasting them would be), so assignment is one
 * codegen'd map-only projection with no exchange; the pairwise stage
 * shuffles members once on the cluster key and the per-cluster
 * quadratic is bounded by the caller's choice of centroid count (the
 * SemDeDup contract: pick k so n/k members fit a task — same knob as
 * the paper's cluster count).
 * A pathologically skewed cluster concentrates c² work on one task;
 * that is inherent to the algorithm's partitioning — re-fit with more
 * centroids, or use the epsilon grid for tight-threshold workloads.
 */
object SemDedup {

  /**
   * @param vecs       corpus: (idCol, vecCol: array&lt;float|double&gt;)
   * @param centroids  cluster centers: (centIdCol, centVecCol) — tiny by
   *                    contract; driver-collected into plan literals
   * @param eps        drop threshold on pairwise cosine, in (0, 1]
   * @return one row per input vector: (id, cluster_id, centroid_sim,
   *         kept) — `kept = false` iff an earlier-ordered same-cluster
   *         member sits within eps.
   */
  /** Map-only nearest-centroid assignment over driver-collected centroid
    * literals (bounded by the few-centroids contract that would
    * otherwise broadcast them): an array_max over per-centroid
    * (cosine, -id) structs — zero exchanges, zero aggregation,
    * whole-stage codegen. Returns (id, cluster_id, centroid_sim, v). */
  private def assignMembers(vecs: DataFrame, centroids: DataFrame,
                            idCol: String, vecCol: String,
                            centIdCol: String, centVecCol: String): DataFrame = {
    val cl = centroids
      .select(col(centIdCol).cast("long"), col(centVecCol).cast("array<double>"))
      .collect()
    require(cl.nonEmpty, "centroids must be non-empty")
    val best = array_max(array(cl.map { r =>
      struct(
        vector.cosineSim(col("v"), lit(r.getSeq[Double](1).toArray)).as("csim"),
        lit(-r.getLong(0)).as("nid"))
    }.toIndexedSeq: _*))
    vecs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("best", best)
      .select(col("id"), (-col("best.nid")).as("cluster_id"),
        col("best.csim").as("centroid_sim"), col("v"))
  }

  def semDedup(vecs: DataFrame, centroids: DataFrame, idCol: String,
               vecCol: String, centIdCol: String, centVecCol: String,
               eps: Double): DataFrame = {
    require(eps > 0.0 && eps <= 1.0, s"eps must be in (0, 1]: $eps")
    // The member relation is consumed three times below (two self-join
    // sides + the verdict join); with a map-only definition each
    // consumption is a pruned corpus scan, per the don't-cache-O(corpus)
    // doctrine — a crossJoin+argmax formulation here would instead
    // re-run an exchange+sort-aggregate subtree per consumer.
    val members = assignMembers(vecs, centroids, idCol, vecCol, centIdCol, centVecCol)
    // Pairwise within cluster, restricted to (earlier a, later b): the
    // equi-join key is the cluster id, so the only cross product is the
    // per-cluster block the algorithm's clustering deliberately bounds.
    // The order key is centroid similarity ROUNDED to 6 decimals (id
    // tie-break), not the raw double: parallel FP summation makes the
    // raw value nondeterministic in its last ulps across evaluations —
    // an order keyed on it would make kept/dropped itself flap run to
    // run (and never match an independent replay). Rounding gives a
    // reproducible total order at resolution far above summation jitter.
    val a = members.select(col("cluster_id"), col("id").as("id_a"),
      col("v").as("va"), round(col("centroid_sim"), 6).as("ca"))
    val b = members.select(col("cluster_id"), col("id").as("id_b"),
      col("v").as("vb"), round(col("centroid_sim"), 6).as("cb"))
    val dropped = a.join(b, "cluster_id")
      .filter(col("ca") < col("cb") ||
        (col("ca") === col("cb") && col("id_a") < col("id_b")))
      .filter(vector.cosineSim(col("va"), col("vb")) >= eps)
      .select(col("id_b").as("id")).distinct()
    members
      .join(dropped.withColumn("__drop", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cluster_id"), col("centroid_sim"),
        col("__drop").isNull.as("kept"))
  }

  /**
   * Incremental (per-batch) SemDeDup against a standing corpus — the
   * admission-funnel form of [[semDedup]], the semantic-dedup analog of
   * [[DedupOps.incrementalNewDocs]]: centroids stay FIXED (the IVF
   * fixed-cells contract; refit is a scheduled bulk job), the corpus is
   * never re-judged, and each batch costs O(batch) probes of the
   * touched clusters only.
   *
   * Semantics — the arrival-ordered batch fold: every `corpus` vector
   * counts as EARLIER than every batch vector (regardless of its own
   * kept verdict — the paper thresholds the full upper-triangular
   * matrix, droppers included), and within the batch the [[semDedup]]
   * order applies (centroid-sim ascending rounded to 6, id tie-break).
   * A batch member is dropped iff some same-cluster earlier member
   * (corpus, or paper-earlier batch member) has cosine ≥ eps. With an
   * EMPTY corpus this is exactly [[semDedup]] of the batch; applied
   * batch-by-batch with the corpus grown by each batch's members
   * (kept AND dropped — the paper's earlier-set), it reproduces the
   * arrival-ordered global fold (spec-pinned). An admission pipeline
   * that discards dropped docs instead passes the admitted-only corpus:
   * the earlier-set is the caller's corpus, explicitly.
   *
   * Scale shape: both sides assign map-only over centroid literals; the
   * corpus side is cluster-pruned BEFORE its shuffle by a broadcast
   * semi-join on the batch's (tiny, ≤ |batch|) cluster-id set, so
   * standing members of untouched clusters never leave their scan. The
   * per-cluster pairwise block is corpus_c × batch_c — linear in the
   * standing members of touched clusters, never corpus².
   */
  def incremental(batch: DataFrame, corpus: DataFrame, centroids: DataFrame,
                  idCol: String, vecCol: String, centIdCol: String,
                  centVecCol: String, eps: Double): DataFrame = {
    require(eps > 0.0 && eps <= 1.0, s"eps must be in (0, 1]: $eps")
    val bm = assignMembers(batch, centroids, idCol, vecCol, centIdCol, centVecCol)
    val cm = assignMembers(corpus, centroids, idCol, vecCol, centIdCol, centVecCol)
    val b = bm.select(col("cluster_id"), col("id").as("id_b"),
      col("v").as("vb"), round(col("centroid_sim"), 6).as("cb"))
    // Corpus probe: prune to the batch's clusters before any exchange.
    val batchClusters = bm.select(col("cluster_id")).distinct()
    val aCorpus = cm.join(broadcast(batchClusters), Seq("cluster_id"), "left_semi")
      .select(col("cluster_id"), col("v").as("va"))
    val droppedByCorpus = aCorpus.join(b, "cluster_id")
      .filter(vector.cosineSim(col("va"), col("vb")) >= eps)
      .select(col("id_b").as("id"))
    // Batch-internal pairs: the semDedup order, restricted to the batch.
    val aBatch = bm.select(col("cluster_id"), col("id").as("id_a"),
      col("v").as("va"), round(col("centroid_sim"), 6).as("ca"))
    val droppedInBatch = aBatch.join(b, "cluster_id")
      .filter(col("ca") < col("cb") ||
        (col("ca") === col("cb") && col("id_a") < col("id_b")))
      .filter(vector.cosineSim(col("va"), col("vb")) >= eps)
      .select(col("id_b").as("id"))
    val dropped = droppedByCorpus.unionByName(droppedInBatch).distinct()
    bm.join(dropped.withColumn("__drop", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cluster_id"), col("centroid_sim"),
        col("__drop").isNull.as("kept"))
  }
}
