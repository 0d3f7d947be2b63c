package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One incoming item for online assignment. */
case class Incoming(id: String, vec: Array[Double])
/** A story's running state: centroid and member count (for running mean). */
case class StoryState(storyId: String, centroid: Array[Double], n: Long)
/** Assignment result row. */
case class Assigned(id: String, storyId: String, sim: Double, isNew: Boolean)
/** Result of a candidate-pruned assignment batch: assigned rows, the MERGE
  * delta of story state, and the sizes that make pruning power OBSERVABLE —
  * `nCandidates` ≈ the story count means the grid has stopped
  * discriminating (see the operating-envelope note on
  * [[OnlineClustering.processBatchPruned]]) and the job should refresh or
  * widen its projection basis. */
case class PrunedBatch(assigned: DataFrame, storyDelta: DataFrame,
                       nCandidates: Long, nBatch: Long)

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
   *
   * SCALE CEILING (use [[processBatchPruned]] instead): this form also
   * collects the ENTIRE story table per micro-batch — fine at the
   * reference's scale, a driver OOM when stories reach millions. Kept as
   * the semantic baseline the pruned form is proven against.
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

  // ── Candidate-pruned fold (the 100 TB-scale form of ST4) ────────────────
  //
  // The sequential fold is the reference's semantics and cannot be
  // distributed, but its CANDIDATE SET can be pruned distributedly: only
  // stories whose centroid can reach cosine ≥ threshold against some batch
  // vector can influence any assignment decision, and the epsilon-grid
  // bound (SimilarityOps.nearDupByCosine) finds exactly those — cos(a,s)
  // ≥ t implies the L2-normalized vectors differ by < w = √(2−2t) in
  // every coordinate, so the story's home grid cell lies within the
  // {−1,0,1}^d neighborhood of the batch vector's cell. Stories outside
  // the batch's cell neighborhood provably cannot clear the threshold.
  //
  // Equivalence to the full fold (spec-pinned in StreamingSpec):
  //  - a non-candidate story has cos < threshold to EVERY batch vector
  //    (its centroid never moves mid-batch: it can never win an
  //    assignment, because any candidate beating threshold outranks it),
  //    so the argmax decision and every centroid trajectory are identical;
  //  - new stories created mid-batch live in the fold's own state either
  //    way. The only divergence is the diagnostic `sim` on isNew rows:
  //    the full fold reports the global best (still < threshold), the
  //    pruned fold the best CANDIDATE (−2.0 when none) — assignments,
  //    story ids, centroids and counts are exactly equal.
  //
  // Scale shape: the story table is filtered map-side on its home cell
  // against the (small, broadcast-as-literal) batch cell neighborhood and
  // only the survivors are collected; the returned state is the DELTA
  // (changed + created stories) for a MERGE, so untouched stories never
  // leave the executors in either direction. With the default key-hash
  // TableSink the prefilter is a scan-and-drop; laying the table out by
  // the STICKY creation cell (TableSink `layoutCol` = [[cellKey]],
  // radius-2 read under the ±1-drift re-homing invariant — see
  // docs/PLANS.md) turns it into file-level pruning.
  //
  // OPERATING ENVELOPE — when does the exact prefilter actually prune?
  // Recall is always exact, but DISCRIMINATION needs the cell width
  // w = √(2−2t) to be comparable to the per-coordinate spread of the
  // normalized centroids in the gridded coordinates (≈ 1/√d for
  // isotropic d-dim embeddings). At (t = 0.8, d = 64): w ≈ 0.63 vs
  // spread ≈ 0.13 — every vector lands in the same few cells, the
  // filter keeps ~everything, and the fold safely degenerates to the
  // full-table collect of processBatch (correct, but the driver ceiling
  // returns). Remedies, in order:
  //  (a) true near-dup thresholds (t ≥ 0.95) shrink w into the
  //      discriminating range;
  //  (b) pass `basis`: grid on projections onto ≤-unit-norm directions
  //      that CONCENTRATE variance (PCA of the story centroids,
  //      refreshed offline). |h·(â−b̂)| ≤ ‖h‖‖â−b̂‖ ≤ w, so the
  //      per-coordinate bound — and with it exact recall — survives any
  //      such projection, while real-world (anisotropic) embeddings
  //      regain spread in the leading components;
  //  (c) for genuinely isotropic embeddings at moderate thresholds NO
  //      exact prefilter can discriminate (concentration of measure) —
  //      that regime needs the approximate sketch path plus the batch
  //      refinement loop to re-merge any stories split by a recall miss.

  /** Cell width for cosine threshold t (mirrors nearDupByCosine: inflated
    * 1e-9 so fp jitter cannot push a true-qualifying pair out of the
    * neighborhood). */
  private def cellWidth(threshold: Double): Double =
    math.sqrt(math.max(2.0 - 2.0 * threshold, 1e-12)) * (1.0 + 1e-9)

  /** Enforce the Cauchy-Schwarz precondition: every projection
    * direction must have L2 norm ≤ 1, or the per-coordinate bound (and
    * with it exact recall) silently breaks. */
  private def requireUnitBounded(basis: Seq[Array[Double]]): Unit =
    basis.zipWithIndex.foreach { case (h, i) =>
      val n = math.sqrt(h.map(x => x * x).sum)
      require(n <= 1.0 + 1e-9, s"basis($i) norm $n > 1 would break exact recall")
    }

  /** Driver-side home cell of a vector: floor over the cell width of
    * either the first gridDims coords of the L2-normalized vector
    * (empty basis) or its projections onto the basis directions.
    * Missing coords sit at 0, zero-norm vectors pass through
    * unnormalized — the exact convention of the Spark-side expression
    * below. */
  private[graft] def homeCell(v: Array[Double], threshold: Double, gridDims: Int,
                              basis: Seq[Array[Double]] = Nil): Seq[Int] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(s)
    def nv(d: Int): Double =
      if (d < v.length) { if (nrm == 0.0) v(d) else v(d) / nrm } else 0.0
    val w = cellWidth(threshold)
    if (basis.isEmpty)
      (0 until gridDims).map(d => math.floor(nv(d) / w).toInt)
    else
      basis.map { h =>
        var dot = 0.0; var j = 0
        while (j < h.length && j < v.length) { dot += nv(j) * h(j); j += 1 }
        math.floor(dot / w).toInt
      }
  }

  /** The {−radius..radius}^dims neighborhood of every batch vector's
    * home cell. At the default radius 1 this is the complete set of
    * cells a ≥-threshold story can live in; radius 2 is the STICKY-cell
    * superset a value-addressable layout reads (a story whose centroid
    * has drifted at most one cell from its creation-time cell — the
    * re-homing invariant in docs/PLANS.md — has its sticky cell within
    * one more cell of its current one). */
  private[graft] def candidateCells(batch: Seq[Incoming], threshold: Double,
                                    gridDims: Int,
                                    basis: Seq[Array[Double]] = Nil,
                                    radius: Int = 1): Set[Seq[Int]] = {
    val dims = if (basis.nonEmpty) basis.length else gridDims
    val offsets = Seq.fill(dims)((-radius to radius).toSeq)
      .foldLeft(Seq(Seq.empty[Int]))((acc, ds) => for (a <- acc; x <- ds) yield a :+ x)
    batch.iterator.flatMap { a =>
      val home = homeCell(a.vec, threshold, gridDims, basis)
      offsets.map(o => home.zip(o).map { case (c, d) => c + d })
    }.toSet
  }

  /** Public form of the Spark-side home-cell key — the column a
    * value-addressable stories layout stores as its STICKY creation
    * cell ([[graft.sources.TableSink]] `layoutCol`) and the predicate
    * column the pruned prefilter compares against candidate cells. */
  def cellKey(vecCol: Column, threshold: Double, gridDims: Int,
              basis: Seq[Array[Double]] = Nil): Column =
    cellKeyExpr(vecCol, threshold, gridDims, basis)

  /** Spark-side home-cell key of a centroid column (same math as
    * [[homeCell]]: raw leading coords, or basis projections via the
    * codegen dot-product kernel against literal direction arrays). */
  private def cellKeyExpr(vecCol: Column, threshold: Double, gridDims: Int,
                          basis: Seq[Array[Double]]): Column = {
    val w = cellWidth(threshold)
    val nv = graft.functions.vector.l2Normalize(vecCol.cast("array<double>"))
    // coalesce in BOTH paths: a null centroid must yield the well-formed
    // all-zero key (like the raw path), not a concat_ws-shortened key
    // that silently excludes the row from every candidate set.
    val coords: Seq[Column] =
      if (basis.isEmpty)
        (0 until gridDims).map(i => coalesce(try_element_at(nv, lit(i + 1)), lit(0.0)))
      else
        basis.map(h =>
          coalesce(graft.functions.vector.dotProduct(nv, lit(h)), lit(0.0)))
    concat_ws(",", coords.map(c => floor(c / w).cast("int").cast("string")): _*)
  }

  /**
   * Turnkey projection basis for [[processBatchPruned]]: the leading k
   * principal directions of the L2-normalized story centroids. PCA
   * directions are unit vectors, so the Cauchy-Schwarz precondition
   * holds by construction, and they concentrate the centroids' variance
   * — exactly what the grid needs to discriminate in high dimensions.
   * Run OFFLINE / every N batches (one MLlib job over the stories
   * table), not per trigger; the basis only needs to track the corpus's
   * slow-moving covariance, and a stale basis costs pruning power, never
   * correctness.
   */
  def storyBasis(stories: DataFrame, vecCol: String, k: Int): Seq[Array[Double]] = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    // Cold start: no stories yet → no basis. Callers fall back to the
    // raw-coordinate grid (correct, just non-discriminating) instead of
    // an opaque empty-iterator crash from first()/PCA.fit. The probed
    // dimension is null-safe (size(null) is null, not an int) and rows
    // with null/empty centroids are excluded BOTH from the probe and
    // from the PCA fit — consistent with cellKeyExpr, which grids null
    // centroids on the all-zero key rather than crashing.
    // ≥ 2 rows required: MLlib's covariance (and any meaningful variance
    // direction) needs more than one observation — a 1-story corpus runs
    // the raw grid until it grows, it must not kill the stream.
    val head = stories
      .select(coalesce(size(col(vecCol)), lit(0)).as("d"))
      .filter(col("d") > 0).limit(2).collect()
    if (head.length < 2) return Nil
    val nv = stories
      .filter(coalesce(size(col(vecCol)), lit(0)) > 0)
      .select(array_to_vector(
        graft.functions.vector.l2Normalize(col(vecCol).cast("array<double>"))).as("v"))
    val kk = math.min(k, head(0).getInt(0))
    val model = new PCA().setInputCol("v").setOutputCol("p").setK(kk).fit(nv)
    // pc is dim × k column-major; column j is the j-th direction.
    // Renormalize defensively: eigenvectors are unit only up to fp noise,
    // and requireUnitBounded enforces ≤ 1 + 1e-9 — make the "holds by
    // construction" claim actually true.
    val pc = model.pc
    (0 until kk).map { j =>
      val h = Array.tabulate(pc.numRows)(i => pc(i, j))
      val n = math.sqrt(h.map(x => x * x).sum)
      if (n > 0.0) h.map(_ / n) else h
    }
  }

  /**
   * The scale form of [[processBatch]]: identical assignments, but only
   * the candidate stories (batch cell neighborhood, exact recall at the
   * threshold) are collected, and the returned story frame is the MERGE
   * DELTA — stories whose state changed plus stories created this batch.
   *
   * @param basis optional ≤-unit-norm projection directions to grid on
   *              instead of raw leading coordinates — REQUIRED for the
   *              filter to discriminate on high-dimensional embeddings
   *              at moderate thresholds (see the operating-envelope note
   *              above; PCA directions of the story centroids are the
   *              natural choice). Exact recall holds for any such basis.
   * @return assigned rows, the changed-or-new story state to upsert, and
   *         the candidate/batch sizes (for pruning observability)
   */
  def processBatchPruned(batch: DataFrame, stories: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, batchEpoch: Long,
                         gridDims: Int = 2,
                         basis: Seq[Array[Double]] = Nil): PrunedBatch = {
    // Validate BEFORE the driver collect: a misconfigured call must fail
    // immediately, not after a full batch materialization.
    require(threshold > 0.0, s"pruned ST4 needs threshold > 0, got $threshold")
    requireUnitBounded(basis)
    prunedFold(collectBatch(batch, idCol, vecCol), stories, threshold,
      batchEpoch, gridDims, basis)
  }

  /** Driver-side collect of a micro-batch's (id, vector) pairs — bounded
    * by the trigger interval (the same working set the reference's
    * consumer holds). Exposed so a storage-aware caller can compute the
    * batch's candidate cells BEFORE deciding which story files to read
    * ([[graft.streaming.StreamingJob]]'s bucket-pruned path) without
    * collecting twice. */
  private[graft] def collectBatch(batch: DataFrame, idCol: String,
                                  vecCol: String): Seq[Incoming] = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col(idCol).cast("string"),
        col(vecCol).cast("array<double>")).as[(String, Seq[Double])]
      .collect().iterator.map { case (i, v) => Incoming(i, v.toArray) }.toSeq
  }

  /** [[processBatchPruned]] after the batch collect: prefilter the story
    * frame to the radius-1 candidate cells (exact at the threshold),
    * collect only those, run the sequential fold. `stories` may itself
    * be a bucket-pruned superset read ([[candidateCells]] radius 2 under
    * the sticky-cell invariant) — the row-level cell predicate here is
    * what makes that read exact. */
  private[graft] def prunedFold(in: Seq[Incoming], stories: DataFrame,
                                threshold: Double, batchEpoch: Long,
                                gridDims: Int,
                                basis: Seq[Array[Double]]): PrunedBatch = {
    require(threshold > 0.0, s"pruned ST4 needs threshold > 0, got $threshold")
    requireUnitBounded(basis)
    val spark = stories.sparkSession
    import spark.implicits._
    val cells = candidateCells(in, threshold, gridDims, basis)
      .map(_.mkString(","))
    // Map-only candidate filter: home-cell membership against the
    // (bounded: ≤ 3^d · |batch|) batch cell neighborhood; nothing
    // shuffles on the story side and non-candidates are dropped at the
    // scan. Small neighborhoods inline as an InSet predicate; large ones
    // ride a broadcast semi-join so the plan never carries a 10^5-literal
    // expression.
    val key = cellKeyExpr(col("centroid"), threshold, gridDims, basis)
    val prefiltered =
      if (cells.size <= 1000) stories.filter(key.isin(cells.toSeq: _*))
      else stories.join(
        broadcast(cells.toSeq.toDF("__cell")), key === col("__cell"), "leftsemi")
    val candidates = prefiltered
      .select(col("story_id"), col("centroid").cast("array<double>"), col("n"))
      .as[(String, Seq[Double], Long)]
      .collect().map { case (s, c, n) => StoryState(s, c.toArray, n) }
    val (assigned, newState) = foldBatch(in.toSeq, candidates.toSeq, threshold,
      i => s"story-$batchEpoch-$i")
    // Delta: n increments on every absorbed article, so a changed story is
    // exactly one whose n differs from its candidate snapshot (new stories
    // have no snapshot).
    val before = candidates.map(s => s.storyId -> s.n).toMap
    val delta = newState.filter(s => !before.get(s.storyId).contains(s.n))
    PrunedBatch(
      spark.createDataFrame(assigned.toIndexedSeq).toDF(),
      spark.createDataFrame(delta.map(s => (s.storyId, s.centroid.toSeq, s.n)).toIndexedSeq)
        .toDF("story_id", "centroid", "n"),
      nCandidates = candidates.length.toLong,
      nBatch = in.length.toLong)
  }
}
