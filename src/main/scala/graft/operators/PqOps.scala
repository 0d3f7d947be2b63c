package graft.operators

import graft.functions.VectorMeanFast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product quantization (Jégou et al. 2011, "Product Quantization for
 * Nearest Neighbor Search") — the memory-compression scale path next to
 * [[QuantizeOps]]'s SQ8: the D-dim vector splits into `m` contiguous
 * subvectors, each encoded as the id of its nearest centroid in a
 * per-subspace codebook of `ksub` centroids. Storage per vector drops
 * from 4·D bytes (float32) to `m` code bytes — 32× at D=64, m=8 — which
 * is what makes a 100 TB embedding corpus fit an ANN serving tier at
 * all. (Reference analogue: the FAISS flat index at
 * batch-cluster-service.py:81 — PQ is the `IndexPQ`/`IVFPQ` family that
 * index becomes at scale.)
 *
 * Scale shape:
 *  - TRAINING is Lloyd's algorithm per subspace, but ALL `m` subspaces
 *    train in ONE job per iteration: the corpus explodes into
 *    (sub, subvec) rows once per pass, assignment to the current
 *    codebook is a map-only codegen projection over CENTROID LITERALS
 *    (the [[SemDedup]] idiom — m·ksub centroids are KBs, not a join),
 *    and the only exchange is the (sub, cid) mean aggregation whose
 *    map-side partials bound it at m·ksub rows per partition. The
 *    per-iteration driver collect is m·ksub·(D/m) doubles — bounded by
 *    construction, never corpus-sized.
 *  - ENCODE / RECONSTRUCT are pure column algebra over the codebook
 *    literal (argmin by L2 via array_position of the array_min — ties
 *    break to the lowest centroid id deterministically), whole-stage
 *    codegen, no UDF, no shuffle.
 *  - SEARCH over PQ codes reconstructs `codes → centroid concat` inside
 *    the scan projection and scores exact cosine against it. This
 *    computes EXACTLY the value the classical ADC lookup-table
 *    formulation computes (the per-subspace dot products are just
 *    evaluated inline instead of precomputed per query); the
 *    bytes-read win — the whole point of PQ — is identical, and the
 *    plan stays in whole-stage codegen.
 *
 * Determinism: init assigns subvector i of doc id to centroid
 * xxhash64(id, sub) mod ksub; every later step is argmin with
 * lowest-id tie-break. Centroid coordinates carry the usual last-ulp
 * jitter of parallel double summation, so downstream checks must be
 * threshold invariants (recall bands), not exact replays — the same
 * contract as [[IvfAnn.buildCells]].
 */
object PqOps {

  /** m-subspace split of a D-dim array column: element s is the
    * contiguous slice [s·D/m, (s+1)·D/m). D must divide by m. */
  private def subvectors(vec: Column, m: Int, dim: Int): Column = {
    val dsub = dim / m
    transform(sequence(lit(0), lit(m - 1)), s => slice(vec, s * dsub + 1, lit(dsub)))
  }

  /** The trained codebook: CB(s)(c) = centroid c of subspace s, each a
    * D/m-dim array<double>. Rides every expression as ONE codegen
    * reference object ([[graft.functions.PqKernels]]) — the former
    * nested literal was inlined verbatim into every consuming
    * expression (142 KB physical plans) and evaluated through
    * interpreted HOF lambdas. */
  type Codebook = Array[Array[Array[Double]]]

  /**
   * Train `m` per-subspace codebooks of `ksub` centroids by `iters`
   * Lloyd passes. One job per pass; the corpus-side work is map-only
   * assignment over the previous pass's centroid literals plus one
   * m·ksub-bounded mean aggregation. Empty cells (possible when ksub
   * exceeds the data's diversity in a subspace) keep their previous
   * centroid, so the codebook never shrinks.
   */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, ksub: Int, dim: Int, iters: Int = 3): Codebook = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val rows = corpus
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))
      .select(col("__id"), posexplode(subvectors(col("__v"), m, dim)).as(Seq("sub", "sv")))
      .localCheckpoint(true) // every Lloyd pass scans it
    def means(assigned: DataFrame): Map[(Int, Int), Array[Double]] =
      assigned.groupBy("sub", "cid").agg(VectorMeanFast(col("sv")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
        .toMap
    val dsub = dim / m
    var cb: Codebook = {
      val init = means(rows.withColumn("cid",
        pmod(xxhash64(col("__id"), col("sub")), lit(ksub.toLong)).cast("int")))
      Array.tabulate(m, ksub)((s, c) => init.getOrElse((s, c), Array.fill(dsub)(0.0)))
    }
    (1 to iters).foreach { _ =>
      val assigned = rows.withColumn("cid",
        graft.functions.pq.assignSub(col("sub"), col("sv"), cb))
      val upd = means(assigned)
      cb = Array.tabulate(m, ksub)((s, c) => upd.getOrElse((s, c), cb(s)(c)))
    }
    // `rows` is a local checkpoint: its blocks are not CacheManager
    // entries (an unpersist() here would be a silent no-op) — they free
    // when the checkpointed RDD is GC'd, i.e. when `rows` goes out of
    // scope on return.
    cb
  }

  /** PQ codes for `vec` under `cb`: array<tinyint> of length m, element
    * s = nearest centroid id in subspace s. Map-only codegen. ksub must
    * stay ≤ 128 so the tinyint storage claim is honest. */
  def encode(vec: Column, cb: Codebook, dim: Int): Column = {
    require(dim % cb.length == 0, s"dim $dim must divide into ${cb.length} subspaces")
    require(cb.forall(_.length <= 128), "ksub > 128 does not fit tinyint codes")
    graft.functions.pq.encode(vec, cb)
  }

  /** [[encode]] of (vec − cell) fused into one pass — the residual
    * encode ([[PqStore.encodeResiduals]]) without the intermediate
    * zip_with array. */
  def encodeResidual(vec: Column, cell: Column, cb: Codebook, dim: Int): Column = {
    require(dim % cb.length == 0, s"dim $dim must divide into ${cb.length} subspaces")
    require(cb.forall(_.length <= 128), "ksub > 128 does not fit tinyint codes")
    graft.functions.pq.encodeResidual(vec, cell, cb)
  }

  /** Reconstruction: concat of each subspace's coded centroid —
    * the vector ADC scores against. Map-only codegen. */
  def reconstruct(codes: Column, cb: Codebook): Column =
    graft.functions.pq.reconstruct(codes, cb)

  /** cell + [[reconstruct]](codes) in one pass — the ADC scan
    * projection of the residual-coded stores. */
  def reconstructAdd(codes: Column, cell: Column, cb: Codebook): Column =
    graft.functions.pq.reconstructAdd(codes, cell, cb)
}
