package graft.operators

import graft.functions.VectorMeanFast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * IVF-style approximate nearest-neighbor search: the corpus is coarsely
 * partitioned into nlist cells (here: by KMeans over a sample, or any
 * precomputed cell id); a query probes only the nprobe nearest cells, so
 * the scan touches nprobe/nlist of the corpus instead of all of it —
 * the scale path next to [[SimilarityOps.knnJoinCosine]]'s exact
 * brute force. (Reference analogue: the FAISS flat index,
 * batch-cluster-service.py:81 — flat = exact; IVF is what that index
 * becomes at 100 TB.)
 */
object IvfAnn {

  /** Assign each corpus vector to its nearest of the given cell centroids. */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame): DataFrame =
    SimilarityOps.assignNearestCentroid(corpus, centroids, idCol, vecCol,
        "cell_id", "cell_vec", threshold = -2.0)
      .select(col("item_id").as(idCol), col("assigned_id").as("cell"))
      .join(corpus, idCol)

  /** Build nlist cell centroids by k-means over the corpus (one pass via
    * our vector-mean aggregate after a seeded random init assignment). */
  def buildCells(corpus: DataFrame, idCol: String, vecCol: String,
                 nlist: Int, iters: Int = 3): DataFrame = {
    // Deterministic init: cell = xxhash64(id) mod nlist; then Lloyd steps
    // expressed as (assign → vector-mean) DataFrame passes. The corpus
    // projection is cached across iterations (each Lloyd step scans it);
    // per-step cell tables are tiny (nlist rows) and get broadcast by the
    // assignment's crossJoin.
    val base = corpus.select(col(idCol).as("item_id"), col(vecCol).cast("array<double>").as("v"))
      .cache()
    var cells = base
      .withColumn("cell_id", pmod(xxhash64(col("item_id")), lit(nlist.toLong)))
      .groupBy("cell_id")
      .agg(VectorMeanFast(col("v")).as("cell_vec"))
    // Lloyd step: assign (ids + sim only through the argmax shuffle),
    // then join the ids back to the cached base for the means. A fused
    // single-aggregation variant that carries vectors through the
    // per-item groupBy was measured SLOWER (vectors are the heavy shuffle
    // payload; ids are not) — keep the two-stage shape.
    (1 to iters).foreach { _ =>
      val assigned = SimilarityOps.assignNearestCentroid(
        base, cells, "item_id", "v", "cell_id", "cell_vec", threshold = -2.0)
      cells = assigned.join(base, "item_id")
        .groupBy(col("assigned_id").as("cell_id"))
        .agg(VectorMeanFast(col("v")).as("cell_vec"))
    }
    // Materialize the finished cell table as a local relation — it is
    // nlist rows by construction (the caller sizes nlist; even at 100 TB
    // scale it is O(√n) centroids, MBs not GBs) — so the corpus cache can
    // be released here and nothing stays pinned in the block manager.
    val spark = corpus.sparkSession
    val rows = cells.collect()
    base.unpersist()
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), cells.schema)
  }

  /**
   * ANN top-k: probe the nprobe nearest cells per query, brute-force only
   * inside those cells. Output shape matches knnJoinCosine. With
   * nprobe = nlist this is EXACT — the same result as brute force,
   * computed as a shuffled cell-equi-join instead of a broadcast
   * (queries replicate nprobe ways; the corpus shuffles once by cell).
   *
   * @param excludeSelf drop query_id == neighbor_id matches — only
   *        meaningful for corpus-vs-itself searches; keep false when the
   *        two id domains differ (see knnJoinCosine).
   */
  def annSearch(queries: DataFrame, corpusWithCells: DataFrame, cells: DataFrame,
                idCol: String, vecCol: String, k: Int, nprobe: Int,
                excludeSelf: Boolean = true): DataFrame = {
    // 1. query → nprobe candidate cells (tiny broadcast cross join).
    val qCells = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .crossJoin(broadcast(cells))
      .select(col("query_id"), col("qv"), col("cell_id"),
        graft.functions.vector.cosineSim(col("qv"), col("cell_vec")).as("csim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(desc("csim"), col("cell_id"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell_id").as("cell"))
    // 2. scan only the probed cells (equi-join on cell), top-k via the
    //    bounded-heap aggregate (map-side partial top-k), keyed by the
    //    corpus id type (same dispatch as knnJoinCosine).
    val topk = corpusWithCells.schema(idCol).dataType match {
      case org.apache.spark.sql.types.StringType => graft.functions.TopKStr(k)
      case _ => graft.functions.TopK(k)
    }
    qCells.join(corpusWithCells.select(col("cell"),
          col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv")), "cell")
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.vector.cosineSim(col("qv"), col("cv")).as("sim"))
      .groupBy("query_id")
      .agg(topk(col("sim"), col("neighbor_id")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("rk", "n")))
      .select(col("query_id"), col("n.id").as("neighbor_id"),
        col("n.score").as("sim"), (col("rk") + 1).as("rank"))
  }
}
