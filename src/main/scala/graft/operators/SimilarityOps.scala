package graft.operators

import graft.functions.{vector, TopK, TopKStr}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity-join operators: exact brute-force kNN (the reference's FAISS
 * IndexFlatL2 / flat-cosine searches, recommendation-trainer.py:89-100),
 * nearest-centroid assignment (duplication_service.py:74-92), and
 * embedding-cosine near-duplicate detection.
 *
 * Scale design: the small side (queries / centroids) is broadcast, the big
 * corpus side stays partitioned — the similarity compute is a map-only
 * stage. Top-k reduction uses a bounded-heap aggregate so only k candidates
 * per query per partition reach the shuffle (vs. a window-rank over the
 * full Q×C cross product) — the classic distributed block-partial-top-k /
 * merge pattern (cf. REPOSE, ICDE 2021, and the top-k similarity-search
 * line in PAPERS.md). For the set-similarity join we evaluated PPJoin-style
 * prefix filtering; with the reference workload's tiny sets (~4 members)
 * the prefix is nearly the whole set, so the direct member-equi-join wins —
 * revisit if member sets grow.
 */
object SimilarityOps {

  /**
   * Exact top-k cosine neighbors for each query vector against the corpus.
   * Output: (queryIdOut, neighborId, sim) — k rows per query, ordered
   * sim desc with id-asc tie-break.
   *
   * @param queries  small side (broadcast), columns (idCol, vecCol)
   * @param corpus   big side (stays partitioned), columns (idCol, vecCol)
   */
  def knnJoinCosine(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val pairs = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        vector.cosineSim(col("qv"), col("cv")).as("sim"))
    // Bounded-heap aggregate keyed by the corpus id type.
    val topk = corpus.schema(idCol).dataType match {
      case org.apache.spark.sql.types.StringType => TopKStr(k)
      case _ => TopK(k)
    }
    pairs.groupBy("query_id")
      .agg(topk(col("sim"), col("neighbor_id")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("rank", "n")))
      .select(col("query_id"), col("n.id").as("neighbor_id"),
        col("n.score").as("sim"), (col("rank") + 1).as("rank"))
  }

  /**
   * Nearest-centroid assignment with threshold (reference J1 batch form):
   * each item joins the centroid of max cosine similarity; below-threshold
   * items get assignedId = -1 ("new story" in the reference). Centroids are
   * broadcast (they are few); argmax via max_by — a single map-side-partial
   * aggregation, no window shuffle of the cross product.
   */
  def assignNearestCentroid(items: DataFrame, centroids: DataFrame,
                            itemId: String, itemVec: String,
                            centId: String, centVec: String,
                            threshold: Double): DataFrame = {
    // Cast both sides to array<double>: the cosine kernel dispatches on the
    // LEFT child's element type, so mixed float/double inputs must align.
    val pairs = items.select(col(itemId).as("item_id"), col(itemVec).cast("array<double>").as("iv"))
      .crossJoin(broadcast(centroids.select(col(centId).as("cent_id"), col(centVec).cast("array<double>").as("cv"))))
      .select(col("item_id"), col("cent_id"),
        vector.cosineSim(col("iv"), col("cv")).as("sim"))
    pairs.groupBy("item_id")
      .agg(max(struct(col("sim"), (-col("cent_id")).as("neg_id"))).as("best"))
      .select(col("item_id"),
        when(col("best.sim") >= threshold, -col("best.neg_id")).otherwise(-1L).as("assigned_id"),
        col("best.sim").as("sim"))
  }

  /**
   * Random-hyperplane (signed random projection) sketch for cosine LSH
   * (Charikar, 2002): bit j = sign(v · h_j) with h_j a deterministic ±1
   * hyperplane derived from xxhash64(j, i). Vectors with high cosine
   * similarity agree on most bits; bucketing sketches (or banding them)
   * yields near-dup candidates without any pairwise scan — the cosine
   * analogue of the MinHash/LSH path, and an alternative to IVF probing.
   * Map-only column expression; the nbits-wide sketch is all that ever
   * shuffles.
   */
  def cosineSketch(vec: Column, nbits: Int = 16): Column = {
    val bits = (0 until nbits).map { j =>
      // v · h_j folded in one pass; h_j component i = ±1 from hash(j,i)
      val dot = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            i => when(pmod(xxhash64(lit(j), i), lit(2L)) === 0L, 1.0).otherwise(-1.0)),
          (v, h) => v * h),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1), j)).otherwise(0)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /**
   * Candidate near-dup pairs via cosine-sketch buckets: exact-sketch
   * collisions (plus optional verification by true cosine). With nbits=16
   * two vectors at cosine θ collide with prob (1 − θ_angle/π)^16.
   */
  def sketchCandidatePairs(vecs: DataFrame, idCol: String, vecCol: String,
                           nbits: Int = 16): DataFrame = {
    val sk = vecs.select(col(idCol).as("id"),
      cosineSketch(col(vecCol).cast("array<double>"), nbits).as("sk"))
    sk.groupBy("sk").agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
  }

  /** All pairs (a<b) with cosine similarity ≥ threshold (near-dup by embedding). */
  def nearDupByCosine(vecs: DataFrame, idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), vector.cosineSim(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /**
   * Set-overlap (Jaccard) join between two grouped-membership relations
   * (reference J6, batch-cluster-service.py:45-70): |∩| via equi-join on
   * members — never a cross product — and |∪| = |A|+|B|−|∩|.
   * Inputs: (groupCol, memberCol) pairs, one row per membership.
   */
  def jaccardJoin(left: DataFrame, right: DataFrame, groupL: String,
                  groupR: String, member: String, threshold: Double): DataFrame = {
    val sizeL = left.groupBy(groupL).agg(count(lit(1)).as("size_l"))
    val sizeR = right.groupBy(groupR).agg(count(lit(1)).as("size_r"))
    val inter = left.join(right, member)
      .groupBy(groupL, groupR).agg(count(lit(1)).as("inter"))
    inter.join(sizeL, groupL).join(sizeR, groupR)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_l") + col("size_r") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col(groupL), col(groupR), col("inter"), col("size_l"), col("size_r"), col("jaccard"))
  }
}
