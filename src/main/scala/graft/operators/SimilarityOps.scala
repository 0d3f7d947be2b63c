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
   * Exactly ONE side is ever broadcast, and the caller picks which by
   * what is bounded in its workload:
   *  - `broadcastQueries = true` (default): few queries against a huge
   *    corpus (the ad-hoc J8 shape) — queries broadcast, corpus streams.
   *  - `broadcastQueries = false`: unbounded query set against a bounded
   *    corpus (all-users recommendation: every user profile vs the
   *    active-story centroids — the same boundedness assumption as the
   *    reference's in-memory FAISS index,
   *    recommendation-trainer.py:89-100) — corpus broadcast, profiles
   *    stream. The heap aggregation is map-side partial either way, so
   *    only k rows per query ever reach the shuffle.
   * Neither mode broadcasts an unbounded relation — and the "bounded"
   * assumption is ENFORCED, not assumed: if Catalyst's size estimate for
   * the to-be-broadcast side exceeds `spark.sql.autoBroadcastJoinThreshold`,
   * the join automatically re-routes through [[IvfAnn]] as a shuffled
   * cell-equi-join with nprobe = nlist — the exact same result, no
   * broadcast of an over-threshold relation, no driver/executor OOM.
   * (Callers who additionally want sublinear scan cost at huge scale call
   * [[IvfAnn]] directly with nprobe &lt; nlist and accept approximation.)
   *
   * @param queries  columns (idCol, vecCol)
   * @param corpus   columns (idCol, vecCol)
   * @param annNlist cell count for the no-broadcast fallback route
   */
  def knnJoinCosine(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, excludeSelf: Boolean = true,
                    broadcastQueries: Boolean = true, annNlist: Int = 32): DataFrame = {
    val bcSide = if (broadcastQueries) queries else corpus
    // "-1" (broadcast disabled) and unparseable values mean "no cap" here:
    // the explicit broadcast() hint below works regardless of the auto
    // threshold, so only a positive threshold gates the re-route.
    val thresholdBytes = scala.util.Try(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        bcSide.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")))
      .getOrElse(-1L)
    val bcBytes = bcSide.queryExecution.optimizedPlan.stats.sizeInBytes
    if (thresholdBytes > 0 && bcBytes > thresholdBytes) {
      // Over-threshold: exact kNN via full-probe IVF (shuffle, no broadcast).
      val cells = IvfAnn.buildCells(corpus, idCol, vecCol, nlist = annNlist)
      val withCells = IvfAnn.assignCells(corpus, idCol, vecCol, cells)
      return IvfAnn.annSearch(queries, withCells, cells, idCol, vecCol, k,
        nprobe = annNlist, excludeSelf = excludeSelf)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val cond = if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)
    val joined = if (broadcastQueries) c.join(broadcast(q), cond)
                 else q.join(broadcast(c), cond)
    val pairs = joined
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
   * Hard-negative mining for contrastive training (the in-batch /
   * cross-batch negatives of SimCLR / DPR / sentence-transformer
   * pipelines): for each anchor, the top-k most similar corpus vectors
   * carrying a DIFFERENT label — the negatives closest to the decision
   * boundary, where the gradient signal lives. Easy negatives (random
   * different-label picks) are what a uniform sampler gives; this
   * returns the hard ones.
   *
   * Scale shape: mining runs per anchor BATCH (a training batch, not
   * the corpus) — the anchor side broadcasts with its vectors and
   * labels into one map-side pass over the corpus, the label-mismatch
   * predicate prunes pairs before the cosine kernel, and the per-anchor
   * top-k is the bounded-heap [[graft.functions.TopK]] on
   * 6-decimal-rounded scores (id tie-break). Nothing corpus-sized
   * shuffles but the (anchor, candidate) partial heaps.
   */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame =
    minePairs(anchors, corpus, idCol, vecCol, labelCol, k,
      sameLabel = false, outCol = "negative_id")

  /** Positive-pair mining — the complement of [[hardNegatives]] a
    * contrastive-training export needs alongside the negatives: per
    * anchor, the top-k most-similar SAME-label vectors (self excluded).
    * Identical broadcast map-side shape; only the label predicate
    * flips. */
  def positivePairs(anchors: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame =
    minePairs(anchors, corpus, idCol, vecCol, labelCol, k,
      sameLabel = true, outCol = "positive_id")

  private def minePairs(anchors: DataFrame, corpus: DataFrame, idCol: String,
                        vecCol: String, labelCol: String, k: Int,
                        sameLabel: Boolean, outCol: String): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    val q = anchors.select(col(idCol).as("anchor_id"),
      col(vecCol).cast("array<double>").as("__qv"), col(labelCol).as("__ql"))
    val c = corpus.select(col(idCol).as(outCol),
      col(vecCol).cast("array<double>").as("__cv"), col(labelCol).as("__cl"))
    val cond =
      if (sameLabel) col("__ql") === col("__cl") && col("anchor_id") =!= col(outCol)
      else col("__ql") =!= col("__cl")
    c.join(broadcast(q), cond)
      .select(col("anchor_id"), col(outCol),
        round(vector.cosineSim(col("__qv"), col("__cv")), 6).as("sim"))
      .groupBy(col("anchor_id"))
      .agg(TopK(k)(col("sim"), col(outCol)).as("nn"))
      .select(col("anchor_id"), posexplode(col("nn")).as(Seq("rank", "n")))
      .select(col("anchor_id"), col("n.id").as(outCol),
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
   * hyperplane derived from md5 bits (oracle-reproducible). Vectors with
   * high cosine similarity agree on most bits; bucketing sketches (or
   * banding them) yields near-dup candidates without any pairwise scan —
   * the cosine analogue of the MinHash/LSH path, and an alternative to
   * IVF probing. Codegen kernel, map-only; the nbits-wide sketch is all
   * that ever shuffles.
   */
  def cosineSketch(vec: Column, nbits: Int = 16): Column =
    graft.functions.sig.cosineSketch(vec.cast("array<double>"), nbits)

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

  /**
   * All pairs (a&lt;b) with cosine similarity ≥ threshold, via an EXACT
   * epsilon-grid self-join (candidates-then-verify — never an all-pairs
   * broadcast): cos(a,b) ≥ t implies the L2-normalized vectors satisfy
   * ‖â−b̂‖ ≤ w = √(2−2t), so each of the first `gridDims` unit-vector
   * coordinates differs by less than one cell of width w. Every vector
   * lands in its home grid cell; one side is additionally replicated to
   * the lexicographically-positive half of the {−1,0,1}^d neighbor
   * offsets, so each qualifying pair meets on EXACTLY one (cell) key —
   * a plain shuffled equi-join (no cross product, nothing broadcast),
   * then the exact cosine kernel verifies. Output is provably identical
   * to brute force (pinned by a spec); the grid only prunes.
   *
   * Scale: shuffle volume is (1 + (3^d+1)/2)·n vector copies keyed by
   * cell. At near-dup thresholds (t ≥ 0.8 ⇒ w ≤ 0.63) cells are small
   * and pruning is aggressive; at loose thresholds it degrades to a
   * hash-join pair enumeration — still never a BroadcastNestedLoopJoin.
   */
  def nearDupByCosine(vecs: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, gridDims: Int = 2): DataFrame = {
    // t ≤ 0 degenerates the cell-width bound (w ≥ √2 covers the whole
    // sphere) and breaks the zero-vector argument below — refuse loudly.
    require(threshold > 0.0, s"nearDupByCosine needs threshold > 0, got $threshold")
    // Slightly inflated cell width absorbs fp jitter at cell boundaries so
    // a true-qualifying pair can never straddle two cells per coordinate.
    val w = math.sqrt(math.max(2.0 - 2.0 * threshold, 1e-12)) * (1.0 + 1e-9)
    val nvd = vector.l2Normalize(col("v").cast("array<double>"))
    // Vectors shorter than gridDims grid on 0.0 for the missing
    // coordinates — EXACT, not approximate, because the cosine kernel
    // zero-pads the shorter operand (dot over min length), so a short
    // vector truly sits at 0 in those dimensions. Zero-norm vectors pass
    // through l2Normalize unchanged (all-zero coords → home cell) and
    // every cosine against them is 0.0 < threshold, matching brute force.
    val pts = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nv", nvd)
      .select(Seq(col("id"), col("v")) ++
        (0 until gridDims).map(i =>
          floor(coalesce(try_element_at(col("nv"), lit(i + 1)), lit(0.0)) / w).cast("int").as(s"c$i")): _*)
    def key(cs: Seq[Column]): Column = struct(cs.zipWithIndex.map { case (c, i) => c.as(s"k$i") }: _*)
    val home = pts.select(col("id").as("id_l"), col("v").as("v_l"),
      key((0 until gridDims).map(i => col(s"c$i"))).as("key"))
    // zero offset + lexicographically-positive half of {-1,0,1}^gridDims:
    // each unordered pair meets on exactly one key (same-cell pairs are
    // ordered by id instead).
    val offsets = Seq.fill(gridDims)(Seq(-1, 0, 1))
      .foldLeft(Seq(Seq.empty[Int]))((acc, ds) => for (a <- acc; x <- ds) yield a :+ x)
      .filter(o => o.dropWhile(_ == 0).headOption.forall(_ > 0))
    val repl = pts.select(col("id").as("id_r"), col("v").as("v_r"),
        explode(array(offsets.map(o => struct(
          key((0 until gridDims).map(i => col(s"c$i") + lit(o(i)))).as("key"),
          lit(o.forall(_ == 0)).as("zero"))): _*)).as("x"))
      .select(col("id_r"), col("v_r"), col("x.key").as("key"), col("x.zero").as("zero"))
    home.join(repl, "key")
      .filter(!col("zero") || col("id_l") < col("id_r"))
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        vector.cosineSim(col("v_l"), col("v_r")).as("sim"))
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
