package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics over the corpus's domain graph — the web-scale
 * quality signal every crawl-derived training set weights by (Common
 * Crawl publishes exactly this: a per-domain PageRank used to
 * prioritize fetches and downweight link farms; cf. Page et al. 1999).
 *
 * [[pageRankFixedPoint]] runs PageRank in FIXED-POINT INTEGER
 * arithmetic: ranks are longs scaled by `scale`, every division is
 * floor division, every sum is a sum of longs. Two reasons, both
 * scale-bred:
 *  - determinism: a double-summed rank depends on partial-sum order
 *    (changes with partitioning, AQE, retry), so a float PageRank can
 *    never hash-match an oracle or its own re-run; long sums are
 *    order-independent, so these ranks are bit-identical across
 *    partitionings, engines, and the DuckDB replay;
 *  - exactness: all intermediates stay < 2^63 by construction
 *    (85 · scale=1e9 ≈ 8.5e10), no rounding drift across iterations.
 *
 * Shuffle shape per iteration: one join of the edge list with the
 * node-count-sized rank frame on `src` (domain-keyed — at web scale
 * ~1e8 domains, far under the doc count), one sum-by-`dst`, one
 * 1-row dangling aggregate broadcast back. Ranks and out-degrees are
 * node-sized and localCheckpoint between iterations (the MLlib
 * iterative idiom: flat lineage, node-sized storage); the edge list is
 * deliberately NOT checkpointed — re-scanning the source relation
 * `iters` times beats materializing a corpus-sized edge copy.
 */
object GraphOps {

  /**
   * Fixed-point PageRank over an edge list (`src`, `dst` — a multigraph:
   * parallel edges weight the link proportionally). Returns one row per
   * node: (node, rank_fp) with rank_fp ≈ rank · scale.
   *
   * Per iteration, with N = node count and d = 85/100:
   *   contrib(v) = Σ over in-edges (u,v) of  rank(u) div outdeg(u)
   *   dangling   = Σ rank(u) over nodes with no out-edges
   *   rank'(v)   = (15·scale div 100) div N
   *              + (85 · contrib(v)) div 100
   *              + (85 · (dangling div N)) div 100
   * — every operation floor/long, so the DuckDB oracle replays the
   * exact longs.
   */
  def pageRankFixedPoint(edges: DataFrame, iters: Int = 3,
                         scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(scale >= 1 && scale <= (Long.MaxValue / 100),
      s"scale out of the exact-arithmetic envelope: $scale")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("__od")).localCheckpoint(true)
    val teleport = (scale * 15L / 100L) / n

    var ranks = nodes.select(col("node"), lit(scale / n).as("rank_fp"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      // Per-edge contribution: floor(rank(src) / outdeg(src)); summed by
      // dst. The rank frame is node-sized — broadcastable at domain
      // counts, and AQE picks that; the join key is `src`, never a doc id.
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          expr("rank_fp div __od").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__contrib"))
      // Dangling mass: rank held by nodes with no out-edges, folded to
      // one row and broadcast back (never a driver round-trip).
      val dangling = ranks
        .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank_fp")), lit(0L)).as("__dang"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(teleport) +
            expr("85 * coalesce(__contrib, 0L) div 100") +
            expr(s"85 * (__dang div ${n}L) div 100")).as("rank_fp"))
        .localCheckpoint(true)
    }
    ranks
  }
}
