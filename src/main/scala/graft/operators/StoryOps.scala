package graft.operators

import graft.functions.VectorMeanFast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Story-entity operators: membership explode-joins, story aggregation
 * (centroid / entity-union / member-list), and the greedy 1-to-1 Jaccard
 * matching that keeps story identity stable across batch re-clustering.
 * (Reference: batch-cluster-service.py:45-70,115-158; summarization-service.py:54;
 * duplication_service.py:100-116.)
 */
object StoryOps {

  /**
   * J2: hydrate members of an array-FK column — explode the membership
   * array and equi-join the member table. The exploded relation carries
   * only (storyId, memberKey); member payloads stay on their own
   * partitions until the join.
   */
  def explodeJoinMembers(stories: DataFrame, members: DataFrame,
                         storyId: String, membersCol: String, memberKey: String): DataFrame =
    stories.select(col(storyId), explode(col(membersCol)).as(memberKey))
      .join(members, memberKey)

  /**
   * A3+A5+A6: one aggregation pass building a story row from its members:
   * centroid (element-wise mean), entity set-union, sorted member list.
   */
  def buildStories(members: DataFrame, storyId: String, memberKey: String,
                   vecCol: String, entitiesCol: String): DataFrame =
    members.groupBy(col(storyId))
      .agg(
        VectorMeanFast(col(vecCol).cast("array<double>")).as("centroid"),
        array_sort(array_distinct(flatten(collect_list(col(entitiesCol))))).as("entities"),
        sort_array(collect_list(col(memberKey))).as("members"),
        count(lit(1)).as("n_members"))

  /**
   * J6 full form: greedy 1-to-1 matching of new clusters to old stories by
   * Jaccard overlap (highest similarity first, each side used at most
   * once, below-threshold pairs dropped).
   *
   * The candidate pair list (output of [[SimilarityOps.jaccardJoin]]) is
   * tiny relative to the corpus — one row per overlapping cluster/story
   * pair — so the greedy scan runs on the driver over the collected
   * candidates, exactly like the reference, but with a deterministic
   * (jaccard desc, cluster, story) order the reference's dict iteration
   * lacks. Returns (cluster, story, jaccard) matches.
   *
   * The collect is BOUNDED, with AUTOMATIC escalation: a candidate set
   * past `maxCandidates` is routed to [[greedyMatchDistributed]] — the
   * exact distributed form of the same decisions — instead of being
   * truncated (truncation was prefix-exact but silently lossy on the
   * tail). The overflow probe is a per-partition-limited count, never a
   * sort; under the cap, the collect runs on a distributed
   * TakeOrderedAndProject prefix as before. Result: one callable, exact
   * at every scale — the driver path merely an optimization for the
   * common tiny candidate set (see docs/DIVERGENCES.md).
   */
  def greedyMatch(candidates: DataFrame, clusterCol: String, storyCol: String,
                  jaccardCol: String, maxCandidates: Int = 1 << 20): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // Overflow probe FOLDED into the one collect (cap+1 rows): a separate
    // count() would execute the whole candidate subtree — typically an
    // expensive jaccardJoin — a second time. Only the rare escalation
    // pays a re-execution (via the distributed form), never the common
    // under-cap path.
    // cap+1 saturates at Int.MaxValue (the overflow probe degenerates to
    // "never escalate", which is the pre-routing behavior at that cap).
    val probeLimit =
      if (maxCandidates == Int.MaxValue) Int.MaxValue else maxCandidates + 1
    val fetched = candidates
      .select(col(clusterCol).cast("string"), col(storyCol).cast("string"), col(jaccardCol).cast("double"))
      .orderBy(desc(jaccardCol), col(clusterCol), col(storyCol))
      .limit(probeLimit)
      .as[(String, String, Double)]
      .collect()
    if (fetched.length > maxCandidates)
      return greedyMatchDistributed(candidates, clusterCol, storyCol, jaccardCol)
    val rows = fetched.sortBy { case (c, s, j) => (-j, c, s) }
    val usedC = scala.collection.mutable.Set.empty[String]
    val usedS = scala.collection.mutable.Set.empty[String]
    val out = rows.flatMap { case (c, s, j) =>
      if (!usedC.contains(c) && !usedS.contains(s)) { usedC += c; usedS += s; Some((c, s, j)) }
      else None
    }
    spark.createDataFrame(out.toIndexedSeq).toDF(clusterCol, storyCol, jaccardCol)
  }

  /**
   * Distributed form of [[greedyMatch]] for candidate sets past the
   * driver cap — [[greedyMatch]] routes here automatically on overflow
   * (the collected greedy stays the under-cap fast path because it is
   * the reference's semantics at the reference's scale; this computes
   * the same decisions without any driver materialization).
   *
   * Algorithm: locally-dominant edge matching (Preis' distributed
   * greedy; Manne & Bisseling 2007) under the SAME strict total order
   * as the driver scan — (jaccard desc, cluster asc, story asc), string
   * order on ids, a total order because (cluster, story) pairs are
   * unique. Each round, an edge that is rank 1 for BOTH its cluster and
   * its story (two row_number windows) is matched, and its endpoints'
   * remaining edges are dropped (two anti-joins against the round's
   * matches). Under a strict total order this produces EXACTLY the
   * sequential greedy matching, not an approximation: the globally
   * first remaining edge is always mutually rank-1 (so every round
   * matches it — progress is guaranteed and the greedy prefix is
   * replayed by induction), and no edge that the greedy skips can ever
   * become mutually rank-1 before the greedy edge that blocks it is
   * matched and removes it. Spec-pinned as full equality on random
   * candidate sets, skew included.
   *
   * Scale shape: per round, two windows and two anti-joins over the
   * REMAINING candidate edges — (cluster, story, jaccard) triples only;
   * each round is lineage-truncated with an eager localCheckpoint (same
   * discipline and rationale as [[DedupOps.connectedComponents]]).
   * Worst case (a strictly-decreasing path) needs O(path length)
   * rounds; real candidate graphs converge in a handful because every
   * round matches ALL locally-dominant edges, not just the global best.
   *
   * @throws IllegalStateException if edges remain after `maxIter`
   *         rounds — a partial matching would silently differ from the
   *         greedy semantics, so refuse instead.
   */
  def greedyMatchDistributed(candidates: DataFrame, clusterCol: String,
                             storyCol: String, jaccardCol: String,
                             maxIter: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = candidates.sparkSession
    var cand = candidates
      .select(col(clusterCol).cast("string").as("__c"),
        col(storyCol).cast("string").as("__s"), col(jaccardCol).cast("double").as("__j"))
      .localCheckpoint(true)
    var matched = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cand.schema)
    var done = cand.isEmpty
    var i = 0
    while (!done && i < maxIter) {
      val mutual = cand
        .withColumn("__rc", row_number().over(
          Window.partitionBy("__c").orderBy(desc("__j"), col("__s"))))
        .withColumn("__rs", row_number().over(
          Window.partitionBy("__s").orderBy(desc("__j"), col("__c"))))
        .filter(col("__rc") === 1 && col("__rs") === 1)
        .select("__c", "__s", "__j")
        .localCheckpoint(true)
      matched = matched.unionByName(mutual)
      cand = cand
        .join(mutual.select("__c"), Seq("__c"), "left_anti")
        .join(mutual.select("__s"), Seq("__s"), "left_anti")
        .localCheckpoint(true)
      done = cand.isEmpty
      i += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"greedyMatchDistributed did not drain the candidate set in $maxIter " +
          "rounds; refusing to return a matching that may differ from greedy")
    matched.select(col("__c").as(clusterCol), col("__s").as(storyCol),
      col("__j").as(jaccardCol))
  }

  /** P4: rows due for (re)summarization — never summarized, or updated since. */
  def needsSummary(stories: DataFrame, lastUpdated: String, lastSummarized: String): DataFrame =
    stories.filter(col(lastSummarized).isNull || col(lastUpdated) > col(lastSummarized))
}
