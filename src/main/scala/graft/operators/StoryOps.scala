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
   * The collect is BOUNDED: candidates are truncated to the first
   * `maxCandidates` in that same greedy order (a distributed
   * TakeOrderedAndProject, never a full sort). Because truncation and
   * the greedy scan share one order, every match produced from the kept
   * prefix is identical to what the unbounded scan would decide —
   * dropping the tail can only lose extra (lowest-jaccard) matches,
   * never change one. A skewed corpus therefore degrades gracefully
   * instead of OOMing the driver (see docs/DIVERGENCES.md).
   */
  def greedyMatch(candidates: DataFrame, clusterCol: String, storyCol: String,
                  jaccardCol: String, maxCandidates: Int = 1 << 20): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = candidates
      .select(col(clusterCol).cast("string"), col(storyCol).cast("string"), col(jaccardCol).cast("double"))
      .orderBy(desc(jaccardCol), col(clusterCol), col(storyCol))
      .limit(maxCandidates)
      .as[(String, String, Double)]
      .collect()
      .sortBy { case (c, s, j) => (-j, c, s) }
    val usedC = scala.collection.mutable.Set.empty[String]
    val usedS = scala.collection.mutable.Set.empty[String]
    val out = rows.flatMap { case (c, s, j) =>
      if (!usedC.contains(c) && !usedS.contains(s)) { usedC += c; usedS += s; Some((c, s, j)) }
      else None
    }
    spark.createDataFrame(out.toIndexedSeq).toDF(clusterCol, storyCol, jaccardCol)
  }

  /** P4: rows due for (re)summarization — never summarized, or updated since. */
  def needsSummary(stories: DataFrame, lastUpdated: String, lastSummarized: String): DataFrame =
    stories.filter(col(lastSummarized).isNull || col(lastUpdated) > col(lastSummarized))
}
