package graft.operators

import graft.functions.text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bias monitoring over recommendation logs (reference
 * bias_detection_service.py:104-216): per log, source-diversity (A8) and
 * signed average sentiment over the recommended headlines (A9/M11),
 * flagged when either crosses its threshold; explanation is the
 * reference's constant placeholder (M12 — faithful!).
 *
 * One pass: explode the nested recommendations array, aggregate back per
 * log — the reference loops per log in Python.
 */
object Bias {

  /**
   * @param logs (log_id, user_id, recommendations array<struct<story_id,
   *             source, headline>>)
   * @return one BiasReport-shaped row per log
   */
  def processLogs(logs: DataFrame, diversityThreshold: Double = 0.5,
                  sentimentThreshold: Double = 0.0): DataFrame = {
    logs.select(col("log_id"), col("user_id"), explode(col("recommendations")).as("r"))
      .groupBy("log_id", "user_id")
      .agg(
        (countDistinct(col("r.source")).cast("double") / count(lit(1))).as("diversity_score"),
        avg(text.sentiment(col("r.headline"))).as("average_sentiment"))
      .withColumn("bias_flag",
        col("diversity_score") < diversityThreshold ||
          col("average_sentiment") < sentimentThreshold)
      .withColumn("explanation",
        lit("Explanation generation placeholder"))  // M12: constant, as in reference
      .withColumn("timestamp", current_timestamp())
  }

  /** GET /bias_reports: latest-n scan (T5). */
  def latestReports(reports: DataFrame, n: Int): DataFrame =
    reports.orderBy(desc("timestamp"), col("log_id")).limit(n)
}
