package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Recommendation-pipeline operators, re-expressed set-oriented (reference:
 * services/recommendation-trainer/recommendation-trainer.py — which loops
 * per user on the driver; here every step is one distributed plan).
 */
object Recommend {

  /**
   * Event-type → implicit-feedback score (reference
   * recommendation-trainer.py:34-43). Chained when/otherwise stays inside
   * whole-stage codegen; unknown events score 0.0.
   */
  def eventScore(eventType: Column, weights: Seq[(String, Double)]): Column =
    coalesce(weights.foldLeft(lit(null).cast("double")) { case (acc, (ev, w)) =>
      when(eventType === ev, w).otherwise(acc)
    }, lit(0.0))

  /** Canonical reference weights (like 1.0, share 0.5, click 0.1, read 0.01). */
  def score(eventType: Column): Column =
    eventScore(eventType, Seq("like" -> 1.0, "share" -> 0.5, "click" -> 0.1, "read" -> 0.01))

  /** Freshness decay exp(-rate · Δhours) (reference recommendation-trainer.py:77-80). */
  def freshness(eventTime: Column, now: Column, ratePerHour: Double = 0.1): Column =
    exp(lit(-ratePerHour) * (unix_timestamp(now) - unix_timestamp(eventTime)).cast("double") / 3600.0)

  /** Millisecond-precision variant (sub-second event times stay exact). */
  def freshnessMs(eventTime: Column, now: Column, ratePerHour: Double = 0.1): Column =
    exp(lit(-ratePerHour) * (unix_millis(now) - unix_millis(eventTime)).cast("double") / 3600000.0)

  /**
   * Per-key min-max normalization with zero-range guard (reference
   * recommendation-trainer.py:138-141,149-152). Window agg — one shuffle
   * on the key, no driver collect.
   */
  def minMaxNorm(df: DataFrame, key: String, value: String, out: String): DataFrame = {
    val w = Window.partitionBy(key)
    val range = max(col(value)).over(w) - min(col(value)).over(w)
    df.withColumn(out, when(range > 0, col(value) / range).otherwise(0.0))
  }

  /**
   * Popularity: interaction count per item, top n (reference
   * recommendation-trainer.py:122-130). Partial counts map-side, then a
   * single global TakeOrdered — no full sort at scale.
   */
  def popularity(interactions: DataFrame, itemCol: String, n: Int): DataFrame =
    interactions.groupBy(itemCol)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(itemCol))
      .limit(n)

  /**
   * Drift score |mean(recent) − mean(hist)| / mean(hist), 0-guarded
   * (reference recommendation-trainer.py:45-56). One conditional aggregate
   * pass — the reference scans the table twice.
   */
  def drift(df: DataFrame, scoreCol: Column, isRecent: Column): DataFrame = {
    df.agg(
      avg(when(isRecent, scoreCol)).as("recent_mean"),
      avg(scoreCol).as("hist_mean"))
      .select(
        when(col("hist_mean").isNull || col("hist_mean") === 0.0, 0.0)
          .otherwise(abs(coalesce(col("recent_mean"), lit(0.0)) - col("hist_mean")) / col("hist_mean"))
          .as("drift_score"))
  }

  /**
   * Hybrid merge: full-outer join of two per-(user,item) score sources with
   * weighted combine (reference recommendation-trainer.py:132-170 does this
   * in driver dicts).
   */
  def hybrid(a: DataFrame, b: DataFrame, keys: Seq[String],
             scoreA: String, scoreB: String, wA: Double, wB: Double): DataFrame =
    a.join(b, keys, "full_outer")
      .withColumn("score",
        coalesce(col(scoreA), lit(0.0)) * wA + coalesce(col(scoreB), lit(0.0)) * wB)

  /** Per-user top-k by score with deterministic tie-break (reference T1). */
  def topKPerKey(df: DataFrame, key: String, orderCols: Seq[Column], k: Int): DataFrame =
    df.withColumn("rn", row_number().over(Window.partitionBy(key).orderBy(orderCols: _*)))
      .filter(col("rn") <= k)
      .drop("rn")
}
