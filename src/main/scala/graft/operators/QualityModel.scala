package graft.operators

import graft.functions.HashEmbed
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering — the classifier-scored curation stage
 * of modern pretraining pipelines (FineWeb-Edu, DCLM): a cheap linear
 * model is trained on WEAK labels (heuristic rules, or a small set of
 * LLM/human judgments) and its calibrated probability becomes the keep
 * signal, replacing the hard rule at corpus scale. Complements the
 * rule-based stages in [[CurationOps]] (Gopher/C4 are the weak-label
 * SOURCE here, as in the published recipes).
 *
 * Shape: features are the hashing-trick bag-of-words the engine already
 * computes ([[graft.functions.HashEmbed]] — deterministic, L2-normalized,
 * no vocabulary state), so featurization is a map-only codegen pass.
 * Training is one MLlib logistic regression over (features, weak label)
 * — O(dim) driver state out. INFERENCE uses no MLlib at all: the fitted
 * weights become literal columns and the score is a pure
 * `zip_with`/`aggregate` dot product + sigmoid inside whole-stage
 * codegen — embarrassingly parallel, no model object on the executors,
 * no UDF. At 100 TB the classifier scores the corpus at scan speed; the
 * train step sees only the (tiny) labeled sample.
 */
object QualityModel {

  /** Fitted model as data: one row (weights array[dim], intercept).
    * Persist/load as plain parquet next to the corpus (the S11 model-
    * store idiom — the model IS a table). */
  // maxIter 10: L-BFGS on the hashed features converges well before it
  // (sf0.1 A/B: identical 0.7958 accuracy at 25 and 10 iterations,
  // 5.45 → 2.46 s — the cost is per-iteration scheduling, not data).
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            dim: Int = 64, maxIter: Int = 10, regParam: Double = 0.01): DataFrame = {
    val feats = labeled.select(
      col(labelCol).cast("double").as("label"),
      array_to_vector(HashEmbed(col(textCol), dim)).as("features"))
      .cache()
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
      .fit(feats)
    feats.unpersist()
    val spark = labeled.sparkSession
    import spark.implicits._
    Seq((m.coefficients.toArray.toSeq, m.intercept, dim))
      .toDF("weights", "intercept", "dim")
  }

  /** The inference column: sigmoid(w · hashEmbed(text) + b) as pure
    * codegen'd column algebra — weights ride as a literal array. */
  def scoreCol(textCol: Column, weights: Seq[Double], intercept: Double,
               dim: Int): Column = {
    val w = array(weights.map(lit): _*)
    val dot = aggregate(
      zip_with(HashEmbed(textCol, dim), w, (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    lit(1.0) / (lit(1.0) + exp(-(dot + lit(intercept))))
  }

  /** Score a corpus against a fitted [[train]] model frame: one added
    * column `probCol`, map-only. The 1-row model is collected driver-side
    * (O(dim)) and inlined as literals — nothing joins, nothing shuffles. */
  def score(docs: DataFrame, model: DataFrame, textCol: String,
            probCol: String = "quality_prob"): DataFrame = {
    val r = model.select(col("weights"), col("intercept"), col("dim")).head()
    val w = r.getSeq[Double](0)
    docs.withColumn(probCol,
      scoreCol(col(textCol), w, r.getDouble(1), r.getInt(2)))
  }
}
