package graft.operators

import graft.functions.HashEmbed
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based domain/language tagging — the multiclass sibling of
 * [[QualityModel]] (FineWeb/CCNet-style corpus partitioning: a cheap
 * linear classifier assigns every document a domain bucket, and the
 * mixture recipe then samples per bucket — [[SampleOps.unimaxAlloc]],
 * `x_temperature_mix`). One softmax regression over the deterministic
 * hashing-trick features; the n-gram heuristic (`x_langid`) is the
 * weak-label SOURCE this replaces at corpus scale, exactly as the
 * Gopher rule seeds [[QualityModel]].
 *
 * Same execution contract as [[QualityModel]]: training sees only the
 * (tiny) labeled sample through MLlib; INFERENCE uses no MLlib at all —
 * the k×dim coefficient matrix becomes k literal arrays, per-class
 * logits are `zip_with`/`aggregate` dot products inside whole-stage
 * codegen, the argmax is a deterministic CASE chain (first class in
 * sorted order wins ties), and the confidence is a softmax over the
 * same logits. No model object on executors, no UDF, no shuffle — the
 * corpus is tagged at scan speed.
 */
object DomainModel {

  /** Fitted model as data: one row per class `(cls, idx, weights,
    * intercept, dim)` — the S11 model-store idiom (the model IS a
    * table), k rows instead of [[QualityModel]]'s one. Class indices
    * are assigned by SORTED class name, so training is deterministic
    * with no StringIndexer state. */
  def train(labeled: DataFrame, textCol: String, classCol: String,
            dim: Int = 64, maxIter: Int = 10, regParam: Double = 0.01): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    // k-bounded driver collect (class vocabulary, not corpus)
    val classes = labeled.select(col(classCol).cast("string"))
      .na.drop().distinct().as[String].collect().sorted
    require(classes.length >= 2, s"need >= 2 classes, got ${classes.toSeq}")
    val toIdx = classes.zipWithIndex.foldLeft(lit(-1.0)) { case (acc, (c, i)) =>
      when(col(classCol).cast("string") === c, lit(i.toDouble)).otherwise(acc)
    }
    val feats = labeled.where(col(classCol).isNotNull).select(
      toIdx.as("label"),
      array_to_vector(HashEmbed(col(textCol), dim)).as("features"))
      .cache()
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
      .setFamily("multinomial")
      .fit(feats)
    feats.unpersist()
    val coef = m.coefficientMatrix
    val icept = m.interceptVector
    classes.zipWithIndex.map { case (c, i) =>
      (c, i, (0 until dim).map(j => coef(i, j)), icept(i), dim)
    }.toSeq.toDF("cls", "idx", "weights", "intercept", "dim")
  }

  /** Per-class logit: w_c · hashEmbed(text) + b_c, pure column algebra. */
  private def logit(textCol: Column, weights: Seq[Double], intercept: Double,
                    dim: Int): Column = {
    val w = array(weights.map(lit): _*)
    aggregate(zip_with(HashEmbed(textCol, dim), w, (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x) + lit(intercept)
  }

  /** Tag a corpus against a fitted [[train]] model frame: adds
    * `predCol` (class name, argmax logit, first-sorted-class
    * tie-break) and `probCol` (softmax confidence of the winner,
    * max-logit-shifted for stability). The k-row model is collected
    * driver-side (O(k·dim)) and inlined as literals — map-only. */
  def tag(docs: DataFrame, model: DataFrame, textCol: String,
          predCol: String = "domain_pred", probCol: String = "domain_prob"): DataFrame = {
    val rows = model.select(col("cls"), col("idx"), col("weights"),
        col("intercept"), col("dim"))
      .collect().sortBy(_.getInt(1))
    require(rows.nonEmpty, "empty model frame")
    val dim = rows.head.getInt(4)
    val names = rows.map(_.getString(0))
    // ONE logits array, operated on with higher-order functions — a
    // greatest + CASE-chain formulation would syntactically replicate
    // every k-dot-product logit O(k²) times across the argmax and the
    // softmax; the array form keeps the expression tree (and, wherever
    // codegen subexpression elimination doesn't kick in, the per-row
    // work) linear in k. array_position on the max = FIRST class in
    // sorted index order — the deterministic tie-break.
    val logitsArr = array(rows.map(r =>
      logit(col(textCol), r.getSeq[Double](2), r.getDouble(3), dim)).toIndexedSeq: _*)
    val tagged = docs.withColumn("__logits", logitsArr)
    val maxLogit = array_max(col("__logits"))
    val pred = element_at(array(names.map(lit).toIndexedSeq: _*),
      array_position(col("__logits"), maxLogit).cast("int"))
    val denom = aggregate(col("__logits"), lit(0.0),
      (acc, l) => acc + exp(l - maxLogit))
    tagged.withColumn(predCol, pred)
      .withColumn(probCol, lit(1.0) / denom)
      .drop("__logits")
  }
}
