package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Linearly separable weak labels: "good" docs share content words,
  // "bad" docs share junk tokens — hashing-trick features separate them.
  private def labeled = {
    val good = (1 to 40).map(i =>
      (i.toLong, s"the quick analysis of spark query plans item$i", 1))
    val bad = (41 to 80).map(i =>
      (i.toLong, s"zzz spam junk garbage noise blob$i", 0))
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("train/score separates the weak classes and stays calibrated") {
    val model = QualityModel.train(labeled, "text", "label", dim = 64)
    val scored = QualityModel.score(labeled, model, "text")
    val r = scored.agg(
      avg(((col("quality_prob") >= 0.5).cast("int") === col("label")).cast("int")).as("acc"),
      avg(col("label")).as("pos"), avg(col("quality_prob")).as("avgp"),
      expr("bool_and(quality_prob >= 0.0 AND quality_prob <= 1.0)").as("rng")).head()
    assert(r.getBoolean(3), "probabilities out of [0,1]")
    assert(r.getDouble(0) >= 0.95, s"separable classes must classify: acc=${r.getDouble(0)}")
    assert(math.abs(r.getDouble(2) - r.getDouble(1)) <= 0.1, "calibration drifted")
  }

  test("inference is map-only column algebra: no exchange, no UDF, deterministic") {
    val model = QualityModel.train(labeled, "text", "label", dim = 32)
    val scored = QualityModel.score(labeled.select("doc_id", "text"), model, "text")
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"),
      s"scoring must not use a UDF:\n$plan")
    val a = scored.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = QualityModel.score(labeled.select("doc_id", "text"), model, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b, "scoring must be deterministic")
  }

  test("model round-trips through parquet (the model IS a table)") {
    val dir = java.nio.file.Files.createTempDirectory("qm").toString
    QualityModel.train(labeled, "text", "label", dim = 32)
      .write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val a = QualityModel.score(labeled, reloaded, "text")
      .select("doc_id", "quality_prob").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.size == 80 && a.values.forall(p => p >= 0.0 && p <= 1.0))
  }
}
