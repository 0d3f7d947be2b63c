package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuantileSketch.{quantileSketch, quantileSketchMerge, quantileSketchQuery}

/** Persistable quantile sketch: the stored-sketch fold must be
  * invisible (merge of per-batch sketches answers like one sketch over
  * the union — the x_hh_incremental law for the rank leg), answers must
  * match `percentile_approx` bit-for-bit (same PercentileDigest code
  * path), and rank-exact accuracy must reproduce the documented
  * "smallest x with cumulative count >= ceil(q*n)" value exactly. */
class QuantileSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val qs = array(lit(0.25), lit(0.5), lit(0.9), lit(0.99))
  private val Acc = 1 << 20

  // Deterministic skewed values: mostly small, a heavy tail.
  private val vals: Seq[Double] =
    (1 to 5000).map(i => ((i * 2654435761L) % 1000).toDouble) ++
      (1 to 50).map(i => 10000.0 + i)

  private def queried(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    df.collect()(0).getSeq[Double](0)

  test("merge of per-batch sketches == one sketch over the union (rank-exact)") {
    val df = vals.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("batch", "v")
    val single = df.agg(quantileSketch(col("v"), Acc).as("s"))
      .select(quantileSketchQuery(col("s"), qs))
    val stored = df.groupBy("batch").agg(quantileSketch(col("v"), Acc).as("s"))
    val folded = stored.agg(quantileSketchMerge(col("s")).as("s"))
      .select(quantileSketchQuery(col("s"), qs))
    assert(queried(folded) === queried(single))
  }

  test("answers == percentile_approx at the same accuracy (sketchy and exact regimes)") {
    for (acc <- Seq(50, Acc)) {
      val df = vals.toDF("v")
      val builtin = df
        .agg(percentile_approx(col("v"), array(lit(0.25), lit(0.5), lit(0.9), lit(0.99)),
          lit(acc)).as("p"))
        .collect()(0).getSeq[Double](0)
      val ours = queried(df.agg(quantileSketch(col("v"), acc).as("s"))
        .select(quantileSketchQuery(col("s"), qs)))
      assert(ours === builtin, s"acc=$acc")
    }
  }

  test("rank-exact accuracy reproduces smallest-x-with-cdf>=ceil(q*n), any partitioning") {
    val sorted = vals.sorted
    val n = sorted.size
    val expected = Seq(0.25, 0.5, 0.9, 0.99).map(q => sorted(math.ceil(q * n).toInt - 1))
    for (parts <- Seq(1, 32)) {
      val got = queried(vals.toDF("v").repartition(parts)
        .agg(quantileSketch(col("v"), Acc).as("s"))
        .select(quantileSketchQuery(col("s"), qs)))
      assert(got === expected, s"parts=$parts")
    }
  }

  test("empty sketch queries to null; nulls in input are ignored") {
    val empty = Seq.empty[Double].toDF("v")
      .agg(quantileSketch(col("v"), Acc).as("s"))
      .select(quantileSketchQuery(col("s"), qs))
    assert(empty.collect()(0).isNullAt(0))

    val withNulls = Seq[Option[Double]](Some(1.0), None, Some(3.0), None, Some(2.0))
      .toDF("v")
      .agg(quantileSketch(col("v"), Acc).as("s"))
      .select(quantileSketchQuery(col("s"), array(lit(0.5))))
    assert(queried(withNulls) === Seq(2.0))
  }

  test("merge adopts the stored sketches' FINE accuracy, not the empty buffer's default") {
    // quantile_sketch_merge's empty aggregation buffer is created at the
    // DEFAULT accuracy (1e-4); the merged summary must carry the stored
    // sketches' 2^-20 error, or rank-exactness would silently cap at the
    // default. n = 50k makes the default's rank slack ~5 — an exact p50
    // proves the union adopted the fine error (pinned empirically
    // against this Spark's QuantileSummaries.merge; a regression here
    // breaks the StatsStore accuracy contract).
    val n = 50000
    val df = (1 to n).map(i => (i % 5, i.toDouble)).toDF("batch", "v")
    val folded = df.groupBy("batch").agg(quantileSketch(col("v"), Acc).as("s"))
      .agg(quantileSketchMerge(col("s")).as("s"))
      .select(quantileSketchQuery(col("s"), array(lit(0.5), lit(0.99))))
    assert(queried(folded) === Seq(25000.0, 49500.0))
  }

  test("persisted sketch bytes survive a parquet round-trip and still fold") {
    val dir = java.nio.file.Files.createTempDirectory("qsketch").toString
    val df = vals.zipWithIndex.map { case (v, i) => (i % 3, v) }.toDF("batch", "v")
    df.groupBy("batch").agg(quantileSketch(col("v"), Acc).as("s"))
      .write.mode("overwrite").parquet(dir)
    val folded = spark.read.parquet(dir)
      .agg(quantileSketchMerge(col("s")).as("s"))
      .select(quantileSketchQuery(col("s"), qs))
    val single = df.agg(quantileSketch(col("v"), Acc).as("s"))
      .select(quantileSketchQuery(col("s"), qs))
    assert(queried(folded) === queried(single))
  }
}
