package graft

import graft.operators.SemDedup
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Cluster-0 members at 0°/10°/20° from the centroid, eps between
  // cos(10°) ≈ 0.985 and cos(20°) ≈ 0.940 — built to separate the
  // paper's upper-triangular drop test from a greedy chain.
  private def deg(a: Double) = Seq(math.cos(math.toRadians(a)), math.sin(math.toRadians(a)))
  private lazy val vecs = Seq(
    (1L, deg(0)),   // csim 1.000 — ordered LAST within cluster 0
    (2L, deg(10)),  // csim 0.985
    (3L, deg(20)),  // csim 0.940 — ordered FIRST (keep-low-centroid-sim)
    (4L, Seq(0.0, 1.0)) // cluster 1, singleton
  ).toDF("id", "v")
  private lazy val cents = Seq(
    (0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))
  ).toDF("cid", "cv")

  test("drop test is upper-triangular (earlier neighbor counts even when itself dropped), not a greedy chain") {
    val out = SemDedup.semDedup(vecs, cents, "id", "v", "cid", "cv", eps = 0.97)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(3L) == (0L, true),  "edge example (lowest centroid sim) must be kept")
    assert(out(2L) == (0L, false), "10° is within eps of earlier 20°")
    // Greedy-vs-triangular discriminator: 0° is within eps of 10° (which
    // was itself dropped) but NOT of the kept 20°. The paper thresholds
    // the upper-triangular similarity matrix, so 0° still drops.
    assert(out(1L) == (0L, false), "0° must drop against the earlier-but-dropped 10°")
    assert(out(4L) == (1L, true),  "singleton cluster is kept")
  }

  test("assignment and kept flags match on real embeddings; kept set non-trivial") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val cents = e.groupBy("label")
      .agg(graft.functions.VectorMeanFast(
        org.apache.spark.sql.functions.col("embedding").cast("array<double>")).as("cent"))
    val out = SemDedup.semDedup(e, cents, "vec_id", "embedding", "label", "cent", eps = 0.3)
    val n = out.count()
    val kept = out.filter("kept").count()
    assert(n == e.count(), "one verdict row per input vector")
    assert(kept > 0 && kept < n, s"eps=0.3 must drop some but not all: $kept/$n")
  }

  test("plan: pairwise stage is a cluster-key equi-join, never an unkeyed cross product") {
    val plan = SemDedup.semDedup(vecs, cents, "id", "v", "cid", "cv", eps = 0.97)
      .queryExecution.executedPlan.toString
    // Assignment is centroid literals folded into a projection — no join
    // node of any kind may exist except the cluster-keyed member-pair
    // join and the verdict join, and neither may be a cross product.
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unkeyed cross product:\n$plan")
    assert(plan.contains("cluster_id"), s"pairwise join must key on cluster_id:\n$plan")
  }
}
