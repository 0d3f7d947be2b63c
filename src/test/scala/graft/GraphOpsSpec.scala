package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Fixed-point PageRank: bit-exact against a plain-Scala long-arithmetic
  * simulation (the whole point of the fixed-point form — the Spark plan,
  * any repartitioning of it, and the DuckDB oracle must all produce the
  * SAME longs), dangling mass redistributed, multigraph edge weighting.
  */
class GraphOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** The reference: same recurrence, plain collections. */
  private def simulate(edges: Seq[(String, String)], iters: Int,
                       scale: Long): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val teleport = (scale * 15L / 100L) / n
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(in =>
        in.map { case (u, _) => rank(u) / outdeg(u) }.sum).toMap
      val dangling = nodes.filterNot(outdeg.contains).map(rank).sum
      rank = nodes.map(v => v ->
        (teleport + 85L * contrib.getOrElse(v, 0L) / 100L +
          85L * (dangling / n) / 100L)).toMap
    }
    rank
  }

  private val edges = Seq(
    "a" -> "b", "a" -> "c", "b" -> "a", "c" -> "d",
    // parallel edge: b links a twice — weights the link 2/3
    "b" -> "a", "b" -> "d")
  // d has no out-edges: dangling.

  test("matches the exact long-arithmetic simulation, incl. dangling") {
    val got = GraphOps.pageRankFixedPoint(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === simulate(edges, 3, 1000000000L))
    // dangling node d still accrues rank from c's links
    assert(got("d") > 0L)
    // a receives 2/3 of b's mass each round — must outrank c (which gets
    // only half of a's)
    assert(got("a") > got("c"))
  }

  test("bit-identical across partitionings (the fixed-point guarantee)") {
    val df1 = edges.toDF("src", "dst").repartition(7)
    val df2 = edges.toDF("src", "dst").coalesce(1)
    val r1 = GraphOps.pageRankFixedPoint(df1, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val r2 = GraphOps.pageRankFixedPoint(df2, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(r1 === r2)
  }

  test("one iteration of the 2-cycle is exact") {
    // a <-> b, N=2: rank0 = scale/2; contrib = rank0 (outdeg 1);
    // rank1 = (15%·scale)/2 + 85%·rank0 = 75e6 + 425e6 = 5e8 each.
    val got = GraphOps.pageRankFixedPoint(
        Seq("a" -> "b", "b" -> "a").toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 500000000L, "b" -> 500000000L))
  }

  test("refuses an empty graph and bad params") {
    intercept[IllegalArgumentException](
      GraphOps.pageRankFixedPoint(edges.toDF("src", "dst"), iters = 0))
    intercept[IllegalArgumentException](
      GraphOps.pageRankFixedPoint(
        Seq.empty[(String, String)].toDF("src", "dst")))
  }
}
