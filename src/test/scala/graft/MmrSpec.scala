package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mmr.mmrSelect

/** MMR selection: equality with a direct Scala greedy reference, the
  * diversity semantics (a near-duplicate of the first pick is passed
  * over for a less relevant but novel candidate), and the λ = 1
  * degeneration to plain relevance top-k. */
class MmrSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def micro(x: Double): Long = math.round(x * 1e6)
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y }
    if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Direct greedy reference in integer micro-units. */
  private def ref(cand: Seq[(Long, Double, Array[Float])], k: Int, lt: Int):
      Seq[(Long, Int, Double)] = {
    val picked = scala.collection.mutable.ArrayBuffer[Int]()
    val maxU = Array.fill(cand.size)(Long.MinValue)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Double)]()
    for (step <- 0 until math.min(k, cand.size)) {
      val best = cand.indices.filterNot(picked.contains).minBy { i =>
        val s = if (step == 0) 10L * micro(cand(i)._2)
                else lt * micro(cand(i)._2) - (10L - lt) * maxU(i)
        (-s, cand(i)._1)
      }
      val s = if (step == 0) 10L * micro(cand(best)._2)
              else lt * micro(cand(best)._2) - (10L - lt) * maxU(best)
      picked += best
      out += ((cand(best)._1, step + 1, s.toDouble / 1e7))
      for (j <- cand.indices if !picked.contains(j)) {
        val sv = micro(cos(cand(j)._3, cand(best)._3))
        if (sv > maxU(j)) maxU(j) = sv
      }
    }
    out.toSeq
  }

  private def run(cand: Seq[(Long, Double, Array[Float])], k: Int, lt: Int):
      Seq[(Long, Int, Double)] =
    Seq(1).toDF("g")
      .withColumn("cands", typedLit(cand.map(c => (c._1, c._2, c._3.toSeq))))
      .select(explode(mmrSelect(col("cands").cast(
        "array<struct<id:bigint,rel:double,vec:array<float>>>"), k, lt)).as("m"))
      .select(col("m.neighbor_id"), col("m.rank"), col("m.mmr_score"))
      .as[(Long, Int, Double)].collect().toSeq

  private val candidates: Seq[(Long, Double, Array[Float])] = {
    // deterministic pseudo-random unit-ish vectors
    def vec(seed: Long): Array[Float] =
      Array.tabulate(8)(i => (((seed * 2654435761L + i * 40503L) % 1000) / 500.0 - 1.0).toFloat)
    (1L to 15L).map(i => (i, 0.9 - 0.03 * i, vec(i)))
  }

  test("matches the direct greedy reference") {
    for (k <- Seq(1, 5, 20); lt <- Seq(0, 5, 7)) {
      assert(run(candidates, k, lt) === ref(candidates, k, lt), s"k=$k lt=$lt")
    }
  }

  test("diversity: near-duplicate of the first pick is deferred") {
    val a = Array(1f, 0f, 0f, 0f)
    val aDup = Array(0.999f, 0.001f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    // rel: a 0.9, its near-dup 0.89, orthogonal b 0.5
    val cand = Seq((1L, 0.9, a), (2L, 0.89, aDup), (3L, 0.5, b))
    val got = run(cand, 2, 7).map(_._1)
    assert(got === Seq(1L, 3L), "MMR must pick the orthogonal candidate second")
    // pure-relevance control: λ=1 keeps the duplicate
    assert(run(cand, 2, 10).map(_._1) === Seq(1L, 2L))
  }

  test("lambda = 1.0 degenerates to relevance top-k") {
    val got = run(candidates, 5, 10).map(_._1)
    assert(got === candidates.sortBy(c => (-c._2, c._1)).take(5).map(_._1))
  }

  test("k past the candidate count emits every candidate exactly once") {
    val got = run(candidates, 100, 7)
    assert(got.map(_._1).sorted === candidates.map(_._1))
    assert(got.map(_._2) === (1 to candidates.size))
  }
}
