package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SampleOps

/** UniMax waterfill: the closed-form window computation must equal the
  * iterative waterfill definition (allocate uniformly, saturate, repeat
  * on the residual), exhaust exactly min(budget, Σcap), and give every
  * unsaturated domain the same water level. */
class UniMaxSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Iterative reference: repeatedly split the remaining budget equally
    * among unsaturated domains; saturate any domain whose cap is below
    * its share; stop when nothing saturates. */
  private def ref(caps: Map[String, Double], budget: Double): Map[String, Double] = {
    var alloc = Map.empty[String, Double]
    var remaining = budget
    var open = caps.keySet
    var changed = true
    while (changed && open.nonEmpty) {
      changed = false
      val share = remaining / open.size
      val sat = open.filter(d => caps(d) <= share)
      if (sat.nonEmpty) {
        changed = true
        sat.foreach { d => alloc += d -> caps(d); remaining -= caps(d) }
        open --= sat
      } else {
        open.foreach(d => alloc += d -> share)
        open = Set.empty
      }
    }
    alloc
  }

  private def run(tokens: Map[String, Long], budget: Double, maxEpochs: Double) =
    SampleOps.unimaxAlloc(
        tokens.toSeq.toDF("dom", "n_tokens"), "dom", "n_tokens",
        lit(budget), maxEpochs)
      .select(col("dom"), col("alloc"), col("capacity"), col("epochs"), col("saturated"))
      .as[(String, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap

  private val tokens = Map("en" -> 11757L, "de" -> 3549L, "es" -> 3958L,
    "fr" -> 3758L, "zh" -> 4143L)

  test("matches the iterative waterfill under saturating and slack budgets") {
    for ((budget, me) <- Seq((10866.0, 0.5), (5000.0, 0.5), (100000.0, 2.0),
                             (1.0, 1.0), (13581.9, 0.5))) {
      val caps = tokens.map { case (d, t) => d -> t * me }
      val expect = ref(caps, budget)
      val got = run(tokens, budget, me)
      tokens.keys.foreach { d =>
        assert(math.abs(got(d)._2 - expect(d)) < 1e-6,
          s"budget=$budget me=$me dom=$d got=${got(d)._2} want=${expect(d)}")
      }
    }
  }

  test("allocation exhausts min(budget, total capacity); 0 <= alloc <= cap") {
    for (budget <- Seq(2000.0, 10866.0, 1e9)) {
      val got = run(tokens, budget, 0.5)
      val capTotal = tokens.values.map(_ * 0.5).sum
      val total = got.values.map(_._2).sum
      assert(math.abs(total - math.min(budget, capTotal)) < 1e-4, s"budget=$budget")
      got.values.foreach { r =>
        assert(r._2 >= 0.0 && r._2 <= r._3 + 1e-9)
        assert(r._5 === (r._2 >= r._3 - 1e-9), "saturated flag must mean alloc == cap")
      }
    }
  }

  test("every unsaturated domain sits at the same water level") {
    // budget 4850 at maxEpochs 0.25: de/fr/es saturate (caps 887/940/990
    // below their levels), zh and en share (4850 − 2817)/2 = 1016.5
    val got = run(tokens, 4850.0, 0.25)
    val open = got.values.filter(!_._5).map(_._2).toSeq
    assert(open.size >= 2, "fixture must leave at least two unsaturated")
    assert(open.distinct.size === 1, s"unequal water levels: $open")
  }
}
