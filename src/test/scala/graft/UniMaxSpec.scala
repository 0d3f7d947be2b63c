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

  test("epochExpand: copies = floor(e) or floor(e)+1, per-doc deterministic, absent domains dropped") {
    val docs = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("doc_id", "dom")
    val plan = Seq(("a", 2.4), ("b", 0.6)).toDF("dom", "epochs")
    val out = SampleOps.epochExpand(docs, "dom", col("doc_id"), plan, salt = "t|")
      .select(col("doc_id"), col("dom"), col("copy"))
      .as[(Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    byDoc.foreach { case (id, copies) =>
      assert(copies === (1L to copies.size), s"copy indices must be 1..n for $id")
    }
    val aCounts = byDoc.filter(_._1 % 3 == 0).values.map(_.size).toSeq
    assert(aCounts.forall(n => n == 2 || n == 3), "domain a: floor(2.4)=2 or 3 copies")
    val a3frac = aCounts.count(_ == 3).toDouble / aCounts.size
    assert(a3frac > 0.2 && a3frac < 0.6, s"~40% of a-docs get the extra copy: $a3frac")
    val bDocs = docs.filter(col("dom") === "b").count()
    val bOut = out.filter(_._2 == "b")
    assert(bOut.forall(_._3 == 1L), "domain b: 0 or 1 copies only")
    val bFrac = bOut.map(_._1).distinct.size.toDouble / bDocs
    assert(bFrac > 0.4 && bFrac < 0.8, s"~60% of b-docs survive: $bFrac")
    // determinism + domain drop
    val again = SampleOps.epochExpand(docs, "dom", col("doc_id"), plan, salt = "t|")
      .select(col("doc_id"), col("dom"), col("copy"))
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(r => (r._1, r._3)).toSeq === again.sortBy(r => (r._1, r._3)).toSeq)
    val dropped = SampleOps.epochExpand(docs, "dom", col("doc_id"),
      Seq(("a", 1.0)).toDF("dom", "epochs"), salt = "t|")
    assert(dropped.filter(col("dom") === "b").count() === 0L)
  }

  test("mixToTarget: binding domain keeps everything; output proportions track the target") {
    val docs = ((1L to 600L).map(i => (i, "big")) ++ (601L to 700L).map(i => (i, "small")))
      .toDF("doc_id", "dom")
    // target small 0.4 → N* = 100/0.4 = 250; big accepts 0.6*250/600 = 0.25
    val out = SampleOps.mixToTarget(docs, "dom", col("doc_id"),
        Map("big" -> 0.6, "small" -> 0.4), salt = "mt|")
      .groupBy("dom").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(out("small") === 100L, "binding domain must keep everything")
    val frac = out("big").toDouble / 600
    assert(frac > 0.18 && frac < 0.32, s"big acceptance ~0.25: $frac")
  }

  test("globalShuffle: balanced shards, contiguous positions, partition-count invariant") {
    val docs = (1L to 1000L).map(i => (i, s"p$i")).toDF("doc_id", "payload")
    val out = SampleOps.globalShuffle(docs, col("doc_id"), shards = 7, salt = "s|")
      .select(col("doc_id"), col("shard"), col("pos"))
      .as[(Long, Int, Long)].collect()
    assert(out.map(_._1).distinct.length === 1000)
    val byShard = out.groupBy(_._2).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byShard.keySet === (0 until 7).toSet)
    val sizes = byShard.values.map(_.size).toSeq
    assert(sizes.max - sizes.min <= 1, s"skewless deal: $sizes")
    byShard.foreach { case (sh, ps) =>
      assert(ps === (0L until ps.size), s"contiguous 0-based positions in shard $sh")
    }
    // the permutation is a pure function of (key, salt): identical under
    // a different input partitioning
    val again = SampleOps.globalShuffle(docs.repartition(13), col("doc_id"),
        shards = 7, salt = "s|")
      .select(col("doc_id"), col("shard"), col("pos"))
      .as[(Long, Int, Long)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("stratifiedSplit: per-stratum sizes exact to the row; disjoint, exhaustive, deterministic") {
    val docs = ((1L to 500L).map(i => (i, "big")) ++ (501L to 540L).map(i => (i, "small")))
      .toDF("doc_id", "dom")
    val out = SampleOps.stratifiedSplit(docs, "dom", col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "t|")
      .select(col("doc_id"), col("dom"), col("split"))
      .as[(Long, String, String)].collect()
    assert(out.length === 540 && out.map(_._1).distinct.length === 540)
    val sizes = out.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
    // exact per-stratum cuts at ceil boundaries — even the 40-doc
    // stratum gets its exact 4-doc val slice
    assert(sizes(("small", "train")) + sizes(("small", "val")) +
      sizes(("small", "test")) === 40)
    assert(sizes(("small", "val")) === 4 && sizes(("small", "test")) === 4 &&
      sizes(("small", "train")) === 32, s"small stratum cuts: $sizes")
    assert(sizes(("big", "train")) === 400 && sizes(("big", "val")) === 50 &&
      sizes(("big", "test")) === 50, s"big stratum cuts: $sizes")
    // deterministic under re-partitioning
    val again = SampleOps.stratifiedSplit(docs.repartition(7), "dom", col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "t|")
      .select(col("doc_id"), col("dom"), col("split"))
      .as[(Long, String, String)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
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
