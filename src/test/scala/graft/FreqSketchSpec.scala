package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesAgg.misraGries

/** Misra–Gries aggregate: the MG bound must hold under EVERY
  * partitioning (partial buffers merge in arbitrary order), and the
  * sketch must degrade to exact counts when capacity covers the
  * universe. Fixture skew is deterministic: token = number of trailing
  * zeros of i, so token t appears ~N/2^(t+1) times — a geometric
  * distribution with distinct ≈ log2(N) tokens and one dominant key. */
class FreqSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val N = 100000
  private def skewed = (1 to N).map(i => "t" + java.lang.Integer.numberOfTrailingZeros(i))

  private def exactCounts: Map[String, Long] =
    skewed.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def sketchOf(m: Int, parts: Int): Map[String, Long] =
    skewed.toDF("tok").repartition(parts)
      .agg(misraGries(col("tok"), m).as("mg"))
      .collect()(0).getMap[String, Long](0).toMap

  test("MG bound holds for every token under 1, 7, and 32 partitions") {
    val m = 5
    val exact = exactCounts
    val bound = N.toDouble / (m + 1)
    for (parts <- Seq(1, 7, 32)) {
      val est = sketchOf(m, parts)
      assert(est.size <= m, s"capacity exceeded at parts=$parts: ${est.size}")
      exact.foreach { case (tok, c) =>
        val e = est.getOrElse(tok, 0L)
        assert(e <= c, s"overestimate at parts=$parts: $tok est=$e exact=$c")
        assert(c - e <= bound,
          s"bound broken at parts=$parts: $tok est=$e exact=$c n/(m+1)=$bound")
      }
      // the presence corollary: every token above threshold survives
      exact.filter(_._2 > bound).keys.foreach { tok =>
        assert(est.contains(tok), s"heavy hitter $tok evicted at parts=$parts")
      }
      // no phantom keys
      est.keys.foreach(tok => assert(exact.contains(tok), s"phantom key $tok"))
    }
  }

  test("capacity >= universe degrades to exact counts, any partitioning") {
    val exact = exactCounts
    for (parts <- Seq(1, 16)) {
      assert(sketchOf(32, parts) == exact,
        s"m >= distinct must be lossless at parts=$parts")
    }
  }

  test("nulls are ignored and do not consume error budget") {
    // 10 'a', 5 nulls: with m=1 the only counter must be exactly a→10 —
    // if nulls incremented n or triggered evictions it would be lower.
    val df = (1 to 15).map(i => if (i <= 10) Some("a") else None).toDF("tok")
    val got = df.repartition(3).agg(misraGries(col("tok"), 1).as("mg"))
      .collect()(0).getMap[String, Long](0).toMap
    assert(got == Map("a" -> 10L))
  }

  test("sketch aggregation is partial: map-side MG buffers feed the exchange") {
    // The scale claim: ≤ m counters per group per map partition enter the
    // shuffle. That is exactly "partial ObjectHashAggregate below the
    // Exchange, final above" — pin it so a regression to final-only
    // aggregation (full token stream through the exchange) fails loudly.
    val df = skewed.toDF("tok").repartition(4)
      .groupBy(lit(1).as("g")).agg(misraGries(col("tok"), 8).as("mg"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate:\n$plan")
    assert(plan.contains("partial_misra_gries") || plan.contains("partial misra_gries")
      || plan.matches("(?s).*ObjectHashAggregate.*Exchange.*ObjectHashAggregate.*"),
      s"no partial aggregate below the exchange:\n$plan")
  }

  test("stored-summary compaction honors the MG bound over the union") {
    import graft.functions.MisraGriesAgg.misraGriesMerge
    val m = 5
    val exact = exactCounts
    val bound = N.toDouble / (m + 1)
    // three "ingest batches" persist their sketches; compaction folds the
    // STORED pairs — the corpus is never rescanned
    val slices = skewed.zipWithIndex.groupBy(_._2 % 3).values.toSeq
      .map(sl => sl.map(_._1).toDF("tok")
        .agg(misraGries(col("tok"), m).as("items"), count(lit(1)).as("n")))
    val merged = slices.reduce(_ unionByName _)
      .agg(misraGriesMerge(col("items"), col("n"), m).as("mg"))
      .select(col("mg.items"), col("mg.n")).collect()(0)
    val est = merged.getMap[String, Long](0).toMap
    assert(merged.getLong(1) == N, "n must be additive across batches")
    assert(est.size <= m)
    exact.foreach { case (tok, c) =>
      val e = est.getOrElse(tok, 0L)
      assert(e <= c, s"overestimate after compaction: $tok $e > $c")
      assert(c - e <= bound, s"bound broken after compaction: $tok est=$e exact=$c")
    }
    exact.filter(_._2 > bound).keys.foreach(tok =>
      assert(est.contains(tok), s"heavy hitter $tok lost in compaction"))
  }

  test("x_heavy_hitters contract booleans are all true at sf0.001") {
    val rows = SparkEntry.queries("x_heavy_hitters")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hh_in_sketch"), s"hh_in_sketch false: $r")
      assert(r.getAs[Boolean]("mg_bounds_ok"), s"mg_bounds_ok false: $r")
    }
  }
}
