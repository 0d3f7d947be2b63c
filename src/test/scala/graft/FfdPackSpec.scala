package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurationOps

/** FFD packing: capacity holds in every bin, every in-range item is
  * assigned exactly once, oversize items are rejected with bin = -1,
  * and FFD never opens more bins than the streaming greedy fill. */
class FfdPackSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val cap = 64
  private def docs = (1 to 400).map { i =>
    val n = 1 + ((i * 2654435761L) % 90).toInt // some exceed cap
    (i.toLong, Seq.fill(n)("w").mkString(" "))
  }.toDF("doc_id", "text")

  private def packed =
    CurationOps.packFirstFitDecreasing(docs, "doc_id", "text", cap, shards = 4)
      .as[(Long, Long, Long, Int)].collect()

  test("every bin holds <= capacity; every item assigned exactly once") {
    val p = packed
    assert(p.map(_._1).distinct.length === 400)
    p.groupBy(r => (r._2, r._4)).foreach { case ((shard, bin), rows) =>
      if (bin != -1)
        assert(rows.map(_._3).sum <= cap, s"overfull bin $bin in shard $shard")
    }
  }

  test("oversize items get bin = -1 and exactly they") {
    val p = packed
    p.foreach { case (_, _, nt, bin) =>
      assert((bin == -1) === (nt > cap), s"nt=$nt bin=$bin")
    }
  }

  test("FFD opens no more bins than the streaming greedy fill") {
    val p = packed.filter(_._4 != -1)
    val ffdBins = p.groupBy(_._2).view.mapValues(_.map(_._4).max).toMap
    // streaming greedy (the packSequences cut rule) per shard, doc order
    val greedyBins = p.groupBy(_._2).view.mapValues { rows =>
      var bins = 1; var load = 0L
      rows.sortBy(_._1).foreach { case (_, _, nt, _) =>
        if (load + nt > cap) { bins += 1; load = nt } else load += nt
      }
      bins
    }.toMap
    ffdBins.foreach { case (shard, nb) =>
      assert(nb <= greedyBins(shard),
        s"shard $shard: FFD $nb bins vs greedy ${greedyBins(shard)}")
    }
  }
}
