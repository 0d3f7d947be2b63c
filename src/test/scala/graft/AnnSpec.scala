package graft

import graft.operators.{IvfAnn, SimilarityOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN quality: recall against the exact brute-force kNN must be
  * reasonable and must improve as more cells are probed. */
class AnnSpec extends AnyFunSuite with SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF recall ≥ 0.7 at nprobe=8/nlist=16 and improves with nprobe") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet").repartition(8).cache()
    val q = e.filter(col("vec_id") < 20)
    val exact = pairs(SimilarityOps.knnJoinCosine(q, e, "vec_id", "embedding", 5))
    val cells = IvfAnn.buildCells(e, "vec_id", "embedding", nlist = 16)
    val corpus = IvfAnn.assignCells(e, "vec_id", "embedding", cells)
    def recall(np: Int): Double = {
      val ann = pairs(IvfAnn.annSearch(q, corpus, cells, "vec_id", "embedding", 5, np))
      (ann & exact).size.toDouble / exact.size
    }
    val r2 = recall(2); val r8 = recall(8)
    assert(r8 >= 0.7, s"recall at nprobe=8 was $r8")
    assert(r8 > r2, s"recall must improve with probes: nprobe2=$r2 nprobe8=$r8")
    // full probe = exact search
    assert(recall(16) == 1.0, "probing all cells must equal brute force")
  }
}
