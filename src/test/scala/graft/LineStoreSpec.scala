package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurationOps, LineStore}

/** Standing boilerplate line inventory: the incremental-equality law
  * (batch scrub vs store(C) ≡ global scrub over C ∪ B restricted to B),
  * exact-count maintenance (replay, remove, compaction, snapshot). */
class LineStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Footer f repeats across docs; each batch doc also carries one
  // corpus-frequent line and one batch-only line.
  private def doc(id: Long, body: String): (Long, String) =
    (id, s"$body\nshared footer line\nunique to $id")

  private val corpus = (1L to 8L).map(i => doc(i, s"corpus body $i")).toDF("doc_id", "text")
  private val batch = (101L to 104L).map(i => doc(i, s"batch body $i")).toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("linestore").toString + "/s"

  private def collectScrub(df: DataFrame): Set[(Long, Int, Int, String)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet

  private def counts(dir: String): Map[String, Long] =
    LineStore.readCounts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("incremental scrub == global scrub over the union, restricted to the batch") {
    val dir = tmp()
    LineStore.init(spark, dir, corpus, "doc_id", "text")
    // 'shared footer line' df: 8 stored + 4 batch = 12 >= 5 → scrubbed
    // from batch docs even though the batch alone (4) is under the bar.
    val inc = LineStore.scrubIncremental(spark, dir, batch, "doc_id", "text", minDocs = 5)
    val global = CurationOps.scrubBoilerplateLines(
        corpus.union(batch), "doc_id", "text", minDocs = 5)
      .filter(col("doc_id") >= 100L)
    assert(collectScrub(inc) === collectScrub(global))
    assert(inc.filter(col("text").contains("shared footer")).isEmpty)
  }

  test("batch-by-batch fold matches the arrival-ordered global semantics") {
    val dir = tmp()
    val b2 = (201L to 203L).map(i => doc(i, s"late body $i")).toDF("doc_id", "text")
    LineStore.init(spark, dir, corpus, "doc_id", "text")
    LineStore.append(spark, dir, batch, "doc_id", "text", Some("b1"))
    // The second batch sees corpus ∪ batch as its standing state.
    val inc2 = LineStore.scrubIncremental(spark, dir, b2, "doc_id", "text", minDocs = 5)
    val global2 = CurationOps.scrubBoilerplateLines(
        corpus.union(batch).union(b2), "doc_id", "text", minDocs = 5)
      .filter(col("doc_id") >= 200L)
    assert(collectScrub(inc2) === collectScrub(global2))
  }

  test("named replay is a no-op, including after compaction") {
    val dir = tmp()
    LineStore.init(spark, dir, corpus, "doc_id", "text")
    LineStore.append(spark, dir, batch, "doc_id", "text", Some("b1"))
    val at = counts(dir)
    LineStore.append(spark, dir, batch, "doc_id", "text", Some("b1"))
    assert(counts(dir) === at)
    LineStore.compact(spark, dir)
    LineStore.append(spark, dir, batch, "doc_id", "text", Some("b1"))
    assert(counts(dir) === at)
  }

  test("remove is the exact inverse of append; snapshot time-travels") {
    val dir = tmp()
    LineStore.init(spark, dir, corpus, "doc_id", "text")
    LineStore.snapshot(dir, "v1")
    val at0 = counts(dir)
    LineStore.append(spark, dir, batch, "doc_id", "text", Some("b1"))
    LineStore.remove(spark, dir, batch, "doc_id", "text", Some("rm1"))
    LineStore.compact(spark, dir)
    assert(counts(dir) === at0)
    assert(LineStore.readCounts(spark, dir, Some("v1")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === at0)
  }
}
