package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurationOps, LmStore}

/** Standing-state n-gram LM: every law is EXACT integer equality
  * (counts are purely additive — no tolerance bands).
  *  - append fold ≡ models over the union;
  *  - named replay is a no-op, including replay AFTER a compaction
  *    folded the named part;
  *  - remove is the exact inverse of append;
  *  - a snapshot tag replays the tagged state across later mutations;
  *  - init refuses a used dir. */
class LmStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val c0 = docsOf(1L -> "the cat sat on the mat", 2L -> "a dog barks at the cat")
  private val b1 = docsOf(3L -> "the cat runs fast", 4L -> "dogs and cats play")
  private val b2 = docsOf(5L -> "the mat sat still", 6L -> "a cat naps")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("lmstore").toString + "/s"

  private def models(dir: String, tag: Option[String] = None)
      : (Set[(String, Long)], Set[(String, String, Long)]) = {
    val (u, b) = LmStore.readModels(spark, dir, tag)
    (u.collect().map(r => (r.getString(0), r.getLong(1))).toSet,
      b.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)
  }

  private def reference(docs: DataFrame)
      : (Set[(String, Long)], Set[(String, String, Long)]) = (
    CurationOps.unigramModel(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet,
    CurationOps.bigramModel(docs, "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)

  test("append fold == models over the union (exact)") {
    val dir = tmp()
    LmStore.init(spark, dir, c0, "text")
    LmStore.append(spark, dir, b1, "text")
    LmStore.append(spark, dir, b2, "text")
    assert(models(dir) === reference(c0.union(b1).union(b2)))
    LmStore.compact(spark, dir)
    assert(models(dir) === reference(c0.union(b1).union(b2)))
  }

  test("named replay is a no-op, including after compaction folded the part") {
    val dir = tmp()
    LmStore.init(spark, dir, c0, "text")
    LmStore.append(spark, dir, b1, "text", Some("b1"))
    LmStore.append(spark, dir, b1, "text", Some("b1")) // plain replay
    assert(models(dir) === reference(c0.union(b1)))
    LmStore.compact(spark, dir)
    LmStore.append(spark, dir, b1, "text", Some("b1")) // replay after fold
    assert(models(dir) === reference(c0.union(b1)))
  }

  test("remove is the exact inverse of append") {
    val dir = tmp()
    LmStore.init(spark, dir, c0, "text")
    LmStore.append(spark, dir, b1, "text", Some("b1"))
    LmStore.remove(spark, dir, b1, "text", Some("rm_b1"))
    assert(models(dir) === reference(c0))
    LmStore.compact(spark, dir)
    assert(models(dir) === reference(c0))
  }

  test("snapshot tag replays the tagged state across later mutations") {
    val dir = tmp()
    LmStore.init(spark, dir, c0, "text")
    LmStore.snapshot(dir, "v1")
    val at1 = models(dir)
    LmStore.append(spark, dir, b1, "text")
    LmStore.compact(spark, dir)
    assert(models(dir, Some("v1")) === at1)
    assert(models(dir) === reference(c0.union(b1)))
  }

  test("init refuses a used dir") {
    val dir = tmp()
    LmStore.init(spark, dir, c0, "text")
    val e = intercept[IllegalStateException](LmStore.init(spark, dir, b1, "text"))
    assert(e.getMessage.contains("already initialized"))
  }
}
