package graft

import graft.operators.{InfiniGram, NgramStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The n-gram store's law: probing the store of a document multiset C
 * answers IDENTICALLY to the in-memory [[InfiniGram.probe]](C, queries)
 * — across appends, exact-negative removals, compactions, snapshots and
 * restores — with the grams scan partition-pruned to the query
 * digests' buckets.
 */
class NgramStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Small-vocab docs (deep digest sharing) + a planted segment with two
  // continuations + an end-of-doc-only match, the InfiniGramSpec shape.
  private def mkText(id: Long): String = {
    val rnd = new scala.util.Random(id * 31 + 7)
    val vocab = Vector("a", "b", "c", "d", "zz")
    val base = Seq.fill(6 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.size)))
    val plant =
      if (id % 7 == 2) Seq("p1", "p2", "p3", "p4", "p5", s"cont${id % 2}")
      else if (id % 7 == 5) Seq("endonly1", "endonly2")
      else Nil
    (base ++ plant).mkString(" ")
  }

  private lazy val docs =
    (0L until 40L).map(id => (id, mkText(id))).toDF("doc_id", "text")
      .localCheckpoint(true)
  private lazy val queries = Seq(
    (901L, "zz a b"),
    (902L, "x p1 p2 p3 p4 p5"),
    (903L, "endonly1 endonly2"),
    (904L, "never gonna match qnovel"),
    (905L, "")
  ).toDF("doc_id", "text").localCheckpoint(true)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ngram").toString + "/store"

  private def rows(df: DataFrame): Set[(Long, Int, Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getString(3), r.getLong(4))).toSet

  private def want(c: DataFrame): Set[(Long, Int, Long, String, Long)] =
    rows(InfiniGram.probe(c, "doc_id", "text", queries, "doc_id", "text", maxN = 4))

  private def probe(dir: String, tag: Option[String] = None) =
    rows(NgramStore.probe(spark, dir, queries, "doc_id", "text", tag))

  test("LAW: stored probe == in-memory probe; plants live; scan is bucket-pruned") {
    val dir = tmp()
    NgramStore.init(spark, dir, docs, "text", maxN = 4, numBuckets = 16)
    assert(NgramStore.maxN(dir) === 4)
    val got = NgramStore.probe(spark, dir, queries, "doc_id", "text")
    val g = rows(got)
    assert(g === want(docs))
    val byQ = g.map(r => r._1 -> r).toMap
    assert(byQ(902L)._2 === 4, "planted segment saturates maxN")
    assert(byQ(902L)._4.startsWith("cont"), "real continuation surfaces")
    assert(byQ(903L)._4 === "" && byQ(903L)._3 > 0,
      "end-of-doc-only match: occurrences but empty top token")
    assert(byQ(904L) === ((904L, 0, 0L, "", 0L)), "novel tail matches nothing")
    assert(byQ(905L) === ((905L, 0, 0L, "", 0L)), "empty query is a zero row")
    // The probe checkpoints its pruned hits (so both aggregations share
    // one scan), which severs the grams scan from the final plan — pin
    // the file-pruning lever on the scan-bearing relation itself, read
    // exactly as the probe reads it.
    val plan = NgramStore.readGrams(spark, dir, None, Some(Seq(1, 3)))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*__b".r.findFirstIn(plan).isDefined,
      s"expected a __b partition filter on the grams scan:\n$plan")
  }

  test("append folds O(batch): probe == in-memory over the union; named replay idempotent") {
    val dir = tmp()
    val c1 = docs.filter(col("doc_id") < 25)
    val c2 = docs.filter(col("doc_id") >= 25)
    NgramStore.init(spark, dir, c1, "text", maxN = 4, numBuckets = 16)
    assert(probe(dir) === want(c1))
    NgramStore.append(spark, dir, c2, "text", name = Some("b1"))
    NgramStore.append(spark, dir, c2, "text", name = Some("b1")) // replay no-op
    assert(probe(dir) === want(docs))
  }

  test("remove is the exact takedown inverse; compact is a pure layout change") {
    val dir = tmp()
    NgramStore.init(spark, dir, docs, "text", maxN = 4, numBuckets = 16)
    val victims = docs.filter(col("doc_id") % 7 === 2) // the cont-plant docs
    NgramStore.remove(spark, dir, victims, "text")
    val shrunk = docs.filter(col("doc_id") % 7 =!= 2)
    assert(probe(dir) === want(shrunk),
      "removed docs' grams must stop counting exactly")
    NgramStore.compact(spark, dir)
    assert(graft.sources.DeltaParts.list(dir).size === 1)
    assert(probe(dir) === want(shrunk), "compaction changes no answer")
    NgramStore.append(spark, dir, victims, "text")
    assert(probe(dir) === want(docs), "re-append after takedown restores")
  }

  test("snapshot pins, tagged probes time-travel, restore rolls back; Release kind 'ngram'") {
    val dir = tmp()
    val mdir = java.nio.file.Files.createTempDirectory("ngram-rel").toString
    val c1 = docs.filter(col("doc_id") < 25)
    NgramStore.init(spark, dir, c1, "text", maxN = 4, numBuckets = 16)
    graft.pipelines.Release.freeze(spark, mdir, "v1",
      Seq(graft.pipelines.Release.Member("ngram", dir)))
    val atV1 = want(c1)
    NgramStore.append(spark, dir, docs.filter(col("doc_id") >= 25), "text")
    assert(probe(dir) === want(docs), "append visible live")
    assert(probe(dir, Some("v1")) === atV1, "tagged probe replays the pin")
    assert(graft.pipelines.Release.verify(spark, mdir, "v1")
      .filter(!col("ok")).isEmpty)
    graft.pipelines.Release.restore(spark, mdir, "v1")
    assert(probe(dir) === atV1, "release restore rolls the store back")
  }

  test("fsck: healthy store audits clean; a vanished meta is flagged") {
    val dir = tmp()
    NgramStore.init(spark, dir, docs, "text", maxN = 4, numBuckets = 16)
    assert(NgramStore.fsck(spark, dir).filter(!col("ok")).isEmpty)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_meta"))
    assert(NgramStore.fsck(spark, dir).filter(!col("ok")).count() >= 1)
  }

  test("init refuses a previously-used dir; probe refuses an uninitialized one") {
    val dir = tmp()
    NgramStore.init(spark, dir, docs, "text", maxN = 4, numBuckets = 16)
    val e = intercept[Exception](
      NgramStore.init(spark, dir, docs, "text", maxN = 4))
    assert(e.getMessage.toLowerCase.contains("store"))
    val e2 = intercept[IllegalArgumentException](
      NgramStore.probe(spark, tmp(), queries, "doc_id", "text"))
    assert(e2.getMessage.contains("init"))
  }
}
