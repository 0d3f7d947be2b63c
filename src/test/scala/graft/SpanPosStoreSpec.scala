package graft

import graft.operators.{SpanDedup, SpanPosStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The positional span store's incremental-equality law: probing the
 * store of a document set C answers IDENTICALLY to the in-memory
 * [[SpanDedup.maximalRepeatsAgainst]](batch, C) — across appends,
 * removals, compactions, and restores — with corpus text never read
 * and the window scan partition-pruned to the eligible digests'
 * buckets.
 */
class SpanPosStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // The x_substr_maximal fixture shape, self-contained: a 14-token group
  // phrase (group = id % 8, ids < 40) planted at offsets that VARY
  // within a group ((id / 8) % 4), a batch-shared 12-token phrase (the
  // batch-vs-batch lane), a doc-unique separator, and a universal
  // 8-token footer that the occurrence cap (maxOcc = 16 here, 60 docs)
  // must drop from every pair.
  private def mkText(id: Long): String = {
    val base = (1 to 30).map(j => s"w${id}x$j")
    val off = ((id / 8) % 4).toInt
    val phrase = (1 to 14).map(j => s"seg${id % 8}tok$j")
    val planted = if (id < 40) base.take(off) ++ phrase ++ base.drop(off) else base
    val share = if (id % 5 == 0 && id < 50) (1 to 12).map(j => s"bshare$j") else Nil
    (planted ++ share ++ Seq(s"sep$id") ++ (1 to 8).map(j => s"foot$j")).mkString(" ")
  }

  private lazy val docs =
    (0L until 60L).map(id => (id, mkText(id))).toDF("doc_id", "text")
      .localCheckpoint(true)
  private lazy val batch = docs.filter(col("doc_id") % 5 === 0).localCheckpoint(true)
  private lazy val corpus = docs.filter(col("doc_id") % 5 =!= 0).localCheckpoint(true)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("spanpos").toString + "/store"

  private def rows(df: DataFrame): Set[(Long, Int, Long, Int, Int, String)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getInt(3), r.getInt(4), r.getString(5))).toSet

  private def want(c: DataFrame): Set[(Long, Int, Long, Int, Int, String)] =
    rows(SpanDedup.maximalRepeatsAgainst(batch, c, "doc_id", "text",
      minLen = 8, maxOcc = 16))

  test("LAW: store probe == in-memory maximalRepeatsAgainst; both lanes live; corpus pairs absent; cap live") {
    val dir = tmp()
    SpanPosStore.init(spark, dir, corpus, "doc_id", "text", k = 8)
    assert(SpanPosStore.k(dir) === 8)
    val got = SpanPosStore.probeMaximalRepeats(spark, dir, batch,
      "doc_id", "text", maxOcc = 16)
    val g = rows(got)
    assert(g === want(corpus), "store probe must equal the in-memory form")
    assert(g.nonEmpty)
    val batchIds = (0L until 60L by 5L).toSet
    assert(g.forall(r => batchIds(r._1) || batchIds(r._3)),
      "every pair must touch the batch")
    assert(g.exists(r => batchIds(r._1) && batchIds(r._3)),
      "the batch-vs-batch lane (bshare plant) must be live")
    assert(g.exists(r => batchIds(r._1) ^ batchIds(r._3)),
      "the batch-vs-corpus lane (seg plants) must be live")
    assert(g.exists(_._6.contains("seg")), "planted phrases must surface")
    assert(!g.exists(_._6.contains("foot1")),
      "the 60-occurrence footer must be cap-dropped from every pair")
    // The scale pin: the stored-window scan carries a __b partition
    // filter — the probe opens only the eligible digests' bucket files,
    // never the whole window relation.
    val plan = got.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*__b".r.findFirstIn(plan).isDefined,
      s"expected a __b partition filter on the windows scan:\n$plan")
  }

  test("append folds new docs O(batch): probe == in-memory over the union") {
    val dir = tmp()
    val c1 = corpus.filter(col("doc_id") < 30)
    val c2 = corpus.filter(col("doc_id") >= 30)
    SpanPosStore.init(spark, dir, c1, "doc_id", "text", k = 8)
    SpanPosStore.append(spark, dir, c2, "doc_id", "text")
    assert(rows(SpanPosStore.probeMaximalRepeats(spark, dir, batch,
      "doc_id", "text", maxOcc = 16)) === want(corpus))
  }

  test("remove tombstones + exact negative counts; re-append refused until compact; compact restores it") {
    val dir = tmp()
    SpanPosStore.init(spark, dir, corpus, "doc_id", "text", k = 8)
    val victims = corpus.filter(col("doc_id") % 8 === 1)
    SpanPosStore.remove(spark, dir, victims, "doc_id", "text")
    val shrunk = corpus.filter(col("doc_id") % 8 =!= 1)
    assert(rows(SpanPosStore.probeMaximalRepeats(spark, dir, batch,
      "doc_id", "text", maxOcc = 16)) === want(shrunk),
      "removed docs must stop pairing AND stop counting toward eligibility")
    // A tombstoned id cannot re-append: the anti-join would erase it.
    val e = intercept[IllegalArgumentException](
      SpanPosStore.append(spark, dir, victims, "doc_id", "text"))
    assert(e.getMessage.contains("tombstones"))
    // Compaction folds tombstones away: answers unchanged, re-append legal.
    SpanPosStore.compact(spark, dir)
    assert(graft.sources.DeltaParts.list(dir).size === 1)
    assert(rows(SpanPosStore.probeMaximalRepeats(spark, dir, batch,
      "doc_id", "text", maxOcc = 16)) === want(shrunk),
      "compaction is a pure layout change")
    SpanPosStore.append(spark, dir, victims, "doc_id", "text")
    assert(rows(SpanPosStore.probeMaximalRepeats(spark, dir, batch,
      "doc_id", "text", maxOcc = 16)) === want(corpus))
  }

  test("snapshot pins state across mutations; tagged probes time-travel; restore rolls back") {
    val dir = tmp()
    val c1 = corpus.filter(col("doc_id") < 30)
    SpanPosStore.init(spark, dir, c1, "doc_id", "text", k = 8)
    SpanPosStore.snapshot(dir, "v1")
    val atV1 = want(c1)
    SpanPosStore.append(spark, dir, corpus.filter(col("doc_id") >= 30),
      "doc_id", "text")
    assert(rows(SpanPosStore.probeMaximalRepeats(spark, dir, batch,
      "doc_id", "text", maxOcc = 16)) === want(corpus), "append visible live")
    assert(rows(SpanPosStore.probeMaximalRepeats(spark, dir, batch,
      "doc_id", "text", maxOcc = 16, tag = Some("v1"))) === atV1,
      "a tagged probe must replay the pinned state")
    SpanPosStore.restore(dir, "v1")
    assert(rows(SpanPosStore.probeMaximalRepeats(spark, dir, batch,
      "doc_id", "text", maxOcc = 16)) === atV1, "restore rolls the live state back")
  }

  test("degenerate batches: empty batch and all-novel batch both probe to empty, loudly well-formed") {
    val dir = tmp()
    SpanPosStore.init(spark, dir, corpus, "doc_id", "text", k = 8)
    assert(SpanPosStore.probeMaximalRepeats(spark, dir,
      batch.limit(0), "doc_id", "text", maxOcc = 16).isEmpty,
      "an empty batch has no batch-touching pairs")
    val novel = Seq((2001L, (1 to 20).map(j => s"novel$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(SpanPosStore.probeMaximalRepeats(spark, dir,
      novel, "doc_id", "text", maxOcc = 16).isEmpty,
      "a batch sharing nothing with the corpus (zero eligible digests) probes empty")
  }

  test("Release kind 'spanpos': freeze pins the store, restore rolls it back with the release") {
    val dir = tmp()
    val mdir = java.nio.file.Files.createTempDirectory("spanpos-rel").toString
    val c1 = corpus.filter(col("doc_id") < 30)
    SpanPosStore.init(spark, dir, c1, "doc_id", "text", k = 8)
    graft.pipelines.Release.freeze(spark, mdir, "v1",
      Seq(graft.pipelines.Release.Member("spanpos", dir)))
    val atV1 = want(c1)
    SpanPosStore.append(spark, dir, corpus.filter(col("doc_id") >= 30),
      "doc_id", "text")
    val verify = graft.pipelines.Release.verify(spark, mdir, "v1")
    assert(verify.filter(!col("ok")).isEmpty, "the release must stay fully pinned")
    graft.pipelines.Release.restore(spark, mdir, "v1")
    assert(rows(SpanPosStore.probeMaximalRepeats(spark, dir, batch,
      "doc_id", "text", maxOcc = 16)) === atV1)
  }

  test("fsck: healthy store audits clean; a vanished meta is flagged") {
    val dir = tmp()
    SpanPosStore.init(spark, dir, corpus, "doc_id", "text", k = 8)
    def bad(df: DataFrame): Set[String] = df.filter(!col("ok"))
      .select("check").collect().map(_.getString(0)).toSet
    assert(bad(SpanPosStore.fsck(spark, dir)).isEmpty)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_meta"))
    assert(bad(SpanPosStore.fsck(spark, dir)) === Set("meta_resolves"))
  }

  test("init refuses a previously-used dir; a held lease refuses a concurrent append") {
    val dir = tmp()
    SpanPosStore.init(spark, dir, corpus, "doc_id", "text", k = 8)
    val e = intercept[IllegalStateException](
      SpanPosStore.init(spark, dir, corpus, "doc_id", "text", k = 8))
    assert(e.getMessage.contains("already initialized"))
    graft.sources.WriterLease.withLease(dir, "spec-holder") {
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() =>
        try { SpanPosStore.append(spark, dir,
          Seq((1001L, "fresh words one two three four five six seven eight"))
            .toDF("doc_id", "text"), "doc_id", "text") }
        catch { case x: Throwable => err.set(x) })
      t.start(); t.join(60000)
      assert(err.get() != null && err.get()
        .isInstanceOf[graft.sources.WriterLease.ConcurrentWriterException],
        s"expected a loud concurrent-writer refusal, got ${err.get()}")
    }
  }
}
