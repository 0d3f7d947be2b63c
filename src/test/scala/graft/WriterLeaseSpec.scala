package graft

import graft.sources.{AdditiveLedger, DeltaParts, TableSink, WriterLease}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Single-writer enforcement: a second concurrent mutator of any store
  * dir fails LOUD (never a silent lost manifest/ledger flip), a crashed
  * writer's stale lease breaks instead of wedging the store, and the
  * lease is invisible to the well-behaved single-writer pipelines the
  * rest of the suite exercises. */
class WriterLeaseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def upsert(dir: String, rows: Seq[(Long, String)], v: Long): Unit =
    TableSink.upsert(spark, dir,
      rows.toDF("k", "payload").withColumn("__v", lit(v)), Seq("k"), "__v")

  test("a live lease makes a second TableSink writer fail loud, naming the holder") {
    val dir = tmp("lease-loud")
    upsert(dir, Seq(1L -> "a"), 1L)
    val second = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    WriterLease.withLease(dir, "spec-holder") {
      val t = new Thread(() =>
        try upsert(dir, Seq(2L -> "b"), 2L)
        catch { case e: Throwable => second.set(e) })
      t.start(); t.join(30000)
      assert(!t.isAlive, "second writer must fail fast, not block")
    }
    val e = second.get()
    assert(e != null, "second writer should have thrown")
    assert(e.isInstanceOf[WriterLease.ConcurrentWriterException], s"got $e")
    assert(e.getMessage.contains("spec-holder"))
    assert(e.getMessage.contains("single-writer"))
    // the loser wrote NOTHING: table state is exactly the first commit
    assert(TableSink.read(spark, dir, Seq((0L, "")).toDF("k", "payload"))
      .select("k", "payload").as[(Long, String)].collect().toSet == Set(1L -> "a"))
    // and the holder's release freed the slot
    upsert(dir, Seq(3L -> "c"), 3L)
    assert(TableSink.read(spark, dir, Seq((0L, "")).toDF("k", "payload"))
      .count() == 2)
  }

  test("ledger mutations refuse a concurrent writer and stay un-torn") {
    val dir = tmp("lease-ledger")
    AdditiveLedger.mutateNamed(dir, Seq(dir), Some("part_00000")) { n =>
      Files.createDirectories(Paths.get(dir, n)); DeltaParts.add(dir, n)
    }
    WriterLease.withLease(dir, "spec-holder") {
      val e = intercept[WriterLease.ConcurrentWriterException] {
        val t = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val th = new Thread(() =>
          try AdditiveLedger.mutateNamed(dir, Seq(dir), Some("part_00001")) { n =>
            Files.createDirectories(Paths.get(dir, n)); DeltaParts.add(dir, n)
          } catch { case x: Throwable => t.set(x) })
        th.start(); th.join(30000)
        throw t.get()
      }
      assert(e.getMessage.contains("spec-holder"))
    }
    assert(DeltaParts.list(dir) == Seq("part_00000"))
    // slot freed: the same mutation now lands
    AdditiveLedger.mutateNamed(dir, Seq(dir), Some("part_00001")) { n =>
      Files.createDirectories(Paths.get(dir, n)); DeltaParts.add(dir, n)
    }
    assert(DeltaParts.list(dir) == Seq("part_00000", "part_00001"))
  }

  test("raced adds serialize — neither part vanishes from the ledger") {
    val dir = tmp("lease-race")
    Files.createDirectories(Paths.get(dir))
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(8)
    val errs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    (0 until 8).foreach { i =>
      new Thread(() => {
        start.await()
        // Loud refusal is the contract under TRUE concurrency; retry a
        // few times like a scheduler would to let every add land.
        var tries = 0
        var ok = false
        while (!ok && tries < 200) {
          try { DeltaParts.add(dir, f"part_$i%05d"); ok = true }
          catch { case _: WriterLease.ConcurrentWriterException =>
            tries += 1; Thread.sleep(5) }
        }
        if (!ok) errs.add(s"part_$i never landed")
        done.countDown()
      }).start()
    }
    start.countDown()
    assert(done.await(60, TimeUnit.SECONDS))
    assert(errs.isEmpty, errs.toString)
    // the lost-update shape this lease exists to prevent: every add present
    assert(DeltaParts.list(dir).toSet == (0 until 8).map(i => f"part_$i%05d").toSet)
  }

  test("a crashed writer's stale lease breaks; a fresh one does not") {
    val dir = tmp("lease-stale")
    upsert(dir, Seq(1L -> "a"), 1L)
    // simulate a crashed writer: lease file left behind, mtime in the past
    val lease = Paths.get(dir, WriterLease.LeaseFile)
    Files.writeString(lease, "token=dead\nowner=crashed@host/t\nlabel=x\n")
    Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 31L * 60 * 1000))
    upsert(dir, Seq(2L -> "b"), 2L)  // stale break: proceeds
    assert(TableSink.read(spark, dir, Seq((0L, "")).toDF("k", "payload"))
      .count() == 2)
    assert(!Files.exists(lease), "healthy commit releases the broken slot")
    // fresh leftover (same content, current mtime): refuses
    Files.writeString(lease, "token=live\nowner=alive@host/t\nlabel=x\n")
    val e = intercept[WriterLease.ConcurrentWriterException](
      upsert(dir, Seq(3L -> "c"), 3L))
    assert(e.getMessage.contains("alive@host"))
    Files.delete(lease)
  }

  test("a held lease heartbeats — a long mutation is never broken as stale") {
    val dir = tmp("lease-beat")
    sys.props("graft.lease.staleMs") = "1200"
    try {
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      WriterLease.withLease(dir, "long-running") {
        Thread.sleep(2000) // > staleMs — only the heartbeat keeps it live
        val t = new Thread(() =>
          try WriterLease.withLease(dir, "intruder") {
            err.set(new AssertionError("acquired a LIVE writer's lease"))
          }
          catch { case x: Throwable => err.set(x) })
        t.start(); t.join(10000)
      }
      assert(err.get() != null &&
        err.get().isInstanceOf[WriterLease.ConcurrentWriterException],
        s"an old-but-beating lease must refuse, never break: ${err.get()}")
    } finally { sys.props.remove("graft.lease.staleMs"); () }
  }

  test("reentrancy: a pipeline-root lease nests its stores' mutations") {
    val root = tmp("lease-reent")
    val tableDir = s"$root/table"
    // same-dir reentrancy (the mutateNamed → DeltaParts.add shape)
    WriterLease.withLease(root, "outer") {
      WriterLease.withLease(root, "inner-same-dir") {
        // distinct child dir: its own lease, freely nested
        upsert(tableDir, Seq(1L -> "a"), 1L)
      }
    }
    assert(TableSink.read(spark, tableDir, Seq((0L, "")).toDF("k", "payload"))
      .count() == 1)
    assert(!Files.exists(Paths.get(root, WriterLease.LeaseFile)))
    assert(!Files.exists(Paths.get(tableDir, WriterLease.LeaseFile)))
  }

  test("a failed mutation still releases the lease") {
    val dir = tmp("lease-fail")
    intercept[Exception] {
      // non-string layout-column refusal fires INSIDE the leased commit
      TableSink.upsert(spark, dir,
        Seq((1L, "a")).toDF("k", "payload").withColumn("__v", lit(1L)),
        Seq("k"), "__v", layoutCol = Some("k"))
    }
    assert(!Files.exists(Paths.get(dir, WriterLease.LeaseFile)))
    upsert(dir, Seq(2L -> "b"), 2L)   // next writer unaffected
    assert(TableSink.read(spark, dir, Seq((0L, "")).toDF("k", "payload"))
      .count() == 1)
  }

  test("admission funnel: concurrent run refused at funnel scope, state intact") {
    val store = tmp("lease-adm")
    // funnel-passing docs: ≥ 50 words, stop words present, sane word
    // lengths (the AdmissionSpec goodText shape), unique per id
    def good(i: Long): String =
      (s"the quick start and most of this is a fine piece num$i" +:
        (0 until 55).map(j => f"w$i%02dx$j%02d")).mkString(" ")
    val docs = (1L to 20L).map(i => (i, good(i))).toDF("doc_id", "text")
    pipelines.Admission.init(spark, store, docs, "doc_id", "text")
    val batch = (21L to 25L).map(i => (i, good(i))).toDF("doc_id", "text")
    WriterLease.withLease(store, "spec-holder") {
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() =>
        try { pipelines.Admission.run(spark, store, batch, "doc_id", "text"); () }
        catch { case x: Throwable => err.set(x) })
      t.start(); t.join(60000)
      assert(err.get() != null &&
        err.get().isInstanceOf[WriterLease.ConcurrentWriterException])
    }
    // after release the same batch admits normally
    val out = pipelines.Admission.run(spark, store, batch, "doc_id", "text")
    assert(out.filter(col("verdict") === "admitted").count() == 5)
  }
}
