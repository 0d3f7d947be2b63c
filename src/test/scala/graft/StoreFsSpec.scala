package graft

import graft.sources.{DeltaParts, HadoopStoreFs, LocalStoreFs, StoreFs, TableSink, WriterLease}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The StoreFs seam: the primitive contract both implementations must
  * meet (the trait's documented per-op guarantees), and the whole
  * store family running UNCHANGED over the swapped Hadoop-API
  * implementation — the drop-in the seam exists for, proven on the
  * local filesystem (HadoopStoreFs over file:/// is a genuinely
  * different code path meeting the same contract). */
class StoreFsSpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("storefs").toString

  /** The primitive contract, run against any implementation. */
  private def primitiveContract(fs: StoreFs): Unit = {
    val d = tmp()
    // writeAtomic: publish, replace, parents created; no visible debris.
    fs.writeAtomic(s"$d/sub/_PTR", "one")
    assert(fs.readString(s"$d/sub/_PTR") === "one")
    fs.writeAtomic(s"$d/sub/_PTR", "two")
    assert(fs.readString(s"$d/sub/_PTR") === "two")
    assert(fs.list(s"$d/sub").map(_.name) === Seq("_PTR"),
      "temp artifacts must not persist after a successful publish")
    // createNew: exclusive — second caller sees false, content intact.
    assert(fs.createNew(s"$d/_LEASE", "a"))
    assert(!fs.createNew(s"$d/_LEASE", "b"))
    assert(fs.readString(s"$d/_LEASE") === "a")
    // moveAtomic no-replace: refuses an occupied destination.
    fs.writeAtomic(s"$d/x", "x"); fs.writeAtomic(s"$d/y", "y")
    intercept[java.io.IOException](fs.moveAtomic(s"$d/x", s"$d/y"))
    assert(fs.readString(s"$d/y") === "y")
    fs.moveAtomic(s"$d/x", s"$d/y", replaceExisting = true)
    assert(fs.readString(s"$d/y") === "x")
    assert(!fs.exists(s"$d/x"))
    // moveAtomic: a vanished source is an IOException (the lost-race
    // signal the lease healer relies on), never a silent no-op.
    intercept[java.io.IOException](fs.moveAtomic(s"$d/gone", s"$d/z"))
    // list: names + kinds; absent dir = empty, file = empty.
    fs.mkdirs(s"$d/part_00000")
    val entries = fs.list(d).map(e => e.name -> e.isDirectory).toMap
    assert(entries("part_00000") === true)
    assert(entries("_LEASE") === false)
    assert(fs.list(s"$d/absent") === Seq.empty)
    // lastModified/touch: absent → None; touch bumps.
    assert(fs.lastModifiedMillis(s"$d/absent").isEmpty)
    val t0 = fs.lastModifiedMillis(s"$d/_LEASE").get
    Thread.sleep(5)
    fs.touch(s"$d/_LEASE")
    assert(fs.lastModifiedMillis(s"$d/_LEASE").get >= t0)
    // canonical: stable across spellings (the lease reentrancy key).
    assert(fs.canonical(s"$d/a/../a") === fs.canonical(s"$d/a"))
    // delete: file vs tree.
    assert(fs.deleteIfExists(s"$d/_LEASE"))
    assert(!fs.deleteIfExists(s"$d/_LEASE"))
    fs.writeAtomic(s"$d/part_00000/f", "payload")
    fs.deleteRecursively(s"$d/part_00000")
    assert(!fs.exists(s"$d/part_00000"))
  }

  test("LocalStoreFs meets the primitive contract") {
    primitiveContract(LocalStoreFs)
  }

  test("HadoopStoreFs (over file:///) meets the primitive contract") {
    primitiveContract(HadoopStoreFs.local())
  }

  test("store lifecycle runs unchanged over the swapped Hadoop seam") {
    import spark.implicits._
    StoreFs.set(HadoopStoreFs.local())
    try {
      // TableSink: upsert → read → snapshot → upsert → restore → fsck.
      val dir = tmp() + "/table"
      val t1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver")
      TableSink.upsert(spark, dir, t1, Seq("id"), "ver", numBuckets = 4)
      TableSink.snapshot(dir, "tag1")
      val t2 = Seq((2L, "B", 2L), (3L, "c", 2L)).toDF("id", "v", "ver")
      TableSink.upsert(spark, dir, t2, Seq("id"), "ver", numBuckets = 4)
      val live = TableSink.read(spark, dir, t1).orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(live === Seq((1L, "a"), (2L, "B"), (3L, "c")))
      val snap = TableSink.readSnapshot(spark, dir, "tag1").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(snap === Seq((1L, "a"), (2L, "b")))
      TableSink.restore(dir, "tag1")
      assert(TableSink.read(spark, dir, t1).count() === 2)
      val fsck = graft.sources.StoreCheck.tableSink(spark, dir)
      assert(fsck.filter(!col("ok")).count() === 0, "fsck green")

      // DeltaParts: publish/add/snapshot/restore under the lease.
      val ld = tmp() + "/ledger"
      DeltaParts.add(ld, "part_00000")
      DeltaParts.add(ld, "part_00001")
      assert(DeltaParts.list(ld) === Seq("part_00000", "part_00001"))
      DeltaParts.snapshot(ld, "s1")
      DeltaParts.add(ld, "part_00002")
      DeltaParts.restore(ld, "s1")
      assert(DeltaParts.list(ld) === Seq("part_00000", "part_00001"))

      // WriterLease: exclusion + release over the swapped seam.
      val wd = tmp()
      WriterLease.withLease(wd, "outer") {
        val t = new Thread(() => {
          intercept[WriterLease.ConcurrentWriterException](
            WriterLease.withLease(wd, "rival") { fail("must not run") })
          ()
        })
        t.start(); t.join()
      }
      // released: a fresh writer acquires cleanly
      WriterLease.withLease(wd, "after") { () }
    } finally StoreFs.resetLocal()
  }

  test("requireCompatible: local seam refuses schemes and stays one place") {
    val e1 = intercept[IllegalArgumentException](
      LocalStoreFs.requireCompatible("file:///tmp/x", spark))
    assert(e1.getMessage.contains("explicit scheme 'file'"))
    LocalStoreFs.requireCompatible("/tmp/plainpath", spark) // accepted
    val e2 = intercept[IllegalArgumentException](
      HadoopStoreFs.local().requireCompatible("s3://bucket/x", spark))
    assert(e2.getMessage.contains("explicit scheme 's3'"))
    HadoopStoreFs.local().requireCompatible("/tmp/plainpath", spark)
  }
}
