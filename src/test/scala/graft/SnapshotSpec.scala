package graft

import graft.sources.TableSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot tags: a pinned generation stays byte-identical readable
  * across any number of later commits and GCs — the training-data
  * reproducibility contract — and unpinning releases it to GC. */
class SnapshotSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def upsert(dir: String, rows: Seq[(Long, String)], v: Long): Unit =
    TableSink.upsert(spark, dir,
      rows.toDF("k", "payload").withColumn("__v", lit(v)), Seq("k"), "__v")

  test("tag validation and empty-generation snapshots fail loud") {
    val dir = java.nio.file.Files.createTempDirectory("snap-edge").toString
    upsert(dir, Seq(1L -> "a"), 1L)
    // dot-leading names collide with atomicWrite's temp-file namespace —
    // they would be accepted yet never GC-pinned; reject them up front
    intercept[IllegalArgumentException](TableSink.snapshot(dir, ".hidden"))
    intercept[IllegalArgumentException](TableSink.snapshot(dir, "has/slash"))
    // a dotted-but-letter-leading tag is fine AND gets pinned
    TableSink.snapshot(dir, "v1.tmp")
    assert(TableSink.listSnapshots(dir).contains("v1.tmp"))
    // snapshot of a generation whose buckets were all emptied: named
    // error, not an unexplained schema-inference crash
    TableSink.delete(spark, dir, Seq(1L).toDF("k"), Seq("k"))
    TableSink.snapshot(dir, "empty-gen")
    val e = intercept[IllegalStateException](
      TableSink.readSnapshot(spark, dir, "empty-gen"))
    assert(e.getMessage.contains("EMPTY table generation"))
  }

  test("a tagged generation survives GC and reads back exactly; drop releases it") {
    val dir = java.nio.file.Files.createTempDirectory("snap").toString
    val prev = sys.props.get("graft.sink.gcGraceMs")
    sys.props("graft.sink.gcGraceMs") = "0"   // count bound only
    try {
      upsert(dir, Seq(1L -> "a", 2L -> "b"), 1L)
      upsert(dir, Seq(2L -> "b2", 3L -> "c"), 2L)
      val gen = TableSink.snapshot(dir, "train-v1")
      assert(TableSink.listSnapshots(dir) == Map("train-v1" -> gen))
      val want = Map(1L -> "a", 2L -> "b2", 3L -> "c")

      // churn well past KeepGenerations so the pinned gen is GC-eligible
      // by recency — every k=1 bucket rewrite would otherwise drop it
      (3L to 8L).foreach(v => upsert(dir, Seq(1L -> s"a$v"), v))
      val snap = TableSink.readSnapshot(spark, dir, "train-v1")
        .select("k", "payload").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(snap == want, s"snapshot drifted: $snap")
      // the live table moved on
      val live = TableSink.read(spark, dir, Seq.empty[(Long, String)].toDF("k", "payload")
          .withColumn("__v", lit(0L)))
        .select("k", "payload").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(live(1L) == "a8" && live.size == 3)

      // rollback: the live table returns to the tagged state as a NEW
      // generation (no seq collision with later commits), and keeps
      // accepting upserts afterwards
      TableSink.restore(dir, "train-v1")
      val restored = TableSink.read(spark, dir,
          Seq.empty[(Long, String)].toDF("k", "payload").withColumn("__v", lit(0L)))
        .select("k", "payload").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(restored == want, s"restore drifted: $restored")
      upsert(dir, Seq(1L -> "post-restore"), 20L)
      val after = TableSink.read(spark, dir,
          Seq.empty[(Long, String)].toDF("k", "payload").withColumn("__v", lit(0L)))
        .select("k", "payload").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(after(1L) == "post-restore" && after.size == 3)

      TableSink.dropSnapshot(dir, "train-v1")
      assert(TableSink.listSnapshots(dir).isEmpty)
      upsert(dir, Seq(4L -> "d"), 9L)   // next commit GCs the unpinned gen
      intercept[Exception] {
        TableSink.readSnapshot(spark, dir, "train-v1")
          .select("k", "payload").collect()
      }
    } finally {
      prev match {
        case Some(v) => sys.props("graft.sink.gcGraceMs") = v
        case None => sys.props.remove("graft.sink.gcGraceMs")
      }
    }
  }
}
