package graft

import graft.operators.{MediaStore, MultimodalOps}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/**
 * The standing media-dedup store: exact (sha) before perceptual
 * (dhash) before novel, only NOVEL documents anchor later verdicts
 * (keep-first — a dropped document's bytes never register), takedown
 * un-anchors content, and undecodable payloads degrade to exact-only
 * semantics without crashing.
 */
class MediaStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // The x_mm_phash_dedup fixture: pattern → dHash cluster, brightness
  // shift → byte-distinct re-encode within the cluster.
  private def img(pattern: Int, off: Int): Array[Byte] =
    MultimodalOps.fixturePng(pattern, off)

  private def media(rows: (Long, Array[Byte])*): DataFrame =
    rows.toDF("id", "payload")

  private def verdicts(out: DataFrame): Map[Long, (String, Long)] =
    out.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("mediastore").toString

  test("funnel verdicts + keep-first: dropped documents never anchor") {
    val dir = tmp()
    MediaStore.init(spark, dir, media(1L -> img(1, 0), 2L -> img(2, 0)))
    val b1 = media(
      11L -> img(1, 0), // exact copy of corpus 1
      12L -> img(1, 5), // re-encode of pattern 1
      13L -> img(3, 0), // new pattern → novel, anchors the rest
      14L -> img(3, 5), // re-encode of 13 → dropped
      15L -> img(3, 5)) // SAME BYTES as dropped 14
    val v1 = verdicts(MediaStore.run(spark, dir, b1, version = 1L))
    assert(v1(11L) == ("duplicate", 1L), s"$v1")
    assert(v1(12L) == ("near_duplicate", 1L), s"$v1")
    assert(v1(13L) == ("novel", -1L), s"$v1")
    assert(v1(14L) == ("near_duplicate", 13L), s"$v1")
    // the subtle pin: 15's bytes match only the DROPPED 14, whose sha
    // never registered — so 15 is a near-dup of the pattern's FIRST
    assert(v1(15L) == ("near_duplicate", 13L),
      s"a doc matching only a dropped doc's bytes must near-dup the first: $v1")
    // a second run probes the GROWN store: 13's keys anchor now
    val v2 = verdicts(MediaStore.run(spark, dir,
      media(21L -> img(3, 0), 22L -> img(3, 10)), version = 2L))
    assert(v2(21L) == ("duplicate", 13L), s"$v2")
    assert(v2(22L) == ("near_duplicate", 13L), s"$v2")
  }

  test("remove un-anchors content; the next submission is novel and re-anchors") {
    val dir = tmp()
    MediaStore.init(spark, dir, media(1L -> img(7, 0)))
    assert(verdicts(MediaStore.run(spark, dir,
      media(31L -> img(7, 5)), 1L))(31L)._1 == "near_duplicate")
    MediaStore.remove(spark, dir, media(99L -> img(7, 0)))
    val v2 = verdicts(MediaStore.run(spark, dir, media(41L -> img(7, 5)), 2L))
    assert(v2(41L) == ("novel", -1L),
      s"removed content must stop anchoring: $v2")
    assert(verdicts(MediaStore.run(spark, dir,
      media(51L -> img(7, 5)), 3L))(51L) == ("duplicate", 41L),
      "the post-removal novel must anchor again")
  }

  test("undecodable payloads degrade to exact-only semantics") {
    val dir = tmp()
    MediaStore.init(spark, dir, media(1L -> "junk-one".getBytes))
    val v = verdicts(MediaStore.run(spark, dir, media(
      61L -> "junk-one".getBytes,
      62L -> "junk-two".getBytes,
      63L -> "junk-two".getBytes), 1L))
    assert(v(61L) == ("duplicate", 1L), s"$v")
    assert(v(62L) == ("novel", -1L), s"$v")
    assert(v(63L) == ("duplicate", 62L), s"$v")
    // and junk never perceptually clusters with anything
    assert(verdicts(MediaStore.run(spark, dir,
      media(71L -> "junk-three".getBytes), 2L))(71L)._1 == "novel")
  }

  // The x_mm_audio_fp_dedup fixture shape: recording → fingerprint
  // cluster, container swap / 2× gain → byte-distinct re-publish.
  private def wav(g: Int, gain: Int, aiff: Boolean = false): Array[Byte] = {
    val s = Array.tabulate(130)(i =>
      ((java.lang.Long.remainderUnsigned(
        MultimodalOps.fmix64(g * 1009L + i * 101L), 1601L) - 800L)
        * gain).toShort)
    MultimodalOps.synthesizeWav(8000f, s, aiff)
  }

  // The x_mm_video_sig_dedup fixture shape: per-frame patterns keyed by
  // (video, frame), brightness shift → byte-distinct re-publish.
  private def vid(g: Int, off: Int): Array[Byte] =
    MultimodalOps.synthesizeVideo((0 until 6).map(fr => img(g * 50 + fr, off)))

  test("perceptual lane is modality-sniffed: audio and video re-publishes cluster like images") {
    val dir = tmp()
    MediaStore.init(spark, dir, media(
      1L -> img(1, 0), 2L -> wav(1, 1), 3L -> vid(1, 0)))
    val v = verdicts(MediaStore.run(spark, dir, media(
      11L -> wav(1, 1, aiff = true), // container swap → same fingerprint
      12L -> wav(1, 2),              // exactly 2× gain → same fingerprint
      13L -> vid(1, 5),              // shifted frames → same signature
      14L -> wav(2, 1),              // different recording → novel
      15L -> img(1, 5)), 1L)         // the image lane, unchanged
    )
    assert(v(11L) == ("near_duplicate", 2L), s"$v")
    assert(v(12L) == ("near_duplicate", 2L), s"$v")
    assert(v(13L) == ("near_duplicate", 3L), s"$v")
    assert(v(14L) == ("novel", -1L), s"$v")
    assert(v(15L) == ("near_duplicate", 1L), s"$v")
  }

  test("takedown of a non-anchor member keeps the perceptual class anchored") {
    val dir = tmp()
    // A(1) and B(2): one perceptual class, different bytes, both in corpus
    MediaStore.init(spark, dir, media(1L -> img(11, 0), 2L -> img(11, 5)))
    // removing B — NOT the class anchor (rep = min id = 1) — must not
    // un-anchor the class A still represents
    MediaStore.remove(spark, dir, media(99L -> img(11, 5)))
    val v = verdicts(MediaStore.run(spark, dir, media(31L -> img(11, 10)), 1L))
    assert(v(31L) == ("near_duplicate", 1L),
      s"the class anchored by live content must survive a member takedown: $v")
    // B's exact bytes resubmitted: its sha fell, but the class lives on
    assert(verdicts(MediaStore.run(spark, dir,
      media(41L -> img(11, 5)), 2L))(41L) == ("near_duplicate", 1L))
    // removing the ANCHOR un-anchors the class — the documented residual
    MediaStore.remove(spark, dir, media(98L -> img(11, 0)))
    assert(verdicts(MediaStore.run(spark, dir,
      media(51L -> img(11, 7)), 3L))(51L)._1 == "novel")
  }

  test("init refuses a previously-used dir; run refuses a missing store") {
    val dir = tmp()
    MediaStore.init(spark, dir, media(1L -> img(9, 0)))
    intercept[IllegalStateException](
      MediaStore.init(spark, dir, media(2L -> img(9, 5))))
    val e = intercept[IllegalArgumentException](
      MediaStore.run(spark, s"$dir-nowhere", media(3L -> img(9, 0)), 1L))
    assert(e.getMessage.contains("init"))
  }

  test("snapshot/restore roll both key relations back; the commit log survives") {
    val dir = tmp()
    MediaStore.init(spark, dir, media(1L -> img(1, 0)))
    MediaStore.runCommitted(spark, dir, media(11L -> img(2, 0)), batchId = 1L)
    MediaStore.snapshot(dir, "t1")
    MediaStore.runCommitted(spark, dir, media(21L -> img(3, 0)), batchId = 2L)
    assert(verdicts(MediaStore.run(spark, dir,
      media(31L -> img(3, 5)), 9L))(31L)._1 == "near_duplicate",
      "post-tag content must anchor before the rollback")
    MediaStore.restore(dir, "t1")
    // rolled back: the post-tag pattern is unknown again...
    val v = verdicts(MediaStore.run(spark, dir, media(41L -> img(3, 5)), 10L))
    assert(v(41L) == ("novel", -1L), s"$v")
    // ...while the pre-tag pattern still anchors
    assert(verdicts(MediaStore.run(spark, dir,
      media(51L -> img(2, 3)), 11L))(51L) == ("near_duplicate", 11L))
    // a replayed post-tag batch returns its ORIGINAL committed verdicts
    val replay = verdicts(MediaStore.runCommitted(spark, dir,
      media(21L -> img(3, 0)), batchId = 2L))
    assert(replay(21L) == ("novel", -1L),
      s"replay must read the commit log, not recompute: $replay")
    // a half-taken tag refuses to re-point after the store moved on
    MediaStore.snapshot(dir, "t2")
    graft.sources.TableSink.dropSnapshot(s"$dir/phash", "t2") // simulate half-taken
    MediaStore.run(spark, dir, media(61L -> img(4, 0)), 12L)
    intercept[IllegalArgumentException](MediaStore.snapshot(dir, "t2"))
  }

  test("streaming media ingest == batch reference; replay is exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val dir = tmp()
    val ckpt = java.nio.file.Files.createTempDirectory("media-ckpt").toString
    MediaStore.init(spark, dir, media(1L -> img(1, 0), 2L -> img(2, 0)))

    val mem = MemoryStream[(Long, Array[Byte])]
    val q = MediaStore.stream(spark, dir, mem.toDF().toDF("id", "payload"),
      ckpt, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    // epoch 0: one exact dup of corpus, one novel pattern
    mem.addData(11L -> img(1, 0), 12L -> img(3, 0))
    q.processAllAvailable()
    // epoch 1: re-encode of epoch 0's novel (must see it), plus junk
    mem.addData(21L -> img(3, 7), 22L -> "junk-a".getBytes)
    q.processAllAvailable()
    q.stop()

    val v0 = verdicts(spark.read.parquet(s"$dir/verdicts/batch_0"))
    assert(v0(11L) == ("duplicate", 1L) && v0(12L) == ("novel", -1L), s"$v0")
    val v1 = verdicts(spark.read.parquet(s"$dir/verdicts/batch_1"))
    assert(v1(21L) == ("near_duplicate", 12L),
      s"epoch 1 must anchor to epoch 0's admitted doc: $v1")
    assert(v1(22L) == ("novel", -1L), s"$v1")

    // replay epoch 1 (crash-after-commit): verdicts come from the
    // committed log — NOT recomputed against a store that now holds
    // this batch's own keys (a recompute would call 22 a duplicate of
    // itself) — and the store state converges, not duplicates.
    val replay = verdicts(MediaStore.runCommitted(spark, dir,
      media(21L -> img(3, 7), 22L -> "junk-a".getBytes), batchId = 1L))
    assert(replay == v1, "replay must return the committed verdicts")
    // a later batch still sees exactly the keep-first anchors
    val v2 = verdicts(MediaStore.run(spark, dir,
      media(31L -> "junk-a".getBytes, 32L -> img(3, 3)), 9L))
    assert(v2(31L) == ("duplicate", 22L) && v2(32L) == ("near_duplicate", 12L),
      s"$v2")
  }
}
