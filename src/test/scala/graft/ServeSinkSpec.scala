package graft

import graft.serve.Serve
import graft.sources.TableSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import java.nio.file.Files

class ServeSinkSpec extends AnyFunSuite with SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)

  private def storiesDf = {
    import spark.implicits._
    Seq(
      ("s1", "sum one", ts("2024-01-03 00:00:00")),
      ("s2", "sum two", ts("2024-01-02 00:00:00")),
      ("s3", "sum three", ts("2024-01-01 00:00:00")))
      .toDF("story_id", "summary", "last_updated")
  }

  test("recommendationsFor: hydrated recs ordered by score") {
    import spark.implicits._
    val recs = Seq(("u1", "s1", 0.9), ("u1", "s2", 0.5), ("u2", "s3", 0.7))
      .toDF("user_id", "story_id", "score")
    val got = Serve.recommendationsFor(recs, storiesDf, "u1").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("s1", "s2"))
  }

  test("recommendationsFor: cold-start fallback = latest stories (T2)") {
    import spark.implicits._
    val recs = Seq.empty[(String, String, Double)].toDF("user_id", "story_id", "score")
    val got = Serve.recommendationsFor(recs, storiesDf, "unknown", fallbackN = 2).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("s1", "s2"), "latest-first fallback")
  }

  test("recommendationsFor: ONE SQL execution per lookup (no isEmpty pre-job)") {
    import spark.implicits._
    val recs = Seq(("u1", "s1", 0.9), ("u2", "s3", 0.7))
      .toDF("user_id", "story_id", "score")
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = execs.incrementAndGet()
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val got = Serve.recommendationsFor(recs, storiesDf, "u1").collect()
      assert(got.map(_.getString(0)).toSeq == Seq("s1"))
      // Listener delivery is async: wait for the first event, then a beat
      // to catch any stray second execution (the old isEmpty pre-action).
      val deadline = System.currentTimeMillis() + 10000
      while (execs.get() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(25)
      Thread.sleep(300)
      assert(execs.get() == 1,
        s"a point lookup must be one SQL execution, saw ${execs.get()}")
    } finally spark.listenerManager.unregister(l)
  }

  test("storyById point lookup") {
    val got = Serve.storyById(storiesDf, "s2").collect()
    assert(got.length == 1 && got(0).getString(1) == "sum two")
  }

  test("stored point lookups open one bucket's files, same results (file-count evidence)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("serve").toString
    // recommendations: 40 users × 2 recs, laid out by user_id
    val recs = (1 to 40).flatMap(u =>
        Seq((s"u$u", s"s${u % 7 + 1}", 0.9), (s"u$u", s"s${u % 5 + 1}0", 0.5)))
      .toDF("user_id", "story_id", "score")
    Serve.writeRecommendations(spark, s"$dir/recs", recs, version = 1L)
    // stories: key-hash by story_id (the serving-table shape)
    val stories = (1 to 40).map(i =>
        (s"s$i", s"sum $i", ts(f"2024-01-${i % 28 + 1}%02d 00:00:00")))
      .toDF("story_id", "summary", "last_updated")
    TableSink.upsert(spark, s"$dir/stories",
      stories.withColumn("__v", lit(1L)), Seq("story_id"), "__v")

    // storyById: same single row, strictly fewer files opened.
    val like = spark.range(0).select(lit("").as("story_id"))
    val allStoryFiles = TableSink.read(spark, s"$dir/stories", like).inputFiles.length
    val prunedStory = TableSink.readBuckets(spark, s"$dir/stories", like,
      TableSink.keyBucketIdsFor(s"$dir/stories", Seq("s7").toDF("story_id")))
    assert(prunedStory.inputFiles.length < allStoryFiles,
      s"point lookup must not open the table: ${prunedStory.inputFiles.length} of $allStoryFiles")
    val got = Serve.storyByIdStored(spark, s"$dir/stories", "s7").collect()
    assert(got.length == 1 && got(0).getString(1) == "sum 7")

    // recommendationsFor: identical rows to the in-memory form; the
    // personalized read opens only u7's bucket files.
    val memory = Serve.recommendationsFor(
        TableSink.read(spark, s"$dir/recs", recs), stories, "u7")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val stored = Serve.recommendationsForStored(spark, s"$dir/recs", stories, "u7")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(stored == memory && stored.nonEmpty,
      s"stored lookup must serve identical recs: $stored vs $memory")
    val allRecFiles = TableSink.read(spark, s"$dir/recs", like).inputFiles.length
    val prunedRecFiles = TableSink.readBuckets(spark, s"$dir/recs", like,
      TableSink.bucketIdsFor(spark, s"$dir/recs", Seq("u7"))).inputFiles.length
    assert(prunedRecFiles < allRecFiles,
      s"user lookup must open one bucket: $prunedRecFiles of $allRecFiles")
    // Unknown user still falls back to latest stories through the stored path.
    val cold = Serve.recommendationsForStored(spark, s"$dir/recs", stories, "nobody",
        fallbackN = 2).collect().map(_.getString(0)).toSeq
    assert(cold.length == 2, s"cold-start fallback must survive the stored path: $cold")
    // A wrong path must fail loudly — "no table" is not "no rows" (for
    // recs it would silently serve every warm user the cold fallback).
    val e1 = intercept[IllegalArgumentException] {
      Serve.storyByIdStored(spark, s"$dir/typo", "s7")
    }
    assert(e1.getMessage.contains("no stories table"))
    val e2 = intercept[IllegalArgumentException] {
      Serve.recommendationsForStored(spark, s"$dir/typo", stories, "u7")
    }
    assert(e2.getMessage.contains("no recommendations table"))
  }

  test("cell-layout stories: sidecar resolves id→cell; lookup opens few buckets; " +
    "miss is authoritative; prev_cell covers the crash window") {
    import spark.implicits._
    val dir = Files.createTempDirectory("servecell").toString
    val stories = (1 to 40).map(i =>
        (s"s$i", s"sum $i", ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"), s"c${i % 10}"))
      .toDF("story_id", "summary", "last_updated", "cell")
    TableSink.upsert(spark, s"$dir/stories", stories.withColumn("__v", lit(1L)),
      Seq("story_id"), "__v", numBuckets = 32, layoutCol = Some("cell"))
    val like = spark.range(0).select(lit("").as("story_id"))
    val nAll = TableSink.read(spark, s"$dir/stories", like).inputFiles.length
    // Pre-sidecar history: correct full-scan fallback.
    val fallback = Serve.storyByIdStored(spark, s"$dir/stories", "s7")
    assert(fallback.collect().map(_.getString(1)).toSeq == Seq("sum 7"))
    assert(fallback.inputFiles.length == nAll,
      "without a sidecar the cell-layout lookup is a (correct) full scan")
    // Backfill adopts the table; the lookup then opens only the story's
    // cell bucket(s) — strictly fewer files.
    Serve.backfillIdMap(spark, s"$dir/stories")
    val got = Serve.storyByIdStored(spark, s"$dir/stories", "s7")
    assert(got.collect().map(_.getString(1)).toSeq == Seq("sum 7"))
    assert(got.inputFiles.length > 0 && got.inputFiles.length < nAll,
      s"sidecar lookup must be file-pruned: ${got.inputFiles.length} of $nAll")
    // A sidecar miss is authoritative: no stories files open at all.
    val miss = Serve.storyByIdStored(spark, s"$dir/stories", "nope")
    assert(miss.collect().isEmpty && miss.inputFiles.isEmpty,
      "absent story must cost one sidecar bucket, not a table read")
    // One-commit crash window: the sidecar committed a re-home (cell=new,
    // prev_cell=old) but the stories commit was lost — the row still sits
    // under its old cell, which prev_cell's bucket covers.
    TableSink.upsert(spark, Serve.idMapDir(s"$dir/stories"),
      Seq(("s7", "cMOVED", "c7")).toDF("story_id", "cell", "prev_cell")
        .withColumn("__v", lit(2L)),
      Seq("story_id"), "__v")
    val win = Serve.storyByIdStored(spark, s"$dir/stories", "s7")
    assert(win.collect().map(_.getString(1)).toSeq == Seq("sum 7"),
      "prev_cell bucket must cover the one-outstanding-commit window")
    // backfill refuses key-hash tables (they prune without a sidecar).
    TableSink.upsert(spark, s"$dir/flat",
      stories.drop("cell").withColumn("__v", lit(1L)), Seq("story_id"), "__v")
    val err = intercept[IllegalArgumentException] {
      Serve.backfillIdMap(spark, s"$dir/flat")
    }
    assert(err.getMessage.contains("no layout column"))
  }

  test("driftScore serves A2 on demand; registerViews enables SQL reads") {
    import spark.implicits._
    val interactions = Seq(
      ("u1", "like", ts("2024-01-01 00:00:00")),
      ("u1", "click", ts("2024-01-20 00:00:00")))
      .toDF("user_id", "event_type", "event_time")
    // hist mean = (1.0 + 0.1)/2 = 0.55; recent mean = 0.1 → drift ≈ 0.818
    val d = Serve.driftScore(interactions, lit("2024-01-10 00:00:00").cast("timestamp"))
      .collect()(0).getDouble(0)
    assert(math.abs(d - 0.45 / 0.55) < 1e-12)
    Serve.registerViews(spark, Map("stories_v" -> storiesDf))
    assert(spark.sql("SELECT count(*) FROM stories_v").collect()(0).getLong(0) == 3)
  }

  test("bias reports: thresholds flag low diversity or negative sentiment") {
    import spark.implicits._
    val logs = Seq(
      (1L, "u1", Seq(("s1", "srcA", "big win today"), ("s2", "srcB", "fast good news"))),
      (2L, "u2", Seq(("s3", "srcC", "slow bad error"), ("s4", "srcC", "fail small crash"))))
      .toDF("log_id", "user_id", "recs")
      .select(col("log_id"), col("user_id"),
        expr("transform(recs, r -> struct(r._1 AS story_id, r._2 AS source, r._3 AS headline))").as("recommendations"))
    val got = graft.operators.Bias.processLogs(logs)
      .collect().map(r => r.getAs[Long]("log_id") -> r.getAs[Boolean]("bias_flag")).toMap
    assert(!got(1L), "diverse sources + positive sentiment → no flag")
    assert(got(2L), "single source + negative sentiment → flagged")
  }

  /** Parse the live manifest: bucket -> relative data path. */
  private def liveManifest(dir: String): Map[Int, String] = {
    val name = Files.readString(java.nio.file.Paths.get(dir, "_CURRENT")).trim
    scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(java.nio.file.Paths.get(dir, "_manifests", name))).asScala
      .drop(1).filter(_.nonEmpty)
      .map { l => val Array(b, p) = l.split('\t'); b.toInt -> p }.toMap
  }

  private def fileBytes(root: String, rel: String): Map[String, Long] = {
    val d = new java.io.File(s"$root/$rel")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
  }

  test("TableSink: untouched buckets are byte-identical across an upsert") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sinkb").toString
    val v1 = (1 to 40).map(i => (s"k$i", s"p$i", 1L)).toDF("key", "payload", "ver")
    TableSink.upsert(spark, dir, v1, Seq("key"), "ver")
    val m1 = liveManifest(dir)
    assert(m1.size > 1, "fixture keys must span several buckets")
    // One-key batch: exactly one dirty bucket.
    val dirtyBucket = v1.filter(col("key") === "k7")
      .select(TableSink.bucketCol(Seq("key"), TableSink.DefaultBuckets))
      .collect()(0).getInt(0)
    val cleanSnapshot = (m1 - dirtyBucket).map { case (b, p) => b -> fileBytes(dir, p) }
    TableSink.upsert(spark, dir, Seq(("k7", "p7b", 2L)).toDF("key", "payload", "ver"),
      Seq("key"), "ver")
    val m2 = liveManifest(dir)
    assert(m2(dirtyBucket) != m1(dirtyBucket), "dirty bucket rewritten")
    (m1 - dirtyBucket).foreach { case (b, p) =>
      assert(m2(b) == p, s"clean bucket $b must keep its existing files")
      assert(fileBytes(dir, p) == cleanSnapshot(b), s"clean bucket $b bytes unchanged")
    }
    val state = TableSink.read(spark, dir, v1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state("k7") == "p7b" && state("k1") == "p1" && state.size == 40)
  }

  test("TableSink: crashed writer leaves the old generation readable; GC reclaims orphans") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sinkc").toString
    val v1 = Seq(("a", 1L, 1L), ("b", 2L, 1L)).toDF("key", "value", "ver")
    TableSink.upsert(spark, dir, v1, Seq("key"), "ver")
    // Simulate a writer that crashed AFTER writing data + a temp manifest
    // but BEFORE the atomic pointer flip: orphan artifacts, stale pointer.
    val orphan = java.nio.file.Paths.get(dir, "data", "g0000000099", "__bucket=0")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-junk.parquet"), "partial write")
    Files.writeString(java.nio.file.Paths.get(dir, "_manifests", ".m-0000000099.tmp"), "buckets=16")
    val state = TableSink.read(spark, dir, v1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state == Map("a" -> 1L, "b" -> 2L), "old generation intact after crash")
    // The next successful commit publishes atomically and GCs the orphan.
    TableSink.upsert(spark, dir, Seq(("b", 20L, 2L)).toDF("key", "value", "ver"),
      Seq("key"), "ver")
    val state2 = TableSink.read(spark, dir, v1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state2 == Map("a" -> 1L, "b" -> 20L))
    assert(!Files.exists(orphan), "unreferenced data from the crashed writer reclaimed")
  }

  test("TableSink GC: a reader holding manifest N-1 survives exactly one commit (grace 0)") {
    import spark.implicits._
    // grace 0 pins the pure count bound (KeepGenerations = 2); the default
    // 15-min grace only ever widens the reader's window.
    sys.props("graft.sink.gcGraceMs") = "0"
    try {
      val dir = Files.createTempDirectory("sinkgc").toString
      val like = Seq(("a", 1L, 1L)).toDF("key", "value", "ver")
      TableSink.upsert(spark, dir, like, Seq("key"), "ver")
      // A reader resolves _CURRENT now and holds this manifest.
      val pinnedName = Files.readString(java.nio.file.Paths.get(dir, "_CURRENT")).trim
      val pinned = liveManifest(dir)
      TableSink.upsert(spark, dir, Seq(("a", 2L, 2L)).toDF("key", "value", "ver"),
        Seq("key"), "ver")
      // One commit later: the pinned manifest and every file it references
      // must still be readable.
      assert(Files.exists(java.nio.file.Paths.get(dir, "_manifests", pinnedName)),
        "manifest N-1 must survive one commit")
      pinned.values.foreach { rel =>
        assert(fileBytes(dir, rel).nonEmpty, s"data of pinned manifest ($rel) must survive")
      }
      val oldState = spark.read.parquet(pinned.values.map(r => s"$dir/$r").toSeq: _*)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(oldState == Map("a" -> 1L), "pinned snapshot still serves its own version")
      // A second commit moves the pinned manifest beyond KeepGenerations:
      // with zero grace it is now reclaimed — the documented bound, not a leak.
      TableSink.upsert(spark, dir, Seq(("a", 3L, 3L)).toDF("key", "value", "ver"),
        Seq("key"), "ver")
      assert(!Files.exists(java.nio.file.Paths.get(dir, "_manifests", pinnedName)),
        "beyond KeepGenerations + grace the old manifest is reclaimed")
    } finally sys.props.remove("graft.sink.gcGraceMs")
  }

  test("TableSink upsert: batch wins, old keys survive, delete drops") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sink").toString
    val v1 = Seq(("k1", "a", 1L), ("k2", "b", 1L)).toDF("key", "payload", "ver")
    TableSink.upsert(spark, dir, v1, Seq("key"), "ver")
    val v2 = Seq(("k2", "b2", 2L), ("k3", "c", 2L)).toDF("key", "payload", "ver")
    TableSink.upsert(spark, dir, v2, Seq("key"), "ver")
    val state = TableSink.read(spark, dir, v1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state == Map("k1" -> "a", "k2" -> "b2", "k3" -> "c"))
    // idempotent re-run of the same batch changes nothing (ST2 exactly-once)
    TableSink.upsert(spark, dir, v2, Seq("key"), "ver")
    val state2 = TableSink.read(spark, dir, v1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state2 == state)
    TableSink.delete(spark, dir, Seq(Tuple1("k1")).toDF("key"), Seq("key"))
    val state3 = TableSink.read(spark, dir, v1).collect().map(_.getString(0)).toSet
    assert(state3 == Set("k2", "k3"))
  }
}
