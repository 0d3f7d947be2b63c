package graft

import graft.sources.TableSink
import graft.streaming.StreamingJob
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** E2E: streaming articles through dedup → featurize → assignment → tables. */
class StreamingJobSpec extends AnyFunSuite with SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming job: articles land with story ids; stories table grows across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("sj").toString
    val mem = MemoryStream[(String, String, String, Timestamp)]
    val src = mem.toDF().toDF("link", "title", "txt", "ingestion_time")
    val q = StreamingJob.start(src, s"$tmp/articles", s"$tmp/stories",
      s"$tmp/ckpt", simThreshold = 0.8, trigger = Trigger.ProcessingTime(0L))
    try {
      mem.addData(
        ("l1", "t", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:00:00")),
        ("l2", "t", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:01:00")), // same text → same story
        ("l1", "t", "duplicate link", ts("2024-01-01 10:02:00")),                              // D1 dropped
        ("l3", "t", "completely different topic entirely elsewhere", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val schemaLike = spark.range(0).select(lit("").as("link"))
      val articles = TableSink.read(spark, s"$tmp/articles", schemaLike)
      assert(articles.count() == 3, "duplicate link dropped by watermark dedup")
      val byLink = articles.select("link", "story_id").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(byLink("l1") == byLink("l2"), "identical text joins the same story")
      assert(byLink("l1") != byLink("l3"), "different text opens a new story")
      val stories = TableSink.read(spark, s"$tmp/stories", schemaLike)
      assert(stories.count() == 2)
      // A11: per-trigger observed metric is reported in progress
      val observed = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("ingest")).map(_.getAs[Long]("n_articles")))
      assert(observed.sum == 3, s"observed ingest counts: ${observed.mkString(",")}")
    } finally q.stop()
  }

  test("streaming job self-provisions the PCA basis: the topology prunes candidates < stories") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("sjb").toString
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[StreamingJob.St4Metrics]()
    val mem = MemoryStream[(String, String, String, Timestamp)]
    val src = mem.toDF().toDF("link", "title", "txt", "ingestion_time")
    // High threshold → narrow cells (w ≈ 0.2); refresh every epoch so the
    // basis fitted on epoch 0's stories serves epoch 1.
    val q = StreamingJob.start(src, s"$tmp/articles", s"$tmp/stories",
      s"$tmp/ckpt", simThreshold = 0.98, trigger = Trigger.ProcessingTime(0L),
      basisK = 8, basisRefreshEvery = 1, onBatch = m => metrics.add(m))
    try {
      // Epoch 0: eight clearly distinct docs → eight stories; the refresh
      // publishes a basis fitted on their centroids.
      val texts = Seq(
        "alpine glaciers retreat under record summer heat",
        "city council approves the new harbor tram line",
        "quarterly chip earnings beat analyst expectations",
        "midfielder signs a four year contract extension",
        "novel enzyme breaks down ocean plastic faster",
        "drought pushes grain futures to seasonal highs",
        "museum reopens with a restored baroque wing",
        "satellite constellation expands rural broadband")
      mem.addData(texts.zipWithIndex.map { case (t, i) =>
        (s"l$i", "t", t, ts(s"2024-01-01 10:0$i:00")) }: _*)
      q.processAllAvailable()
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(StreamingJob.basisPath(s"$tmp/stories"))),
        "epoch-0 refresh must publish a basis file")
      // Epoch 1: one article repeating story 3's text — with the basis
      // live, the candidate prefilter must NOT collect all eight stories.
      mem.addData(("l9", "t", texts(3), ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val ms = metrics.toArray(Array.empty[StreamingJob.St4Metrics])
      val last = ms.last
      assert(last.basisDims > 0, s"epoch 1 must run with the published basis: $ms")
      assert(last.nStories == 8, s"eight stories before epoch 1: $last")
      assert(last.nCandidates < last.nStories,
        s"basis-pruned topology must collect fewer candidates than stories: $last")
      // And pruning never costs recall: the repeat joins its story.
      val schemaLike = spark.range(0).select(lit("").as("link"))
      val byLink = TableSink.read(spark, s"$tmp/articles", schemaLike)
        .select("link", "story_id").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(byLink("l9") == byLink("l3"), "identical text joins the same story")
    } finally q.stop()
  }

  test("epoch-replay guard: re-running a committed epoch is a no-op (exactly-once)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("sjr").toString
    val metrics = scala.collection.mutable.ArrayBuffer.empty[StreamingJob.St4Metrics]
    val batch = Seq(
      ("l1", "t", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:00:00")),
      ("l2", "t", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:01:00")))
      .toDF("link", "title", "txt", "ingestion_time")
    def run(): Unit = StreamingJob.processBatch(spark, batch,
      s"$tmp/articles", s"$tmp/stories", simThreshold = 0.8, epoch = 5L,
      onBatch = m => metrics.synchronized { metrics += m })
    run()
    val schemaLike = spark.range(0).select(lit("").as("link"))
    def storyNs() = TableSink.read(spark, s"$tmp/stories", schemaLike)
      .select("story_id", "n").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after1 = storyNs()
    assert(after1.values.sum == 2L, s"both articles absorbed once: $after1")
    // Replay of the SAME epoch (crash after the stories merge, before the
    // checkpoint commit): the guard must detect __v == 5 and change nothing.
    run()
    assert(storyNs() == after1, "replayed epoch must not re-increment counts")
    assert(metrics.map(_.replaySkipped).toSeq == Seq(false, true),
      s"second run must be detected as a replay: $metrics")
    // A fresh checkpoint pointed at EXISTING tables restarts epochs below
    // the table's newest committed epoch — that is not a replay, and
    // silently skipping it would drop real batches. Must fail loudly.
    val err = intercept[IllegalStateException] {
      StreamingJob.processBatch(spark, batch,
        s"$tmp/articles", s"$tmp/stories", simThreshold = 0.8, epoch = 3L)
    }
    assert(err.getMessage.contains("does not belong to these tables"),
      s"mismatched checkpoint must be rejected: ${err.getMessage}")
  }

  test("cell-sticky layout ships by default: bucket-pruned candidate read, identical assignments") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.{BasisStore, OnlineClustering}
    val texts = Seq(
      "alpine glaciers retreat under record summer heat",
      "city council approves the new harbor tram line",
      "quarterly chip earnings beat analyst expectations",
      "midfielder signs a four year contract extension",
      "novel enzyme breaks down ocean plastic faster",
      "drought pushes grain futures to seasonal highs",
      "museum reopens with a restored baroque wing",
      "satellite constellation expands rural broadband",
      "volcanic ash grounds flights across the strait",
      "archivists digitize a trove of wartime letters",
      "referee review system debuts in the cup final",
      "desalination plant breaks ground on the coast")
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[StreamingJob.St4Metrics]()
    def runJob(dir: String, layout: Boolean): Unit = {
      val mem = MemoryStream[(String, String, String, Timestamp)]
      val q = StreamingJob.start(mem.toDF().toDF("link", "title", "txt", "ingestion_time"),
        s"$dir/articles", s"$dir/stories", s"$dir/ckpt", simThreshold = 0.98,
        trigger = Trigger.ProcessingTime(0L), basisK = 4, basisRefreshEvery = 1,
        cellLayout = layout, storyBuckets = 64,
        onBatch = m => if (layout) metrics.add(m))
      try {
        mem.addData(texts.zipWithIndex.map { case (t, i) =>
          (s"l$i", "t", t, ts(f"2024-01-01 10:${i}%02d:00")) }: _*)
        q.processAllAvailable()
        // batch 2: one repeat (joins its story) + one novel doc
        mem.addData(("l20", "t", texts(3), ts("2024-01-01 11:00:00")),
          ("l21", "t", "meteor shower dazzles stargazers after midnight", ts("2024-01-01 11:01:00")))
        q.processAllAvailable()
      } finally q.stop()
    }
    val dirA = Files.createTempDirectory("sj_cell").toString   // shipping default shape
    val dirB = Files.createTempDirectory("sj_scan").toString   // scan-and-drop baseline
    runJob(dirA, layout = true); runJob(dirB, layout = false)
    // Identical assignments and story state — the layout changes I/O, not semantics.
    def tables(dir: String) = {
      val like = spark.range(0).select(lit("").as("link"))
      val arts = TableSink.read(spark, s"$dir/articles", like)
        .select("link", "story_id").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val sts = TableSink.read(spark, s"$dir/stories", like)
        .select("story_id", "n").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      (arts, sts)
    }
    assert(tables(dirA) == tables(dirB),
      "cell layout must not change assignments or story state")
    // Manifest evidence: the stories table is value-addressable and the
    // basis that defines its cells rides the manifest meta (atomic with
    // the re-grid), not only the sibling file.
    val storiesDir = s"$dirA/stories"
    assert(TableSink.layoutColOf(storiesDir).contains("cell"),
      "shipping stories table must be laid out by sticky cell")
    val meta = TableSink.metaOf(storiesDir)
    assert(meta.isDefined, "re-grid must publish the basis in the manifest meta")
    val (t0, g0, k0, decoded) = StreamingJob.decodeLayoutMeta(meta.get)
    assert((t0, g0, k0) == ((0.98, 2, 2)), s"meta pins the cell function: ($t0,$g0,$k0)")
    val layoutBasis = decoded.take(k0)
    assert(layoutBasis.nonEmpty, "published basis must decode")
    // File-count evidence: replicate the per-batch candidate read for one
    // probe article — it must open strictly fewer files than the table
    // has, and still cover the probe's own story.
    val probe = Seq(("p0", "t", texts(3))).toDF("link", "title", "txt")
      .withColumn("content", concat_ws(" ", col("title"), col("txt")))
      .withColumn("embedding", graft.pipelines.NewsPipeline.hashEmbedding(col("content")))
    val in = OnlineClustering.collectBatch(probe, "link", "embedding")
    val cells2 = OnlineClustering.candidateCells(in, 0.98, 2, layoutBasis, radius = 2)
      .map(_.mkString(",")).toSeq
    val like = spark.range(0).select(lit("").as("story_id"))
    val prunedRead = TableSink.readBuckets(spark, storiesDir, like,
      TableSink.bucketIdsFor(spark, storiesDir, cells2))
    val nPruned = prunedRead.inputFiles.length
    val nAll = TableSink.read(spark, storiesDir, like).inputFiles.length
    assert(nPruned > 0 && nPruned < nAll,
      s"candidate read must be file-pruned: opened $nPruned of $nAll files")
    val byLink = tables(dirA)._1
    assert(prunedRead.select("story_id").collect().map(_.getString(0))
      .contains(byLink("l20")), "pruned read must cover the probe's story")
    // The shipping job reports the same pruning in its OWN metrics: the
    // post-re-grid batch read strictly fewer files than the table has.
    val last = metrics.toArray(Array.empty[StreamingJob.St4Metrics]).last
    assert(last.tableFiles > 0 && last.candidateFiles >= 0 &&
      last.candidateFiles < last.tableFiles,
      s"per-batch file-pruning metrics must show the pruned read: $last")
    // The id→cell serving sidecar rides the same epochs (upserts and the
    // re-grid overwrite both maintain it): it must exist and mirror every
    // story's CURRENT cell, which is what lets Serve.storyByIdStored
    // resolve a point lookup to ≤ 2 stories buckets.
    val idmapDir = graft.serve.Serve.idMapDir(storiesDir)
    assert(TableSink.tableExists(idmapDir),
      "cell-layout job must maintain the id→cell sidecar")
    val sideLike = spark.range(0).select(lit("").as("story_id"))
    val side = TableSink.read(spark, idmapDir, sideLike)
      .select("story_id", "cell").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val curCells = TableSink.read(spark, storiesDir, sideLike)
      .select("story_id", "cell").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(side == curCells,
      s"sidecar must mirror every story's current cell: $side vs $curCells")
  }

  test("curateGate: in-stream hygiene — quality floor, PII redaction — before featurization") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("sjcurate").toString
    val mem = MemoryStream[(String, String, String, Timestamp)]
    val q = StreamingJob.start(mem.toDF().toDF("link", "title", "txt", "ingestion_time"),
      s"$tmp/articles", s"$tmp/stories", s"$tmp/ckpt", simThreshold = 0.8,
      trigger = Trigger.ProcessingTime(0L), curateGate = true)
    try {
      mem.addData(
        ("l1", "t", "the committee published its annual report contact us at press@example.org today",
          ts("2024-01-01 10:00:00")),
        ("l2", "t", "aa", ts("2024-01-01 10:01:00")), // under the token floor → gated out
        ("l3", "t", "x ".repeat(40).trim, ts("2024-01-01 10:02:00"))) // degenerate → quality floor
      q.processAllAvailable()
      val like = spark.range(0).select(lit("").as("link"))
      val arts = TableSink.read(spark, s"$tmp/articles", like)
      val rows = arts.select("link", "txt").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(rows.keySet == Set("l1"), s"gate must drop l2 (short) and l3 (quality): ${rows.keySet}")
      assert(!rows("l1").contains("press@example.org") && rows("l1").contains("<EMAIL>"),
        s"PII redacted before the article lands: ${rows("l1")}")
      assert(arts.columns.contains("canonical_url"), "curated articles carry the canonical url")
    } finally q.stop()
  }

  test("layout meta pins the cell function: restart with changed threshold fails loudly") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("sjmeta").toString
    def run(epoch: Long, t: Double): Unit = StreamingJob.processBatch(spark,
      Seq(("l" + epoch, "t", s"some fresh topic number $epoch entirely", ts("2024-01-01 10:00:00")))
        .toDF("link", "title", "txt", "ingestion_time"),
      s"$tmp/articles", s"$tmp/stories", simThreshold = t, epoch = epoch)
    run(0L, 0.9)
    // The cell function is pinned from the FIRST commit, before any
    // basis refresh: a restart with a different threshold would probe
    // wrong buckets, so it must refuse, not silently mis-read.
    assert(TableSink.metaOf(s"$tmp/stories").exists(_.startsWith("st4:v1;")),
      "first stories commit must pin the layout meta")
    val err = intercept[IllegalStateException] { run(1L, 0.8) }
    assert(err.getMessage.contains("layout mismatch"), err.getMessage)
    // same parameters resume fine
    run(1L, 0.9)
    val like = spark.range(0).select(lit("").as("link"))
    assert(TableSink.read(spark, s"$tmp/articles", like).count() == 2)
  }

  test("cellLayout over a legacy key-hash stories table: scan-and-drop, file basis, clean schema") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("sjlegacy").toString
    val texts = Seq(
      "harbor authority tenders the new ferry berths",
      "chipmaker guidance tops analyst expectations",
      "club confirms the striker's season ending surgery",
      "grain futures rally on dry season forecasts")
    def batchDf(rows: Seq[(String, String)]) = rows
      .map { case (l, t) => (l, "t", t, ts("2024-01-01 10:00:00")) }
      .toDF("link", "title", "txt", "ingestion_time")
    // Epoch 0 under the OLD layout (key-hash table, sibling-file basis):
    StreamingJob.processBatch(spark, batchDf(texts.take(3).zipWithIndex.map {
        case (t, i) => (s"l$i", t) }),
      s"$tmp/articles", s"$tmp/stories", simThreshold = 0.98, epoch = 0L,
      basisRefreshEvery = 1, cellLayout = false)
    assert(TableSink.layoutColOf(s"$tmp/stories").isEmpty, "legacy table is key-hash")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(StreamingJob.basisPath(s"$tmp/stories"))))
    // Epoch 1 with the shipping default against the SAME tables: must run
    // scan-and-drop with the FILE basis (not a dead meta basis), and must
    // not leak layout columns into the legacy schema.
    val metrics = scala.collection.mutable.ArrayBuffer.empty[StreamingJob.St4Metrics]
    StreamingJob.processBatch(spark, batchDf(Seq("l9" -> texts(1))),
      s"$tmp/articles", s"$tmp/stories", simThreshold = 0.98, epoch = 1L,
      basisRefreshEvery = 0, cellLayout = true,
      onBatch = m => metrics.synchronized { metrics += m })
    assert(metrics.last.basisDims > 0,
      s"legacy path must keep using the published file basis: ${metrics.last}")
    val like = spark.range(0).select(lit("").as("link"))
    val stories = TableSink.read(spark, s"$tmp/stories", like)
    assert(!stories.columns.contains("cell") && !stories.columns.contains("__old_cell"),
      s"legacy schema must stay clean: ${stories.columns.toSeq}")
    val byLink = TableSink.read(spark, s"$tmp/articles", like)
      .select("link", "story_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byLink("l9") == byLink("l1"), "identical text joins its story through the legacy path")
  }

  test("staleness guard: off-schedule basis refresh restores pruning after degeneration") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("sjstale").toString
    val metrics = scala.collection.mutable.ArrayBuffer.empty[StreamingJob.St4Metrics]
    val guard = new StreamingJob.StalenessGuard(ratio = 0.8, k = 2)
    // Never scheduled (basisRefreshEvery = 0): only the guard can refresh.
    def run(epoch: Long, docs: Seq[(String, String)]): Unit =
      StreamingJob.processBatch(spark,
        docs.map { case (l, t) => (l, "t", t, ts(s"2024-01-01 10:00:00")) }
          .toDF("link", "title", "txt", "ingestion_time"),
        s"$tmp/articles", s"$tmp/stories", simThreshold = 0.98, epoch = epoch,
        basisRefreshEvery = 0, staleGuard = Some(guard),
        onBatch = m => metrics.synchronized { metrics += m })
    val topics = Seq(
      "glacier retreat accelerates in the high ranges",
      "port authority tenders the new ferry berths",
      "chipmaker guidance tops analyst expectations",
      "club confirms the striker's season ending surgery",
      "enzyme engineering speeds plastic depolymerization",
      "grain futures rally on dry season forecasts",
      "restored organ returns to the cathedral loft",
      "rural fiber rollout clears its funding review",
      "ash cloud closes airspace over the channel")
    run(0L, Seq("a0" -> topics(0), "a1" -> topics(1), "a2" -> topics(2)))
    run(1L, Seq("b0" -> topics(3), "b1" -> topics(4), "b2" -> topics(5)))
    run(2L, Seq("c0" -> topics(6), "c1" -> topics(7), "c2" -> topics(8)))
    // Cold start = raw 2-dim grid over 64-dim embeddings: degenerate, so
    // candidates ≈ stories from epoch 1 on; streak of 2 fires the guard.
    val fired = metrics.indexWhere(_.basisRefreshed)
    assert(fired >= 0, s"guard must fire an off-schedule refresh: $metrics")
    assert(metrics(fired).basisDims == 0,
      s"refresh must fire while still on the degenerate raw grid: $metrics")
    // The next batch runs with the published basis and prunes again.
    run(3L, Seq("d0" -> topics(0))) // same topic as a0 → joins its story
    val last = metrics.last
    assert(last.basisDims > 0, s"post-refresh batch must carry the basis: $last")
    assert(last.nCandidates < last.nStories,
      s"restored basis must prune candidates < stories: $last")
    val like = spark.range(0).select(lit("").as("link"))
    val byLink = TableSink.read(spark, s"$tmp/articles", like)
      .select("link", "story_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byLink("d0") == byLink("a0"), "pruning never costs recall")
  }

  test("shipping job (auto-basis, pruned, cell layout) groups articles exactly like the full-collect fold") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.OnlineClustering
    // Epoch 0: eight distinct docs; epoch 1: two repeats + one novel —
    // the story GROUPING is order-invariant for this corpus (distinct
    // docs create their own stories; exact repeats join them), so the
    // job's collect order and the replay's local order cannot diverge it.
    val texts = Seq(
      "alpine glaciers retreat under record summer heat",
      "city council approves the new harbor tram line",
      "quarterly chip earnings beat analyst expectations",
      "midfielder signs a four year contract extension",
      "novel enzyme breaks down ocean plastic faster",
      "drought pushes grain futures to seasonal highs",
      "museum reopens with a restored baroque wing",
      "satellite constellation expands rural broadband")
    val b0 = texts.zipWithIndex.map { case (t, i) =>
      (s"l$i", "t", t, f"2024-01-01 10:${i}%02d:00") }
    val b1 = Seq(("l20", "t", texts(3), "2024-01-01 11:00:00"),
      ("l21", "t", texts(6), "2024-01-01 11:01:00"),
      ("l22", "t", "meteor shower dazzles stargazers after midnight", "2024-01-01 11:02:00"))

    // Shipping path: defaults (cell layout, pruned fold), auto-basis
    // refreshed every epoch so epoch 1 runs under the PCA basis.
    val dir = Files.createTempDirectory("sj_fullfold").toString
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[StreamingJob.St4Metrics]()
    val mem = MemoryStream[(String, String, String, Timestamp)]
    val q = StreamingJob.start(mem.toDF().toDF("link", "title", "txt", "ingestion_time"),
      s"$dir/articles", s"$dir/stories", s"$dir/ckpt", simThreshold = 0.98,
      trigger = Trigger.ProcessingTime(0L), basisRefreshEvery = 1,
      onBatch = m => metrics.add(m))
    try {
      mem.addData(b0.map { case (l, t, x, s) => (l, t, x, ts(s)) }: _*)
      q.processAllAvailable()
      mem.addData(b1.map { case (l, t, x, s) => (l, t, x, ts(s)) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    val last = metrics.toArray(Array.empty[StreamingJob.St4Metrics]).last
    assert(last.basisDims > 0 && last.nCandidates < last.nStories,
      s"epoch 1 must actually run pruned under the auto-derived basis: $last")

    // Independent reference: the FULL-collect sequential fold
    // (processBatch — the semantic baseline), same featurization,
    // no pruning, no layout, no basis.
    def featurize(rows: Seq[(String, String, String, String)]) =
      rows.map { case (l, t, x, s) => (l, t, x, ts(s)) }
        .toDF("link", "title", "txt", "ingestion_time")
        .withColumn("content", concat_ws(" ", col("title"), col("txt")))
        .withColumn("embedding", graft.pipelines.NewsPipeline.hashEmbedding(col("content")))
    val empty = spark.range(0).select(lit("").as("story_id"),
      array().cast("array<double>").as("centroid"), lit(0L).as("n"))
    val (a0, s0) = OnlineClustering.processBatch(
      featurize(b0), empty, "link", "embedding", 0.98, batchEpoch = 0L)
    val (a1, _) = OnlineClustering.processBatch(
      featurize(b1), s0, "link", "embedding", 0.98, batchEpoch = 1L)

    // Equality on the grouping (story ids are creation-order artifacts;
    // the partition of articles into stories is the semantics).
    def grouping(pairs: Seq[(String, String)]): Set[Set[String]] =
      pairs.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val refGroups = grouping((a0.unionByName(a1))
      .select(col("id"), col("storyId")).collect()
      .map(r => (r.getString(0), r.getString(1))).toIndexedSeq)
    val like = spark.range(0).select(lit("").as("link"))
    val jobGroups = grouping(TableSink.read(spark, s"$dir/articles", like)
      .select("link", "story_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toIndexedSeq)
    assert(jobGroups == refGroups,
      s"auto-basis pruned shipping path must group exactly like the full fold:\n" +
        s" job=$jobGroups\n ref=$refGroups")
  }

  test("pruned ST4 + basis resume identically across a checkpoint restart") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val b1 = Seq(
      ("l1", "t", "voters approve the coastal wind farm expansion", "2024-01-01 10:00:00"),
      ("l2", "t", "library unveils a rare manuscript collection", "2024-01-01 10:01:00"),
      ("l3", "t", "startup ships a solid state battery pack", "2024-01-01 10:02:00"))
    val b2 = Seq(
      ("l4", "t", "voters approve the coastal wind farm expansion", "2024-01-01 11:00:00"),
      ("l5", "t", "completely unrelated midnight meteor shower report", "2024-01-01 11:01:00"))
    def feed(mem: MemoryStream[(String, String, String, Timestamp)],
             rows: Seq[(String, String, String, String)]): Unit =
      mem.addData(rows.map { case (l, t, x, s) => (l, t, x, ts(s)) }: _*)
    def readTables(dir: String) = {
      val schemaLike = spark.range(0).select(lit("").as("link"))
      val arts = TableSink.read(spark, s"$dir/articles", schemaLike)
        .select("link", "story_id").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val sts = TableSink.read(spark, s"$dir/stories", schemaLike)
        .select("story_id", "n").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      (arts, sts)
    }
    def job(mem: MemoryStream[(String, String, String, Timestamp)], dir: String) =
      StreamingJob.start(mem.toDF().toDF("link", "title", "txt", "ingestion_time"),
        s"$dir/articles", s"$dir/stories", s"$dir/ckpt", simThreshold = 0.95,
        trigger = Trigger.ProcessingTime(0L), basisRefreshEvery = 1)

    // Uninterrupted reference run: both batches through one query.
    val refDir = Files.createTempDirectory("sj_ref").toString
    val memRef = MemoryStream[(String, String, String, Timestamp)]
    val qRef = job(memRef, refDir)
    try {
      feed(memRef, b1); qRef.processAllAvailable()
      feed(memRef, b2); qRef.processAllAvailable()
    } finally qRef.stop()

    // Interrupted run: stop after batch 1, restart from the checkpoint
    // (same MemoryStream carries the offsets forward), then batch 2.
    val dir = Files.createTempDirectory("sj_restart").toString
    val mem = MemoryStream[(String, String, String, Timestamp)]
    val q1 = job(mem, dir)
    try { feed(mem, b1); q1.processAllAvailable() } finally q1.stop()
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(StreamingJob.basisPath(s"$dir/stories"))),
      "the basis published before the stop survives the restart")
    val q2 = job(mem, dir)
    try { feed(mem, b2); q2.processAllAvailable() } finally q2.stop()

    // State = stories table + checkpoint (+ published basis): the resumed
    // run must land EXACTLY the reference assignments, story ids included
    // (epoch numbering resumes from the checkpoint, so story-<epoch>-<i>
    // names agree too).
    assert(readTables(dir) == readTables(refDir),
      "restarted job must reproduce the uninterrupted run's tables")
  }
}
