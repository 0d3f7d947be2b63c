package graft

import graft.streaming.{ArticleStream, Incoming, OnlineClustering, StoryState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
  private def tsDay(d: Int, h: Int): Timestamp = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("D1: duplicate keys within the watermark horizon are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val deduped = ArticleStream.dedupWithTtl(
      mem.toDF().toDF("ingestion_time", "link"), "ingestion_time", "link")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // same link twice within an hour + a distinct link
      mem.addData((ts(1), "a"), (ts(1), "b"), (ts(2), "a"))
      q.processAllAvailable()
      val links = spark.table("dedup_out").select("link").as[String].collect().sorted
      assert(links.toSeq == Seq("a", "b"))
    } finally q.stop()
  }

  test("streaming curation gate: canonical-url dedup, quality floor, PII redaction") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val curated = ArticleStream.curate(
      mem.toDF().toDF("ingestion_time", "url", "text"),
      "url", "text", "ingestion_time", minTokens = 3, minQuality = 0.0)
    val q = curated.writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      mem.addData(
        // two crawl variants of ONE page — must dedup on the canonical form
        (ts(1), "HTTP://Example.COM:80/a/?utm_x=1", "mail me at a@b.co please today"),
        (ts(1), "http://example.com/a", "mail me at a@b.co please today"),
        // too short for minTokens=3
        (ts(1), "http://example.com/short", "hi there"),
        // distinct page survives
        (ts(2), "http://example.com/b", "completely different words here now"),
        // Gopher gate: heavy line repetition dies in-stream, statelessly
        (ts(2), "http://example.com/spam",
          "buy this now\nbuy this now\nbuy this now\nbuy this now\nonly once"))
      q.processAllAvailable()
      val rows = spark.table("curate_out")
        .select("canonical_url", "text").as[(String, String)].collect().toMap
      assert(rows.keySet == Set("http://example.com/a", "http://example.com/b"),
        "crawl variants collapse; short doc dropped; repetitive doc gophered")
      assert(rows("http://example.com/a").contains("<EMAIL>"), "PII redacted in-stream")
    } finally q.stop()
  }

  test("streaming curation gate: htmlInput extracts text BEFORE the gates judge it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val curated = ArticleStream.curate(
      mem.toDF().toDF("ingestion_time", "url", "text"),
      "url", "text", "ingestion_time", minTokens = 3, minQuality = 0.0,
      htmlInput = true)
    val q = curated.writeStream.format("memory").queryName("html_curate_out")
      .outputMode("append").start()
    try {
      mem.addData(
        // real prose inside markup — survives, with the markup gone
        (ts(1), "http://example.com/page",
          "<html><body><p>completely different words here now</p></body></html>"),
        // tag-heavy page whose PROSE is under minTokens — the length
        // band must judge the extracted text, not the markup bytes
        (ts(1), "http://example.com/thin",
          "<div class=\"wide markup heavy wrapper element\"><span>hi</span></div>"),
        // script-only page: nothing survives extraction
        (ts(1), "http://example.com/js",
          "<script>var much = 'code here today'; run(much);</script>"))
      q.processAllAvailable()
      val rows = spark.table("html_curate_out")
        .select("canonical_url", "text").as[(String, String)].collect().toMap
      assert(rows.keySet == Set("http://example.com/page"),
        s"only the prose page survives: ${rows.keySet}")
      assert(rows("http://example.com/page") === "completely different words here now")
    } finally q.stop()
  }

  test("streaming compression-ratio gate drops long-range-repetitive rows in-stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val curated = ArticleStream.curate(
      mem.toDF().toDF("ingestion_time", "url", "text"),
      "url", "text", "ingestion_time", minTokens = 3, minQuality = 0.0,
      gopherGate = false, maxCompressRatio = 4.0)
    val q = curated.writeStream.format("memory").queryName("compress_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts(1), "http://example.com/ok", "genuinely varied natural words appear across this sentence"),
        // >4x compressible: one phrase repeated 40 times — the Gopher
        // line rules are OFF here, only the deflate gate can catch it
        (ts(1), "http://example.com/junk", Seq.fill(40)("template row value").mkString(" ")))
      q.processAllAvailable()
      val urls = spark.table("compress_out").select("canonical_url").as[String].collect().toSeq
      assert(urls == Seq("http://example.com/ok"), s"junk survived: $urls")
    } finally q.stop()
  }

  test("D1: key reappearing after the TTL horizon is accepted again") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val deduped = ArticleStream.dedupWithTtl(
      mem.toDF().toDF("ingestion_time", "link"), "ingestion_time", "link")
    val q = deduped.writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()
    try {
      mem.addData((tsDay(1, 0), "a"))
      q.processAllAvailable()
      // advance watermark far past 24h, then send "a" again
      mem.addData((tsDay(5, 0), "advance"))
      q.processAllAvailable()
      mem.addData((tsDay(5, 1), "a"))
      q.processAllAvailable()
      val n = spark.table("dedup_ttl_out").filter(col("link") === "a").count()
      assert(n == 2, "link must be re-admitted after TTL state eviction")
    } finally q.stop()
  }

  test("ST4: article joins story created by the previous article in the same batch") {
    val batch = Seq(
      Incoming("a1", Array(1.0, 0.0)),
      Incoming("a2", Array(0.99, 0.01)), // similar to a1 → joins a1's story
      Incoming("a3", Array(0.0, 1.0)))   // dissimilar → new story
    val (assigned, state) = OnlineClustering.foldBatch(batch, Seq.empty, 0.8, i => s"new-$i")
    assert(assigned(0).isNew && assigned(0).storyId == "new-0")
    assert(!assigned(1).isNew && assigned(1).storyId == "new-0",
      "sequential semantics: a2 must join the story a1 just created")
    assert(assigned(2).isNew && assigned(2).storyId == "new-1")
    assert(state.map(_.storyId).toSet == Set("new-0", "new-1"))
    assert(state.find(_.storyId == "new-0").get.n == 2)
  }

  test("ST4: existing story state is matched before creating new ones") {
    val stories = Seq(StoryState("s-old", Array(1.0, 0.0), 5L))
    val (assigned, state) = OnlineClustering.foldBatch(
      Seq(Incoming("a1", Array(0.95, 0.05))), stories, 0.8, i => s"new-$i")
    assert(assigned(0).storyId == "s-old" && !assigned(0).isNew)
    assert(state.find(_.storyId == "s-old").get.n == 6)
  }

  test("windowed counts: tumbling event-time windows per key") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val counts = graft.streaming.ArticleStream.windowedCounts(
      mem.toDF().toDF("ts", "src"), "ts", "src", "1 hour", "2 hours")
    val q = counts.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), "a"), (ts(1), "a"), (ts(1), "b"), (ts(2), "a"))
      q.processAllAvailable()
      // advance watermark far enough to close the 01:00 and 02:00 windows
      mem.addData((tsDay(2, 0), "advance"))
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select(col("window_start").cast("string"), col("src"), col("n")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got.contains(("2024-01-01 01:00:00", "a", 2L)))
      assert(got.contains(("2024-01-01 01:00:00", "b", 1L)))
      assert(got.contains(("2024-01-01 02:00:00", "a", 1L)))
    } finally q.stop()
  }

  test("streaming session windows equal batch sessionize on a closed log") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // Second-resolution events against a 10.5 s gap: the exactly-at-gap
    // boundary (where the two sessionizers differ by design — see the
    // ArticleStream.sessionCounts scaladoc) is unreachable, so the
    // assignments must coincide on the whole log.
    val rng = new scala.util.Random(11)
    val rows = (0 until 300).map { _ =>
      (new Timestamp(1700000000000L + rng.nextInt(600) * 1000L), s"u${rng.nextInt(4)}")
    }
    val batch = graft.operators.TemporalOps.sessionize(
        rows.toDF("ts", "k"), Seq("k"), "ts", gapMicros = 10500000L)
      .groupBy("k", "session_seq")
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n"))
      .select(col("k"), col("session_start"), col("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val mem = MemoryStream[(Timestamp, String)]
    val sessions = ArticleStream.sessionCounts(
      mem.toDF().toDF("ts", "k"), "ts", "k", gap = "10500 milliseconds")
    // complete mode: every session is visible without watermark games.
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .select(col("k"), col("session_start"), col("n")).collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(got == batch,
        s"streaming sessions must equal batch sessionize: ${got.diff(batch)} vs ${batch.diff(got)}")
      assert(got.size > 20, "fixture must actually fragment into many sessions")
    } finally q.stop()
  }

  test("deterministic sampling is replay-safe in a stream (rand() is not)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Long]
    // stateless hash-decision filter: a replayed micro-batch re-decides
    // every row identically, so exactly-once survives retries — the
    // property a rand()-based sample cannot give
    val sampled = graft.operators.SampleOps.deterministicSample(
      mem.toDF().toDF("id"), col("id"), 0.5, "st|")
    val q = sampled.writeStream.format("memory").queryName("sample_out")
      .outputMode("append").start()
    try {
      mem.addData(1L to 400L: _*)
      q.processAllAvailable()
      val got = spark.table("sample_out").as[Long].collect().toSet
      // identical to the batch decision for the same (salt, key)
      val batch = graft.operators.SampleOps.deterministicSample(
        (1L to 400L).toDF("id"), col("id"), 0.5, "st|")
        .as[Long].collect().toSet
      assert(got == batch)
      assert(got.nonEmpty && got.size < 400)
    } finally q.stop()
  }

  test("multimodal decodeBatches: partition-batched stub decode") {
    import spark.implicits._
    val df = Seq((1L, "hello".getBytes), (2L, "world!!".getBytes), (3L, Array.empty[Byte]))
      .toDF("id", "payload")
    val got = graft.operators.MultimodalOps.decodeBatches(df).collect()
      .map(m => m.id -> m).toMap
    assert(got.size == 3)
    assert(got(1L).width >= 1 && got(1L).width <= 1920)
    assert(got(1L).height >= 1 && got(1L).height <= 1080)
    assert(got(3L).meanByte == 0.0)
    // deterministic across runs
    val again = graft.operators.MultimodalOps.decodeBatches(df).collect().map(m => m.id -> m).toMap
    assert(again(1L) == got(1L) && again(2L) == got(2L))
  }

  test("ST4 state-store variant: assignments persist across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[graft.streaming.Incoming]
    val out = graft.streaming.StatefulClustering.assignStream(mem.toDS(), 0.8)
    val q = out.writeStream.format("memory").queryName("st4_out")
      .outputMode("append").start()
    try {
      mem.addData(graft.streaming.Incoming("a1", Array(1.0, 0.0)))
      q.processAllAvailable()
      // second batch: similar article must join the story created in batch 1
      mem.addData(graft.streaming.Incoming("a2", Array(0.99, 0.01)),
        graft.streaming.Incoming("a3", Array(0.0, 1.0)))
      q.processAllAvailable()
      val rows = spark.table("st4_out").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(3))).toMap
      assert(rows("a1")._2, "a1 opens a story")
      assert(rows("a2")._1 == rows("a1")._1 && !rows("a2")._2,
        "a2 joins the story created in the PREVIOUS batch via state store")
      assert(rows("a3")._2 && rows("a3")._1 != rows("a1")._1)
    } finally q.stop()
  }

  test("ST4 pruned: grid-cell candidate fold ≡ full fold, with candidates < stories") {
    import spark.implicits._
    // 40 stories spread around the unit circle; the batch clusters near
    // angle 0, so only a handful of stories share its cell neighborhood.
    val stories = (0 until 40).map { k =>
      val a = 2 * math.Pi * k / 40.0
      (f"s-$k%02d", Seq(math.cos(a) * 3.0, math.sin(a) * 3.0), (k % 4) + 1L)
    }.toDF("story_id", "centroid", "n")
    val batch = Seq(
      ("a1", Seq(1.0, 0.02)),            // joins s-00
      ("a2", Seq(0.99, 0.05)),           // joins s-00 (moved centroid)
      ("a3", Seq(-0.6, -0.82)),          // far side of the circle
      ("a4", Seq(0.0, 0.0)),             // zero vector: always a new story
    ).toDF("link", "embedding")
    val threshold = 0.9
    val (fullA, fullS) = OnlineClustering.processBatch(
      batch, stories, "link", "embedding", threshold, batchEpoch = 7L)
    val pruned = OnlineClustering.processBatchPruned(
      batch, stories, "link", "embedding", threshold, batchEpoch = 7L)
    val (prunedA, deltaS) = (pruned.assigned, pruned.storyDelta)
    assert(pruned.nBatch == 4L)
    assert(pruned.nCandidates < 40,
      s"reported candidate count must reflect real pruning: ${pruned.nCandidates}")
    // The prefilter must genuinely prune: candidate stories < all stories.
    val batchVecs = Map("a1" -> Array(1.0, 0.02), "a2" -> Array(0.99, 0.05),
      "a3" -> Array(-0.6, -0.82), "a4" -> Array(0.0, 0.0))
    val realCells = OnlineClustering.candidateCells(
      batchVecs.map { case (i, v) => Incoming(i, v) }.toSeq, threshold, 2)
    val nCand = stories.collect().count { r =>
      val c = OnlineClustering.homeCell(
        r.getSeq[Double](1).toArray, threshold, 2)
      realCells.contains(c)
    }
    assert(nCand < 40, s"prefilter must prune, saw $nCand of 40 candidates")
    assert(nCand > 0, "fixture must keep some candidates or the test is vacuous")
    // Assignments are EXACTLY equal: story id, isNew, and sim for joins.
    def byId(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2), r.getBoolean(3))).toMap
    val (fa, pa) = (byId(fullA), byId(prunedA))
    assert(fa.keySet == pa.keySet)
    fa.foreach { case (id, (sid, sim, isNew)) =>
      val (psid, psim, pisNew) = pa(id)
      assert(psid == sid && pisNew == isNew, s"assignment diverged for $id")
      if (!isNew) assert(psim == sim, s"join sim diverged for $id")
      else assert(psim <= sim + 1e-12 && psim < threshold,
        s"new-story sim is best-candidate (≤ global best, < threshold) for $id")
    }
    // Original stories + delta == the full fold's complete state.
    def stateMap(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getString(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    val merged = stateMap(stories.collect()) ++ stateMap(deltaS.collect())
    assert(merged == stateMap(fullS.collect()),
      "MERGE delta applied to the stories table must reproduce the full state")
    // The delta itself stays small: only touched stories travel.
    assert(deltaS.count() < 40)
  }

  test("ST4 pruned: raw grid degenerates in high dims; a projection basis restores pruning") {
    import spark.implicits._
    // 64-dim embeddings whose variation lives in coordinates 7 and 23 —
    // the shape of real embeddings after isotropic coordinates wash out.
    val d = 64
    def emb(x: Double, y: Double): Seq[Double] = {
      val a = Array.fill(d)(0.0); a(7) = x * 3.0; a(23) = y * 3.0; a.toSeq
    }
    val stories = (0 until 40).map { k =>
      val th = 2 * math.Pi * k / 40.0
      (f"s-$k%02d", emb(math.cos(th), math.sin(th)), (k % 4) + 1L)
    }
    val storiesDf = stories.toDF("story_id", "centroid", "n")
    val batchLocal = Seq("a1" -> emb(1.0, 0.02), "a2" -> emb(0.99, 0.05),
      "a3" -> emb(-0.6, -0.82))
    val batch = batchLocal.toDF("link", "embedding")
    val threshold = 0.9
    val in = batchLocal.map { case (id, v) => Incoming(id, v.toArray) }
    // Raw leading-coordinate grid: coords 1..2 are identically zero, so
    // every story shares one cell — the filter keeps all 40 (correct but
    // non-discriminating, exactly the documented envelope limit).
    val rawCells = OnlineClustering.candidateCells(in, threshold, 2)
    val nRaw = stories.count(s =>
      rawCells.contains(OnlineClustering.homeCell(s._2.toArray, threshold, 2)))
    assert(nRaw == 40, s"raw grid should degenerate to keep-all here, kept $nRaw")
    // Basis = the two variance-carrying directions: pruning returns.
    def unit(i: Int) = { val a = Array.fill(d)(0.0); a(i) = 1.0; a }
    val basis = Seq(unit(7), unit(23))
    val pCells = OnlineClustering.candidateCells(in, threshold, 2, basis)
    val nProj = stories.count(s =>
      pCells.contains(OnlineClustering.homeCell(s._2.toArray, threshold, 2, basis)))
    assert(nProj > 0 && nProj < 40, s"projected grid must discriminate, kept $nProj")
    // And the basis-pruned outputs still equal the full fold exactly.
    val (fullA, _) = OnlineClustering.processBatch(
      batch, storiesDf, "link", "embedding", threshold, batchEpoch = 3L)
    val prunedA = OnlineClustering.processBatchPruned(
      batch, storiesDf, "link", "embedding", threshold, batchEpoch = 3L, basis = basis).assigned
    def byId(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(3))).toMap
    assert(byId(prunedA) == byId(fullA))
    // The turnkey PCA basis finds the two variance-carrying directions
    // on its own and discriminates just as well.
    val learned = OnlineClustering.storyBasis(storiesDf, "centroid", 2)
    assert(learned.length == 2 && learned.forall(h =>
      math.abs(math.sqrt(h.map(x => x * x).sum) - 1.0) < 1e-6), "unit directions")
    val lCells = OnlineClustering.candidateCells(in, threshold, 2, learned)
    val nLearned = stories.count(s =>
      lCells.contains(OnlineClustering.homeCell(s._2.toArray, threshold, 2, learned)))
    assert(nLearned < 40, s"PCA basis must discriminate, kept $nLearned")
    val pcaA = OnlineClustering.processBatchPruned(
      batch, storiesDf, "link", "embedding", threshold, batchEpoch = 3L, basis = learned).assigned
    assert(byId(pcaA) == byId(fullA))
  }

  test("ST4: centroid running mean moves toward joined article") {
    val stories = Seq(StoryState("s", Array(1.0, 0.0), 1L))
    val (_, state) = OnlineClustering.foldBatch(
      Seq(Incoming("a", Array(0.0, 0.0))), stories, -2.0, i => s"n-$i")
    // mean of (1,0) and (0,0) = (0.5, 0)
    assert(state.head.centroid.toSeq == Seq(0.5, 0.0))
  }

  // Auto-activating Kafka check: the `spark-sql-kafka-0-10` connector is
  // absent from this environment (standing waiver, BASELINE.md), so this
  // CANCELS today — but the moment the jar lands on the classpath, the
  // source topology resolves and the fixed Kafka schema is asserted with
  // no test-code change. Provider lookup happens at load(); no broker is
  // contacted before query start.
  test("trending tokens: MG bound holds per closed window; state is m-bounded") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val m = 5
    val mem = MemoryStream[(Timestamp, String)]
    val trending = ArticleStream.trendingTokens(
      mem.toDF().toDF("event_time", "token"), "event_time", "token",
      m = m, windowLen = "1 hour", lateness = "30 minutes")
    val q = trending.writeStream.format("memory").queryName("trend_out")
      .outputMode("append").start()
    try {
      // window [01:00, 02:00): one dominant token + a 20-token tail, fed
      // across TWO micro-batches so state-store serialize/merge runs.
      val tail = (1 to 20).map(i => (ts(1), s"c$i"))
      mem.addData(Seq.fill(30)((ts(1), "hot")) ++ tail: _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(30)((ts(1), "hot")) ++ tail: _*)
      q.processAllAvailable()
      mem.addData((ts(5), "flush")) // advance watermark, close the window
      q.processAllAvailable()
      val rows = spark.table("trend_out")
        .filter(col("window_start") === ts(1)).collect()
      assert(rows.length == 1, s"one closed window expected: ${rows.toSeq}")
      val est = rows(0).getMap[String, Long](1).toMap
      val n = rows(0).getLong(2)
      assert(n == 100L)
      assert(est.size <= m, s"state not m-bounded: $est")
      val bound = n.toDouble / (m + 1)
      // exact: hot=60, c1..c20=2 — hot is above n/(m+1) so it MUST survive
      assert(est.contains("hot"), s"heavy hitter evicted: $est")
      assert(est("hot") <= 60L && 60L - est("hot") <= bound, s"bound broken: $est")
      est.foreach { case (k, v) =>
        val exact = if (k == "hot") 60L else 2L
        assert(v <= exact, s"overestimate for $k: $v")
      }
    } finally q.stop()
  }

  test("window quantiles: closed-window answers equal batch percentile_approx; bounded state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val qdf = ArticleStream.windowQuantiles(
      mem.toDF().toDF("event_time", "len"), "event_time", "len",
      qs = Seq(0.5, 0.9, 0.99), accuracy = 1 << 12,
      windowLen = "1 hour", lateness = "30 minutes")
    val q = qdf.writeStream.format("memory").queryName("wq_out")
      .outputMode("append").start()
    try {
      // window [01:00, 02:00): a skewed value stream across TWO
      // micro-batches so the sketch rides state-store serialize/merge
      val b1 = (1 to 60).map(i => (ts(1), ((i * 2654435761L) % 500)))
      val b2 = (1 to 40).map(i => (ts(1), 1000L + i))
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      mem.addData((ts(5), 0L)) // advance watermark, close the window
      q.processAllAvailable()
      val rows = spark.table("wq_out")
        .filter(col("window_start") === ts(1)).collect()
      assert(rows.length == 1, s"one closed window expected: ${rows.toSeq}")
      assert(rows(0).getLong(2) == 100L)
      val got = rows(0).getSeq[Double](1)
      val want = (b1 ++ b2).map(_._2.toDouble).toDF("v")
        .agg(percentile_approx(col("v"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(1 << 12)).as("p"))
        .collect()(0).getSeq[Double](0)
      assert(got === want,
        "closed-window sketch answers must equal batch percentile_approx")
    } finally q.stop()
  }

  test("S4: Kafka source provider resolves when the connector is present") {
    val connectorPresent =
      try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
      catch { case _: ClassNotFoundException => false }
    assume(connectorPresent,
      "spark-sql-kafka-0-10 not on classpath — standing environment waiver")
    val df = ArticleStream.fromKafka(spark, "localhost:9092", "articles",
      org.apache.spark.sql.Encoders.product[graft.core.Article].schema)
    assert(df.schema.fieldNames.nonEmpty)
  }
}
