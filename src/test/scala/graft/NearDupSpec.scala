package graft

import graft.operators.{DedupOps, SimilarityOps}
import graft.functions.vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Scale-safe near-duplicate paths must equal their brute-force forms:
 * banded SimHash (Manku WWW'07 pigeonhole) vs all-pairs Hamming, and the
 * epsilon-grid cosine join vs the all-pairs broadcast — and neither plan
 * may contain a nested-loop pair enumeration.
 */
class NearDupSpec extends AnyFunSuite with SparkSpec {

  test("banded simhash pairs == all-pairs Hamming filter; no nested-loop join") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val banded = DedupOps.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 8)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded plan must not enumerate all pairs:\n$plan")

    val sh = docs.select(col("doc_id"), DedupOps.simhash(col("text")).as("sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sa"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sb"))
    val brute = a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .filter(col("hamming") <= 8)
    val got = banded.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exp = brute.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exp, s"banded=${got.size} brute=${exp.size}")
    assert(exp.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("dedupCascade: candidates verify, close, and keep the min-id representative") {
    import spark.implicits._
    // Docs 1/2/3 share almost all shingles (a chain: 1~2, 2~3); 10 is
    // unrelated; 11 is a word-salad singleton with no repeated shingles.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "beta gamma delta epsilon zeta eta iota kappa"),
      (10L, "completely different words about completely other topics here"),
      (11L, "one singular document"),
    ).toDF("doc_id", "text")
    val out = DedupOps.dedupCascade(docs, "doc_id", "text",
        shingleN = 3, k = 4, bands = 4, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1L, true)), "min id of the chain is the representative")
    assert(out(2L) == ((1L, false)) && out(3L) == ((1L, false)),
      "transitive near-dups collapse into one group through the chain")
    assert(out(10L) == ((10L, true)) && out(11L) == ((11L, true)),
      "singletons keep themselves")
    // Exactly one survivor per component.
    val perComp = out.values.groupBy(_._1).view.mapValues(_.count(_._2)).toMap
    assert(perComp.values.forall(_ == 1))
  }

  test("simhash bands cover all 64 bits exactly once") {
    import spark.implicits._
    val fp = Seq(-1L, 0L, 0x123456789abcdefL, Long.MinValue).toDF("sh")
    // Reassembling the bands must reproduce the fingerprint.
    val widths = {
      val base = 64 / 9; val rem = 64 % 9
      Seq.tabulate(9)(t => if (t < rem) base + 1 else base)
    }
    val offsets = widths.scanLeft(0)(_ + _)
    val back = fp.select(col("sh"),
      (0 until 9).map(t => shiftleft(element_at(DedupOps.simhashBands(col("sh"), 9), t + 1), offsets(t)))
        .reduce((x, y) => x.bitwiseOR(y)).as("re"))
    assert(back.filter(col("sh") =!= col("re")).count() == 0)
  }

  test("epsilon-grid cosine near-dup == brute force at loose and tight thresholds; no nested-loop join") {
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
    for (t <- Seq(0.3, 0.9)) {
      val grid = SimilarityOps.nearDupByCosine(vecs, "vec_id", "embedding", t)
      val plan = grid.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"grid plan must not enumerate all pairs:\n$plan")
      val a = vecs.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = vecs.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      val brute = a.join(broadcast(b), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), vector.cosineSim(col("va"), col("vb")).as("sim"))
        .filter(col("sim") >= t)
      val got = grid.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exp = brute.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exp, s"t=$t grid=${got.size} brute=${exp.size} " +
        s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
  }

  test("LSH bucket cap bounds pair counts on boilerplate-heavy data and flags capped pairs") {
    import spark.implicits._
    val boiler = "the same boilerplate header appears on every single page of this corpus"
    val docs = ((0L until 200L).map(i => (i, boiler)) ++
      Seq((900L, "a genuinely unique document about alpine marmots and their burrows"),
          (901L, "a genuinely unique document about alpine marmots and their burrows"))).toDF("doc_id", "text")
    val capped = DedupOps.lshCandidatePairs(docs, "doc_id", "text", 3, 4, 4, bucketCap = 10)
    val rows = capped.collect()
    // 200 identical docs would give C(200,2)=19900 pairs; the cap bounds
    // enumeration to C(10,2) per band over the truncated bucket.
    val fromBoiler = rows.filter(_.getLong(0) < 200L)
    assert(fromBoiler.length <= 45, s"cap must bound pairs, got ${fromBoiler.length}")
    assert(fromBoiler.nonEmpty && fromBoiler.forall(_.getBoolean(2)), "boilerplate pairs are flagged capped")
    // The small genuine near-dup bucket is untouched and unflagged.
    val marmots = rows.filter(_.getLong(0) == 900L)
    assert(marmots.length == 1 && !marmots.head.getBoolean(2))
    // With no bucket over the cap, capped output == unbounded output.
    val unique = (0L until 40L).map(i =>
      (i, s"document number $i talks about topic ${i % 7} in considerable depth with words $i"))
      .toDF("doc_id", "text")
    val a = DedupOps.lshCandidatePairs(unique, "doc_id", "text", 3, 4, 4)
      .select("id_a", "id_b", "capped").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val b = DedupOps.lshCandidatePairs(unique, "doc_id", "text", 3, 4, 4, bucketCap = 100)
      .select("id_a", "id_b", "capped").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(a == b)
  }

  test("epsilon-grid keeps short and zero-norm vectors, matching brute force") {
    import spark.implicits._
    // Vectors shorter than gridDims (size 1 < 2) and an all-zero vector:
    // the guard grids missing coordinates at 0.0 instead of dropping the
    // row on a null cell key; the kernel zero-pads, so this stays exact.
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.99, 0.1, 0.0)),
      (2L, Seq(0.97)),                      // short: near-dup of 0 and 1
      (3L, Seq(0.0, 0.0, 0.0)),             // zero-norm: matches nothing
      (4L, Seq(-1.0, 0.05, 0.0))).toDF("vec_id", "embedding")
    val got = SimilarityOps.nearDupByCosine(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = vecs.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = vecs.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exp = a.join(broadcast(b), col("id_a") < col("id_b"))
      .filter(vector.cosineSim(col("va"), col("vb")) >= 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exp.contains((0L, 2L)), "fixture must exercise a short-vector pair")
    assert(got == exp, s"grid=$got brute=$exp")
    intercept[IllegalArgumentException] {
      SimilarityOps.nearDupByCosine(vecs, "vec_id", "embedding", 0.0)
    }
  }

  test("greedyMatch past the cap auto-routes to the distributed form — exact, never truncated") {
    import spark.implicits._
    val cands = Seq(
      ("c1", "s1", 0.9), ("c2", "s1", 0.8), ("c2", "s2", 0.7),
      ("c3", "s3", 0.6), ("c4", "s4", 0.5)).toDF("cluster", "story", "jaccard")
    val full = graft.operators.StoryOps.greedyMatch(cands, "cluster", "story", "jaccard")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // cap=3 < 5 candidates: the old behavior truncated to the top-3
    // prefix (losing (c3,s3)/(c4,s4)); the routed form escalates to
    // greedyMatchDistributed and returns the COMPLETE greedy matching.
    val routed = graft.operators.StoryOps.greedyMatch(cands, "cluster", "story", "jaccard",
        maxCandidates = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(routed == full, s"overflow must escalate, not truncate: $routed vs $full")
    assert(full == Set(("c1", "s1"), ("c2", "s2"), ("c3", "s3"), ("c4", "s4")))
  }

  test("epsilon-grid equals brute force on seeded random ragged corpora") {
    import spark.implicits._
    for (seed <- Seq(11, 29, 47); t <- Seq(0.35, 0.9)) {
      val rnd = new scala.util.Random(seed)
      // ragged dims (1..6) exercise the short-vector guard; values near
      // cell boundaries exercise the inflated cell width.
      val vecs = (0L until 40L).map(i =>
        (i, Seq.fill(1 + rnd.nextInt(6))(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "embedding")
      val got = SimilarityOps.nearDupByCosine(vecs, "vec_id", "embedding", t)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val a = vecs.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = vecs.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      val exp = a.join(broadcast(b), col("id_a") < col("id_b"))
        .filter(vector.cosineSim(col("va").cast("array<double>"),
          col("vb").cast("array<double>")) >= t)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exp, s"seed=$seed t=$t missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
  }

  test("greedyMatch cap routing: identical matchings above and below the cap (random sets)") {
    import spark.implicits._
    for (seed <- Seq(3, 17)) {
      val rnd = new scala.util.Random(seed)
      val cands = (1 to 60).map(_ => (s"c${rnd.nextInt(12)}", s"s${rnd.nextInt(12)}",
        math.rint(rnd.nextDouble() * 100) / 100)).toDF("cluster", "story", "jaccard")
      def run(cap: Int) = graft.operators.StoryOps
        .greedyMatch(cands, "cluster", "story", "jaccard", maxCandidates = cap)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val full = run(1 << 20)       // under cap: driver greedy
      assert(run(10) == full, s"seed=$seed: routed (past-cap) must equal driver greedy")
      assert(run(60) == full)       // cap exactly covers: driver greedy
    }
  }

  test("greedyMatchDistributed equals the driver greedy exactly (random, ties, skew, chains)") {
    import spark.implicits._
    import graft.operators.StoryOps
    def run(df: org.apache.spark.sql.DataFrame) = {
      def norm(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      val drv = norm(StoryOps.greedyMatch(df, "cluster", "story", "jaccard"))
      val dist = norm(StoryOps.greedyMatchDistributed(df, "cluster", "story", "jaccard"))
      assert(dist == drv, s"missing=${(drv -- dist).take(5)} extra=${(dist -- drv).take(5)}")
    }
    for (seed <- Seq(1, 7, 23, 41)) {
      val rnd = new scala.util.Random(seed)
      // distinct pairs, 2-decimal scores → plenty of jaccard ties to
      // exercise the (cluster, story) string tie-break
      val cands = (1 to 120).map(_ => (s"c${rnd.nextInt(15)}", s"s${rnd.nextInt(15)}"))
        .distinct.map { case (c, s) => (c, s, math.rint(rnd.nextDouble() * 100) / 100) }
      run(cands.toDF("cluster", "story", "jaccard"))
    }
    // Skew: one hub cluster over many stories (plus competing clusters).
    val hub = (0 until 50).map(i => ("hub", s"s$i", 1.0 - i * 0.01)) ++
      (0 until 50).map(i => (s"c$i", s"s$i", 0.995 - i * 0.01))
    run(hub.toDF("cluster", "story", "jaccard"))
    // Strictly-decreasing path: the multi-round worst case for
    // locally-dominant matching (one new dominant edge per two hops).
    val chain = (0 until 30).flatMap(i =>
      Seq((s"c$i", s"s$i", 0.9 - i * 0.02), (s"c${i + 1}", s"s$i", 0.89 - i * 0.02)))
    run(chain.toDF("cluster", "story", "jaccard"))
  }

  test("neardupIncremental: near-dups of the corpus are rejected, novel docs admitted") {
    import spark.implicits._
    import graft.operators.DedupOps
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (2L, "an entirely different report about municipal budget hearings and road repairs"),
      (3L, "gardening tips for growing tomatoes peppers and basil in small urban plots"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the quiet river bank tonight"), // near-dup of 1
      (102L, "completely novel astronomy notes on variable stars and their light curves"),
      (103L, "x"))  // shingle-less: must still get an (admitted) verdict row
      .toDF("doc_id", "text")
    val idx = DedupOps.minhashBandIndex(corpus, "doc_id", "text", 3, 4, 4)
    val got = DedupOps.neardupIncremental(batch, corpus, idx, "doc_id", "text",
        shingleN = 3, k = 4, bands = 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toMap
    assert(got(101L)._2.contains(1L) && !got(101L)._3,
      s"near-dup must be rejected with its corpus match: ${got(101L)}")
    assert(got(102L) == ((0L, None, true)), s"novel doc admitted: ${got(102L)}")
    assert(got(103L) == ((0L, None, true)), s"shingle-less doc admitted: ${got(103L)}")
    // The index is append-only refreshable: admitting 102 and indexing it
    // makes a later identical ingest reject it.
    val admitted = batch.filter(col("doc_id") === 102L)
    val idx2 = idx.unionByName(
      DedupOps.minhashBandIndex(admitted, "doc_id", "text", 3, 4, 4))
    val corpus2 = corpus.unionByName(admitted)
    val again = DedupOps.neardupIncremental(
        batch.filter(col("doc_id") === 102L).select(col("doc_id") + 100, col("text"))
          .toDF("doc_id", "text"),
        corpus2, idx2, "doc_id", "text", 3, 4, 4, threshold = 0.5)
      .collect()
    assert(again.length == 1 && !again(0).getBoolean(4) && again(0).getLong(2) == 102L,
      s"re-ingest of an admitted doc must now be rejected: ${again.toSeq}")
    // Broadcast misuse guard: a batch past maxBatchRows must fail fast
    // (a corpus-sized "batch" would otherwise OOM the driver silently)...
    val guard = intercept[IllegalArgumentException] {
      DedupOps.neardupIncremental(batch, corpus, idx, "doc_id", "text",
        3, 4, 4, threshold = 0.5, maxBatchRows = 2)
    }
    assert(guard.getMessage.contains("broadcastBatch = false"),
      s"guard must point at the shuffled fallback: ${guard.getMessage}")
    // ...and the shuffled fallback gives the identical verdicts.
    val shuffled = DedupOps.neardupIncremental(batch, corpus, idx, "doc_id", "text",
        3, 4, 4, threshold = 0.5, maxBatchRows = 2, broadcastBatch = false)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toMap
    assert(shuffled == got, s"shuffled fallback must match the broadcast path: $shuffled vs $got")
  }

  test("persisted band index refresh touches only the new docs' buckets") {
    import spark.implicits._
    import graft.operators.DedupOps
    import graft.sources.TableSink
    val dir = java.nio.file.Files.createTempDirectory("bandidx").toString
    val corpus = (1L to 40L).map(i =>
        (i, s"standing document number $i about topic ${i % 7} with enough words to shingle"))
      .toDF("doc_id", "text")
    TableSink.upsert(spark,
      dir, DedupOps.minhashBandIndex(corpus, "doc_id", "text", 3, 4, 4)
        .withColumn("__v", lit(0L)), Seq("doc_id", "band"), "__v")
    def manifest(): Map[Int, String] = {
      val name = java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "_CURRENT")).trim
      scala.jdk.CollectionConverters.ListHasAsScala(java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(dir, "_manifests", name))).asScala
        .filter(_.contains('\t'))
        .map { l => val Array(b, p) = l.split('\t'); b.toInt -> p }.toMap
    }
    val before = manifest()
    assert(before.size > 4, "standing index must span several buckets")
    val fresh = Seq((101L, "a wholly new report on deep sea cables and repair ships"))
      .toDF("doc_id", "text")
    DedupOps.refreshBandIndexStored(spark, dir, fresh, "doc_id", "text", 3, 4, 4,
      version = 1L)
    val after = manifest()
    // O(batch) maintenance: only the buckets the 4 new (doc, band) rows
    // hash to were rewritten; every other standing bucket kept its files.
    val changed = after.filter { case (b, p) => before.get(b).exists(_ != p) }.keySet ++
      (after.keySet -- before.keySet)
    assert(changed.nonEmpty && changed.size <= 4,
      s"refresh must dirty at most the new rows' buckets: $changed")
    assert((before.keySet -- changed).forall(b => after(b) == before(b)),
      "standing buckets keep their existing files")
    // And the refreshed index actually serves: re-ingesting the same text
    // is now rejected by the standing check.
    val like = fresh.withColumn("band", lit(0)).withColumn("bv", lit(""))
      .withColumn("__v", lit(0L)).limit(0)
    val idxNow = TableSink.read(spark, dir, like)
    val verdict = DedupOps.neardupIncremental(
        Seq((202L, "a wholly new report on deep sea cables and repair ships"))
          .toDF("doc_id", "text"),
        corpus.unionByName(fresh), idxNow, "doc_id", "text", 3, 4, 4, threshold = 0.5)
      .collect()
    assert(verdict.length == 1 && !verdict(0).getBoolean(4) &&
      verdict(0).getLong(2) == 101L,
      s"refreshed index must catch the re-ingest: ${verdict.toSeq}")
  }

  test("admitIncremental: within-batch mutual near-dups collapse to one representative") {
    import spark.implicits._
    import graft.operators.DedupOps
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (2L, "an entirely different report about municipal budget hearings and road repairs"),
      (3L, "winter storm closes mountain passes across the northern region late this weekend entirely"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the quiet river bank tonight"), // corpus near-dup
      (102L, "completely novel astronomy notes on variable stars and their light curves"),
      (104L, "fresh recipe ideas for slow roasted vegetables with garlic and rosemary butter"),
      (105L, "fresh recipe ideas for slow roasted vegetables with garlic and rosemary sauce"), // near-dup of 104
      // 106 near-dups 107 (within batch) but NOT corpus doc 3 directly;
      // 107 near-dups corpus doc 3 → the whole {106, 107} component is
      // blocked even though its representative 106 clears its own check.
      (106L, "winter gale shuts mountain passes across the northern region late this sunday completely"),
      (107L, "winter gale shuts mountain passes across the northern region late this weekend entirely"))
      .toDF("doc_id", "text")
    val idx = DedupOps.minhashBandIndex(corpus, "doc_id", "text", 3, 4, 4)
    val vs = DedupOps.neardupIncremental(batch, corpus, idx, "doc_id", "text",
        3, 4, 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(vs(106L) && !vs(107L),
      s"fixture: 106 must clear its OWN corpus check while 107 fails it: $vs")
    val got = DedupOps.admitIncremental(batch, corpus, idx, "doc_id", "text",
        3, 4, 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(!got(101L)._2, "corpus near-dup blocked even though alone in its batch component")
    assert(got(102L)._2, "novel doc admitted")
    assert(got(104L) == ((104L, true)),
      s"min-id representative of the within-batch pair admitted: ${got(104L)}")
    assert(got(105L) == ((104L, false)),
      s"its within-batch near-dup collapses into the component: ${got(105L)}")
    assert(got(106L) == ((106L, false)),
      s"a member's corpus match blocks the whole component, representative included: ${got(106L)}")
    assert(got(107L) == ((106L, false)), s"blocked member stays blocked: ${got(107L)}")
    // Plan-shape pin: the cascade + corpus-probe DAG must run ONCE. The
    // flagged frame is eagerly checkpointed before fanning out to its two
    // consumers, so the FINAL plan contains only scans of the truncated
    // RDD — no shingle explode (Generate) and no minhash evaluation may
    // survive into it. A regression re-inlines the probe subtree into
    // both consumers and reappears here as a Generate node.
    val finalPlan = DedupOps.admitIncremental(batch, corpus, idx, "doc_id", "text",
      3, 4, 4, threshold = 0.5).queryExecution.executedPlan.toString
    assert(finalPlan.contains("ExistingRDD"),
      s"admission output must read the checkpointed verdict:\n$finalPlan")
    assert(!finalPlan.contains("Generate"),
      s"no shingle/band explode may survive into the final admission plan " +
        s"(the verify DAG would execute per consumer):\n$finalPlan")
  }

  test("epsilon-grid emits each candidate pair exactly once (no distinct needed)") {
    import spark.implicits._
    // All vectors in one tight cluster → every pair qualifies; duplicates
    // in the join would show up as repeated (id_a, id_b) rows.
    val base = Seq.tabulate(8)(i => math.sin(i + 1.0))
    val vecs = (0L until 20L).map(i => (i, base.map(_ * (1.0 + i * 1e-4)))).toDF("vec_id", "embedding")
    val out = SimilarityOps.nearDupByCosine(vecs, "vec_id", "embedding", 0.99)
    assert(out.count() == 190)
    assert(out.select("id_a", "id_b").distinct().count() == 190)
  }

  test("quality-argmax representative: longest member survives, doc-id breaks exact ties") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Component {1,2,3}: 2 is longest. Component {7,8}: tied length →
    // min id 7. Singleton 9 represents itself.
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 20L), (7L, 5L), (8L, 5L), (9L, 1L))
      .toDF("doc_id", "n_chars")
    val comp = graft.operators.DedupOps.connectedComponents(pairs, "id_a", "id_b")
    val labeled = docs
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"), col("n_chars"))
    val rep = labeled.groupBy("component")
      .agg(max_by(col("doc_id"),
        struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("rep_id"))
    val got = labeled.join(rep, "component")
      .select(col("doc_id"), col("rep_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }
}
