package graft

import graft.operators.SpanDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class SpanDedupSpec extends AnyFunSuite with SparkSpec {

  // 8-token boilerplate shared by three docs; everything else unique.
  private val boiler = "alpha beta gamma delta epsilon zeta eta theta"
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, s"$boiler unique one two three"),
      (2L, s"prefix words here $boiler trailing bits"),
      (3L, "totally unique prose with no duplication at all whatsoever"),
      (4L, "short doc"),                 // < k tokens → no windows
      (5L, ""),                          // empty → zero counts
      (6L, boiler)                       // exactly k tokens
    ).toDF("doc_id", "text")
  }

  /** Output attributes (name → type) of every shuffle exchange in the
    * plan, with AQE off so the tree is a plain ShuffleExchangeExec forest
    * (the adaptive wrapper hides its inner plan from collect). */
  private def shuffleOutputs(build: => DataFrame): Seq[Seq[(String, org.apache.spark.sql.types.DataType)]] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try build.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e.output.map(a => a.name -> a.dataType).toSeq
    }
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("digest-keyed inventory equals the string-keyed oracle form") {
    val s = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val d = SpanDedup.duplicatedSpansDigest(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(s.nonEmpty, "fixture must contain a duplicated span")
    assert(s == d)
    assert(s.contains((boiler, 3L, 3L))) // docs 1, 2, 6 — once each
  }

  test("digest-keyed scrub equals the string-keyed oracle form") {
    def asMap(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val s = asMap(SpanDedup.scrubSpans(docs, "doc_id", "text", k = 8))
    val d = asMap(SpanDedup.scrubSpansDigest(docs, "doc_id", "text", k = 8))
    val dShuffled = asMap(SpanDedup.scrubSpansDigest(docs, "doc_id", "text", k = 8,
      broadcastDups = false))
    assert(s == d)
    assert(s == dShuffled)
    assert(s(3L) == ((9L, 0L, "totally unique prose with no duplication at all whatsoever")))
    assert(s(4L) == ((2L, 0L, "short doc")))
    assert(s(5L) == ((0L, 0L, "")))
    assert(s(6L) == ((8L, 8L, "")))      // the span IS the doc → fully scrubbed
    assert(s(1L)._2 == 8L && s(1L)._3 == "unique one two three")
  }

  test("overlapping duplicated windows merge their coverage (distinct positions)") {
    import spark.implicits._
    // 9 shared tokens → two overlapping 8-token duplicated windows per
    // doc; coverage must be the 9 distinct positions, not 16.
    val nine = s"$boiler iota"
    val two = Seq((1L, nine), (2L, nine)).toDF("doc_id", "text")
    val got = SpanDedup.scrubSpansDigest(two, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 9L, 2L -> 9L))
  }

  test("scrubSpansDigest: span text never enters a shuffle exchange") {
    val exchanges = shuffleOutputs(
      SpanDedup.scrubSpansDigest(docs, "doc_id", "text", k = 8))
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(out => !out.exists(_._1.contains("span"))),
      s"span text shuffled: $exchanges")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SpanDedup.scrubSpansDigest(docs, "doc_id", "text", k = 8)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(plan.contains("BroadcastHashJoin"),
      s"duplicated-digest set must probe the windows as a broadcast:\n$plan")
  }

  test("span index merge law: index(a ∪ b) == merge(index(a), index(b)) on disjoint doc sets") {
    val a = docs.filter(col("doc_id") <= 3)
    val b = docs.filter(col("doc_id") > 3)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val whole = rows(SpanDedup.spanDigestIndex(docs, "doc_id", "text", k = 8))
    val merged = rows(SpanDedup.mergeSpanIndexes(
      SpanDedup.spanDigestIndex(a, "doc_id", "text", k = 8),
      SpanDedup.spanDigestIndex(b, "doc_id", "text", k = 8)))
    assert(whole.nonEmpty && whole == merged)
  }

  test("scrubAgainstIndex == full-corpus scrub restricted to the batch, all three dup parts exercised") {
    import spark.implicits._
    // corpus: two docs sharing the boiler span (index-already-duplicated)
    // plus a doc holding ONE copy of a second span; batch: a doc holding
    // the other copy of that span (crossed: 1 + 1 reaches minDocs), two
    // docs sharing a third span (batch-internal), and clean/short docs.
    val other = "one two three four five six seven eight"
    val third = "red orange yellow green blue indigo violet ultraviolet"
    val corpus = Seq(
      (10L, s"$boiler corpus padding words"),
      (11L, s"extra stuff $boiler more here"),
      (12L, s"$other lonely in the corpus")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (20L, s"$boiler fresh batch words"),      // hits index-duplicated span
      (21L, s"$other now seen twice overall"),  // crossed 1+1
      (22L, s"$third and some tail"),           // batch-internal (with 23)
      (23L, s"lead in $third"),
      (24L, "nothing duplicated here at all in any way whatsoever"),
      (25L, "tiny")
    ).toDF("doc_id", "text")
    val idx = SpanDedup.spanDigestIndex(corpus, "doc_id", "text", k = 8)
    def asMap(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val got = asMap(SpanDedup.scrubAgainstIndex(batch, idx, "doc_id", "text", k = 8))
    val gotShuffled = asMap(SpanDedup.scrubAgainstIndex(batch, idx, "doc_id", "text",
      k = 8, broadcastProbes = false))
    val full = asMap(SpanDedup.scrubSpansDigest(corpus.unionByName(batch),
      "doc_id", "text", k = 8).filter(col("doc_id") >= 20L))
    assert(got == full, s"incremental must equal full-restricted:\n$got\nvs\n$full")
    assert(gotShuffled == full)
    // Each dup-source path actually removed something.
    assert(got(20L)._2 >= 8, "index-duplicated span must scrub")
    assert(got(21L)._2 >= 8, "crossed 1+1 span must scrub")
    assert(got(22L)._2 >= 8 && got(23L)._2 >= 8, "batch-internal span must scrub")
    assert(got(24L)._2 == 0 && got(25L)._2 == 0)
  }

  test("scrubAgainstIndex: span text never enters a shuffle exchange") {
    import spark.implicits._
    val corpus = docs.filter(col("doc_id") <= 3)
    val batch = docs.filter(col("doc_id") > 3)
    val idx = SpanDedup.spanDigestIndex(corpus, "doc_id", "text", k = 8)
    val exchanges = shuffleOutputs(
      SpanDedup.scrubAgainstIndex(batch, idx, "doc_id", "text", k = 8))
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(out => !out.exists(_._1.contains("span"))),
      s"span text shuffled: $exchanges")
  }

  test("persisted index: admission scrub pushes the n_docs threshold into the parquet scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("span_idx").toString
    val corpus = docs.filter(col("doc_id") <= 3)
    val batch = docs.filter(col("doc_id") > 3)
    SpanDedup.spanDigestIndex(corpus, "doc_id", "text", k = 8)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val viaStored = SpanDedup.scrubAgainstIndex(batch, stored, "doc_id", "text", k = 8)
    // Same verdicts as the in-memory index (persistence is transparent) …
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val viaMem = SpanDedup.scrubAgainstIndex(batch,
      SpanDedup.spanDigestIndex(corpus, "doc_id", "text", k = 8), "doc_id", "text", k = 8)
    assert(rows(viaStored) == rows(viaMem))
    // … and the scaladoc's pushdown claim holds: both index reads
    // (already-duplicated ≥ minDocs; crossed < minDocs) reach the scan
    // as pushed parquet predicates on n_docs, so an admission read never
    // decodes the index rows the threshold excludes.
    val plan = viaStored.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(n_docs,2)"),
      s"threshold side must push n_docs >= minDocs into the scan:\n$plan")
    assert(plan.contains("LessThan(n_docs,2)"),
      s"crossed side must push n_docs < minDocs into the scan:\n$plan")
  }

  test("maximalRepeats: exact variable-length extents at misaligned offsets — " +
    "the spans the fixed-k shingle index cannot report") {
    import spark.implicits._
    // A 12-token phrase planted in two docs at DIFFERENT offsets (3 and
    // 2 tokens in), surrounded by unique prose. k = 6 windows.
    val phrase = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    val d = Seq(
      (1L, s"a b c $phrase x y"),
      (2L, s"q r $phrase z"),
      (3L, "entirely unrelated filler prose with no duplication here at all"),
      // Within-doc overlapping self-repeat: seven 'w's — the maximal
      // self-match is w×6 at offsets (3, 4).
      (4L, "u v w w w w w w w tail")
    ).toDF("doc_id", "text")
    val got = SpanDedup.maximalRepeats(d, "doc_id", "text", minLen = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getString(5))).toSet
    assert(got === Set(
      // ONE maximal 12-token match with exact per-doc offsets — a k=6
      // shingle inventory reports this as 7 separate fixed-width rows
      // and can never align the offsets 4-vs-3.
      (1L, 4, 2L, 3, 12, phrase),
      (4L, 3, 4L, 4, 6, "w w w w w w")))
  }

  test("maximalRepeats: occurrence cap excludes ubiquitous spans; runs respect it") {
    import spark.implicits._
    // The same 8-token phrase in 5 docs; cap 4 → every pair excluded.
    val phrase = "c1 c2 c3 c4 c5 c6 c7 c8"
    val d = (1L to 5L).map(i => (i, s"unique$i lead$i $phrase tail$i")).toDF("doc_id", "text")
    assert(SpanDedup.maximalRepeats(d, "doc_id", "text", minLen = 8, maxOcc = 4)
      .count() === 0L)
    // Raise the cap: C(5,2) = 10 pairs, all full extent.
    val got = SpanDedup.maximalRepeats(d, "doc_id", "text", minLen = 8, maxOcc = 16)
    assert(got.count() === 10L)
    assert(got.filter(col("len_tokens") === 8 && col("span") === phrase).count() === 10L)
  }

  test("dupMaskRanges: merged ranges cover exactly the positions the scrub removes") {
    import spark.implicits._
    // docs fixture: 9 shared tokens in docs 1/2/6 → overlapping
    // duplicated windows whose coverage must merge into ONE range.
    val ranges = SpanDedup.dupMaskRanges(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(ranges.forall { case (_, s, e, l) => l == e - s + 1 && l >= 8 })
    // Per-doc masked token count == the all-copies scrub's n_removed —
    // the two views of the same coverage set cannot disagree.
    val maskedPerDoc = ranges.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val removed = SpanDedup.scrubSpansDigest(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    removed.foreach { case (id, n) =>
      assert(maskedPerDoc.getOrElse(id, 0).toLong === n,
        s"doc $id: mask total vs scrub n_removed") }
    // The boiler block is one contiguous 8-token range in doc 1 and 6.
    assert(ranges.count(_._1 == 1L) === 1)
    assert(ranges.filter(_._1 == 6L).map(t => (t._2, t._3)).toSeq === Seq((1, 8)))
  }

  test("scrubSpansKeepFirst: canonical occurrence survives, later copies scrub, " +
    "within-doc repeats dedup") {
    import spark.implicits._
    val phrase = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val d = Seq(
      // doc 1 holds the canonical (min (doc, pos)) occurrence — kept.
      (1L, s"$phrase unique one two three"),
      // doc 2's copy is non-canonical — scrubbed.
      (2L, s"prefix words here $phrase trailing bits"),
      // doc 3 repeats an 8-token run TWICE within itself: first copy
      // kept, second scrubbed (occurrence-counted, not doc-counted —
      // the all-copies scrub would not touch this doc at all).
      (3L, "r1 r2 r3 r4 r5 r6 r7 r8 mid r1 r2 r3 r4 r5 r6 r7 r8"),
      (4L, "wholly unique prose with no duplication anywhere at all")
    ).toDF("doc_id", "text")
    val got = SpanDedup.scrubSpansKeepFirst(d, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) === ((12L, 0L, s"$phrase unique one two three")),
      "canonical occurrence must survive untouched")
    assert(got(2L) === ((13L, 8L, "prefix words here trailing bits")),
      "the non-canonical copy must scrub")
    assert(got(3L) === ((17L, 8L, "r1 r2 r3 r4 r5 r6 r7 r8 mid")),
      "a within-doc repeat deduplicates (keep the first copy)")
    assert(got(4L)._2 === 0L)
    // Contrast pin: the all-copies scrub removes BOTH cross-doc copies
    // and leaves the within-doc repeat alone (distinct-doc counting).
    val all = SpanDedup.scrubSpansDigest(d, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(all(1L) === 8L && all(2L) === 8L && all(3L) === 0L)
  }

  test("scrubKeepFirstAgainstIndex == global keep-first restricted to the batch " +
    "on an id-ordered ingest; corpus presence covers even batch-unique spans") {
    import spark.implicits._
    val phrase = "alpha beta gamma delta epsilon zeta eta theta"
    // Corpus ids (1-3) all below batch ids (10-12): the arrival-order
    // canonical IS the global min-(doc,pos) canonical, so the
    // incremental form must equal the global scrub restricted to batch.
    val corpus = Seq(
      (1L, s"$phrase corpus prose one"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 more corpus text"),
      (3L, "unshared corpus content sits here quietly for now")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // hits a corpus span ONCE — all-copies incremental scrub would
      // need a second doc; keep-first covers it on presence alone.
      (10L, s"lead in $phrase tail"),
      // corpus-novel span duplicated within the batch: 10 < 11 is not
      // relevant (different span) — 11 holds the batch-canonical copy.
      (11L, "n1 n2 n3 n4 n5 n6 n7 n8 filler words"),
      (12L, s"pre n1 n2 n3 n4 n5 n6 n7 n8 post")
    ).toDF("doc_id", "text")
    val index = SpanDedup.spanDigestIndex(corpus, "doc_id", "text", k = 8)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val inc = rows(SpanDedup.scrubKeepFirstAgainstIndex(batch, index,
      "doc_id", "text", k = 8))
    val global = rows(SpanDedup.scrubSpansKeepFirst(
        corpus.unionByName(batch), "doc_id", "text", k = 8)
      .filter(col("doc_id") >= 10L))
    assert(inc === global, "incremental-equality law on id-ordered ingest")
    val byId = inc.map(t => t._1 -> t).toMap
    assert(byId(10L)._3 === 8L, "corpus-held span scrubs on presence alone")
    assert(byId(11L)._3 === 0L, "batch-canonical copy of a corpus-novel span survives")
    assert(byId(12L)._3 === 8L, "the later batch copy scrubs")
  }

  test("scrubSpansKeepFirst: span text never enters a shuffle exchange") {
    val exchanges = shuffleOutputs(
      SpanDedup.scrubSpansKeepFirst(docs, "doc_id", "text", k = 8))
    assert(exchanges.nonEmpty)
    // Same contract as scrubSpansDigest: the detection and coverage
    // exchanges carry digests + the canonical (id, i) struct + ints —
    // never a span attribute (single tokens in the reassembly agg are
    // the only strings anywhere).
    assert(exchanges.forall(out => !out.exists(_._1.contains("span"))),
      s"span text shuffled: $exchanges")
  }

  test("maximalRepeats == independent token-level reference on seeded random corpora") {
    import spark.implicits._
    // Reference built WITHOUT windows: walk every (doc pair, diagonal)
    // at token level, emit maximal runs of equal tokens of length >= k
    // — an independent construction of the same mathematical object the
    // window/gaps-and-islands pipeline computes.
    def ref(ids: Seq[Long], toks: Map[Long, Vector[String]], k: Int)
        : Set[(Long, Int, Long, Int, Int)] = {
      val out = scala.collection.mutable.Set.empty[(Long, Int, Long, Int, Int)]
      for (a <- ids; b <- ids; if a <= b) {
        val A = toks(a); val B = toks(b)
        for (sa <- 1 to A.length; sb <- 1 to B.length
             if (a < b || sa < sb) &&
               A(sa - 1) == B(sb - 1) &&
               (sa == 1 || sb == 1 || A(sa - 2) != B(sb - 2))) {
          var len = 0
          while (sa - 1 + len < A.length && sb - 1 + len < B.length &&
            A(sa - 1 + len) == B(sb - 1 + len)) len += 1
          if (len >= k) out += ((a, sa, b, sb, len))
        }
      }
      out.toSet
    }
    val rng = new scala.util.Random(4242)
    val k = 4
    for (trial <- 1 to 4) {
      // Tiny alphabet → dense accidental repeats, within-doc included.
      val corpus = (1L to 8L).map { id =>
        val n = 8 + rng.nextInt(25)
        (id, Seq.fill(n)("wxyz".charAt(rng.nextInt(4)).toString).mkString(" "))
      }
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toVector }.toMap
      val got = SpanDedup.maximalRepeats(corpus.toDF("doc_id", "text"),
          "doc_id", "text", minLen = k, maxOcc = 1 << 20)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getInt(3), r.getInt(4), r.getString(5)))
      // Every reported span must be REAL (both slices equal the span)…
      got.foreach { case (ia, sa, ib, sb, len, span) =>
        val seg = toks(ia).slice(sa - 1, sa - 1 + len)
        assert(seg == toks(ib).slice(sb - 1, sb - 1 + len),
          s"trial $trial: phantom match ($ia,$sa)-($ib,$sb) len $len")
        assert(span == seg.mkString(" "))
      }
      // …and the SET must equal the independent reference exactly
      // (soundness and completeness, maximality included).
      val want = ref(corpus.map(_._1), toks, k)
      val gotSet = got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSet
      assert(gotSet === want, s"trial $trial: engine=$gotSet\n  ref=$want")
      assert(want.nonEmpty, s"trial $trial produced no matches — fixture too sparse")
    }
  }

  test("maximalRepeatsAgainst == global maximalRepeats restricted to batch-touching pairs") {
    import spark.implicits._
    val phrase = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    val corpus = Seq(
      (1L, s"a b c $phrase x y"),
      (2L, s"q r $phrase z"),          // corpus-corpus pair: must NOT appear
      (3L, "unrelated corpus content sits here quietly")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"lead $phrase tail"),      // batch-vs-corpus (and vs 11)
      (11L, s"$phrase immediately"),    // batch-vs-batch with 10
      (12L, "nothing shared in this one at all")
    ).toDF("doc_id", "text")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4))).toSet
    val inc = rows(SpanDedup.maximalRepeatsAgainst(batch, corpus,
      "doc_id", "text", minLen = 6))
    val batchIds = Set(10L, 11L, 12L)
    val global = rows(SpanDedup.maximalRepeats(
        corpus.unionByName(batch), "doc_id", "text", minLen = 6)
      .filter(col("id_a").isin(batchIds.toSeq: _*) ||
        col("id_b").isin(batchIds.toSeq: _*)))
    assert(inc === global, "the incremental-equality law")
    assert(inc.exists(t => batchIds(t._1) && batchIds(t._3)), "batch-batch lane live")
    assert(inc.exists(t => batchIds(t._1) != batchIds(t._3)), "batch-corpus lane live")
    assert(!inc.exists(t => !batchIds(t._1) && !batchIds(t._3)),
      "corpus-corpus pairs must never be generated")
  }

  test("maximalRepeats: the pair join is digest-keyed — no cartesian or nested loop") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SpanDedup.maximalRepeats(docs, "doc_id", "text", minLen = 6)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // The occurrence self-join must key on (__h1, __h2) with the
    // canonical-order predicate as a post-filter — a planner that fell
    // back to a nested loop would make the op all-pairs over the corpus.
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay an equi-join:\n$plan")
  }

  test("maximalRepeats: span text never enters a shuffle exchange") {
    val exchanges = shuffleOutputs(
      SpanDedup.maximalRepeats(docs, "doc_id", "text", minLen = 6))
    // Windows shuffle digests + ints only; the representative span is a
    // map-side slice under a broadcast of the run relation, so NO
    // exchange may carry a string column (unlike duplicatedSpansDigest,
    // whose rep pass aggregates span text — here the text re-derives
    // from the doc's own tokens in place).
    val withString = exchanges.count(_.exists(
      _._2 == org.apache.spark.sql.types.StringType))
    assert(exchanges.nonEmpty)
    assert(withString === 0,
      s"no exchange may carry span text: $exchanges")
  }

  test("duplicatedSpansDigest: span text never enters a shuffle exchange") {
    val exchanges = shuffleOutputs(
      SpanDedup.duplicatedSpansDigest(docs, "doc_id", "text", k = 8))
    // The corpus-wide counting aggregation and the representative-SITE
    // aggregation both shuffle digests + ints/longs only; the span text
    // re-derives map-side from the representative doc's own tokens under
    // a broadcast of the inventory-sized site relation (the
    // maximalRepeats attachSpans shape) — so NO exchange may carry a
    // string column. (The former shape aggregated min(span) TEXT over
    // the duplicated windows, paying one inventory-sized string-bearing
    // exchange; the site form removed it — optimization round 19.)
    val withString = exchanges.count(_.exists(
      _._2 == org.apache.spark.sql.types.StringType))
    assert(exchanges.length >= 2, s"expected count + site exchanges: $exchanges")
    assert(withString === 0,
      s"no exchange may carry span text: $exchanges")
  }
}
