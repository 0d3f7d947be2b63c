package graft

import graft.operators.{SaStore, SuffixArrayOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The suffix-array store's law: probing the store of a document set C
 * answers IDENTICALLY to the in-memory
 * [[SuffixArrayOps.longestCorpusMatch]](C, queries) — across appends,
 * removals, compactions, snapshots and restores — with the window scan
 * partition-pruned to the probed (level, bucket) dirs and every
 * lifecycle refusal loud.
 */
class SaStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Small-vocab randomized docs (deep window sharing) + plants that pin
  // the probe's branches: a 9-token phrase shared corpus↔query (a
  // NON-power match length between 8 and 16), a full-doc copy (match =
  // whole doc), and an exact-power 4-token plant.
  private def mkText(id: Long): String = {
    val rnd = new scala.util.Random(id * 17 + 3)
    val vocab = Vector("a", "b", "c", "d", "zz")
    val base = Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
    val plant =
      if (id % 7 == 2) (1 to 9).map(j => s"p$j")
      else if (id % 7 == 5) Seq("q1", "q2", "q3", "q4")
      else Nil
    (base ++ plant).mkString(" ")
  }

  private lazy val docs =
    (0L until 40L).map(id => (id, mkText(id))).toDF("doc_id", "text")
      .localCheckpoint(true)
  private lazy val fullDocText = mkText(9L)
  private lazy val queries = Seq(
    (901L, "zz " + (1 to 9).map(j => s"p$j").mkString(" ")), // 9-token plant
    (902L, fullDocText),                                     // whole corpus doc
    (903L, "b a q1 q2 q3 q4"),                               // power-of-two tail?
    (904L, "never gonna match qnovel"),                      // novel final token
    (905L, ""),                                              // empty query
    (906L, "c d a b")                                        // natural small match
  ).toDF("doc_id", "text").localCheckpoint(true)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sastore").toString + "/store"

  private def rows(df: DataFrame): Set[(Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private def want(c: DataFrame): Set[(Long, Int)] =
    rows(SuffixArrayOps.longestCorpusMatch(c, "doc_id", "text",
      queries, "doc_id", "text", depth = 4))

  private def probe(dir: String, tag: Option[String] = None): Set[(Long, Int)] =
    rows(SaStore.probe(spark, dir, queries, "doc_id", "text", tag))

  test("LAW: stored probe == in-memory longestCorpusMatch; plants live; scan is (level,bucket)-pruned") {
    val dir = tmp()
    SaStore.init(spark, dir, docs, "doc_id", "text", numBuckets = 16)
    val g = probe(dir)
    assert(g === want(docs))
    val byQ = g.toMap
    assert(byQ(901L) === 9, "the 9-token plant (a non-power length) matches whole")
    assert(byQ(902L) === fullDocText.split(" ").length,
      "a verbatim corpus doc matches at its full length")
    assert(byQ(904L) === 0, "a novel final token matches nothing")
    assert(byQ(905L) === 0, "empty query is a zero row")
    assert(byQ(906L) >= 1, "small-vocab windows give a natural short match")
    // The scale pin: the probed window scan carries __a/__b partition
    // filters — a probe opens only the probed levels' buckets' files.
    val plan = SaStore.readWindows(spark, dir,
        levelBuckets = Some(Map(0 -> Seq(1, 3), 2 -> Seq(5))))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*__a".r.findFirstIn(plan).isDefined &&
      "PartitionFilters: \\[[^\\]]*__b".r.findFirstIn(plan).isDefined,
      s"expected __a and __b partition filters on the window scan:\n$plan")
    // The shuffle escape hatch answers identically.
    assert(rows(SaStore.probe(spark, dir, queries, "doc_id", "text",
      broadcastProbes = false)) === g)
  }

  test("per-position LAW: probeDupLengths == in-memory dupLengthsAgainst == brute force; scrub == saScrubAgainst") {
    val dir = tmp()
    SaStore.init(spark, dir, docs, "doc_id", "text", numBuckets = 16)
    val batch = queries // reuse the fixture's plant-bearing probe docs
    def dlRows(df: DataFrame): Set[(Long, Int, Int)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val got = dlRows(SaStore.probeDupLengths(spark, dir, batch,
      "doc_id", "text", minLen = 4))
    val inMem = dlRows(SuffixArrayOps.dupLengthsAgainst(docs, "doc_id", "text",
      batch, "doc_id", "text", minLen = 4, depth = 4))
    assert(got === inMem, "store probe must equal the in-memory form")
    // Independent brute force: corpus substring set, longest prefix of
    // each batch-position suffix present in it.
    def toks(t: String): Vector[String] =
      t.toLowerCase.trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toVector
    val substrings = (for {
      (id, text) <- (0L until 40L).map(i => (i, mkText(i)))
      t = toks(text); i <- t.indices; w <- 1 to (t.length - i)
    } yield t.slice(i, i + w)).toSet
    val brute = (for {
      (qid, text) <- Seq(901L -> ("zz " + (1 to 9).map(j => s"p$j").mkString(" ")),
        902L -> fullDocText, 903L -> "b a q1 q2 q3 q4",
        904L -> "never gonna match qnovel", 905L -> "", 906L -> "c d a b")
      t = toks(text); p <- t.indices
      dl = (t.length - p to 1 by -1)
        .find(l => substrings(t.slice(p, p + l))).getOrElse(0)
      if dl >= 4
    } yield (qid, p + 1, dl)).toSet
    assert(got === brute, "store probe must equal the brute-force reference")
    assert(got.exists { case (q, _, dl) => q == 901L && dl == 9 },
      "the 9-token plant must report from its first position")
    // The scrub laws: store scrub == in-memory scrubAgainst, and the
    // plant-covered tokens actually leave.
    def scrubRows(df: DataFrame): Set[(Long, Long, Long, String)] =
      df.select(col("doc_id"), col("n_tokens"), col("n_removed"), col("clean_text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
    val gotScrub = scrubRows(SaStore.scrub(spark, dir, batch,
      "doc_id", "text", minLen = 4))
    val inMemScrub = scrubRows(SuffixArrayOps.saScrubAgainst(docs, "doc_id", "text",
      batch, "doc_id", "text", minLen = 4, depth = 4))
    assert(gotScrub === inMemScrub, "store scrub must equal the in-memory form")
    val byId = gotScrub.map(r => r._1 -> r).toMap
    assert(!byId(901L)._4.contains("p1") && byId(901L)._3 >= 9,
      s"the planted span must scrub: ${byId(901L)}")
    assert(byId(902L)._3 === byId(902L)._2,
      "a verbatim corpus doc scrubs entirely")
    assert(byId(904L)._4.contains("qnovel"),
      "novel text survives untouched")
  }

  test("probeWithCounts: n_occ equals the brute-force occurrence count of the longest match") {
    val dir = tmp()
    SaStore.init(spark, dir, docs, "doc_id", "text", numBuckets = 16)
    def toks(t: String): Vector[String] =
      t.toLowerCase.trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toVector
    val corpusToks = (0L until 40L).map(i => toks(mkText(i)))
    def countOcc(span: Vector[String]): Long =
      corpusToks.map(t => (0 to t.length - span.length)
        .count(i => t.slice(i, i + span.length) == span).toLong).sum
    val want = Seq(901L -> ("zz " + (1 to 9).map(j => s"p$j").mkString(" ")),
      902L -> fullDocText, 903L -> "b a q1 q2 q3 q4",
      904L -> "never gonna match qnovel", 905L -> "", 906L -> "c d a b")
      .map { case (qid, text) =>
        val t = toks(text)
        val ml = (t.length to 1 by -1)
          .find(l => countOcc(t.takeRight(l)) > 0).getOrElse(0)
        (qid, ml, if (ml == 0) 0L else countOcc(t.takeRight(ml)))
      }.toSet
    val got = SaStore.probeWithCounts(spark, dir, queries, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
    val byQ = got.map(r => r._1 -> r).toMap
    assert(byQ(901L)._3 >= 1L && byQ(904L) === ((904L, 0, 0L)))
    // The 4-token plant (q1..q4) appears in every id % 7 == 5 doc —
    // a genuinely multi-occurrence count.
    assert(byQ(903L)._3 >= 2L, s"plant occurs in several docs: ${byQ(903L)}")
    // Attribution: the reported sites really carry the matched span,
    // the per-query cap holds, and site count == n_occ under the cap.
    val sites = SaStore.attributeMatches(spark, dir, queries,
        "doc_id", "text", maxSites = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(sites.groupBy(_._1).values.forall(_.length <= 3), "cap holds")
    val q901 = queries.collect().find(_.getLong(0) == 901L).get.getString(1)
    val span901 = toks(q901).takeRight(byQ(901L)._2)
    sites.filter(_._1 == 901L).foreach { case (_, ml, did, pos) =>
      assert(ml === byQ(901L)._2)
      assert(corpusToks(did.toInt).slice(pos - 1, pos - 1 + ml) === span901,
        s"site ($did, $pos) must really carry the matched span")
    }
    assert(sites.count(_._1 == 903L) ===
      math.min(3L, byQ(903L)._3), "sites == min(cap, n_occ)")
    assert(!sites.exists(_._1 == 904L), "no-match queries emit no sites")
  }

  test("append folds O(batch): probe == in-memory over the union; named replay idempotent") {
    val dir = tmp()
    val c1 = docs.filter(col("doc_id") < 25)
    val c2 = docs.filter(col("doc_id") >= 25)
    // maxLen floor: the budget must admit the second half's docs too.
    SaStore.init(spark, dir, c1, "doc_id", "text", maxLen = 64, numBuckets = 16)
    SaStore.append(spark, dir, c2, "doc_id", "text", name = Some("part_b1"))
    assert(probe(dir) === want(docs))
    // Replaying the same named mutation is a no-op.
    SaStore.append(spark, dir, c2, "doc_id", "text", name = Some("part_b1"))
    assert(probe(dir) === want(docs))
  }

  test("remove tombstones; re-append refused until compact; compact restores it") {
    val dir = tmp()
    SaStore.init(spark, dir, docs, "doc_id", "text", numBuckets = 16)
    // Remove every plant carrier: the 9-token and full-doc matches die.
    val victims = docs.filter(col("doc_id") % 7 === 2)
    SaStore.remove(spark, dir, victims.select("doc_id"), "doc_id")
    val shrunk = docs.filter(col("doc_id") % 7 =!= 2)
    val afterRemove = probe(dir)
    assert(afterRemove === want(shrunk),
      "tombstoned docs must stop matching")
    assert(afterRemove.toMap.apply(901L) < 9,
      "the plant match must shrink once its carriers are tombstoned")
    val e = intercept[IllegalArgumentException](
      SaStore.append(spark, dir, victims, "doc_id", "text"))
    assert(e.getMessage.contains("tombstones"))
    SaStore.compact(spark, dir)
    assert(graft.sources.DeltaParts.list(dir).size === 1)
    assert(probe(dir) === want(shrunk), "compaction is a pure layout change")
    SaStore.append(spark, dir, victims, "doc_id", "text")
    assert(probe(dir) === want(docs))
  }

  test("length budget: overlong append refuses loudly; the rebuild path is the documented exit") {
    val dir = tmp()
    SaStore.init(spark, dir, docs, "doc_id", "text", numBuckets = 16)
    val budget = SaStore.maxLen(dir)
    val overlong = Seq((5001L, (1 to (budget + 1)).map(j => s"lw$j").mkString(" ")))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      SaStore.append(spark, dir, overlong, "doc_id", "text"))
    assert(e.getMessage.contains("maxLen") && e.getMessage.contains("rebuild"))
    // The documented exit: a FRESH dir init at a larger budget takes the
    // same corpus + the long doc, and long matches certify there.
    val dir2 = tmp()
    SaStore.init(spark, dir2, docs.unionByName(overlong), "doc_id", "text",
      numBuckets = 16)
    assert(SaStore.maxLen(dir2) >= budget + 1)
    val longQ = Seq((801L, (1 to (budget + 1)).map(j => s"lw$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = SaStore.probe(spark, dir2, longQ, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === Set((801L, budget + 1)),
      "the rebuilt store certifies matches past the old budget")
  }

  test("minLen beyond the length budget is the exact empty answer, not a phantom certificate") {
    val dir = tmp()
    // A repetitive corpus: budget 16 (topA = 3, window widths up to 8).
    // The batch doc repeats one token far past the budget, so for any
    // L > 2^(topA+1) both CLAMPED half-windows occur in the store —
    // without the guard the round-0 screen's windows leave an uncovered
    // gap and it certifies dup_len = minLen spans that occur NOWHERE
    // (no stored doc even reaches minLen tokens).
    val corpus = Seq((1L, Seq.fill(16)("r").mkString(" "))).toDF("doc_id", "text")
    SaStore.init(spark, dir, corpus, "doc_id", "text", numBuckets = 4)
    assert(SaStore.maxLen(dir) === 16)
    val batch = Seq((901L, Seq.fill(40)("r").mkString(" "))).toDF("doc_id", "text")
    val got = SaStore.probeDupLengths(spark, dir, batch, "doc_id", "text",
      minLen = 17)
    assert(got.isEmpty,
      "no stored doc exceeds the budget — the exact answer is empty")
    // The scrub law holds at the degenerate point too: nothing leaves.
    val s = SaStore.scrub(spark, dir, batch, "doc_id", "text", minLen = 17)
      .collect().head
    assert(s.getAs[Long]("n_removed") === 0L && s.getAs[Long]("n_tokens") === 40L)
    // At the budget itself the same store still reports real duplication
    // (off == w: the two half-windows tile the span exactly).
    assert(SaStore.probeDupLengths(spark, dir, batch, "doc_id", "text",
      minLen = 16).count() > 0)
  }

  test("non-numeric ids refused loudly at init, append, and remove") {
    val dir = tmp()
    val strDocs = Seq(("doc-1", "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      SaStore.init(spark, dir, strDocs, "doc_id", "text"))
    assert(e.getMessage.contains("numeric-castable"))
  }

  test("snapshot pins state across mutations; tagged probes time-travel; restore rolls back") {
    val dir = tmp()
    val c1 = docs.filter(col("doc_id") < 25)
    SaStore.init(spark, dir, c1, "doc_id", "text", maxLen = 64, numBuckets = 16)
    SaStore.snapshot(dir, "v1")
    val atV1 = want(c1)
    SaStore.append(spark, dir, docs.filter(col("doc_id") >= 25), "doc_id", "text")
    assert(probe(dir) === want(docs), "append visible live")
    assert(probe(dir, Some("v1")) === atV1,
      "a tagged probe must replay the pinned state")
    SaStore.restore(dir, "v1")
    assert(probe(dir) === atV1, "restore rolls the live state back")
  }

  test("Release kind 'sa': freeze pins the store, restore rolls it back with the release") {
    val dir = tmp()
    val mdir = java.nio.file.Files.createTempDirectory("sa-rel").toString
    val c1 = docs.filter(col("doc_id") < 25)
    SaStore.init(spark, dir, c1, "doc_id", "text", maxLen = 64, numBuckets = 16)
    graft.pipelines.Release.freeze(spark, mdir, "v1",
      Seq(graft.pipelines.Release.Member("sa", dir)))
    val atV1 = want(c1)
    SaStore.append(spark, dir, docs.filter(col("doc_id") >= 25), "doc_id", "text")
    val verify = graft.pipelines.Release.verify(spark, mdir, "v1")
    assert(verify.filter(!col("ok")).isEmpty, "the release must stay fully pinned")
    graft.pipelines.Release.restore(spark, mdir, "v1")
    assert(probe(dir) === atV1)
  }

  test("fsck: healthy store audits clean; a vanished meta is flagged") {
    val dir = tmp()
    SaStore.init(spark, dir, docs, "doc_id", "text", numBuckets = 16)
    def bad(df: DataFrame): Set[String] = df.filter(!col("ok"))
      .select("check").collect().map(_.getString(0)).toSet
    assert(bad(SaStore.fsck(spark, dir)).isEmpty)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_meta"))
    assert(bad(SaStore.fsck(spark, dir)) === Set("meta_resolves"))
  }

  test("init refuses a previously-used dir; a held lease refuses a concurrent append") {
    val dir = tmp()
    SaStore.init(spark, dir, docs, "doc_id", "text", numBuckets = 16)
    val e = intercept[IllegalStateException](
      SaStore.init(spark, dir, docs, "doc_id", "text"))
    assert(e.getMessage.contains("already initialized"))
    graft.sources.WriterLease.withLease(dir, "spec-holder") {
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() =>
        try { SaStore.append(spark, dir,
          Seq((1001L, "fresh words one two three")).toDF("doc_id", "text"),
          "doc_id", "text") }
        catch { case x: Throwable => err.set(x) })
      t.start(); t.join(60000)
      assert(err.get() != null && err.get()
        .isInstanceOf[graft.sources.WriterLease.ConcurrentWriterException],
        s"expected a loud concurrent-writer refusal, got ${err.get()}")
    }
  }
}
