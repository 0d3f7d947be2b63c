package graft

import graft.functions.{sig, SigKernels}
import graft.operators.{SpanDedup, SuffixArrayOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * The suffix-array family against an INDEPENDENT local reference: token
 * suffixes sorted by sequence order (prefix-first), brute-force
 * all-pairs LCP for per-position duplicated lengths, and local coverage
 * scrubbing — none of it sharing code with the distributed prefix
 * doubling under test. The random corpus draws from a 6-token vocab
 * (with "a"/"aa" prefix-of-token stress) at base depth 4, so doubling
 * rounds, dense-rank ties, exhausted-prefix sentinels, and multi-round
 * LCP escalation are all exercised on every run.
 */
class SuffixArraySpec extends AnyFunSuite with SparkSpec {

  private val vocab = Vector("a", "b", "c", "aa", "ab", "zz")

  /** 40 random docs (seeded), plus planted edges: an empty doc, a
    * one-token doc, two exact duplicates (equal suffixes to the end —
    * the exhausted-equal doubling branch), a pair sharing a 25-token
    * prefix (forces LCP escalation through depths 8, 16, 32 at base 4),
    * and a within-doc repeat. */
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val random = (1L to 40L).map { id =>
      val n = rnd.nextInt(31)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val shared25 = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    random ++ Seq(
      41L -> "",
      42L -> "b",
      43L -> "aa ab a c b zz a aa",
      44L -> "aa ab a c b zz a aa",
      45L -> s"$shared25 b c",
      46L -> s"$shared25 zz a",
      47L -> "a b c a b c a b c zz"
    )
  }

  private def docsDf: DataFrame = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  private def toks(t: String): Vector[String] =
    t.toLowerCase.trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toVector

  /** Token-sequence lexicographic compare, prefix-first — the order the
    * sentinel-space construction must reproduce. */
  private def cmpSeq(a: Seq[String], b: Seq[String]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = a(i).compareTo(b(i))
      if (c != 0) return c
      i += 1
    }
    a.length.compareTo(b.length)
  }

  /** All suffixes in (suffix, id, pos) order with 1-based total rank. */
  private def localSa: Vector[((Long, Int), Long)] = {
    val sufs = for {
      (id, text) <- corpus.toVector
      t = toks(text)
      p <- 1 to t.length
    } yield (id, p, t.drop(p - 1))
    sufs.sortWith { case ((ia, pa, sa), (ib, pb, sb)) =>
      val c = cmpSeq(sa, sb)
      if (c != 0) c < 0 else if (ia != ib) ia < ib else pa < pb
    }.zipWithIndex.map { case ((id, p, _), i) => ((id, p), (i + 1).toLong) }
  }

  private def lcpTok(a: Seq[String], b: Seq[String]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a(i) == b(i)) i += 1
    i
  }

  /** Brute-force per-position duplicated length: max LCP against EVERY
    * other suffix — independent of the SA-contiguity argument the
    * distributed form relies on. */
  private def localDupLen: Map[(Long, Int), Int] = {
    val sufs = for {
      (id, text) <- corpus.toVector
      t = toks(text)
      p <- 1 to t.length
    } yield (id, p, t.drop(p - 1))
    sufs.map { case (id, p, s) =>
      val best = sufs.iterator
        .filter { case (id2, p2, _) => (id2, p2) != ((id, p)) }
        .map { case (_, _, s2) => lcpTok(s, s2) }
        .foldLeft(0)(math.max)
      ((id, p), best)
    }.toMap
  }

  test("suffixArray total ranks equal the local reference order") {
    val got = SuffixArrayOps.suffixArray(docsDf, "doc_id", "text", depth = 4)
      .select("doc_id", "pos", "sa_rank")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val want = localSa.toMap
    assert(got.size === want.size)
    assert(got === want)
  }

  test("ORDER INVARIANT: suffixRanks' physical row order is (__r, __id, pos)") {
    // The sort-free total rank (suffixArray) and the sort-free
    // corpus-neighbor fill both RELY on this physical order; prose alone
    // would let a future repartition/AQE change break them silently.
    // Read rows per partition in partition-index order — exactly how the
    // stitch consumes them — and assert the concatenation is sorted.
    val ranked = SuffixArrayOps.suffixRanks(docsDf, "doc_id", "text", depth = 4)
    val rows = ranked.rdd.mapPartitionsWithIndex { (pid, it) =>
      it.map(r => (pid, r.getLong(2), r.getLong(0), r.getInt(1)))
    }.collect()
    val inOrder = rows.sortBy(_._1) // stable: preserves intra-partition order
    val keys = inOrder.map { case (_, r, id, pos) => (r, id, pos) }
    assert(keys.nonEmpty)
    assert(keys.sliding(2).forall {
      case Array(a, b) => implicitly[Ordering[(Long, Long, Int)]].lteq(a, b)
      case _ => true
    }, "suffixRanks' physical order diverged from (__r, __id, pos)")
    // and partition indices themselves must carry the global order:
    // every partition's first key >= the previous partition's last
    assert(keys.toSeq == keys.toSeq.sorted)
  }

  test("skew guard: a pathologically long doc completes, split across pos-blocks") {
    import spark.implicits._
    val key = SuffixArrayOps.DoublingBlockConf
    // One 4200-token doc (vocab-random, so real doubling rounds) next to
    // normal docs; a 512-token block forces the guard to split it ~9
    // ways per round instead of serializing one window task.
    val rnd = new scala.util.Random(13)
    val long = (1 to 4200).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (corpus :+ (99L -> long)).toDF("doc_id", "text")
    val expected = {
      // unsalted reference: block far above every doc length → the guard
      // is structurally inert (single block per doc)
      spark.conf.set(key, (1 << 20).toString)
      try SuffixArrayOps.suffixArray(docs, "doc_id", "text", depth = 4)
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
      finally spark.conf.unset(key)
    }
    spark.conf.set(key, "512")
    try {
      val got = SuffixArrayOps.suffixArray(docs, "doc_id", "text", depth = 4)
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
      assert(got === expected)
    } finally spark.conf.unset(key)
  }

  test("adjacentLcp is exact, including multi-round escalation depths") {
    val order = localSa.sortBy(_._2).map(_._1)
    val sufOf = corpus.map { case (id, t) => id -> toks(t) }.toMap
    val want = order.sliding(2).collect { case Seq((ia, pa), (ib, pb)) =>
      ((ia, pa, ib, pb),
        lcpTok(sufOf(ia).drop(pa - 1), sufOf(ib).drop(pb - 1)))
    }.toMap
    val got = SuffixArrayOps.adjacentLcp(docsDf, "doc_id", "text", depth = 4)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)), r.getInt(4)))
      .toMap
    assert(got === want)
    // The 25-token planted prefix really forces escalation: some pair
    // must exceed 4 * 2 * 2 (two escalation rounds at base depth 4).
    assert(want.values.max >= 17, s"plant too short: max lcp ${want.values.max}")
  }

  test("saDupLengths equals brute-force all-pairs duplicated lengths") {
    val minLen = 3
    val want = localDupLen.filter(_._2 >= minLen)
    val got = SuffixArrayOps.saDupLengths(docsDf, "doc_id", "text", minLen, depth = 4)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    assert(got === want)
  }

  test("coverage law: SA dup coverage equals duplicated-window coverage (occ >= 2)") {
    val L = 3
    val saCover = localDupLen.iterator
      .filter(_._2 >= L)
      .flatMap { case ((id, p), dl) => (p until p + dl).map(q => (id, q)) }
      .toSet
    // Window side from the DISTRIBUTED shingle kernel: L-token windows
    // occurring >= 2 times (same-doc repeats count), each covering its
    // L positions.
    val win = SpanDedup.spanWindows(docsDf, "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val dupSpans = win.groupBy(_._3).filter(_._2.length >= 2).keySet
    val winCover = win.iterator
      .filter(w => dupSpans(w._3))
      .flatMap { case (id, i, _) => (i until i + L).map(q => (id, q)) }
      .toSet
    assert(saCover === winCover)
  }

  test("saScrub removes exactly the covered tokens; edge docs pass through") {
    val minLen = 3
    val dup = localDupLen
    val want = corpus.map { case (id, text) =>
      val t = toks(text)
      val cover = (1 to t.length).flatMap { p =>
        val dl = dup.getOrElse((id, p), 0)
        if (dl >= minLen) p until p + dl else Seq.empty
      }.toSet
      val kept = (1 to t.length).filterNot(cover).map(p => t(p - 1))
      (id, (t.length.toLong, cover.size.toLong, kept.mkString(" ")))
    }.toMap
    val got = SuffixArrayOps.saScrub(docsDf, "doc_id", "text", minLen, depth = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got === want)
    assert(got(41L) === ((0L, 0L, "")))  // empty doc is a total-function row
  }

  test("dupLengthsAgainstAndWithin: one union SA equals brute force and the two-SA composition") {
    import spark.implicits._
    val batchRows = Seq(
      901L -> "aa ab a c b zz a aa",              // verbatim corpus doc 43
      902L -> "n1 n2 n3 n4 n5 n6 n7 n8 n9 tailx", // batch-internal 9-run, copy A
      903L -> "zz n1 n2 n3 n4 n5 n6 n7 n8 n9",    // copy B — novel to the corpus
      904L -> "novelone noveltwo novelthree",     // matches nothing anywhere
      905L -> "",                                 // empty doc
      906L -> "a b c a b c zz")                   // natural + within-doc repeat
    val batch = batchRows.toDF("doc_id", "text")
    val minLen = 3
    val got = SuffixArrayOps.dupLengthsAgainstAndWithin(docsDf, "doc_id", "text",
        batch, "doc_id", "text", minLen, depth = 4, idOffset = 100000L)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    // Brute force: per batch position, max LCP over every corpus suffix
    // AND every OTHER batch suffix — independent of any SA argument.
    val corpusSufs = corpus.toVector.flatMap { case (_, text) =>
      val t = toks(text); t.indices.map(t.drop) }
    val batchSufs = for {
      (id, text) <- batchRows.toVector; t = toks(text); p <- 1 to t.length
    } yield (id, p, t.drop(p - 1))
    val want = batchSufs.map { case (id, p, s) =>
      val vsCorpus = corpusSufs.iterator.map(lcpTok(s, _)).foldLeft(0)(math.max)
      val vsBatch = batchSufs.iterator
        .filter { case (id2, p2, _) => (id2, p2) != ((id, p)) }
        .map { case (_, _, s2) => lcpTok(s, s2) }.foldLeft(0)(math.max)
      ((id, p), math.max(vsCorpus, vsBatch))
    }.filter(_._2 >= minLen).toMap
    assert(got === want)
    // The plants really exercise both lanes: the corpus-verbatim doc
    // matches whole from pos 1; the batch-internal 9-run (novel to the
    // corpus) reaches 9 only via the query-query pair lane.
    assert(got((901L, 1)) === 8)
    assert(got((902L, 1)) === 9)
    // Scrub-level law: the one-construction coverage equals the former
    // two-SA composition (dupLengthsAgainst ∪ saDupLengths) — the
    // equality Admission's exact policy relies on.
    def scrubRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val one = scrubRows(SuffixArrayOps.scrubFromDupLengths(batch, "doc_id", "text",
      SuffixArrayOps.dupLengthsAgainstAndWithin(docsDf, "doc_id", "text",
        batch, "doc_id", "text", minLen, depth = 4, idOffset = 100000L)))
    val two = scrubRows(SuffixArrayOps.scrubFromDupLengths(batch, "doc_id", "text",
      SuffixArrayOps.dupLengthsAgainst(docsDf, "doc_id", "text",
          batch, "doc_id", "text", minLen, depth = 4, idOffset = 100000L)
        .unionByName(SuffixArrayOps.saDupLengths(batch, "doc_id", "text",
          minLen, depth = 4))))
    assert(one === two)
  }

  test("corpus-neighbor fill: the query-run buffer bound is enforced loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // One corpus row, 2000 query rows on one hot key: every partition of
    // the range sort holds a long corpus-free query run.
    val rows = (Seq((0L, 1, "a ", 0)) ++
      (1 to 2000).map(i => (100000L + i, 1, "q ", 1)))
      .toDF("__id", "pos", "__key", "__isq")
    val sortCols = Seq(col("__key"), col("__id"), col("pos"))
    // Under the cap the fill serves: every query row pairs with the one
    // corpus predecessor (via the boundary sidecar), none with a successor.
    assert(SuffixArrayOps.corpusNeighborPairs(rows, sortCols,
      maxQueryRun = 5000).count() === 2000L)
    // Over the cap it refuses loudly instead of buffering without bound.
    val e = intercept[Exception](
      SuffixArrayOps.corpusNeighborPairs(rows, sortCols,
        maxQueryRun = 10).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("corpus scale")), s"unexpected: $e")
    // The session-conf route — the refusal's documented exit, reachable
    // without any API parameter (public callers pass no cap).
    spark.conf.set(SuffixArrayOps.MaxQueryRunConf, "10")
    try {
      val e2 = intercept[Exception](
        SuffixArrayOps.corpusNeighborPairs(rows, sortCols).count())
      assert(msgs(e2).exists(_.contains(SuffixArrayOps.MaxQueryRunConf)),
        s"the refusal must name its conf exit: $e2")
      spark.conf.set(SuffixArrayOps.MaxQueryRunConf, "5000")
      assert(SuffixArrayOps.corpusNeighborPairs(rows, sortCols).count() === 2000L)
      // A malformed or non-positive conf value refuses NAMING the key,
      // not as a context-free NumberFormatException.
      for (bad <- Seq("banana", "-3", "0")) {
        spark.conf.set(SuffixArrayOps.MaxQueryRunConf, bad)
        val e3 = intercept[Exception](
          SuffixArrayOps.corpusNeighborPairs(rows, sortCols).count())
        assert(msgs(e3).exists(m => m.contains(SuffixArrayOps.MaxQueryRunConf)
          && m.contains(bad)), s"bad-conf refusal must name key+value: $e3")
      }
    } finally spark.conf.unset(SuffixArrayOps.MaxQueryRunConf)
  }

  test("CommonPrefixLen counts code points, through codegen and for surrogates") {
    // Kernel directly: surrogate-pair code points count as ONE.
    def k(a: String, b: String): Int =
      SigKernels.commonPrefixLen(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(k("𝕏ab", "𝕏ac") === 2)   // the shared "𝕏a": 2 code points, 3 UTF-16 units
    assert(k("𝕏", "𝕏x") === 1)
    assert(k("", "x") === 0)
    assert(k("same", "same") === 4)
    // Through the codegen expression on a DataFrame, null-intolerant.
    import spark.implicits._
    val rows = Seq(("abc x", "abc y"), ("q", "q"), (null, "x"))
      .toDF("a", "b")
      .select(sig.commonPrefixLen(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(rows.toSeq === Seq(Some(4), Some(1), None))
  }
}
