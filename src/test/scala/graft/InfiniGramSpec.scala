package graft

import graft.operators.InfiniGram
import org.scalatest.funsuite.AnyFunSuite

/**
 * The bounded ∞-gram probe against an independent local reference
 * (brute-force: every corpus n-gram of every width counted in a map,
 * longest query-suffix lookup, continuation argmax) on a randomized
 * small-vocab corpus, plus planted edges: a query that is a verbatim
 * corpus segment (saturates at maxN), a novel-final-token query (no
 * match at any width), a match whose every occurrence ends a document
 * (count > 0, empty top token), and a continuation tie broken to the
 * lexicographically smaller token.
 */
class InfiniGramSpec extends AnyFunSuite with SparkSpec {

  private val vocab = Vector("a", "b", "c", "d", "zz")

  private def corpusDocs: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(11)
    val random = (1L to 30L).map { id =>
      id -> Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    random ++ Seq(
      31L -> "p1 p2 p3 p4 p5 p6 p7 p8 p9 cont1",   // planted segment + continuation
      32L -> "x p1 p2 p3 p4 p5 p6 p7 p8 p9 cont2", // same segment, other continuation
      33L -> "enddoc1 enddoc2",                     // match that ends the document
      34L -> "t1 t2 ta",                            // tie pair: 'ta' vs 'tb' after t1 t2
      35L -> "t1 t2 tb",
      36L -> "u t1 t2 tb"
    )
  }

  private def queryDocs: Seq[(Long, String)] = Seq(
    (101L, "p1 p2 p3 p4 p5 p6 p7 p8 p9"),  // saturates at maxN
    (102L, "a b qnovel"),                   // novel final token: no match
    (103L, "x enddoc1 enddoc2"),            // all matches end docs
    (104L, "zz t1 t2"),                     // tie: tb (2) beats ta (1)? no — tb 2 vs ta 1
    (105L, ""),                             // empty query
    (106L, "a b c")                         // plain random-ish probe
  )

  private def local(maxN: Int): Map[Long, (Int, Long, String, Long)] = {
    def toks(t: String): Vector[String] =
      t.toLowerCase.trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toVector
    val grams = scala.collection.mutable.Map
      .empty[(Int, Seq[String]), (Long, Map[String, Long])]
    for ((_, text) <- corpusDocs; t = toks(text); i <- t.indices;
         w <- 1 to math.min(maxN, t.length - i)) {
      val key = (w, t.slice(i, i + w))
      val (n, conts) = grams.getOrElse(key, (0L, Map.empty[String, Long]))
      val c2 = if (i + w < t.length) {
        val nx = t(i + w)
        conts.updated(nx, conts.getOrElse(nx, 0L) + 1)
      } else conts
      grams(key) = (n + 1, c2)
    }
    queryDocs.map { case (qid, text) =>
      val t = toks(text)
      val hit = (math.min(maxN, t.length) to 1 by -1).iterator
        .map(w => w -> grams.get((w, t.takeRight(w))))
        .collectFirst { case (w, Some(v)) => (w, v) }
      qid -> (hit match {
        case None => (0, 0L, "", 0L)
        case Some((w, (n, conts))) =>
          if (conts.isEmpty) (w, n, "", 0L)
          else {
            val (tok, cnt) = conts.toSeq.minBy { case (tk, c) => (-c, tk) }
            (w, n, tok, cnt)
          }
      })
    }.toMap
  }

  test("probe equals the brute-force reference; all edge branches live") {
    import spark.implicits._
    val corpus = corpusDocs.toDF("doc_id", "text")
    val queries = queryDocs.toDF("doc_id", "text")
    val got = InfiniGram.probe(corpus, "doc_id", "text",
      queries, "doc_id", "text", maxN = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getString(3), r.getLong(4))))
      .toMap
    val want = local(8)
    assert(got === want)
    // The plants really exercise their branches:
    assert(want(101L)._1 === 8)                    // saturated at maxN
    // continuation of the matched 8-suffix "p2..p9": cont1/cont2 tie 1-1,
    // lexicographic rule picks cont1
    assert(want(101L)._3 === "cont1" && want(101L)._4 === 1L)
    assert(want(102L) === ((0, 0L, "", 0L)))       // novel token: nothing
    assert(want(103L)._1 >= 2 && want(103L)._3 === "")  // end-of-doc only
    assert(want(105L) === ((0, 0L, "", 0L)))       // empty query
    // Tie-break: after "t1 t2" the corpus continues ta(1) and tb(2) —
    // count wins; shrink the corpus in-head to force an exact tie and
    // check the lexicographic rule via the reference itself.
    assert(want(104L)._1 === 2 && want(104L)._3 === "tb" && want(104L)._4 === 2L)
  }

  test("longestCorpusMatch equals the brute-force unbounded reference; beats the bounded cap") {
    import spark.implicits._
    def toks(t: String): Vector[String] =
      t.toLowerCase.trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toVector
    // Brute force: every corpus substring of every length, then the
    // longest contained query suffix — independent of the SA.
    val substrings = (for {
      (_, text) <- corpusDocs
      t = toks(text)
      i <- t.indices
      w <- 1 to (t.length - i)
    } yield t.slice(i, i + w)).toSet
    val want = queryDocs.map { case (qid, text) =>
      val t = toks(text)
      val best = (t.length to 1 by -1).find(w => substrings(t.takeRight(w))).getOrElse(0)
      qid -> best
    }.toMap
    val corpus = corpusDocs.toDF("doc_id", "text")
    val queries = queryDocs.toDF("doc_id", "text")
    // depth 4 forces doubling rounds and LCP escalation on the long
    // planted segment; idOffset small to exercise the disjointness path.
    val got = graft.operators.SuffixArrayOps.longestCorpusMatch(
        corpus, "doc_id", "text", queries, "doc_id", "text",
        depth = 4, idOffset = 100000L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === want)
    // The 9-token planted segment: unbounded reports 9 where the
    // bounded probe (maxN = 8 in the first test) saturates at 8.
    assert(want(101L) === 9)
    assert(want(102L) === 0, "novel final token: no suffix matches")
    assert(want(105L) === 0, "empty query")
    // Disjointness contract is loud.
    val e = intercept[IllegalArgumentException](
      graft.operators.SuffixArrayOps.longestCorpusMatch(corpus, "doc_id", "text",
        queries, "doc_id", "text", idOffset = 10L))
    assert(e.getMessage.contains("idOffset"))
    // Non-numeric ids are refused loudly — a silent cast-to-NULL would
    // collapse the disjointness bounds to their defaults and key the
    // union on all-null ids (wrong lengths, no error).
    val strCorpus = corpusDocs.map { case (id, t) => (s"doc-$id", t) }
      .toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException](
      graft.operators.SuffixArrayOps.longestCorpusMatch(strCorpus, "doc_id", "text",
        queries, "doc_id", "text"))
    assert(e2.getMessage.contains("numeric-castable"))
  }

  test("shuffle-probe escape hatch answers identically to the broadcast default") {
    import spark.implicits._
    val corpus = corpusDocs.toDF("doc_id", "text")
    val queries = queryDocs.toDF("doc_id", "text")
    def rows(b: Boolean) = InfiniGram.probe(corpus, "doc_id", "text",
        queries, "doc_id", "text", maxN = 8, broadcastProbes = b)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSet
    assert(rows(false) === rows(true))
  }

  test("exact continuation-count tie breaks to the smaller token") {
    import spark.implicits._
    val corpus = Seq((1L, "t1 t2 ta"), (2L, "t1 t2 tb")).toDF("doc_id", "text")
    val queries = Seq((9L, "t1 t2")).toDF("doc_id", "text")
    val row = InfiniGram.probe(corpus, "doc_id", "text",
      queries, "doc_id", "text", maxN = 4).collect().head
    assert((row.getInt(1), row.getLong(2), row.getString(3), row.getLong(4)) ===
      ((2, 2L, "ta", 1L)))
  }
}
