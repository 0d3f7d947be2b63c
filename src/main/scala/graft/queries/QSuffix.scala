package graft

import graft.operators.SuffixArrayOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QShared._
import OracleDefs._

/** The suffix-array family ([[graft.operators.SuffixArrayOps]]): the
  * exact, cap-free ExactSubstr path — full suffix array by prefix
  * doubling, exact adjacent-suffix LCP, per-position duplicated
  * lengths, and the SA-based scrub. One `queries` entry per operator
  * with its DuckDB oracle side by side; aggregated into the driver
  * contract by [[SparkEntry]] / [[OracleSql]].
  *
  * Oracle hazard pinned here: DuckDB 1.0's `list_position` returns 0
  * (not NULL) when the needle is absent, so the LCP fold's "no
  * mismatch in range" branch — exactly the prefix-exhausted pairs the
  * corpus's near-duplicate docs produce — must go through
  * `nullif(_, 0)` before the coalesce to min-remaining, or every such
  * pair reads lcp = −1 and the duplicated-length report silently
  * empties.
  */
private[graft] object QSuffix {

  /** Shared oracle CTE chain: tokens, suffix rows (with remaining
    * length and the full suffix string for ordering), SA order via
    * row_number, adjacent pairs with EXACT token LCP — not the engine's
    * doubling/escalation, an independent construction: first differing
    * token index over the two docs' token lists (O(1) list indexing,
    * bounded by the shorter remaining suffix). */
  private val saCtes =
    s"""WITH pd AS (SELECT doc_id, CASE WHEN doc_id % 23 = 3
       |        THEN text || ' xsepa' || CAST(doc_id AS VARCHAR) ||
       |          ' sag1 sag2 sag3 sag4 sag5 sag6 sag7 sag8 xsepb' ||
       |          CAST(doc_id AS VARCHAR) ||
       |          ' sag1 sag2 sag3 sag4 sag5 sag6 sag7 sag8'
       |        ELSE text END AS text FROM documents),
       |toks AS (SELECT doc_id, $words AS t FROM pd),
       |s AS (SELECT doc_id, CAST(i AS INTEGER) AS pos, t,
       |        len(t) - i + 1 AS rem,
       |        array_to_string(t[i:len(t)], ' ') AS suf
       |      FROM (SELECT doc_id, t,
       |              unnest(generate_series(1, len(t))) AS i FROM toks)),
       |o AS (SELECT doc_id, pos, t, rem,
       |        lead(doc_id) OVER w AS nid, lead(pos) OVER w AS npos,
       |        lead(t) OVER w AS nt, lead(rem) OVER w AS nrem
       |      FROM s WINDOW w AS (ORDER BY suf, doc_id, pos)),
       |pr AS (SELECT doc_id, pos, nid, npos,
       |         coalesce(nullif(list_position(list_transform(
       |             generate_series(1, least(rem, nrem)),
       |             j -> t[pos + j - 1] = nt[npos + j - 1]), false), 0) - 1,
       |           least(rem, nrem)) AS lcp
       |       FROM o WHERE nid IS NOT NULL),
       |d AS (SELECT doc_id, pos, max(lcp) AS dl FROM (
       |        SELECT doc_id, pos, lcp FROM pr
       |        UNION ALL SELECT nid AS doc_id, npos AS pos, lcp FROM pr)
       |      GROUP BY doc_id, pos)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The suffix array itself: 1-based total rank in (suffix, id, pos)
    // order — a hash match proves the whole doubling construction
    // (base-key sentinels, rank sentinels, dense-rank rounds, final
    // tie-break) against DuckDB's direct sort of the materialized
    // suffix strings.
    "x_suffix_array" -> ((s, d) =>
      SuffixArrayOps.suffixArray(T(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("pos"), col("sa_rank"))
        .orderBy("doc_id", "pos")),
    // Per-position exact duplicated length (>= 8 tokens): the cap-free
    // ExactSubstr report — x_substr_maximal's occurrence cap (maxOcc)
    // does not exist here; a span repeated 500x is linear work, not a
    // dropped digest. Planted input (saPlanted): natural coverage at
    // sf0.01 merges to ONE interval per doc, so the within-doc-repeat
    // convention and the multi-interval gap branch needed a plant.
    "x_sa_dup_len" -> ((s, d) =>
      SuffixArrayOps.saDupLengths(saPlanted(s, d), "doc_id", "text", minLen = 8)
        .orderBy("doc_id", "pos")),
    // SA-based ExactSubstr scrub: variable-length coverage at
    // occurrence >= 2 (same-doc repeats count), merged intervals,
    // total over the corpus (empty/short docs pass through with zeros).
    "x_sa_scrub" -> ((s, d) =>
      SuffixArrayOps.saScrub(saPlanted(s, d), "doc_id", "text", minLen = 8)
        .orderBy("doc_id")),
    // Bounded infini-gram probe: held-out docs (doc_id % 17 == 0) play
    // the queries, the rest the corpus. Plants keep every branch live
    // at natural sf0.01 data (match lengths otherwise top out at 3):
    // EVEN query ids get a novel final token (no match at ANY width —
    // a query suffix always contains the query's end); odd % 3 == 0
    // query ids and % 11 == 5 corpus docs share a 10-token phrase, the
    // corpus copies carrying one continuation token — the full-width
    // saturation branch (match_len == maxN) with a real top_next;
    // remaining odd ids probe their natural text (match_len 2-3 with
    // one natural end-of-doc-only match).
    "x_infinigram" -> ((s, d) => {
      val (corpus, queries) = igFixture(s, d)
      graft.operators.InfiniGram.probe(corpus, "doc_id", "text",
        queries, "doc_id", "text", maxN = 8)
        .orderBy("q_id")
    }),
    "x_infinigram_stored" -> fused(infinigramStoredPhased),
    // UNBOUNDED longest match via the suffix array — the same fixture
    // as x_infinigram, demonstrating the bound in the outputs
    // themselves: the planted queries report 11 at sf0.01 (the
    // 10-token plant, plus the query's pre-plant final token
    // coinciding with a plant-carrying corpus doc's) where the
    // bounded probe saturates at maxN = 8.
    "x_sa_longest_match" -> ((s, d) => {
      val (corpus, queries) = igFixture(s, d)
      SuffixArrayOps.longestCorpusMatch(corpus, "doc_id", "text",
        queries, "doc_id", "text")
        .orderBy("q_id")
    }),
    "x_sa_longest_match_stored" -> fused(saLongestStoredPhased),
    // The cap-free ExactSubstr ADMISSION forms, served from the
    // standing SaStore: per-position duplicated lengths of the batch
    // against the stored corpus, and the scrub built on them — the
    // production shape of Lee et al.'s dedup-new-data-against-corpus,
    // with the corpus side reduced to (level, bucket)-pruned store
    // probes (three fixed rounds, O(batch)).
    "x_sa_dup_len_stored" -> fused(saDupLenStoredPhased),
    "x_sa_scrub_stored" -> fused(saScrubStoredPhased),
    // The counted unbounded probe: match_len + the corpus occurrence
    // count of the matched span (InfiniGram.probe's n_occ at unbounded
    // width) — one extra result-sized certificate-count round.
    "x_sa_match_counts" -> fused(saMatchCountsPhased),
    // ATTRIBUTION: the corpus SITES (doc, position) of each query's
    // longest match, capped per query — "where did this memorized
    // text come from?", the report the ∞-gram family exists for.
    "x_sa_attribution" -> fused(saAttributionPhased),
    // TAKEDOWN gate (the x_bm25_delete / x_ann_delete precedent for
    // this store): remove two doc-id slices around a compact — wave A
    // folds physically into the compacted generation, wave B stays a
    // live tombstone part hidden by the read-side anti-join — then
    // probe; the oracle replays the SURVIVOR corpus only, so a removed
    // doc serving any match is a hash mismatch.
    "x_sa_remove" -> fused(saRemovePhased),
    // The takedown gate extended to the ADMISSION probes (r18 verdict
    // task 5): the funnel's exact policy consumes probeDupLengths and
    // attributeMatches — post-takedown each is replayed against the
    // survivor corpus (dup lengths by the union-suffix-sort max-LCP
    // construction, sites by direct window equality), so a tombstoned
    // doc contributing a length or a named site is a hash mismatch.
    "x_sa_remove_duplen" -> fused(saRemoveDupLenPhased),
    "x_sa_remove_attr" -> fused(saRemoveAttrPhased))

  /** x_sa_dup_len / x_sa_scrub planted fixture: docs with id % 23 == 3
    * repeat an 8-token phrase TWICE with a doc-unique separator between
    * the copies — a WITHIN-doc repeat (the same-doc neighbor convention
    * the natural cross-doc near-dups never exercise) whose two coverage
    * intervals are separated by the uncovered separator token, making
    * the per-doc interval-merge gap branch (>= 2 disjoint islands)
    * live under the DuckDB replay. The separators are doc-unique so
    * boundary windows cannot weld unrelated docs. */
  private def saPlanted(s: SparkSession, d: String): DataFrame = {
    val sag = (1 to 8).map(i => s"sag$i").mkString(" ")
    T(s, d, "documents").select(col("doc_id"),
      when(col("doc_id") % 23 === 3,
        concat(col("text"),
          lit(" xsepa"), col("doc_id").cast("string"),
          lit(s" $sag"),
          lit(" xsepb"), col("doc_id").cast("string"),
          lit(s" $sag")))
        .otherwise(col("text")).as("text"))
  }

  /** The x_infinigram corpus/queries split with its liveness plants —
    * ONE definition shared by the in-memory and stored probes (they
    * answer the same oracle; drift here would silently decouple the
    * NgramStore LAW from its sf-scale replay). */
  private def igFixture(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = T(s, d, "documents")
    val ig = (1 to 10).map(i => s"ig$i").mkString(" ")
    val corpus = docs.where(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 5, concat(col("text"), lit(s" $ig igend")))
          .otherwise(col("text")).as("text"))
    val queries = docs.where(col("doc_id") % 17 === 0)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" qnovel"), col("doc_id").cast("string")))
          .when(col("doc_id") % 3 === 0, concat(col("text"), lit(s" $ig")))
          .otherwise(col("text")).as("text"))
    (corpus, queries)
  }

  /** Stored-probe phased form (QShared.Phased): init builds the
    * standing NgramStore over the corpus slice — the one-time cost
    * amortized across every probe that follows; serve is the
    * queries-sized bucket-pruned probe. SAME oracle as x_infinigram
    * (the store is a pure execution strategy — the NgramStoreSpec LAW,
    * replayed here against DuckDB at sf scale). */
  private val infinigramStoredPhased: Phased = (s, d) => {
    lazy val dir = tmpStore("ngram_store")
    val init = () => {
      val (corpus, _) = igFixture(s, d)
      graft.operators.NgramStore.init(s, dir, corpus, "text", maxN = 8)
    }
    val serve = () => {
      val (_, queries) = igFixture(s, d)
      graft.operators.NgramStore.probe(s, dir, queries, "doc_id", "text")
        .orderBy("q_id")
    }
    (init, serve)
  }

  /** Stored unbounded-longest-match phased form: init builds the
    * standing [[graft.operators.SaStore]] (the binary-lifted window
    * ledger — the one-time cost that replaces the in-memory form's
    * per-call union-SA rebuild); serve is the queries-sized
    * binary-search probe over the (level, bucket)-pruned scans. SAME
    * oracle as x_sa_longest_match (the store is a pure execution
    * strategy — the SaStoreSpec LAW, replayed here against DuckDB's
    * independent suffix-sort at sf scale). */
  private val saLongestStoredPhased: Phased = (s, d) => {
    lazy val dir = tmpStore("sa_store")
    val init = () => {
      val (corpus, _) = igFixture(s, d)
      // 16 digest buckets: the layout's file count is levels × buckets
      // and every probe scan pays the dir listing — at this corpus size
      // 16 prunes plenty; production sizes it up with the corpus.
      graft.operators.SaStore.init(s, dir, corpus, "doc_id", "text",
        numBuckets = 16)
    }
    val serve = () => {
      val (_, queries) = igFixture(s, d)
      graft.operators.SaStore.probe(s, dir, queries, "doc_id", "text")
        .orderBy("q_id")
    }
    (init, serve)
  }

  /** The admission-form phased pair: init builds the SaStore over the
    * corpus slice; serve probes/scrubs the HELD-OUT docs (the batch) —
    * O(batch) against the standing state, no corpus rescan. Distinct
    * store prefixes: Verify runs distinct queries concurrently and a
    * shared dir would race its own re-init. */
  private def saAdmissionPhased(prefix: String,
      serveFn: (SparkSession, String, DataFrame) => DataFrame): Phased = (s, d) => {
    lazy val dir = tmpStore(prefix)
    val init = () => {
      val (corpus, _) = igFixture(s, d)
      graft.operators.SaStore.init(s, dir, corpus, "doc_id", "text",
        numBuckets = 16)
    }
    val serve = () => {
      val (_, batch) = igFixture(s, d)
      serveFn(s, dir, batch)
    }
    (init, serve)
  }

  private val saDupLenStoredPhased: Phased =
    saAdmissionPhased("sa_store_dl", (s, dir, batch) =>
      graft.operators.SaStore.probeDupLengths(s, dir, batch,
          "doc_id", "text", minLen = 8)
        .orderBy("doc_id", "pos"))

  private val saScrubStoredPhased: Phased =
    saAdmissionPhased("sa_store_scrub", (s, dir, batch) =>
      graft.operators.SaStore.scrub(s, dir, batch, "doc_id", "text", minLen = 8)
        .orderBy("doc_id"))

  private val saMatchCountsPhased: Phased = (s, d) => {
    lazy val dir = tmpStore("sa_store_cnt")
    val init = () => {
      val (corpus, _) = igFixture(s, d)
      graft.operators.SaStore.init(s, dir, corpus, "doc_id", "text",
        numBuckets = 16)
    }
    val serve = () => {
      val (_, queries) = igFixture(s, d)
      graft.operators.SaStore.probeWithCounts(s, dir, queries, "doc_id", "text")
        .orderBy("q_id")
    }
    (init, serve)
  }

  private val saAttributionPhased: Phased = (s, d) => {
    lazy val dir = tmpStore("sa_store_attr")
    val init = () => {
      val (corpus, _) = igFixture(s, d)
      graft.operators.SaStore.init(s, dir, corpus, "doc_id", "text",
        numBuckets = 16)
    }
    val serve = () => {
      val (_, queries) = igFixture(s, d)
      graft.operators.SaStore.attributeMatches(s, dir, queries,
          "doc_id", "text", maxSites = 5)
        .orderBy("q_id", "doc_id", "pos")
    }
    (init, serve)
  }

  /** The takedown-path phased form: init builds the store over the
    * corpus, tombstones the victim slices in two waves AROUND a compact
    * (so the serve probe reads a compacted generation AND a live
    * tombstone part at once — both erasure lanes in one gate); serve is
    * the ordinary probe. Wave overlap (ids in both slices) is the
    * re-tombstone-after-compact no-op, deliberately exercised. */
  /** The shared takedown init (build + wave A remove + compact +
    * wave B remove — both erasure lanes live at serve); each remove
    * query gets its own store prefix (Verify runs queries concurrently
    * and a shared dir would race its own re-init), and a DIFFERENT
    * serve probe — the admission funnel consumes probeDupLengths /
    * attributeMatches, so the takedown gate must cover them too, not
    * just the longest-match probe. */
  private def saRemoveInit(s: SparkSession, d: String, dir: String): Unit = {
    val (corpus, _) = igFixture(s, d)
    graft.operators.SaStore.init(s, dir, corpus, "doc_id", "text",
      numBuckets = 16)
    // Wave A: every plant carrier — the takedown must visibly change
    // answers (the planted 11-matches die with their only sites).
    graft.operators.SaStore.remove(s, dir,
      corpus.filter(col("doc_id") % 11 === 5).select("doc_id"), "doc_id")
    graft.operators.SaStore.compact(s, dir)
    // Wave B, post-compact: stays a live tombstone part at serve.
    graft.operators.SaStore.remove(s, dir,
      corpus.filter(col("doc_id") % 13 === 4).select("doc_id"), "doc_id")
  }

  private def saRemovePhasedWith(prefix: String,
      serveFn: (SparkSession, String, DataFrame) => DataFrame): Phased =
    (s, d) => {
      lazy val dir = tmpStore(prefix)
      val init = () => saRemoveInit(s, d, dir)
      val serve = () => {
        val (_, queries) = igFixture(s, d)
        serveFn(s, dir, queries)
      }
      (init, serve)
    }

  private val saRemovePhased: Phased =
    saRemovePhasedWith("sa_store_rm", (s, dir, queries) =>
      graft.operators.SaStore.probe(s, dir, queries, "doc_id", "text")
        .orderBy("q_id"))

  /** Takedown × the ADMISSION probe: the funnel's exact policy reads
    * probeDupLengths/scrub, so a removed doc surviving in the
    * per-position dup-length report would poison admissions silently —
    * replayed here against the survivor-corpus suffix sort. */
  private val saRemoveDupLenPhased: Phased =
    saRemovePhasedWith("sa_store_rm_dl", (s, dir, batch) =>
      graft.operators.SaStore.probeDupLengths(s, dir, batch,
          "doc_id", "text", minLen = 8)
        .orderBy("doc_id", "pos"))

  /** Takedown × ATTRIBUTION: a report naming a tombstoned site would
    * resurrect taken-down text in the audit trail — the sites must
    * come from survivors only, and match lengths must shrink with
    * them (wave A carries every plant). */
  private val saRemoveAttrPhased: Phased =
    saRemovePhasedWith("sa_store_rm_at", (s, dir, queries) =>
      graft.operators.SaStore.attributeMatches(s, dir, queries,
          "doc_id", "text", maxSites = 5)
        .orderBy("q_id", "doc_id", "pos"))

  private[graft] val phased: Map[String, Phased] = Map(
    "x_infinigram_stored" -> infinigramStoredPhased,
    "x_sa_longest_match_stored" -> saLongestStoredPhased,
    "x_sa_dup_len_stored" -> saDupLenStoredPhased,
    "x_sa_scrub_stored" -> saScrubStoredPhased,
    "x_sa_match_counts" -> saMatchCountsPhased,
    "x_sa_attribution" -> saAttributionPhased,
    "x_sa_remove" -> saRemovePhased,
    "x_sa_remove_duplen" -> saRemoveDupLenPhased,
    "x_sa_remove_attr" -> saRemoveAttrPhased)

  private val oraclesBase: Map[String, String] = Map(
    "x_suffix_array" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
         |s AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
         |        array_to_string(t[i:len(t)], ' ') AS suf
         |      FROM (SELECT doc_id, t,
         |              unnest(generate_series(1, len(t))) AS i FROM toks))
         |SELECT doc_id, pos,
         |  CAST(row_number() OVER (ORDER BY suf, doc_id, pos) AS BIGINT) AS sa_rank
         |FROM s ORDER BY doc_id, pos""".stripMargin,
    "x_sa_dup_len" ->
      s"""$saCtes
         |SELECT doc_id, pos, CAST(dl AS INTEGER) AS dup_len
         |FROM d WHERE dl >= 8 ORDER BY doc_id, pos""".stripMargin,
    // Coverage replay: positions under any [pos, pos+dl) with dl >= 8
    // (DISTINCT merges overlaps — the engine's merged intervals are the
    // same set), then the x_substring_scrub reassembly tail.
    "x_sa_scrub" ->
      s"""$saCtes,
         |cov AS (SELECT DISTINCT doc_id, u.cp AS pos
         |        FROM d, unnest(generate_series(d.pos, d.pos + d.dl - 1)) AS u(cp)
         |        WHERE d.dl >= 8),
         |tok_pos AS (SELECT doc_id, CAST(i AS INTEGER) AS pos, t[i] AS tok
         |            FROM (SELECT doc_id, t,
         |                    unnest(generate_series(1, len(t))) AS i FROM toks)),
         |agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
         |          count(c.pos) AS n_removed,
         |          coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
         |            ' ' ORDER BY tp.pos), '') AS clean_text
         |        FROM tok_pos tp LEFT JOIN cov c
         |          ON c.doc_id = tp.doc_id AND c.pos = tp.pos
         |        GROUP BY 1)
         |SELECT dd.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |       coalesce(a.clean_text, '') AS clean_text
         |FROM documents dd LEFT JOIN agg a USING (doc_id)
         |ORDER BY dd.doc_id""".stripMargin,
    // String-keyed replay of the digest-keyed probe (a hash match
    // proves the (width, span) digesting collision-free): corpus
    // windows of every width 1..8 with their next token, query
    // suffixes per width, longest matched width per query, argmax
    // continuation with the (count desc, token asc) tie-break.
    "x_infinigram" ->
      s"""WITH q0 AS (SELECT doc_id, CASE
         |        WHEN doc_id % 2 = 0 THEN text || ' qnovel' || CAST(doc_id AS VARCHAR)
         |        WHEN doc_id % 3 = 0 THEN text ||
         |          ' ig1 ig2 ig3 ig4 ig5 ig6 ig7 ig8 ig9 ig10'
         |        ELSE text END AS text
         |      FROM documents WHERE doc_id % 17 = 0),
         |qt AS (SELECT doc_id AS qid, $words AS t FROM q0),
         |qw AS (SELECT qid, w.w AS w,
         |         array_to_string(t[len(t) - w.w + 1:len(t)], ' ') AS span
         |       FROM qt, unnest(generate_series(1, least(8, len(t)))) AS w(w)),
         |c0 AS (SELECT doc_id, CASE WHEN doc_id % 11 = 5 THEN text ||
         |          ' ig1 ig2 ig3 ig4 ig5 ig6 ig7 ig8 ig9 ig10 igend'
         |        ELSE text END AS text
         |      FROM documents WHERE doc_id % 17 <> 0),
         |ct AS (SELECT doc_id, $words AS t FROM c0),
         |cw AS (SELECT w.w AS w, array_to_string(t[i.i:i.i + w.w - 1], ' ') AS span,
         |         CASE WHEN i.i + w.w <= len(t) THEN t[i.i + w.w] END AS next
         |       FROM ct, unnest(generate_series(1, len(t))) AS i(i),
         |            unnest(generate_series(1, least(8, len(t) - i.i + 1))) AS w(w)),
         |occ AS (SELECT w, span, count(*) AS n_occ FROM cw GROUP BY 1, 2),
         |m AS (SELECT qid, qw.w, qw.span, n_occ,
         |        row_number() OVER (PARTITION BY qid ORDER BY qw.w DESC) AS rn
         |      FROM qw JOIN occ ON occ.w = qw.w AND occ.span = qw.span),
         |best AS (SELECT qid, w, span, n_occ FROM m WHERE rn = 1),
         |cont AS (SELECT b.qid, cw.next, count(*) AS cnt
         |         FROM best b JOIN cw ON cw.w = b.w AND cw.span = b.span
         |         WHERE cw.next IS NOT NULL GROUP BY 1, 2),
         |top AS (SELECT qid, next, cnt,
         |          row_number() OVER (PARTITION BY qid ORDER BY cnt DESC, next) AS rn
         |        FROM cont)
         |SELECT q.doc_id AS q_id,
         |  CAST(coalesce(b.w, 0) AS INTEGER) AS match_len,
         |  CAST(coalesce(b.n_occ, 0) AS BIGINT) AS n_occ,
         |  coalesce(t2.next, '') AS top_next,
         |  CAST(coalesce(t2.cnt, 0) AS BIGINT) AS top_cnt
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 17 = 0) q
         |LEFT JOIN best b ON b.qid = q.doc_id
         |LEFT JOIN (SELECT * FROM top WHERE rn = 1) t2 ON t2.qid = q.doc_id
         |ORDER BY q_id""".stripMargin)

  /** Unbounded longest-match replay — an INDEPENDENT construction from
    * the engine's union SA: sort every corpus and query suffix string
    * together once; a query suffix occurs in the corpus iff its
    * nearest corpus neighbor in that order extends it (qs-prefixed
    * strings form a contiguous range starting at qs — the successor
    * catches proper extensions, the predecessor exact equals).
    * `corpusWhere` selects the corpus slice — the default is the whole
    * igFixture corpus; x_sa_remove narrows it to the survivors of the
    * takedown (the store's removed docs must answer exactly as if they
    * were never there). */
  private def longestMatchCtes(
      corpusWhere: String = "doc_id % 17 <> 0"): String =
    s"""WITH q0 AS (SELECT doc_id, CASE
       |        WHEN doc_id % 2 = 0 THEN text || ' qnovel' || CAST(doc_id AS VARCHAR)
       |        WHEN doc_id % 3 = 0 THEN text ||
       |          ' ig1 ig2 ig3 ig4 ig5 ig6 ig7 ig8 ig9 ig10'
       |        ELSE text END AS text
       |      FROM documents WHERE doc_id % 17 = 0),
       |c0 AS (SELECT doc_id, CASE WHEN doc_id % 11 = 5 THEN text ||
       |          ' ig1 ig2 ig3 ig4 ig5 ig6 ig7 ig8 ig9 ig10 igend'
       |        ELSE text END AS text
       |      FROM documents WHERE $corpusWhere),
       |ctoks AS (SELECT doc_id, $words AS t FROM c0),
       |qtoks AS (SELECT doc_id AS qid, $words AS t FROM q0),
       |cs AS (SELECT array_to_string(t[i.i:len(t)], ' ') AS suf
       |       FROM ctoks, unnest(generate_series(1, len(t))) AS i(i)),
       |qs AS (SELECT qid, CAST(len(t) - i.i + 1 AS INTEGER) AS rem,
       |         array_to_string(t[i.i:len(t)], ' ') AS suf
       |       FROM qtoks, unnest(generate_series(1, len(t))) AS i(i)),
       |u AS (SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS INTEGER) AS rem,
       |        suf, 0 AS isq FROM cs
       |      UNION ALL SELECT qid, rem, suf, 1 FROM qs),
       |w AS (SELECT qid, rem, suf, isq,
       |        last_value(CASE WHEN isq = 0 THEN suf END IGNORE NULLS)
       |          OVER (ORDER BY suf, isq
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc,
       |        first_value(CASE WHEN isq = 0 THEN suf END IGNORE NULLS)
       |          OVER (ORDER BY suf, isq
       |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc
       |      FROM u),
       |m AS (SELECT qid, max(rem) AS ml FROM w
       |      -- TOKEN-granular containment: the trailing sentinel space
       |      -- (the engine's own key construction) stops 'agg'
       |      -- char-extending 'a'; token-extensions of qs still sort
       |      -- IMMEDIATELY after qs (' ' < every token char), so the
       |      -- nearest-neighbor test stays sound.
       |      WHERE isq = 1 AND (starts_with(pc || ' ', suf || ' ')
       |                      OR starts_with(nc || ' ', suf || ' '))
       |      GROUP BY qid)""".stripMargin

  private val longestMatchSql =
    s"""${longestMatchCtes()}
       |SELECT q.doc_id AS q_id, CAST(coalesce(m.ml, 0) AS INTEGER) AS match_len
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 17 = 0) q
       |LEFT JOIN m ON m.qid = q.doc_id
       |ORDER BY q_id""".stripMargin

  /** The counted form: the matched span string materializes per query
    * (queries-sized) and its corpus occurrences are counted by a
    * direct window-equality scan — an INDEPENDENT counting of what the
    * engine counts via the certificate join. */
  private val saMatchCountsSql =
    s"""${longestMatchCtes()},
       |spanq AS (SELECT m.qid, m.ml,
       |            array_to_string(q2.t[len(q2.t) - m.ml + 1:len(q2.t)], ' ') AS span
       |          FROM m JOIN qtoks q2 ON q2.qid = m.qid WHERE m.ml >= 1),
       |occ AS (SELECT s2.qid, count(*) AS n_occ
       |        FROM spanq s2, ctoks c,
       |             unnest(generate_series(1, len(c.t) - s2.ml + 1)) AS i(i)
       |        WHERE array_to_string(c.t[i.i:i.i + s2.ml - 1], ' ') = s2.span
       |        GROUP BY 1)
       |SELECT q.doc_id AS q_id, CAST(coalesce(m.ml, 0) AS INTEGER) AS match_len,
       |       CAST(coalesce(occ.n_occ, 0) AS BIGINT) AS n_occ
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 17 = 0) q
       |LEFT JOIN m ON m.qid = q.doc_id
       |LEFT JOIN occ ON occ.qid = q.doc_id
       |ORDER BY q_id""".stripMargin

  /** Per-position duplicated-length replay AGAINST the corpus — the
    * same independent union-suffix-sort construction as
    * [[longestMatchSql]], without the containment filter: a batch
    * position's longest corpus match is its max TOKEN-level LCP
    * against its nearest corpus suffixes in suffix order (token
    * prefixes of a string P occupy the contiguous [P, "P"+c) string
    * range — every token char exceeds ' ' — so the nearest corpus
    * string-neighbor on the max-LCP side shares the maximal token
    * prefix; the x_sa_dup_len oracle's own lead()-over-suffix-order
    * argument). LCP via the list-compare `list_position` fold with
    * the nullif(0) guard the class note pins. */
  private def againstCtes(corpusWhere: String = "doc_id % 17 <> 0") =
    s"""WITH q0 AS (SELECT doc_id, CASE
       |        WHEN doc_id % 2 = 0 THEN text || ' qnovel' || CAST(doc_id AS VARCHAR)
       |        WHEN doc_id % 3 = 0 THEN text ||
       |          ' ig1 ig2 ig3 ig4 ig5 ig6 ig7 ig8 ig9 ig10'
       |        ELSE text END AS text
       |      FROM documents WHERE doc_id % 17 = 0),
       |c0 AS (SELECT doc_id, CASE WHEN doc_id % 11 = 5 THEN text ||
       |          ' ig1 ig2 ig3 ig4 ig5 ig6 ig7 ig8 ig9 ig10 igend'
       |        ELSE text END AS text
       |      FROM documents WHERE $corpusWhere),
       |ctoks AS (SELECT doc_id, $words AS t FROM c0),
       |qtoks AS (SELECT doc_id AS qid, $words AS t FROM q0),
       |cs AS (SELECT t, CAST(i.i AS INTEGER) AS pos,
       |         CAST(len(t) - i.i + 1 AS INTEGER) AS rem,
       |         array_to_string(t[i.i:len(t)], ' ') AS suf
       |       FROM ctoks, unnest(generate_series(1, len(t))) AS i(i)),
       |qs AS (SELECT qid, t, CAST(i.i AS INTEGER) AS pos,
       |         CAST(len(t) - i.i + 1 AS INTEGER) AS rem,
       |         array_to_string(t[i.i:len(t)], ' ') AS suf
       |       FROM qtoks, unnest(generate_series(1, len(t))) AS i(i)),
       |u AS (SELECT CAST(NULL AS BIGINT) AS qid, t, pos, rem, suf, 0 AS isq FROM cs
       |      UNION ALL SELECT qid, t, pos, rem, suf, 1 FROM qs),
       |w AS (SELECT qid, t, pos, rem, isq,
       |        last_value(CASE WHEN isq = 0
       |            THEN struct_pack(ct := t, cpos := pos, crem := rem) END
       |          IGNORE NULLS) OVER (ORDER BY suf, isq
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc,
       |        first_value(CASE WHEN isq = 0
       |            THEN struct_pack(ct := t, cpos := pos, crem := rem) END
       |          IGNORE NULLS) OVER (ORDER BY suf, isq
       |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc
       |      FROM u),
       |d AS (SELECT qid AS doc_id, pos, greatest(
       |        CASE WHEN pc IS NULL THEN 0 ELSE
       |          coalesce(nullif(list_position(list_transform(
       |              generate_series(1, least(rem, pc.crem)),
       |              j -> t[pos + j - 1] = pc.ct[pc.cpos + j - 1]), false), 0) - 1,
       |            least(rem, pc.crem)) END,
       |        CASE WHEN nc IS NULL THEN 0 ELSE
       |          coalesce(nullif(list_position(list_transform(
       |              generate_series(1, least(rem, nc.crem)),
       |              j -> t[pos + j - 1] = nc.ct[nc.cpos + j - 1]), false), 0) - 1,
       |            least(rem, nc.crem)) END) AS dl
       |      FROM w WHERE isq = 1)""".stripMargin

  private def saDupLenSqlFor(corpusWhere: String) =
    s"""${againstCtes(corpusWhere)}
       |SELECT doc_id, pos, CAST(dl AS INTEGER) AS dup_len
       |FROM d WHERE dl >= 8 ORDER BY doc_id, pos""".stripMargin

  private val saDupLenStoredSql = saDupLenSqlFor("doc_id % 17 <> 0")

  /** Coverage replay over the BATCH docs — the x_sa_scrub reassembly
    * tail, against-corpus dup lengths feeding it. */
  private val saScrubStoredSql =
    s"""${againstCtes()},
       |cov AS (SELECT DISTINCT doc_id, u2.cp AS pos
       |        FROM d, unnest(generate_series(d.pos, d.pos + d.dl - 1)) AS u2(cp)
       |        WHERE d.dl >= 8),
       |tok_pos AS (SELECT qid AS doc_id, CAST(i.i AS INTEGER) AS pos, t[i.i] AS tok
       |            FROM qtoks, unnest(generate_series(1, len(t))) AS i(i)),
       |agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
       |          count(c.pos) AS n_removed,
       |          coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
       |            ' ' ORDER BY tp.pos), '') AS clean_text
       |        FROM tok_pos tp LEFT JOIN cov c
       |          ON c.doc_id = tp.doc_id AND c.pos = tp.pos
       |        GROUP BY 1)
       |SELECT q.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
       |       coalesce(a.clean_text, '') AS clean_text
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 17 = 0) q
       |LEFT JOIN agg a USING (doc_id)
       |ORDER BY q.doc_id""".stripMargin

  /** Attribution replay: the matched span's corpus sites by direct
    * window equality, capped per query at the engine's own
    * deterministic (doc, pos) order. */
  private def saAttributionSqlFor(corpusWhere: String) =
    s"""${longestMatchCtes(corpusWhere)},
       |spanq AS (SELECT m.qid, m.ml,
       |            array_to_string(q2.t[len(q2.t) - m.ml + 1:len(q2.t)], ' ') AS span
       |          FROM m JOIN qtoks q2 ON q2.qid = m.qid WHERE m.ml >= 1),
       |sites AS (SELECT s2.qid, s2.ml, c.doc_id, CAST(i.i AS INTEGER) AS pos,
       |            row_number() OVER (PARTITION BY s2.qid
       |                               ORDER BY c.doc_id, i.i) AS rn
       |          FROM spanq s2, ctoks c,
       |               unnest(generate_series(1, len(c.t) - s2.ml + 1)) AS i(i)
       |          WHERE array_to_string(c.t[i.i:i.i + s2.ml - 1], ' ') = s2.span)
       |SELECT qid AS q_id, CAST(ml AS INTEGER) AS match_len, doc_id, pos
       |FROM sites WHERE rn <= 5 ORDER BY q_id, doc_id, pos""".stripMargin

  private val saAttributionSql = saAttributionSqlFor("doc_id % 17 <> 0")

  /** The survivor slice after the takedown's two victim waves. */
  private val survivorWhere =
    "doc_id % 17 <> 0 AND doc_id % 11 <> 5 AND doc_id % 13 <> 4"

  /** Takedown replay: the SAME independent union-suffix-sort as
    * longestMatchSql, over the corpus MINUS both victim slices — the
    * removed docs must answer exactly as if they were never stored
    * (the plant carriers are all in wave A, so the planted 11-matches
    * must fall back to the queries' natural text). */
  private val saRemoveSql =
    s"""${longestMatchCtes(survivorWhere)}
       |SELECT q.doc_id AS q_id, CAST(coalesce(m.ml, 0) AS INTEGER) AS match_len
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 17 = 0) q
       |LEFT JOIN m ON m.qid = q.doc_id
       |ORDER BY q_id""".stripMargin

  /** The stored probe answers IDENTICALLY (the NgramStore law) — the
    * oracle IS the in-memory replay; a hash match proves the persisted
    * signed count ledger and the bucket-pruned probe drift-free. */
  def oracles: Map[String, String] =
    oraclesBase +
      ("x_infinigram_stored" -> oraclesBase("x_infinigram")) +
      ("x_sa_longest_match" -> longestMatchSql) +
      // The stored probe answers IDENTICALLY (the SaStore law) — the
      // oracle IS the in-memory replay, shared verbatim; a hash match
      // proves the persisted level ledger and the binary-search probe
      // drift-free against DuckDB's independent suffix-sort.
      ("x_sa_longest_match_stored" -> longestMatchSql) +
      ("x_sa_dup_len_stored" -> saDupLenStoredSql) +
      ("x_sa_scrub_stored" -> saScrubStoredSql) +
      ("x_sa_match_counts" -> saMatchCountsSql) +
      ("x_sa_attribution" -> saAttributionSql) +
      ("x_sa_remove" -> saRemoveSql) +
      // The takedown gate on the admission probes: the same replays as
      // the siblings above, over the survivor corpus only.
      ("x_sa_remove_duplen" -> saDupLenSqlFor(survivorWhere)) +
      ("x_sa_remove_attr" -> saAttributionSqlFor(survivorWhere))
}

