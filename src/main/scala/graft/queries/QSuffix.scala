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
    s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
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
    // dropped digest.
    "x_sa_dup_len" -> ((s, d) =>
      SuffixArrayOps.saDupLengths(T(s, d, "documents"), "doc_id", "text", minLen = 8)
        .orderBy("doc_id", "pos")),
    // SA-based ExactSubstr scrub: variable-length coverage at
    // occurrence >= 2 (same-doc repeats count), merged intervals,
    // total over the corpus (empty/short docs pass through with zeros).
    "x_sa_scrub" -> ((s, d) =>
      SuffixArrayOps.saScrub(T(s, d, "documents"), "doc_id", "text", minLen = 8)
        .orderBy("doc_id")))

  def oracles: Map[String, String] = Map(
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
         |ORDER BY dd.doc_id""".stripMargin)
}
