package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Bounded ∞-gram probe (Liu et al. 2024, "Infini-gram: Scaling
 * Unbounded n-gram Language Models to a Trillion Tokens"): for each
 * query string, the LONGEST query suffix (up to `maxN` tokens) that
 * occurs as a contiguous n-gram anywhere in the corpus, with its
 * occurrence count and the most-frequent observed next token — the
 * backoff-free n-gram LM lookup the paper serves from a suffix array,
 * and the memorization/attribution probe a training-data pipeline runs
 * against held-out prompts.
 *
 * Shape (the [[SpanDedup.duplicatedSpansDigest]] exchange economics):
 * the corpus emits every (start, width ≤ maxN) window DIGEST-keyed with
 * its next token — span text never materializes past the generator
 * (the digests hash the token-array slices directly; grouping is
 * identical to string keying because tokens contain no whitespace, and
 * the string-keyed oracle proves it per run) — and the query side's
 * suffix digests (|queries| × maxN rows, the probe is queries-sized by
 * nature) broadcast-prune the corpus windows MAP-SIDE before any
 * aggregation, so the only exchanges carry the matching windows'
 * digests and single next-tokens, sized by the queries' corpus hits,
 * not the corpus. Window fan-out is maxN rows per corpus token —
 * bounded and linear, the explicit price of the bounded probe; the
 * UNBOUNDED form is what [[SuffixArrayOps]] holds the machinery for (a
 * query suffix's longest corpus match is its LCP against its
 * suffix-array neighbors), traded here for the one-scan digest form
 * because admission-time probes are n-bounded in practice.
 *
 * [[NgramStore]] is the standing form: the same window kernel folded
 * into a persisted additive count ledger, making repeat probes
 * queries-sized (no corpus rescan) — kernels and the result-assembly
 * tail are shared one-definition here so the two forms cannot drift.
 *
 * Match semantics: occurrences are counted per corpus POSITION;
 * next-token counts cover only occurrences with a following token in
 * the same document (a match ending a document contributes to `n_occ`
 * but no continuation — a query whose matches all end documents
 * reports the empty top token). Ties on the continuation count break
 * to the lexicographically smallest token, replayed identically by the
 * oracle. Queries with no match at ANY width (e.g. a novel final
 * token — suffixes always include the query's end) report
 * (0, 0, '', 0); the probe is a total function over the queries.
 */
object InfiniGram {

  /** Query suffix digests, one row per width 1..min(maxN, |q|):
    * (__qid, w, __h1, __h2). Tiny by contract — probes are
    * queries-sized. Digests come from the compiled chained kernel
    * ([[graft.functions.WindowKernels]]) — ONE definition with the
    * corpus side below; drift here would silently empty every match. */
  private[operators] def querySuffixes(queries: DataFrame, qIdCol: String,
                                       qTextCol: String, maxN: Int): DataFrame =
    queries
      .select(col(qIdCol).as("__qid"),
        explode(graft.functions.windows.suffixDigests(
          SpanDedup.toks(col(qTextCol)), maxN)).as("__s"))
      .select(col("__qid"), col("__s.w").as("w"),
        col("__s.h1").as("__h1"), col("__s.h2").as("__h2"))

  /** Corpus windows of every width 1..maxN with their next token
    * (null at document end), digest-keyed inside the generator:
    * (__h1, __h2, __next). The ONE corpus-sized kernel — shared with
    * [[NgramStore]], whose persisted counts must group identically or
    * the store law breaks silently. Compiled chained-digest kernel
    * (optimization round 19): the former nested-transform + per-window
    * `slice` + array-hash form was interpreted per element and measured
    * ~5 s of this op's ~7 s at sf0.1; the kernel is one compiled pass,
    * one hash step per (window, extra token), zero slice allocations. */
  private[operators] def corpusWindows(corpus: DataFrame, textCol: String,
                                       maxN: Int): DataFrame =
    corpus
      .select(explode(graft.functions.windows.ngramWindows(
        SpanDedup.toks(col(textCol)), maxN)).as("__w"))
      .select(col("__w.h1").as("__h1"), col("__w.h2").as("__h2"),
        col("__w.next").as("__next"))

  /** The result-assembly tail shared by the in-memory and stored
    * probes: longest matched width per query ((qid, w) is unique — one
    * suffix per width), the argmax continuation of that one n-gram
    * (count desc, token asc), and the total-function left join back to
    * the queries. `occ` = (__h1, __h2, n_occ); `conts` =
    * (__h1, __h2, __next, __cnt). All three join inputs are
    * queries-hit-sized. */
  private[operators] def assemble(queries: DataFrame, qIdCol: String,
                                  qw: DataFrame, occ: DataFrame,
                                  conts: DataFrame): DataFrame = {
    val matched = qw.join(occ, Seq("__h1", "__h2"))
    val best = matched
      .groupBy(col("__qid"))
      .agg(max(struct(col("w"), col("n_occ"), col("__h1"), col("__h2"))).as("__b"))
      .select(col("__qid"), col("__b.w").as("match_len"),
        col("__b.n_occ").as("n_occ"),
        col("__b.__h1").as("__h1"), col("__b.__h2").as("__h2"))
    val rn = Window.partitionBy(col("__qid"))
      .orderBy(col("__cnt").desc, col("__next").asc)
    val withTop = best.join(conts, Seq("__h1", "__h2"), "left")
      .withColumn("__rn", row_number().over(rn))
      .where(col("__rn") === 1)
      .select(col("__qid"), col("match_len"), col("n_occ"),
        coalesce(col("__next"), lit("")).as("top_next"),
        coalesce(col("__cnt"), lit(0L)).as("top_cnt"))
    queries.select(col(qIdCol).as("q_id"))
      .join(withTop, col("q_id") === col("__qid"), "left")
      .select(col("q_id"),
        coalesce(col("match_len"), lit(0)).cast("int").as("match_len"),
        coalesce(col("n_occ"), lit(0L)).as("n_occ"),
        coalesce(col("top_next"), lit("")).as("top_next"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"))
  }

  /** `broadcastProbes = false` degrades the digest prune to a shuffle
    * semi join for a genuinely huge query batch (the family escape
    * hatch — the default broadcast has no size gate, and a query set
    * beyond the broadcast limit must not OOM the driver). */
  def probe(corpus: DataFrame, idCol: String, textCol: String,
            queries: DataFrame, qIdCol: String, qTextCol: String,
            maxN: Int = 8, broadcastProbes: Boolean = true): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1: $maxN")
    val bcast = if (broadcastProbes) (df: DataFrame) => broadcast(df)
                else (df: DataFrame) => df
    val qw = querySuffixes(queries, qIdCol, qTextCol, maxN)
    // Consumed by BOTH aggregations below — materialized once so the
    // corpus window generation (maxN hashed slices per token, the
    // op's only corpus-sized work) runs a single pass; the checkpoint
    // holds only the queries' corpus hits, not the corpus.
    val pruned = corpusWindows(corpus, textCol, maxN)
      .join(bcast(qw.select("__h1", "__h2").distinct()),
        Seq("__h1", "__h2"), "left_semi")
      .localCheckpoint(true)
    val occ = pruned.groupBy(col("__h1"), col("__h2"))
      .agg(count(lit(1)).as("n_occ"))
    val conts = pruned.where(col("__next").isNotNull)
      .groupBy(col("__h1"), col("__h2"), col("__next"))
      .agg(count(lit(1)).as("__cnt"))
    assemble(queries, qIdCol, qw, occ, conts)
  }
}
