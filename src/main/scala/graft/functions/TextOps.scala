package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for a large-scale training-data pipeline:
 * tokenization, quality scoring, fingerprinting, shingling, MinHash
 * signatures, language ID, lexicon sentiment.
 *
 * Everything here composes built-in `org.apache.spark.sql.functions`
 * (split / transform / filter / aggregate / md5 ...), so every operator
 * stays inside whole-stage codegen — no UDF boxing anywhere, and all of it
 * scales embarrassingly parallel over partitions (per-row, no shuffle).
 *
 * Capability modeled on the reference's text stages (featurization at
 * duplication_service.py:62-72, sentiment at bias_detection_service.py:59-62,
 * summarization-service.py:32-36) re-grounded as deterministic,
 * oracle-testable operators.
 */
object text {

  /**
   * THE whitespace class, spelled out — every tokenizing split in the
   * engine uses this constant and the OracleSql `words` macro spells the
   * identical class. Java's `\s` happens to equal it, but DuckDB's RE2
   * `\s` drops vertical tab 0x0B; writing the class out on BOTH sides
   * makes engine/oracle tokenization parity self-evident and independent
   * of either regex engine's `\s` definition.
   */
  val WhitespaceRun: String = "[ \t\n\\x0B\f\r]+"

  /** Whitespace tokenization of trimmed lowercase text. Empties are
    * filtered: `trim` only strips spaces, so a tab/VT-leading document
    * would otherwise emit a phantom "" first token that the oracle's
    * `list_filter(..., t <> '')` never sees. */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), WhitespaceRun), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** First-k-token prefix re-joined with single spaces — the query-text
    * constructor the retrieval queries (x_bm25_topk / x_bm25_incremental
    * / x_hybrid_rrf / x_hybrid_stored) and their specs share. ONE
    * definition on purpose: x_hybrid_rrf and x_hybrid_stored replay
    * against the same oracle SQL precisely because their query
    * construction is identical, so the pinned tokenization must not be
    * able to drift between copies. */
  def firstKTokens(c: Column, k: Int): Column =
    concat_ws(" ", slice(tokens(c), 1, k))

  /** BPE-ish subword count: words + punctuation marks counted separately. */
  def subwordCount(c: Column): Column =
    size(filter(split(c, "(?<=\\W)|(?=\\W)"), t => length(trim(t)) > 0))

  /** Exact-content fingerprint (md5 hex of normalized text). */
  def fingerprint(c: Column): Column = md5(lower(trim(c)))

  /** Word n-gram shingles, joined by single spaces. Empty when < n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))

  /**
   * MinHash signature: k independent permutations simulated by salting the
   * shingle with a seed before hashing (md5 hex; min over the lexicographic
   * order). Portable: any engine with md5 produces the identical signature.
   *
   * Implemented as ONE `aggregate` fold over the shingle array rather than
   * k separate `array_min(transform(...))` passes — nested-lambda subtrees
   * defeat Spark's common-subexpression elimination, so the k-pass form
   * re-evaluates the (expensive) shingle construction k times per row.
   * "g" sorts after every md5 hex digit, so it is the fold's +∞; it is
   * mapped to null afterwards (empty-input semantics match `array_min`).
   */
  def minhashSignature(sh: Column, k: Int): Column = {
    val init = array(Seq.fill(k)(lit("g")): _*)
    val folded = aggregate(sh, init, (acc, x) =>
      array((0 until k).map(s => least(element_at(acc, s + 1), md5(concat(lit(s"$s|"), x)))): _*))
    transform(folded, m => when(m === "g", lit(null).cast("string")).otherwise(m))
  }

  /** LSH band values: the signature split into `bands` concatenated chunks. */
  def minhashBands(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map(b =>
      concat_ws("#", (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*)): _*)
  }

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  def stopwordRatio(toks: Column, stops: Seq[String] = defaultStopwords): Column = {
    val stopArr = array(stops.map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(stopArr, t))).cast("double") / size(toks))
  }

  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(length(regexp_replace(c, "[^\\p{Punct}]", "")).cast("double") / length(c))

  def avgWordLen(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /**
   * Composite quality score in [0,1]: long-enough docs with moderate
   * stopword density and sane word lengths score high (heuristic in the
   * spirit of C4/Gopher quality rules; weights are fixed and documented).
   */
  def qualityScore(textCol: Column): Column = {
    val toks = tokens(textCol)
    val lenScore = least(size(toks).cast("double") / 50.0, lit(1.0))
    val stopScore = when(stopwordRatio(toks) > 0.01, 1.0).otherwise(0.5)
    val wordLenScore = when(avgWordLen(toks).between(2.0, 12.0), 1.0).otherwise(0.5)
    round(lenScore * 0.5 + stopScore * 0.25 + wordLenScore * 0.25, 6)
  }

  /** Per-language marker-word profiles for the n-gram/stopword language ID. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "los", "y", "es", "una"),
    "fr" -> Seq("le", "la", "et", "est", "une"),
  )

  /**
   * Heuristic language ID: score = |tokens ∩ profile| per language, argmax
   * with deterministic tie-break on language code; "und" (undetermined)
   * when no profile matches. Backed by the single-pass [[TextStatsExpr]]
   * kernel (the profile counters ride the same token scan as the other
   * text statistics); [[langIdColumns]] keeps the declarative column
   * formulation, pinned equivalent by KernelEquivalenceSpec.
   */
  def langId(textCol: Column): Column = textStats(textCol)("lang_pred")

  /** Column-formulation language ID (the kernel's executable spec). */
  def langIdColumns(textCol: Column): Column = {
    val toks = tokens(textCol)
    val scored = langProfiles.map { case (lang, words) =>
      val wordArr = array(words.map(lit): _*)
      struct(size(filter(toks, t => array_contains(wordArr, t))).as("score"), lit(lang).as("lang"))
    }
    // max_by over (score, reversed-lang) with deterministic tie-break:
    // sort desc by score, asc by lang code, take first; 0-score → "und".
    val best = array_sort(array(scored: _*),
      (l, r) => when(l("score") > r("score"), -1)
        .when(l("score") < r("score"), 1)
        .when(l("lang") < r("lang"), -1)
        .when(l("lang") > r("lang"), 1)
        .otherwise(0))(0)
    when(best("score") === 0, "und").otherwise(best("lang"))
  }

  val posWords: Seq[String] = Seq("fast", "big", "win", "good", "great")
  val negWords: Seq[String] = Seq("slow", "small", "error", "bad", "fail")

  /** Signed lexicon sentiment in [-1,1] (reference M11 stand-in). */
  def sentiment(textCol: Column): Column = {
    val toks = tokens(textCol)
    val pos = array(posWords.map(lit): _*)
    val neg = array(negWords.map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      (size(filter(toks, t => array_contains(pos, t))) -
        size(filter(toks, t => array_contains(neg, t)))).cast("double") / size(toks))
  }

  /** Extractive lead-k summary: the prefix through the k-th sentence
    * terminator (reference M10 stand-in). RE2-expressible on purpose (no
    * lookbehind) so the DuckDB oracle can run the identical pattern; a
    * document with no terminator summarizes to itself. */
  def leadKSummary(textCol: Column, k: Int): Column = {
    val ex = regexp_extract(textCol, s"^(?:[^.!?]*[.!?]+){1,$k}", 0)
    when(ex === "", textCol).otherwise(ex)
  }

  /**
   * Rule-based NER stand-in (reference M2): capitalized-word spans not at
   * sentence start, deduplicated and sorted.
   */
  def entities(textCol: Column): Column =
    array_sort(array_distinct(filter(
      split(trim(textCol), WhitespaceRun),
      t => t.rlike("^[A-Z][a-z]+"))))
}
