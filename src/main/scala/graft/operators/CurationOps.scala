package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators a large-scale training-data pipeline runs
 * between ingest and training: repetition-based quality filtering
 * (the Gopher rules, Rae et al. 2021, Table A1), n-gram train/eval
 * decontamination (the GPT-3 appendix-C procedure, Brown et al. 2020),
 * PII redaction, and temperature-scaled domain mixing (multilingual
 * sampling à la Conneau & Lample 2019). All deterministic — re-runs and
 * retries make identical decisions — and all expressed as map-side work
 * plus bounded shuffles of ids/hashes only; document text never rides a
 * shuffle.
 */
object CurationOps {

  /** Whitespace tokens, lowercased — the same stream every text kernel
    * and every DuckDB oracle uses (split on runs, drop empties). */
  private def toks(c: Column): Column =
    filter(split(lower(trim(c)), graft.functions.text.WhitespaceRun), t => t =!= "")

  /** [[toks]] for the operators outside this file that must share the
    * exact token stream (the [[EvalStore]] registry: a digest registered
    * under one tokenization and probed under another silently never
    * hits). */
  private[operators] def tokens(c: Column): Column = toks(c)

  /** Distinct word n-gram md5 digests of the token-array column named
    * `wordsCol` — ONE digest definition shared by [[decontaminate]] and
    * the standing [[EvalStore]] registry, and mirrored verbatim by their
    * DuckDB oracles (n-grams travel as md5 hex, never as text). */
  private[operators] def gramDigests(wordsCol: String, n: Int): Column = expr(
    s"array_distinct(transform(slice($wordsCol, 1, greatest(size($wordsCol) - ${n - 1}, 0)), " +
      s"(x, i) -> md5(concat_ws(' ', slice($wordsCol, i + 1, $n)))))")

  /**
   * Gopher-style repetition signals per document:
   *  - `dup_line_frac`: fraction of non-empty trimmed lines that repeat
   *    an earlier line (1 − distinct/total; 0 for single/no lines),
   *  - `top_bigram_frac`: fraction of all word-bigram occurrences taken
   *    by the single most frequent bigram (0 when no bigrams),
   *  - `keep`: both under the published thresholds (0.30 / 0.20).
   *
   * Scale shape: line stats are pure per-row column work; the bigram
   * mode runs as posexplode_outer → count by (doc, bigram) → max per
   * doc, so only (doc_id, bigram) pairs shuffle — never the document —
   * and the two-level aggregation is map-side partial throughout.
   * posexplode_outer (not posexplode) both keeps bigram-less docs and
   * stops InferFiltersFromGenerate from pushing a second evaluation of
   * the generator child into the scan.
   */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      maxDupLineFrac: Double = 0.30,
                      maxTopBigramFrac: Double = 0.20): DataFrame = {
    val lines = filter(transform(split(col("__text"), "\n"), l => trim(l)), l => l =!= "")
    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("__lines", lines)
      .withColumn("dup_line_frac",
        when(size(col("__lines")) > 0,
          lit(1.0) - size(array_distinct(col("__lines"))).cast("double") /
            size(col("__lines")))
          .otherwise(lit(0.0)))
      .withColumn("__w", toks(col("__text")))
      .withColumn("__bigrams", expr(
        "transform(slice(__w, 1, greatest(size(__w) - 1, 0)), (x, i) -> concat(x, ' ', __w[i + 1]))"))
    base
      .select(col("doc_id"), col("dup_line_frac"),
        posexplode_outer(col("__bigrams")).as(Seq("__i", "__bg")))
      .groupBy("doc_id", "__bg")
      .agg(first(col("dup_line_frac")).as("dlf"), count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(first(col("dlf")).as("dup_line_frac"),
        coalesce(max(when(col("__bg").isNotNull, col("c"))), lit(0L)).as("__top"),
        coalesce(sum(when(col("__bg").isNotNull, col("c"))), lit(0L)).as("__tot"))
      .select(col("doc_id"), col("dup_line_frac"),
        when(col("__tot") > 0, col("__top").cast("double") / col("__tot"))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
      .withColumn("keep",
        col("dup_line_frac") < maxDupLineFrac && col("top_bigram_frac") < maxTopBigramFrac)
  }

  /**
   * The COMPLETE Gopher rule set (Rae et al. 2021, Table A1) —
   * [[repetitionStats]] extended with the remaining published signals:
   *
   *  - `dup_line_frac` / `dup_paragraph_frac`: fraction of non-empty
   *    trimmed lines / blank-line-separated paragraphs repeating an
   *    earlier one,
   *  - `dup_line_char_frac` / `dup_paragraph_char_frac`: fraction of
   *    characters sitting in those repeated occurrences (1 − chars of
   *    the distinct set / chars of all occurrences),
   *  - `top_2gram_frac` / `top_3gram_frac` / `top_4gram_frac`: the
   *    paper's CHARACTER-fraction form — characters covered by the
   *    occurrences of the top REPEATED n-gram over the characters of
   *    the whitespace-normalized token stream (0 when no gram
   *    repeats). Each occurrence is weighted by its character length
   *    (gram chars include the single joining spaces; the denominator
   *    is the tokens joined the same way, so both sides count one
   *    alphabet). Choices, both documented against Rae et al.:
   *    (a) only grams with count ≥ 2 compete — the rule measures
   *    DUPLICATION, and a count-1 gram duplicates nothing; the paper
   *    never evaluates that case because its separate 50-word gate
   *    keeps docs long enough that a count-1 gram sits far under the
   *    thresholds (for in-scope docs the verdicts therefore agree;
   *    without the guard the statistic becomes length-dependent noise
   *    on short docs). (b) the top gram is selected by character MASS
   *    (count × length), not raw count: on count ties that picks the
   *    longer gram — a ≥ value, so `keep` is conservative — and it
   *    needs no gram-level tie-break to be engine-replayable.
   *    Overlapping occurrences can push the fraction past 1
   *    ("a a a a"), as in the published implementations — the
   *    thresholds only care about the 0.2 region. [[repetitionStats]]
   *    keeps the occurrence-based form for contrast (spec-pinned: the
   *    two verdicts genuinely differ on long repeated grams amid
   *    short filler),
   *  - `symbol_word_ratio`: occurrences of `#`, `...`, `…` per word,
   *  - `bullet_line_frac` / `ellipsis_line_frac`: fraction of non-empty
   *    lines starting with a bullet (`-`, `*`, `•`) / ending with an
   *    ellipsis,
   *  - `mean_word_len`: mean characters per whitespace token,
   *  - `n_words` / `alpha_word_frac` / `n_stop_hits`: Table A1's
   *    remaining gates — document length band, fraction of words with
   *    an alphabetic character, and stop-word occurrences (the
   *    engine-wide [[graft.functions.TextOps.defaultStopwords]] list;
   *    the paper's own 8-word list differs slightly — one shared list
   *    keeps this gate, quality scoring and language ID consistent),
   *  - `keep`: all signals inside the published operating points
   *    (dup-line/paragraph &lt; 0.30, their char fractions &lt; 0.20;
   *    top-2/3/4-gram &lt; 0.20/0.18/0.16; symbol ratio &lt; 0.10;
   *    bullet lines &lt; 0.90; ellipsis lines &lt; 0.30; mean word
   *    length in [3, 10]; words in [minWords, maxWords] — paper
   *    default [50, 100k]; alpha-word fraction ≥ 0.8; ≥ 2 stop
   *    words). The length/alpha/stop bounds are parameters so tests
   *    and short-document pipelines can relax them without forking
   *    the operator.
   *
   * Scale shape — unchanged from [[repetitionStats]]: every line/word
   * signal is pure per-row column work carried through the aggregation
   * with `first`, and the three modal n-grams ride ONE posexplode of the
   * concatenated (n, gram) structs → count by (doc, n, gram) → max per
   * (doc, n). Only (doc_id, n, gram) pairs shuffle — never the document
   * — and both aggregation levels are map-side partial.
   */
  // ── Per-row Gopher building blocks (no shuffle, reused by the batch
  //    operator and the streaming row predicate) ─────────────────────────
  private def gLines(c: Column): Column =
    filter(transform(split(c, "\n"), l => trim(l)), l => l =!= "")
  private def gParas(c: Column): Column =
    filter(transform(split(c, "\n[ \t]*\n"), p => trim(p)), p => p =!= "")
  private def itemFrac(arr: Column, pred: Column => Column): Column =
    when(size(arr) > 0,
      size(filter(arr, pred)).cast("double") / size(arr)).otherwise(lit(0.0))
  // Fraction of items repeating an earlier one, and fraction of
  // CHARACTERS those repeats occupy (total chars − chars of the
  // distinct set, over total chars) — both pure array work.
  private def dupFrac(arr: Column): Column =
    when(size(arr) > 0,
      lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr))
      .otherwise(lit(0.0))
  private def charLen(arr: Column): Column =
    aggregate(transform(arr, x => length(x).cast("long")), lit(0L), (a, x) => a + x)
  private def dupCharFrac(arr: Column): Column = {
    val tot = charLen(arr)
    when(tot > 0,
      lit(1.0) - charLen(array_distinct(arr)).cast("double") / tot)
      .otherwise(lit(0.0))
  }
  private def meanWordLen(w: Column): Column =
    when(size(w) > 0,
      aggregate(transform(w, x => length(x).cast("long")), lit(0L), (a, x) => a + x)
        .cast("double") / size(w)).otherwise(lit(0.0))
  private def symbolWordRatio(c: Column, w: Column): Column =
    when(size(w) > 0,
      (regexp_count(c, lit("#")) + regexp_count(c, lit("\\.\\.\\.")) +
        regexp_count(c, lit("…"))).cast("double") / size(w)).otherwise(lit(0.0))
  // Fraction of words carrying at least one alphabetic character, and
  // the count of stop-word occurrences — Table A1's remaining per-row
  // gates (tokens are lowercased by toks, so [a-z] covers the alphabet;
  // the stop list is the engine-wide text.defaultStopwords, one list
  // for quality scoring, language ID and this gate).
  private def alphaWordFrac(w: Column): Column =
    when(size(w) > 0,
      size(filter(w, t => t.rlike("[a-z]"))).cast("double") / size(w))
      .otherwise(lit(0.0))
  private def stopHits(w: Column): Column = {
    val stopArr = array(graft.functions.text.defaultStopwords.map(lit): _*)
    size(filter(w, t => array_contains(stopArr, t)))
  }

  /**
   * The shuffle-free subset of [[gopherStats]] as ONE per-row predicate:
   * every published signal except the modal n-gram fractions (those need
   * the (doc, gram) aggregation). Because it is pure column work it can
   * gate a STREAM statelessly — each micro-batch row decides for itself,
   * replays identically on retry, and adds no state store.
   */
  def gopherRowKeep(c: Column, minWords: Int = 50, maxWords: Int = 100000,
                    minAlphaFrac: Double = 0.8, minStopHits: Int = 2): Column = {
    val lines = gLines(c); val paras = gParas(c); val w = toks(c)
    dupFrac(lines) < 0.30 && dupFrac(paras) < 0.30 &&
      dupCharFrac(lines) < 0.20 && dupCharFrac(paras) < 0.20 &&
      symbolWordRatio(c, w) < 0.10 &&
      itemFrac(lines, l => l.rlike("^[-*•]")) < 0.90 &&
      itemFrac(lines, l => l.rlike("(\\.\\.\\.|…)$")) < 0.30 &&
      meanWordLen(w) >= 3.0 && meanWordLen(w) <= 10.0 &&
      size(w) >= minWords && size(w) <= maxWords &&
      alphaWordFrac(w) >= minAlphaFrac && stopHits(w) >= minStopHits
  }

  def gopherStats(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minAlphaFrac: Double = 0.8, minStopHits: Int = 2): DataFrame = {
    def lineFrac(pred: Column => Column): Column = itemFrac(col("__lines"), pred)
    def gramStructs(n: Int): Column = expr(
      s"transform(slice(__w, 1, greatest(size(__w) - ${n - 1}, 0)), " +
        s"(x, i) -> struct($n AS n, concat_ws(' ', slice(__w, i + 1, $n)) AS g))")
    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("__lines", gLines(col("__text")))
      .withColumn("__paras", gParas(col("__text")))
      .withColumn("__w", toks(col("__text")))
      .withColumn("dup_line_frac", dupFrac(col("__lines")))
      .withColumn("dup_paragraph_frac", dupFrac(col("__paras")))
      .withColumn("dup_line_char_frac", dupCharFrac(col("__lines")))
      .withColumn("dup_paragraph_char_frac", dupCharFrac(col("__paras")))
      .withColumn("bullet_line_frac", lineFrac(l => l.rlike("^[-*•]")))
      .withColumn("ellipsis_line_frac", lineFrac(l => l.rlike("(\\.\\.\\.|…)$")))
      .withColumn("mean_word_len", meanWordLen(col("__w")))
      .withColumn("symbol_word_ratio", symbolWordRatio(col("__text"), col("__w")))
      .withColumn("n_words", size(col("__w")))
      .withColumn("alpha_word_frac", alphaWordFrac(col("__w")))
      .withColumn("n_stop_hits", stopHits(col("__w")))
      // Character count of the normalized token stream — the
      // denominator of the char-weighted modal n-gram fractions (same
      // single-space joining as the gram strings themselves).
      .withColumn("__doclen", length(concat_ws(" ", col("__w"))))
      .withColumn("__grams",
        concat(gramStructs(2), gramStructs(3), gramStructs(4)))
    val scalars = Seq("dup_line_frac", "dup_paragraph_frac",
      "dup_line_char_frac", "dup_paragraph_char_frac",
      "bullet_line_frac", "ellipsis_line_frac",
      "mean_word_len", "symbol_word_ratio",
      "n_words", "alpha_word_frac", "n_stop_hits", "__doclen")
    def topFrac(n: Int): Column = {
      val top = coalesce(
        max(when(col("__n") === n && col("c") >= 2, col("c") * length(col("__gram")))),
        lit(0L)).cast("double")
      val dl = first(col("__doclen")).cast("double")
      when(dl > 0, top / dl).otherwise(lit(0.0)).as(s"top_${n}gram_frac")
    }
    base
      .select(Seq(col("doc_id")) ++ scalars.map(col) :+
        posexplode_outer(col("__grams")).as(Seq("__i", "__g")): _*)
      .select(Seq(col("doc_id")) ++ scalars.map(col) :+
        col("__g.n").as("__n") :+ col("__g.g").as("__gram"): _*)
      .groupBy("doc_id", "__n", "__gram")
      .agg(scalars.map(s => first(col(s)).as(s)).head,
        scalars.map(s => first(col(s)).as(s)).tail :+ count(lit(1)).as("c"): _*)
      .groupBy("doc_id")
      .agg(scalars.map(s => first(col(s)).as(s)).head,
        (scalars.map(s => first(col(s)).as(s)).tail :+
          topFrac(2) :+ topFrac(3) :+ topFrac(4)): _*)
      .withColumn("keep",
        col("dup_line_frac") < 0.30 &&
          col("dup_paragraph_frac") < 0.30 &&
          col("dup_line_char_frac") < 0.20 &&
          col("dup_paragraph_char_frac") < 0.20 &&
          col("top_2gram_frac") < 0.20 &&
          col("top_3gram_frac") < 0.18 &&
          col("top_4gram_frac") < 0.16 &&
          col("symbol_word_ratio") < 0.10 &&
          col("bullet_line_frac") < 0.90 &&
          col("ellipsis_line_frac") < 0.30 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("alpha_word_frac") >= minAlphaFrac &&
          col("n_stop_hits") >= minStopHits)
      .select(Seq(col("doc_id"), col("dup_line_frac"), col("dup_paragraph_frac"),
        col("dup_line_char_frac"), col("dup_paragraph_char_frac"),
        col("top_2gram_frac"), col("top_3gram_frac"), col("top_4gram_frac"),
        col("symbol_word_ratio"), col("bullet_line_frac"),
        col("ellipsis_line_frac"), col("mean_word_len"),
        col("n_words"), col("alpha_word_frac"), col("n_stop_hits"),
        col("keep")): _*)
  }

  /**
   * Train/eval n-gram decontamination: a training document is
   * contaminated if any of its word n-grams appears in the evaluation
   * corpus. Output: one row per train doc with the count of its distinct
   * n-grams found in eval and the contamination flag.
   *
   * Scale shape: the eval side is small BY CONSTRUCTION (benchmarks are
   * KBs-MBs against a 100 TB corpus), so its distinct n-gram digests are
   * broadcast and the probe is a map-side broadcast join on the train
   * side; only (doc_id, hit) pairs reach the count shuffle. N-grams
   * travel as md5 digests, never as text — and md5 keeps the whole stage
   * replayable by the SQL oracle.
   */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val evalGrams = eval.select(toks(col(textCol)).as("__w"))
      .select(explode(gramDigests("__w", n)).as("__g")).distinct()
      .withColumn("__hit", lit(1))
    train.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__w"))
      .select(col("doc_id"), posexplode_outer(gramDigests("__w", n)).as(Seq("__i", "__g")))
      .join(broadcast(evalGrams), Seq("__g"), "left")
      .groupBy("doc_id")
      .agg(count(when(col("__hit").isNotNull, 1)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /**
   * C4-style line cleaning (Raffel et al. 2020, §2.2): keep only lines
   * that end in terminal punctuation (period / ! / ? / closing quote),
   * carry at least `minLineWords` words, and do not mention
   * "javascript"; rejoin the survivors. Pure per-row array work — no
   * shuffle, no UDF — and exactly replayable (the line predicate is
   * split/trim/regex both engines share).
   */
  def c4LineClean(c: Column, minLineWords: Int = 5): Column =
    array_join(filter(split(c, "\n"), l =>
      trim(l).rlike("[.!?\"']$") &&
        size(filter(split(trim(l), graft.functions.text.WhitespaceRun), t => t =!= "")) >= minLineWords &&
        !lower(l).contains("javascript")), "\n")

  /** Intra-document line dedup — the within-page sibling of
    * [[c4LineClean]] (navigation bars, repeated boilerplate footers,
    * scraped menus duplicate lines INSIDE one page; cross-page
    * duplication is [[graft.operators.SpanDedup]]'s job): keep each
    * non-blank line's FIRST occurrence, preserving order. Pure
    * higher-order-function column algebra (zip_with over the line array
    * and its index, keep where array_position == index) — map-only,
    * whole-stage codegen, no shuffle, no UDF. Per-doc cost is O(L²)
    * over the LINE count, which is bounded per document — the right
    * trade at corpus scale where avoiding a shuffle dominates. */
  def dedupLines(c: Column): Column = {
    val lines = filter(split(c, "\n"), l => trim(l) =!= "")
    array_join(
      transform(
        filter(zip_with(lines, sequence(lit(1), size(lines)),
            (l, i) => struct(l.as("l"), i.as("i"))),
          p => array_position(lines, p.getField("l")) === p.getField("i")),
        p => p.getField("l")),
      "\n")
  }

  /**
   * CROSS-document boilerplate line removal (the RefinedWeb / MassiveText
   * recipe next to [[dedupLines]]'s within-page form): a line whose
   * trimmed text appears in ≥ `minDocs` DISTINCT documents is navigation /
   * footer / cookie-banner furniture, not content, and is scrubbed from
   * every document — while within-page repetition alone (handled by
   * [[dedupLines]]) stays untouched here.
   *
   * Scale shape — document text NEVER rides an exchange:
   *  1. line digests: one map-only pass emits (id, md5(trim(line)))
   *     pairs; the doc-frequency count shuffles 16-byte digests only
   *     (distinct per (id, digest), then a digest-keyed count).
   *  2. the frequent set (df ≥ minDocs) is boilerplate-sized; it joins
   *     BACK to the per-doc digest stream and folds to one
   *     (id, scrub_digests) row per affected document — again digests
   *     only through the exchange.
   *  3. the scrub itself is IN PLACE: the affected-docs relation
   *     (typically a small fraction of the corpus… or broadcast-sized
   *     per-doc digest lists even when every doc is affected) joins the
   *     corpus on id, and a higher-order filter drops lines whose digest
   *     is in the doc's own scrub list — map-side column algebra in
   *     whole-stage codegen, no UDF, no text reassembly exchange.
   * Whitespace-only lines are structural, not content: they never count
   * toward df and are never scrubbed.
   *
   * Returns (idCol, n_lines, n_kept, textCol-scrubbed) — n_lines/n_kept
   * count non-empty trimmed lines before/after.
   */
  def scrubBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                            minDocs: Int): DataFrame = {
    val docDigests = lineDigests(docs, idCol, textCol)
    val frequent = docDigests.groupBy("__d")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("__d")
    scrubWithFrequent(docs, idCol, textCol, docDigests, frequent)
  }

  /** (idCol, __d) pairs — one row per (doc, distinct non-blank trimmed
    * line), 16-byte md5 digests only. Shared by the batch scrub and
    * [[graft.operators.LineStore]]'s incremental form. */
  private[operators] def lineDigests(docs: DataFrame, idCol: String,
                                     textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(filter(split(col(textCol), "\n"), l => trim(l) =!= "")).as("__l"))
      .select(col(idCol), lineDigest(col("__l")).as("__d"))
      .distinct()

  private[operators] def lineDigest(l: Column): Column =
    md5(trim(l).cast("binary"))

  /** The in-place scrub tail given the frequent set: fold the doc's own
    * frequent digests to one list per affected doc (digests-only
    * exchange), join back on id, higher-order filter in codegen. */
  private[operators] def scrubWithFrequent(docs: DataFrame, idCol: String,
                                           textCol: String, docDigests: DataFrame,
                                           frequent: DataFrame): DataFrame = {
    val lineArr = split(col(textCol), "\n")
    val scrubLists = docDigests.join(frequent, "__d")
      .groupBy(idCol).agg(collect_set(col("__d")).as("__scrub"))
    val kept = filter(lineArr, l =>
      trim(l) === "" || !array_contains(col("__scrub"), lineDigest(l)))
    docs.join(scrubLists, Seq(idCol), "left")
      .select(col(idCol),
        size(filter(lineArr, l => trim(l) =!= "")).as("n_lines"),
        when(col("__scrub").isNull, size(filter(lineArr, l => trim(l) =!= "")))
          .otherwise(size(filter(kept, l => trim(l) =!= ""))).as("n_kept"),
        when(col("__scrub").isNull, col(textCol))
          .otherwise(array_join(kept, "\n")).as(textCol))
  }

  /** C4's document-level flags: "lorem ipsum" boilerplate and curly
    * braces (code); callers combine them with a retained-line minimum
    * (C4's "at least 3 sentences") for the page-level drop decision. */
  def c4DocFlags(c: Column): Column = struct(
    lower(c).contains("lorem ipsum").as("has_lorem"),
    c.contains("{").as("has_brace"))

  /**
   * First step of BPE tokenizer training (Sennrich et al. 2016):
   * corpus-wide counts of adjacent symbol pairs, weighted by word
   * frequency. Computed the classic way — over the distinct-word
   * frequency dictionary, NOT a rescan of the corpus — so the heavy
   * text scan happens once (vocab build) and the pair stage runs on
   * vocab-sized data; each subsequent merge iteration of a full BPE
   * trainer reuses the same dict shape. Deterministic ties: count
   * desc, pair asc; the final top-k is a TakeOrderedAndProject, never
   * a global sort of the pair space.
   */
  def bpePairCounts(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(toks(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(col("f"), explode(expr(
        "CASE WHEN length(w) >= 2 THEN transform(sequence(1, length(w) - 1)," +
          " i -> substring(w, i, 2)) ELSE array() END")).as("pair"))
      .groupBy("pair").agg(sum(col("f")).as("cnt"))
      .orderBy(desc("cnt"), col("pair"))
      .limit(k)

  /**
   * BPE merge LOOP (tokenizer training step 2, Sennrich et al. 2016
   * `learn_bpe`): starting from words as character sequences, repeatedly
   * (a) count adjacent symbol pairs weighted by word frequency,
   * (b) take the argmax (count desc, then pair asc — the deterministic
   * tie-break), (c) apply the merge to every word greedily
   * left-to-right, for `merges` iterations. Output is the ordered merge
   * table (merge_rank, l_sym, r_sym, cnt) — the artifact a BPE
   * tokenizer ships.
   *
   * Scale shape: the corpus is scanned ONCE (the word-frequency dict of
   * [[bpePairCounts]]); every iteration runs two vocab-sized jobs — a
   * pair-count aggregation and a one-row TakeOrderedAndProject argmax —
   * on the persisted dict, never a corpus rescan. Words ride as
   * space-delimited symbol strings so the merge application is a single
   * codegen `replace` (non-overlapping left-to-right — exactly the
   * greedy BPE semantics, identical in the DuckDB oracle); each
   * iteration's dict is materialized before its parent is unpersisted,
   * so lineage stays one step deep across any number of merges.
   */
  def bpeMerges(docs: DataFrame, textCol: String, merges: Int,
                dictPartitions: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    val (out, _) = bpeTrain(docs, textCol, merges, keepDict = false, dictPartitions)
    spark.createDataFrame(out).toDF("merge_rank", "l_sym", "r_sym", "cnt")
  }

  /**
   * Tokenizer step 3 — ENCODE the corpus under the vocabulary the merge
   * loop learned: per document, the word count and the BPE token count
   * (each word contributes the length of its final symbol segmentation).
   * The segmentation lives in the word dict, so encoding is one
   * broadcast join of the corpus's (doc, word) pairs against the
   * vocab-sized dict — the corpus text is scanned once for the dict and
   * once for the encode; no per-merge corpus work ever happens.
   * The compression ratio n_bpe_tokens / n_chars is THE tokenizer
   * training feedback metric at 100 TB.
   */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String, merges: Int,
                dictPartitions: Int = 1): DataFrame = {
    val (_, dict) = bpeTrain(docs, textCol, merges, keepDict = true, dictPartitions)
    val perWord = dict.select(col("w0"),
      size(filter(split(trim(col("w")), " "), s => s =!= "")).as("nt"))
    docs.select(col(idCol).as("doc_id"), explode_outer(toks(col(textCol))).as("w0"))
      .join(broadcast(perWord), Seq("w0"), "left")
      .groupBy("doc_id")
      .agg(count(col("w0")).as("n_words"),
        coalesce(sum("nt"), lit(0)).cast("long").as("n_bpe_tokens"))
  }

  /**
   * Train-once-store: persist the tokenizer artifacts [[bpeTrain]]
   * produces — the ordered merge table and the final word dict — as two
   * [[graft.sources.TableSink]] tables (`dir/merges`, `dir/dict`), the
   * production split of Sennrich et al. 2016's `learn_bpe` (here) from
   * `apply_bpe` ([[bpeEncodeStored]]): the corpus is scanned for
   * training ONCE, ever; every future batch encodes under the stored
   * vocabulary without touching the training corpus again. Both tables
   * are vocab-sized (the merge table is ≤ `merges` rows by contract),
   * so the store is a bulk-maintenance artifact like a model file, not
   * data. The merge count is pinned in the merges table's manifest meta
   * so a consumer can assert which vocabulary it decodes under.
   */
  def bpeStore(spark: org.apache.spark.sql.SparkSession, dir: String,
               docs: DataFrame, textCol: String, merges: Int,
               dictPartitions: Int = 1): Unit = {
    import graft.sources.TableSink
    val (out, dict) = bpeTrain(docs, textCol, merges, keepDict = true, dictPartitions)
    val mergesDf = spark.createDataFrame(out)
      .toDF("merge_rank", "l_sym", "r_sym", "cnt")
    TableSink.overwrite(spark, s"$dir/merges", mergesDf, Seq("merge_rank"),
      numBuckets = 1, meta = Some(s"bpe:v1;merges=${out.length}"))
    TableSink.overwrite(spark, s"$dir/dict", dict, Seq("w0"),
      meta = Some(s"bpe:v1;merges=${out.length}"))
  }

  /**
   * ENCODE a new batch under a STORED vocabulary ([[bpeStore]]) without
   * retraining — same output shape as [[bpeEncode]]. Words present in
   * the stored dict reuse their stored segmentation; UNSEEN words are
   * segmented by replaying the stored merge table in rank order
   * (`apply_bpe`: start from the character sequence, apply each learned
   * merge greedily left-to-right — byte-for-byte the operation the
   * trainer ran, so a word's replayed segmentation is IDENTICAL to what
   * the dict would have stored had the word been in the training
   * corpus; spec-pinned over the whole dict).
   *
   * Scale shape: the batch text is scanned once; per-word work joins
   * the batch's vocab against the broadcast stored dict, and the merge
   * replay is ONE codegen `aggregate` fold over a literal merge array
   * (driver-collected — bounded ≤ 10000 rows by [[bpeTrain]]'s
   * contract), evaluated only for dict misses (`coalesce`
   * short-circuits). No corpus-sized state is ever read — the stored
   * tables are vocab-sized, which the spec pins with a file-count
   * assertion.
   */
  def bpeEncodeStored(spark: org.apache.spark.sql.SparkSession, dir: String,
                      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.sources.TableSink
    require(TableSink.tableExists(s"$dir/merges") && TableSink.tableExists(s"$dir/dict"),
      s"no stored BPE vocabulary at '$dir' — train one with bpeStore first")
    val dictLike = spark.range(0).select(
      lit("").as("w0"), lit("").as("w"), lit(0L).as("f"))
    val dict = TableSink.read(spark, s"$dir/dict", dictLike).select("w0", "w")
    val mLike = spark.range(0).select(lit(0).as("merge_rank"),
      lit("").as("l_sym"), lit("").as("r_sym"), lit(0L).as("cnt"))
    val ms = TableSink.read(spark, s"$dir/merges", mLike)
      .select("merge_rank", "l_sym", "r_sym")
      .collect().sortBy(_.getInt(0))
    // The replay fold: init = the double-space-delimited char sequence
    // (the trainer's exact representation, see bpeTrain), one `replace`
    // per stored merge — a single expression regardless of merge count,
    // so a 10k-merge vocab does not become a 10k-node plan.
    val spaced = concat(lit("  "),
      array_join(filter(split(col("w0"), ""), s => s =!= ""), "  "), lit("  "))
    val replayed =
      if (ms.isEmpty) spaced
      else aggregate(
        array(ms.toIndexedSeq.map(r => struct(lit(r.getString(1)).as("l"),
          lit(r.getString(2)).as("r"))): _*),
        spaced,
        (acc, m) => replace(acc,
          concat(lit(" "), m.getField("l"), lit("  "), m.getField("r"), lit(" ")),
          concat(lit(" "), m.getField("l"), m.getField("r"), lit(" "))))
    val batchWords = docs.select(col(idCol).as("doc_id"),
      explode_outer(toks(col(textCol))).as("w0"))
    val perWord = batchWords.filter(col("w0").isNotNull).select("w0").distinct()
      .join(broadcast(dict), Seq("w0"), "left")
      .select(col("w0"), size(filter(
        split(trim(coalesce(col("w"), replayed)), " "), s => s =!= "")).as("nt"))
    batchWords.join(broadcast(perWord), Seq("w0"), "left")
      .groupBy("doc_id")
      .agg(count(col("w0")).as("n_words"),
        coalesce(sum("nt"), lit(0)).cast("long").as("n_bpe_tokens"))
  }

  /** Shared BPE trainer (see [[bpeMerges]] for the algorithm and scale
    * notes): returns the ordered merge table and — when `keepDict` — the
    * final (w0, w, f) dict, lineage-truncated so consumers don't replay
    * the merge chain per use.
    *
    * Driver-pacing escalation (the [[StoryOps.greedyMatch]] cap idiom in
    * reverse): the word dict is vocab-sized — it does NOT grow with the
    * corpus — so when it fits the driver cap the ENTIRE merge loop folds
    * locally (identical greedy semantics, spec-pinned ≡ the distributed
    * form), turning a production-scale merge count (capped at 10k here)
    * from one sequential driver-paced Spark job per merge into one
    * collect + a local fold. Only a dict past `maxLocalDict` rows pays
    * the distributed per-merge loop (two vocab-sized jobs per merge).
    * The corpus is scanned ONCE either way — the dict aggregation
    * checkpoints before the overflow probe, so the escalation path
    * reads blocks, never the corpus again. */
  private[graft] def bpeTrain(docs: DataFrame, textCol: String, merges: Int,
                       keepDict: Boolean, dictPartitions: Int = 1,
                       maxLocalDict: Int = 1 << 20)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(merges >= 1 && merges <= 10000, s"merges out of range: $merges")
    require(dictPartitions >= 1, s"dictPartitions must be >= 1: $dictPartitions")
    // Words ride as DOUBLE-space-delimited symbol strings: the merge
    // pattern " l  r " keeps one delimiter space on each side, so
    // token-adjacent occurrences never share a consumed character and a
    // single non-overlapping left-to-right `replace` is EXACTLY the
    // token-level greedy merge of Sennrich's learn_bpe (single-space
    // delimiters would silently skip every second merge in runs like
    // [b,a,n,a,n,a] → checked in CurationSpec).
    // The dict aggregation (the ONE corpus scan) materializes once via
    // localCheckpoint; both the overflow probe and — on escalation —
    // the distributed loop read the checkpointed blocks, so neither
    // path re-scans the corpus. Dropped blocks are reclaimed by the
    // ContextCleaner once unreferenced (vocab-sized).
    val dictDf = docs.select(explode(toks(col(textCol))).as("w0"))
      .groupBy("w0").agg(count(lit(1)).as("f"))
      .select(col("w0"), concat(lit("  "),
        array_join(filter(split(col("w0"), ""), s => s =!= ""), "  "),
        lit("  ")).as("w"), col("f"))
      .localCheckpoint(true)
    val probeLimit =
      if (maxLocalDict >= Int.MaxValue - 1) Int.MaxValue else maxLocalDict + 1
    val fetched = dictDf.limit(probeLimit).collect()
    if (fetched.length <= maxLocalDict)
      bpeTrainLocal(docs.sparkSession, fetched, merges, keepDict)
    else bpeTrainDistributed(dictDf, merges, keepDict, dictPartitions)
  }

  /** Spark-string sort order (UTF8 binary over UTF-8 bytes) — the local
    * fold's tie-breaks must reproduce the distributed
    * `orderBy(col("l"), col("r"))` exactly, and Java's UTF-16 compareTo
    * diverges from it above the BMP. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The merge loop as one driver-local fold over the collected dict —
    * exact same greedy semantics as [[bpeTrainDistributed]] (argmax by
    * (cnt desc, l asc, r asc) in Spark's string order; merges applied
    * left-to-right non-overlapping). Pair-count UPDATES are incremental
    * — each merge rewrites only the words containing the merged pair
    * (an inverted pair→words index) — while the per-merge ARGMAX is one
    * in-memory scan of the live pair map (byte-compares only on count
    * ties): at the 10k-merge cap over a cap-sized dict that is ~10^10
    * map visits worst-case, still minutes where the per-merge-Spark-job
    * loop pays scheduler latency alone in hours; a count-bucketed
    * argmax is the next rung if a profile ever demands it. */
  private def bpeTrainLocal(spark: org.apache.spark.sql.SparkSession,
                            rows: Array[org.apache.spark.sql.Row],
                            merges: Int, keepDict: Boolean)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    import scala.collection.mutable
    val n = rows.length
    val w0s = new Array[String](n)
    val fs = new Array[Long](n)
    val syms = new Array[Array[String]](n)
    val cnt = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def pairsOf(s: Array[String]): Iterator[(String, String)] =
      if (s.length < 2) Iterator.empty
      else (0 until s.length - 1).iterator.map(j => (s(j), s(j + 1)))
    var i = 0
    while (i < n) {
      w0s(i) = rows(i).getString(0)
      fs(i) = rows(i).getLong(2)
      // Column 1 is the double-space-delimited form; the symbol array is
      // equivalent and what the fold mutates.
      syms(i) = rows(i).getString(1).trim.split(" ").filter(_.nonEmpty)
      pairsOf(syms(i)).foreach { p =>
        cnt.update(p, cnt.getOrElse(p, 0L) + fs(i))
        where.getOrElseUpdate(p, mutable.Set.empty) += i
      }
      i += 1
    }
    def applyMerge(s: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < s.length) {
        if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
          out += (l + r); j += 2
        } else { out += s(j); j += 1 }
      }
      out.toArray
    }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= merges && cnt.nonEmpty) {
      var bl: String = null; var br: String = null; var bc = -1L
      cnt.foreach { case ((l, r), c) =>
        if (c > bc || (c == bc &&
            (utf8Lt(l, bl) || (l == bl && utf8Lt(r, br))))) {
          bl = l; br = r; bc = c
        }
      }
      out += ((rank, bl, br, bc))
      val touched = where.getOrElse((bl, br), mutable.Set.empty).toArray
      touched.foreach { wid =>
        val old = syms(wid)
        val merged = applyMerge(old, bl, br)
        syms(wid) = merged
        val oldPairs = pairsOf(old).toSeq
        val newPairs = pairsOf(merged).toSeq
        oldPairs.foreach { p =>
          val c = cnt(p) - fs(wid)
          if (c == 0L) cnt.remove(p) else cnt.update(p, c)
        }
        newPairs.foreach { p =>
          cnt.update(p, cnt.getOrElse(p, 0L) + fs(wid))
        }
        (oldPairs.toSet -- newPairs.toSet).foreach { p =>
          where.get(p).foreach { s => s -= wid; if (s.isEmpty) where.remove(p) }
        }
        (newPairs.toSet -- oldPairs.toSet).foreach { p =>
          where.getOrElseUpdate(p, mutable.Set.empty) += wid
        }
      }
      rank += 1
    }
    val kept =
      if (!keepDict) null
      else spark.createDataFrame(
        (0 until n).map(j => (w0s(j), syms(j).mkString("  ", "  ", "  "), fs(j))))
        .toDF("w0", "w", "f")
    (out.toSeq, kept)
  }

  /** The per-merge distributed loop — the escalation for a word dict
    * past the driver cap. Two vocab-sized jobs per merge iteration on
    * the persisted dict, never a corpus rescan. */
  private def bpeTrainDistributed(dictDf: DataFrame, merges: Int,
                                  keepDict: Boolean, dictPartitions: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    // coalesce(dictPartitions), default 1: the dict is vocab-sized, so
    // every iteration's two jobs should be single-task — 32-way task
    // scheduling would dominate the loop's wall time at any corpus scale
    // (the dict does not grow with the corpus). A genuinely huge vocab
    // (~10^6 distinct words) raises `dictPartitions` instead of editing
    // the source; the semantics don't depend on it.
    //
    // localCheckpoint (NOT persist) per generation: the chained
    // `withColumn(replace(...))` lineage makes the OPTIMIZED plan double
    // in size every iteration (measured: ~2 KB at merge 1, ~2 MB at
    // merge 12, OOM near merge 24 just BUILDING the plan string) — a
    // cached-but-lineage-carrying dict re-optimizes the whole chain per
    // argmax job. Cutting lineage to a materialized RDD keeps every
    // iteration's plan constant-size at any merge count. Dropped
    // generations' blocks are reclaimed by Spark's ContextCleaner once
    // unreferenced (vocab-sized each, bounded residency).
    var dict = dictDf
      .coalesce(dictPartitions)
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val best = dict
        .withColumn("syms", filter(split(trim(col("w")), " "), s => s =!= ""))
        .filter(size(col("syms")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("f").as("cnt"))
        .orderBy(desc("cnt"), col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word is a single symbol
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((rank, l, r, cnt))
        dict = dict
          .withColumn("w", replace(col("w"), lit(s" $l  $r "), lit(s" $l$r ")))
          .localCheckpoint(true)
        rank += 1
      }
    }
    val kept = if (keepDict) dict else null
    (out.toSeq, kept)
  }

  /**
   * Unigram token counts of a reference corpus — the model side of
   * [[unigramCrossEntropy]]. One aggregation; the result is vocab-sized
   * (bounded, broadcastable) at any corpus scale.
   */
  def unigramModel(reference: DataFrame, textCol: String): DataFrame =
    reference.select(explode(toks(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))

  /**
   * CCNet-style LM quality signal (Wenzek et al. 2020 bucket a crawl by
   * LM perplexity against a clean reference corpus): per-document
   * cross-entropy in nats/token under an add-1-smoothed UNIGRAM model
   * of the reference corpus,
   *
   *   H(doc) = ln(N + V) − (1/n) Σ_i ln(c(w_i) + 1),
   *
   * the deterministic, engine-replayable stand-in for CCNet's KenLM
   * 5-gram (a model artifact this engine treats like the other model
   * stand-ins): the same monotone unusual-token-mass signal, exact
   * replay. Unseen tokens contribute ln(0 + 1) = 0 — the model's full
   * ln(N + V) surprise via add-1 smoothing, not a special case.
   *
   * Scale shape: the model is one count aggregation (vocab-sized →
   * broadcast); scoring is a map-side broadcast probe + per-doc
   * aggregation — only (doc_id, token) rows reach the partial agg.
   * Token-less documents score 0 with n_tokens = 0 (callers gate keep
   * decisions on n_tokens, as the query does).
   */
  def unigramCrossEntropy(docs: DataFrame, model: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val totals = model.agg(sum(col("c")).as("__n"), count(lit(1)).as("__v"))
    docs.select(col(idCol).as("doc_id"), explode_outer(toks(col(textCol))).as("token"))
      .join(broadcast(model), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(col("token")).as("n_tokens"),
        sum(log(coalesce(col("c"), lit(0L)) + lit(1))).as("__s"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          log(col("__n") + col("__v")) - col("__s") / col("n_tokens"))
          .otherwise(lit(0.0)).as("cross_entropy"))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020 §4: split each
   * language's crawl into head/middle/tail thirds by LM score; the head
   * is the cleanest slice, the tail the noisiest): per-document bucket
   * assignment from per-language TERCILES of [[unigramCrossEntropy]]
   * (6-decimal-rounded — the engine-stable decision value).
   *
   * Thresholds ride the partial-combinable percentile sketch
   * ([[SampleOps.quantileTrim]]'s accuracy contract: rank-exact while a
   * language's doc count stays ≤ `accuracy`, i.e. Spark's documented
   * "smallest x with cdf ≥ q"), and come back as a BROADCAST of one
   * tiny row per language — the corpus never shuffles on anything but
   * the (doc, token) scoring aggregation that cross-entropy itself
   * needs. Token-less documents can't be scored and get their own
   * `empty` bucket rather than polluting `head` with ce = 0 rows.
   */
  def pplBuckets(docs: DataFrame, model: DataFrame, idCol: String,
                 textCol: String, langCol: String,
                 accuracy: Int = 1 << 20): DataFrame = {
    val ce = unigramCrossEntropy(docs, model, idCol, textCol)
      .select(col("doc_id"), col("n_tokens"),
        round(col("cross_entropy"), 6).as("__ce"))
    val scored = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
      .join(ce, "doc_id")
    val thr = scored.filter(col("n_tokens") > 0)
      .groupBy("lang")
      .agg(percentile_approx(col("__ce"), lit(1.0 / 3), lit(accuracy)).as("__t1"),
        percentile_approx(col("__ce"), lit(2.0 / 3), lit(accuracy)).as("__t2"))
    scored.join(broadcast(thr), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("__ce").as("cross_entropy"),
        when(col("n_tokens") === 0, lit("empty"))
          .when(col("__ce") <= col("__t1"), lit("head"))
          .when(col("__ce") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /**
   * Completion-only loss masking for instruction-tuning data (the SFT
   * prep step every chat-format pipeline runs: loss applies ONLY to
   * assistant tokens, never to user/prompt tokens — training on prompts
   * teaches the model to parrot users): given role-marked text
   * (`user:` / `assistant:` marker tokens), emit one row per LOSS SPAN —
   * the token ranges following each `assistant:` marker up to the next
   * marker (1-based inclusive [s, e] over the whitespace token stream).
   * Multi-turn by construction; empty spans (marker immediately followed
   * by another marker or end) drop.
   *
   * Map-only column algebra — marker positions, their successors, and
   * the span arithmetic all run inside one codegen projection
   * (zip_with/filter/transform); the explode emits spans-count rows.
   */
  def lossSpans(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val n = size(t)
    val marked = filter(
      zip_with(t, sequence(lit(1), n), (tok, i) => struct(tok.as("r"), i.as("p"))),
      s => s.getField("r").isin("user:", "assistant:"))
    val padded = concat(
      slice(marked, lit(2), greatest(size(marked) - 1, lit(0))),
      array(struct(lit("").as("r"), (n + 1).as("p"))))
    val spans = filter(
      transform(
        filter(zip_with(marked, padded,
          (a, b) => struct(a.getField("r").as("r"), a.getField("p").as("p"),
            b.getField("p").as("np"))),
          x => x.getField("r") === "assistant:"),
        x => struct((x.getField("p") + 1).as("s"), (x.getField("np") - 1).as("e"))),
      sp => sp.getField("s") <= sp.getField("e"))
    docs.select(col(idCol), n.as("n_tokens"), explode(spans).as("__sp"))
      .select(col(idCol), col("n_tokens"),
        col("__sp.s").as("s"), col("__sp.e").as("e"))
  }

  /**
   * Bigram counts of a reference corpus — the second-order companion to
   * [[unigramModel]], one step toward CCNet's KenLM n-gram artifact.
   * One explode of adjacent-token pairs → one (w1, w2) count
   * aggregation with map-side partials. The result is bounded by the
   * reference's distinct-bigram count (vocab², in practice Zipf-sparse);
   * `minCount` prunes the long tail so the broadcast-model contract
   * stays honest when the reference grows — a pruned bigram simply
   * backs off to the unigram leg in [[bigramCrossEntropy]].
   */
  def bigramModel(reference: DataFrame, textCol: String,
                  minCount: Long = 1L): DataFrame =
    reference.select(toks(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)

  /**
   * Per-document cross-entropy under a Jelinek–Mercer–interpolated
   * bigram LM of the reference corpus — the next rung of the CCNet
   * ladder above [[unigramCrossEntropy]] (Wenzek et al. 2020 score with
   * a KenLM 5-gram; the interpolated bigram captures the same
   * word-order signal the unigram is blind to, deterministically and
   * engine-replayably):
   *
   *   H(doc) = −(1/(n−1)) Σ_{i=2..n} ln( wBigram · c2(w_{i−1}, w_i)/c1(w_{i−1})
   *                                     + wUnigram · (c1(w_i)+1)/(N+V) )
   *
   * An unseen context (c1(w_{i−1}) = 0 — possible because the reference
   * is a separate corpus, not the scored docs) zeroes the bigram leg;
   * the add-1 unigram leg keeps every transition strictly positive, so
   * ln never sees 0. `wBigram`/`wUnigram` are taken as two literals
   * (not λ and 1−λ) so the oracle's decimal weights replay bit-for-bit.
   *
   * Scale shape: both models broadcast (vocab- and pruned-bigram-
   * bounded); scoring is THREE map-side broadcast probes on the
   * (doc, pair) stream + one per-doc aggregation — the corpus never
   * shuffles on anything but doc_id partials. Documents with < 2 tokens
   * have no transitions: n_pairs = 0, cross_entropy = 0 (callers gate
   * on n_pairs, as the query does).
   */
  def bigramCrossEntropy(docs: DataFrame, uniModel: DataFrame, biModel: DataFrame,
                         idCol: String, textCol: String,
                         wBigram: Double = 0.7, wUnigram: Double = 0.3): DataFrame = {
    val totals = uniModel.agg(sum(col("c")).as("__n"), count(lit(1)).as("__v"))
    val t = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__t"))
    // Docs with < 2 tokens contribute no pair rows; the doc_id spine
    // left-join below restores them with n_pairs = 0.
    val pairs = t.filter(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__p"))
      .select(col("doc_id"), col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val scored = pairs
      .join(broadcast(biModel), Seq("w1", "w2"), "left")
      .join(broadcast(uniModel.select(col("token").as("w1"), col("c").as("__c1"))),
        Seq("w1"), "left")
      .join(broadcast(uniModel.select(col("token").as("w2"), col("c").as("__cw"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum(log(
          lit(wBigram) * when(col("__c1").isNull, lit(0.0))
            .otherwise(coalesce(col("c2"), lit(0L)).cast("double") / col("__c1")) +
          lit(wUnigram) * (coalesce(col("__cw"), lit(0L)) + lit(1)).cast("double") /
            (col("__n") + col("__v")))).as("__s"))
    t.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("n_pairs").isNull, lit(0.0))
          .otherwise(-col("__s") / col("n_pairs")).as("cross_entropy"))
  }

  /**
   * Hashed n-gram feature instances — the DSIR feature map (Xie et al.
   * 2023 §3: bag of hashed unigrams + bigrams): one row per feature
   * OCCURRENCE, bucketed by md5 into a space bounded by `buckets`
   * regardless of vocabulary, so any model built over it is
   * broadcastable by construction. Map-only (tokenize → two explodes);
   * the `u|`/`b|` prefixes keep a unigram from colliding with a bigram
   * of the same spelling before the hash.
   */
  def hashedNgramFeatures(df: DataFrame, idCol: String, textCol: String,
                          buckets: Int): DataFrame = {
    val w = df.select(col(idCol).as("__id"), toks(col(textCol)).as("__t"))
    val n1 = greatest(size(col("__t")) - 1, lit(0))
    val uni = w.select(col("__id"),
      explode(transform(col("__t"), t => concat(lit("u|"), t))).as("__f"))
    val bi = w.select(col("__id"),
      explode(zip_with(
        slice(col("__t"), lit(1), n1), slice(col("__t"), lit(2), n1),
        (a, b) => concat(lit("b|"), a, lit(" "), b))).as("__f"))
    uni.unionByName(bi).select(col("__id"),
      graft.functions.sig.md5BucketCol(col("__f"), buckets).as("bucket"))
  }

  /**
   * DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
   * score each raw document by how much likelier its hashed n-gram
   * features are under a bag-of-words model of the TARGET distribution
   * than under one of the raw pool itself,
   *
   *   log w(doc) = Σ_f [ ln((ct[h(f)]+1)/(Nt+B)) − ln((cr[h(f)]+1)/(Nr+B)) ],
   *
   * summed over the doc's feature instances (add-1 smoothing on both
   * models; B = `buckets`). Selection downstream samples ∝ w without
   * replacement via deterministic Gumbel keys — see the `x_dsir_sample`
   * query. This is the published scalable alternative to model-based
   * classifiers when the target is "data that looks like this corpus"
   * rather than a labeled quality judgment.
   *
   * Scale shape: two passes, inherent to the algorithm (the models must
   * be complete before any document is scored). Pass 1 builds both
   * bucket-count models — bounded aggregations, ≤ B rows each — and the
   * λ = log-ratio table joins them driver-free (counts → one broadcast
   * table). Pass 2 re-explodes the raw side and probes λ by broadcast;
   * the only corpus-sized exchange carries (id, bucket) pairs into the
   * per-doc sum. Raw documents with no tokens score 0 (the neutral
   * weight) via the left join back onto the id spine.
   */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets >= 2: $buckets")
    val rf = hashedNgramFeatures(raw, idCol, textCol, buckets)
    val tf = hashedNgramFeatures(target, idCol, textCol, buckets)
    val rc = rf.groupBy("bucket").agg(count(lit(1)).as("__cr"))
    val tc = tf.groupBy("bucket").agg(count(lit(1)).as("__ct"))
    val totals = rc.agg(coalesce(sum(col("__cr")), lit(0L)).as("__nr"))
      .crossJoin(tc.agg(coalesce(sum(col("__ct")), lit(0L)).as("__nt")))
    // Every bucket a raw doc can probe appears in rc (its own counts),
    // so a left join from rc covers the full probe domain; target-only
    // buckets are unreachable from the raw side by construction.
    val lam = rc.join(tc, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("__ct"), lit(0L)) + lit(1)) / (col("__nt") + lit(buckets))) -
          log((col("__cr") + lit(1)) / (col("__nr") + lit(buckets)))).as("__lambda"))
    val perDoc = rf.join(broadcast(lam), "bucket")
      .groupBy("__id").agg(sum(col("__lambda")).as("__lw"))
    raw.select(col(idCol))
      .join(perDoc, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        round(coalesce(col("__lw"), lit(0.0)), 6).as("log_weight"))
  }

  /**
   * Semantic (embedding-space) decontamination — the complement of the
   * n-gram [[decontaminate]]: a training example is suspect when its
   * embedding lies within `threshold` cosine of ANY evaluation
   * example's, catching paraphrased leakage that exact n-gram matching
   * misses. The eval side is small by construction (benchmarks vs a
   * corpus) and is broadcast; the cosine sweep is map-only over the
   * training side and the per-example max is a map-side-partial
   * aggregation — nothing corpus-sized shuffles.
   *
   * @return (idCol, max_sim, contaminated) — one row per training
   *         example, max_sim 0.0 when the eval set is empty.
   */
  def decontaminateByEmbedding(train: DataFrame, eval: DataFrame, idCol: String,
                               vecCol: String, threshold: Double): DataFrame = {
    val t = train.select(col(idCol), col(vecCol).cast("array<double>").as("__tv"))
    val e = eval.select(col(vecCol).cast("array<double>").as("__ev"))
    val best = t.crossJoin(broadcast(e))
      .select(col(idCol),
        graft.functions.vector.cosineSim(col("__tv"), col("__ev")).as("__sim"))
      .groupBy(idCol).agg(max(col("__sim")).as("max_sim"))
    train.select(col(idCol)).join(best, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("max_sim"), lit(0.0)).as("max_sim"),
        coalesce(col("max_sim") >= threshold, lit(false)).as("contaminated"))
  }

  // RE2-safe patterns (no lookaround) so the DuckDB oracle replays the
  // exact same redaction. Order matters: emails first (their dots would
  // otherwise feed the IP pattern), then IPs (their digits would feed
  // the phone pattern), then phones.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // No \s in the phone separator class: a class with whitespace matches
  // ANY digit run spanning spaces/newlines ("2019 2020 2021", score
  // tables), destructively over-redacting ordinary corpus text. Spaced
  // formats ("+1 (555) 010-1234") are handled by the SECOND,
  // structure-anchored pattern below instead.
  val PhonePattern = "\\+?\\d[\\d().-]{6,}\\d"
  // Spaced phone formats need whitespace separators, but an open-ended
  // class with \s would over-redact; this pattern's FIXED group shape —
  // optional 1-3 digit country code, then 3-3-4 digit groups, exactly
  // ONE mandatory separator between groups — cannot match open-ended
  // digit runs: year lists ("2019 2020 2021") and score tables have no
  // sep-aligned 3-3-4 decomposition, so they survive. Both ends are
  // anchored to a non-digit (consumed and restored via capture groups —
  // RE2 has no lookaround) so a phone-shaped PREFIX or SUFFIX of a
  // longer digit run never splits that run away from the contiguous
  // pass. Runs BEFORE the open-ended pattern — the contiguous pass
  // would otherwise eat the "010-1234" tail and break the structure
  // match. Known residual: two back-to-back spaced phones share the
  // boundary guard char, so the second leaks (no lookahead in RE2) —
  // under-redaction bounded to that corner, while free-text digit runs
  // stay untouched.
  val PhoneSpacedPattern =
    "(^|[^\\d])((\\+?\\d{1,3}[\\s.-])?\\(?\\d{3}\\)?[\\s.-]\\d{3}[\\s.-]\\d{4})([^\\d]|$)"

  /** Redact emails, IPv4 addresses and phone-shaped digit runs (spaced
    * formats first — see [[PhoneSpacedPattern]] — then contiguous runs).
    * Pure map-side codegen'd regex work: no shuffle, no UDF. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhoneSpacedPattern, "$1<PHONE>$4"),
      PhonePattern, "<PHONE>")

  /** Per-class PII hit counts (before redaction), for audit columns. */
  def piiCounts(c: Column): Column = struct(
    regexp_count(c, lit(EmailPattern)).as("emails"),
    regexp_count(c, lit(Ipv4Pattern)).as("ips"))

  /**
   * Corpus vocabulary head: the k most frequent tokens with counts —
   * the first statistic a tokenizer-training job computes. Map-side
   * partial counts before the one hash exchange, then a
   * TakeOrderedAndProject (never a global sort of the vocabulary).
   * Deterministic ties: count desc, token asc.
   */
  def vocabTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(toks(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("token"))
      .limit(k)

  /**
   * Script detection — the Unicode-block histogram that backs language
   * ID for non-Latin text (fastText-style ID starts from script; a
   * Cyrillic page is not going to be English no matter what its
   * stopwords hash to): per-document counts of LETTERS in the four
   * highest-volume blocks (Basic Latin letters, Cyrillic U+0400-04FF,
   * Greek U+0370-03FF, CJK Unified U+4E00-9FFF) via codegen'd
   * regexp_count — map-only, no UDF. Both regex engines (Java here, RE2
   * in the oracle) agree on explicit code-point classes.
   */
  def scriptCounts(c: Column): Column = struct(
    regexp_count(c, lit("[A-Za-z]")).cast("int").as("latin"),
    regexp_count(c, lit("[Ѐ-ӿ]")).cast("int").as("cyrillic"),
    regexp_count(c, lit("[Ͱ-Ͽ]")).cast("int").as("greek"),
    regexp_count(c, lit("[一-鿿]")).cast("int").as("han"))

  /** Dominant script from [[scriptCounts]]: argmax with the fixed
    * latin > cyrillic > greek > han tie order; `und` when no letter of
    * any tracked block occurs. */
  def dominantScript(counts: Column): Column = {
    val l = counts.getField("latin"); val cy = counts.getField("cyrillic")
    val g = counts.getField("greek"); val h = counts.getField("han")
    val top = greatest(l, cy, g, h)
    when(top === 0, lit("und"))
      .when(l === top, lit("latin"))
      .when(cy === top, lit("cyrillic"))
      .when(g === top, lit("greek"))
      .otherwise(lit("han"))
  }

  /**
   * Per-group salient terms by tf-idf — the "what is this source/domain
   * about" report a corpus datasheet ships next to the mixture weights
   * (and the signal domain-weighting recipes use to spot near-duplicate
   * sources). Each group (source, domain, language bucket) is treated as
   * one pseudo-document: tf = term occurrences within the group, idf =
   * ln(n_groups / group-frequency of the term), score = tf·idf, top-k
   * terms per group.
   *
   * Scale shape: ONE corpus-sized pass (the token explode) feeding one
   * (group, token) hash exchange with map-side partial counts —
   * everything downstream (group frequency, n_groups, scoring, the
   * top-k) derives from that vocab-×-groups-sized counts relation, which
   * is localCheckpointed because three consumers read it (tf, gf, and
   * the group count). The per-group top-k is a rank-ordered row_number
   * window that Spark executes as WindowGroupLimit — each group's
   * candidate set prunes map-side to k before the window's exchange.
   * Deterministic ties: rounded score desc, token asc.
   */
  def tfidfTerms(docs: DataFrame, groupCol: String, textCol: String, k: Int): DataFrame = {
    val tf = docs.select(col(groupCol).as("grp"), explode(toks(col(textCol))).as("token"))
      .groupBy("grp", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val gf = tf.groupBy("token").agg(count(lit(1)).as("gf"))
    val nGroups = tf.select(countDistinct(col("grp")).as("n_groups"))
    // ln over a count ratio is a smooth libm call (no decimal-structured
    // boundary); round 6 absorbs cross-engine last-ulp differences.
    val scored = tf.join(gf, "token").crossJoin(broadcast(nGroups))
      .select(col("grp").as(groupCol), col("token"), col("cnt"),
        round(col("cnt") * log(col("n_groups").cast("double") / col("gf")), 6).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(desc("tfidf"), col("token"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /**
   * URL canonicalization for web-corpus dedup: two crawls of one page
   * should collide on the canonical form. Chain (each step RE2-safe and
   * replayed by the SQL oracle, order load-bearing):
   *   1. drop the fragment,
   *   2. drop `utm_*` tracking params (then repair a `&` left dangling
   *      where the removed param was first in the query string),
   *   3. drop an explicit default port (`:80`/`:443`) — only when it
   *      sits at the end of the authority (`scheme://host:443/...`);
   *      a `:443` later in the path or query is someone's data, not a
   *      port, and must survive (a false strip would collide two
   *      distinct pages and silently drop one at the dedup step),
   *   4. lowercase the scheme+host prefix (never the path),
   *   5. drop one trailing `/`.
   * Pure map-side string work — the natural key for [[DedupOps]]
   * keep-first / exact-group dedup.
   */
  def canonicalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*", "")
    val noUtm = regexp_replace(noFrag, "[?&]utm_[A-Za-z_]*=[^&#]*", "")
    val repaired = regexp_replace(noUtm, "^([^?]*)&", "$1?")
    // Authority = optional userinfo (may itself contain ':') then either
    // a bracketed IPv6 literal or a colon-free host; only a port right
    // after THAT authority is stripped. RE2-safe (non-capturing groups,
    // no lookaround) so the oracle replays it verbatim.
    val noPort = regexp_replace(repaired,
      "^([^/?#]*//(?:[^/?#@]*@)?(?:\\[[^\\]]*\\]|[^/?#:@]*)):(80|443)([/?#]|$)", "$1$3")
    val prefix = regexp_extract(noPort, "^([^/?#]*//[^/?#]*)", 1)
    val lowered = concat(lower(prefix),
      noPort.substr(length(prefix) + lit(1), length(noPort)))
    regexp_replace(lowered, "/$", "")
  }

  /**
   * HTML → text extraction — the step every web-crawl pipeline runs
   * FIRST (C4/Dolma extract text from fetched HTML before any quality
   * rule sees it). Regex-grade extraction, the jusText/trafilatura
   * stand-in: (1) drop `<script>`/`<style>`/comment blocks WITH their
   * contents ((?is) dot-matches-newline, case-insensitive — RE2-safe,
   * so the DuckDB oracle replays it verbatim); (2) every remaining tag
   * becomes one space (block boundaries must not glue words together);
   * (3) decode the five XML entities + `&nbsp;` (`&amp;` LAST — a
   * double-encoded `&amp;lt;` must yield the literal `&lt;`, not a
   * re-decoded `<`); (4) collapse whitespace runs, trim. Pure map-side
   * column work in whole-stage codegen — no UDF, no parser object;
   * markup-aware boilerplate classification is out of scope (the
   * line-level [[c4LineClean]] and the corpus-level
   * [[graft.operators.SpanDedup]] cover it downstream).
   */
  def htmlExtract(c: Column): Column = {
    // Explicit whitespace classes, not \s — Java's \s includes \x0B,
    // RE2's does not (the graft.queries.OracleDefs.words rationale).
    val ws = "[ \\t\\n\\x0B\\f\\r]"
    // Comments and script/style blocks strip in ONE alternation pass —
    // true leftmost-scan semantics, the only order that handles BOTH
    // hiding directions: an unclosed `<script>` open tag INSIDE a
    // comment (`<!-- add <script> here --> visible <script>x</script>`)
    // — the comment starts first, so the comment alternative consumes
    // it before the script alternative can anchor inside it and eat
    // through the next real `</script>`; and a comment OPENER inside
    // script source (`<script>var a = "<!--";</script>keep<!-- x -->`)
    // — the script starts first, so the script alternative consumes
    // through its own `</script>` before the comment alternative can
    // swallow the visible text between the blocks (the regression a
    // comments-first ordered pass reintroduces). The legacy
    // `<script><!-- … --></script>` hiding idiom collapses the same
    // way: the script block starts first. Alternatives carry their OWN
    // close tags — RE2 has no backreferences, and a shared
    // `</(script|style)>` closer let `<script>…</style>` close a
    // script block early, leaking raw script source. A final pass
    // drops a trailing UNCLOSED script/style block (no close tag at
    // all) so its contents can't fall through to the tag-stripper.
    val noBlocks0 = regexp_replace(c,
      s"(?is)(?:<!--.*?-->|<script\\b[^>]*>.*?</script$ws*>|<style\\b[^>]*>.*?</style$ws*>)",
      " ")
    val noBlocks = regexp_replace(noBlocks0, "(?is)<(?:script|style)\\b[^>]*>.*$", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (col0, (e, ch)) =>
      regexp_replace(col0, e, ch)
    }
    trim(regexp_replace(decoded, s"$ws+", " "))
  }

  /**
   * Sequence packing (concat-and-chunk): lay documents end-to-end in a
   * deterministic order and cut the token stream into fixed-budget
   * training sequences. A document occupies stream positions
   * [start, start + n_tokens); its first/last sequence ids and its
   * offset inside the first sequence follow by integer division — the
   * exact bookkeeping a tokenize-and-pack job needs to materialize
   * training examples. Zero-token documents pack nowhere and are
   * dropped (documented contract).
   *
   * Packing is inherently sequential, so it runs independently PER
   * SHARD — the same way production pipelines pack per input shard: the
   * shard is a deterministic md5 bucket of the id, the running total is
   * a window partitioned by shard (no single-partition exchange), and
   * the shard count is the parallelism knob (O(corpus/shards) rows sort
   * within each). Every output is replayable from (id, text) alone.
   */
  /**
   * Fixed-size token chunking with stride — the sliding-window document
   * split RAG indexing and long-context training both need (the
   * complement of [[packSequences]], which concatenates SHORT docs; this
   * splits LONG ones). Chunk starts run 1, 1+stride, … up to
   * `max(1, n − size + stride)`, so the final chunk always reaches the
   * last token and no degenerate tail chunks are emitted (the largest
   * start is ≥ n − size + 1 by the stepping argument); `stride < size`
   * gives overlapping context windows, `stride = size` a partition.
   * Docs with zero tokens emit no chunks. Map-only: one tokenize, one
   * `transform` over the start sequence, one explode — no shuffle, and
   * the chunk text re-joins with single spaces (whitespace-normalized,
   * as every downstream text kernel assumes).
   */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive: $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size] (gaps would drop tokens): $stride")
    val t = toks(col(textCol))
    val n = org.apache.spark.sql.functions.size(t)
    val starts = when(n > 0,
      sequence(lit(1), greatest(lit(1), n - lit(size) + lit(stride)), lit(stride)))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol).as("doc_id"), t.as("__t"), n.as("__n"),
        posexplode(starts).as(Seq("chunk_id", "__s")))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("__t"), col("__s"), lit(size))).as("chunk_text"),
        least(lit(size), col("__n") - col("__s") + 1).as("n_tokens"))
  }

  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, shards: Int = 32): DataFrame =
    packLengths(docs.select(col(idCol), size(toks(col(textCol))).as("n_tokens")),
      idCol, "n_tokens", budget, shards)

  /** The packing tail over PRECOMPUTED lengths — the shard-export path
    * where the unit is BPE tokens (or any other cost), not whitespace
    * tokens: (idCol, lenCol) → (doc_id, shard, n_tokens, seq_first,
    * seq_last, tok_offset). Same digest sharding, same per-shard
    * running-total window, same integer-division chunking as
    * [[packSequences]] — ONE tail on purpose. */
  def packLengths(lengths: DataFrame, idCol: String, lenCol: String,
                  budget: Int, shards: Int = 32): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    require(shards > 0, s"shard count must be positive: $shards")
    val base = lengths.select(col(idCol).as("doc_id"),
        col(lenCol).as("n_tokens"),
        graft.functions.sig.md5BucketCol(col(idCol).cast("string"), shards).as("shard"))
      .filter(col("n_tokens") > 0)
    base
      .withColumn("__start",
        sum(col("n_tokens")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("doc_id"))
          - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"__start div $budget").as("seq_first"),
        expr(s"(__start + n_tokens - 1) div $budget").as("seq_last"),
        pmod(col("__start"), lit(budget.toLong)).as("tok_offset"))
  }

  /**
   * First-fit-decreasing packing over digest shards — the bin-QUALITY
   * form of [[packSequences]] (which cuts a new sequence on overflow
   * and wastes every cut's tail; FFD places longest-first into the
   * first bin that fits — near-optimal residual waste, Krell et al.
   * 2021). The FFD itself is [[graft.functions.FfdPack]], one call per
   * shard over collected (id, len) pairs — ids and lengths only, text
   * never leaves the map side; the caller sizes `shards` so a shard's
   * doc count stays collect-bounded (the [[graft.operators.StoryOps]]
   * greedyMatch contract — production packs micro-shards for exactly
   * this reason). Documents longer than `capacity` come back bin = −1;
   * route them to the chunker, don't truncate silently.
   */
  def packFirstFitDecreasing(docs: DataFrame, idCol: String, textCol: String,
                             capacity: Int, shards: Int = 32): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(shards > 0, s"shard count must be positive: $shards")
    docs.select(col(idCol).as("doc_id"),
        size(toks(col(textCol))).cast("long").as("n_tokens"),
        graft.functions.sig.md5BucketCol(col(idCol).cast("string"), shards).as("shard"))
      .filter(col("n_tokens") > 0)
      .groupBy("shard")
      .agg(collect_list(struct(col("doc_id"), col("n_tokens"))).as("items"))
      .select(col("shard"),
        explode(graft.functions.FfdPack.ffdPack(col("items"), capacity)).as("a"))
      .select(col("a.id").as("doc_id"), col("shard"),
        col("a.len").as("n_tokens"), col("a.bin").as("bin"))
  }

  /**
   * [[packSequences]] with the EXACT global stream order (docs laid
   * end-to-end by `idCol` across the whole corpus, no shard structure) —
   * for when training wants one canonical token stream rather than
   * per-shard streams.
   *
   * Same decomposition as `ids.orderedSeqId`: range-partition by id and
   * sort within partitions (global order, no single-partition exchange
   * of the data), then the running token total = a per-partition window
   * prefix sum + a broadcast cumsum of per-partition token totals (one
   * tiny row per partition at any scale). The ranged frame is
   * localCheckpoint'ed so the offsets branch and the output read one
   * materialization — the range sampler cannot disagree between them.
   */
  def packSequencesGlobal(docs: DataFrame, idCol: String, textCol: String,
                          budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("doc_id"),
        size(toks(col(textCol))).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val ranged = base.repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id").localCheckpoint()
    val withPid = ranged.withColumn("__pid",
      shiftright(monotonically_increasing_id(), 33))
    // Per-partition token totals: tiny (one row per partition), so the
    // cumsum window over them is a deliberate, bounded SinglePartition.
    val offsets = withPid.groupBy("__pid").agg(sum("n_tokens").as("__t"))
      .withColumn("__offset", coalesce(sum(col("__t")).over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__t")
    withPid.join(broadcast(offsets), "__pid")
      .withColumn("__start",
        col("__offset") +
          sum(col("n_tokens")).over(Window.partitionBy("__pid").orderBy("doc_id")) -
          col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"__start div $budget").as("seq_first"),
        expr(s"(__start + n_tokens - 1) div $budget").as("seq_last"),
        pmod(col("__start"), lit(budget.toLong)).as("tok_offset"))
  }

  /**
   * Temperature-scaled domain mixture (the multilingual-sampling rule:
   * p_d ∝ count_d^alpha, alpha < 1 upweights tail domains): computes
   * per-domain keep fractions so the sampled corpus has expected size
   * `targetFraction · total` distributed by the tempered weights, capped
   * at 1 per domain, then applies the deterministic md5 keep-decision
   * ([[SampleOps.keep]]) — reproducible, auditable, engine-independent.
   *
   * Scale shape: one count aggregation over the domain column (tiny
   * result — one row per domain), rates broadcast back, then a map-only
   * filter. Rates are rounded to 6 decimals so the decision boundary is
   * identical for any engine that replays it.
   *
   * NULL domains are a real domain here: groupBy already puts them in
   * one group, and the rate join is null-SAFE (`<=>`), so null-domain
   * rows are sampled at their own tempered rate — a plain equi-join
   * would silently drop every one of them (null === null is not true),
   * shrinking the corpus with no signal.
   *
   * @return input rows that survive, plus their domain's `keep_frac`.
   */
  def temperatureMixture(df: DataFrame, domainCol: String, key: Column,
                         alpha: Double, targetFraction: Double,
                         salt: String = ""): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0,1]: $alpha")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction out of (0,1]: $targetFraction")
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__c"))
    val totals = counts.agg(sum(pow(col("__c"), lit(alpha))).as("__zsum"),
      sum(col("__c")).as("__n"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("__dom"),
        round(least(lit(1.0),
          lit(targetFraction) * col("__n") *
            (pow(col("__c"), lit(alpha)) / col("__zsum")) / col("__c")), 6)
          .as("keep_frac"))
    df.join(broadcast(rates), df(domainCol) <=> rates("__dom"))
      .filter(SampleOps.keep(key, col("keep_frac"), salt))
      .drop("__dom")
  }
}
