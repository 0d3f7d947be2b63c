package graft

import graft.functions.{sig, text, vector, VectorMeanFast}
import graft.operators.{Bm25, Bm25Store, ClusterRefine, CurationOps, DedupOps, DomainModel, GraphOps, IvfAnn, LayoutOps, MultimodalOps, PqOps, QualityModel, QuantizeOps, Recommend, RecommendML, Rerank, Rrf, SampleOps, SemDedup, SemDedupStore, SimilarityOps, SkewOps, SpanDedup, StoryOps, TemporalOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QShared._
import OracleDefs._

/** Text curation, quality, LM-scoring, and corpus-observability queries (SURVEY §2.10 curation + data-card families).
 *
 * One `queries` entry per operator with its DuckDB oracle in
 * `oracles` side by side (rows-only queries omit the oracle);
 * aggregated into the driver contract by [[SparkEntry]] /
 * [[OracleSql]]. Shared plan helpers live in [[QShared]], shared
 * SQL fragments in [[OracleDefs]].
 */
private[graft] object QCuration {

  // ── Stored-family phased forms (QShared.Phased; see QVector.phased):
  // init builds the standing store, serve probes it — `queries` entries
  // are `fused` over the same definitions.

  /** Standing eval-decontamination registry: suite register + exact
    * negative deregister + compact in init (including the crash-retry
    * replay no-op the fused query pins); the O(batch) broadcast probe
    * in serve. */
  private val decontamStorePhased: Phased = (s, d) => {
    lazy val docs = T(s, d, "documents")
    lazy val dir = tmpStore("eval_store")
    val init = () => {
      val evalSlice = docs.filter(col("doc_id") % 13 === 0)
      graft.operators.EvalStore.init(s, dir, "suite_a",
        evalSlice.filter(col("doc_id") % 2 === 0), "text", n = 3)
      graft.operators.EvalStore.register(s, dir, "suite_b",
        evalSlice.filter(col("doc_id") % 2 === 1), "text", Some("b"))
      // Replay of an absorbed name must be a no-op (crash-retry shape).
      graft.operators.EvalStore.register(s, dir, "suite_b",
        evalSlice.filter(col("doc_id") % 2 === 1), "text", Some("b"))
      graft.operators.EvalStore.compact(s, dir); ()
    }
    val serve = () =>
      graft.operators.EvalStore.probe(s, dir,
          docs.filter(col("doc_id") % 13 =!= 0), "doc_id", "text")
        .orderBy("doc_id")
    (init, serve)
  }

  /** Standing reference LM (LmStore): init + O(batch) appends (incl.
    * the replay no-op) + compact in init; model read + scoring in
    * serve. */
  private val bigramPplStorePhased: Phased = (s, d) => {
    lazy val docs = T(s, d, "documents")
    lazy val dir = tmpStore("lm_store")
    val init = () => {
      val ref = docs.filter(col("doc_id") % 2 === 0)
      graft.operators.LmStore.init(s, dir, ref.filter(col("doc_id") % 4 === 0), "text")
      graft.operators.LmStore.append(s, dir,
        ref.filter(col("doc_id") % 4 =!= 0), "text", Some("b1"))
      // Replay of an absorbed name must be a no-op (crash-retry shape).
      graft.operators.LmStore.append(s, dir,
        ref.filter(col("doc_id") % 4 =!= 0), "text", Some("b1"))
      graft.operators.LmStore.compact(s, dir); ()
    }
    val serve = () => {
      val (uni, bi) = graft.operators.LmStore.readModels(s, dir)
      bigramPplTail(CurationOps.bigramCrossEntropy(docs, uni, bi, "doc_id", "text"))
    }
    (init, serve)
  }

  /** Standing data card: ledger init + the three O(batch) appends in
    * init; the datasheet fold (the read production repeats per
    * dashboard refresh) in serve. */
  private val dataCardIncrementalPhased: Phased = (s, d) => {
    lazy val dir = tmpStore("graft_cardstore")
    lazy val docs = T(s, d, "documents")
    val init = () => {
      graft.operators.CardStore.init(s, dir,
        docs.filter(pmod(col("doc_id"), lit(4)) === 0),
        "source", "lang", "text", "n_chars", qualityOf)
      (1 to 3).foreach(i => graft.operators.CardStore.append(s, dir,
        docs.filter(pmod(col("doc_id"), lit(4)) === i),
        "source", "lang", "text", "n_chars", qualityOf,
        name = Some(f"part_b$i%d")))
    }
    val serve = () => graft.operators.CardStore.card(s, dir)
    (init, serve)
  }

  private[graft] val phased: Map[String, Phased] = Map(
    "x_decontam_store" -> decontamStorePhased,
    "x_bigram_ppl_store" -> bigramPplStorePhased,
    "x_data_card_incremental" -> dataCardIncrementalPhased)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_token_stats" -> ((s, d) => {
      val st = graft.functions.textStats(col("text"))
      T(s, d, "documents").select(col("doc_id"),
          st("n_tokens").as("n_tokens"),
          // BPE-ish estimate: maximal letter/digit/punctuation runs (the
          // GPT pre-tokenizer shape, RE2-safe so the oracle mirrors it).
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))).as("n_bpe_tokens"),
          length(col("text")).as("n_chars2"),
          round(when(st("n_tokens") === 0, 0.0)
            .otherwise(st("sum_len").cast("double") / st("n_tokens")), 6).as("avg_word_len"),
          round(when(st("n_tokens") === 0, 0.0)
            .otherwise(st("n_stop").cast("double") / st("n_tokens")), 6).as("stopword_ratio"))
        .orderBy("doc_id")
    }),
    "x_quality" -> ((s, d) => {
      val quality = qualityOf(col("text"))
      T(s, d, "documents")
        .select(col("doc_id"), quality.as("quality"))
        .orderBy("doc_id")
    }),
    // Script detection over a deterministically mixed-script corpus:
    // docs %4==1 transliterate to Cyrillic, %4==2 to Greek, %4==3 to
    // CJK (1:1 translate, both engines), the rest stay Latin — then
    // the Unicode-block letter histogram + argmax classification, the
    // signal language ID starts from on non-Latin text. Map-only.
    "x_script_detect" -> ((s, d) => {
      val abc = "abcdefghijklmnopqrstuvwxyz"
      val t = when(col("doc_id") % 4 === 1,
          translate(col("text"), abc, "абвгдежзийклмнопрстуфхцчшщ"))
        .when(col("doc_id") % 4 === 2,
          translate(col("text"), abc, "αβγδεζηθικλμνξοπρστυφχψωάέ"))
        .when(col("doc_id") % 4 === 3,
          translate(col("text"), abc, "数据模型训练语言文本分析处理系统网络算法机器学习深度"))
        .otherwise(col("text"))
      val counts = CurationOps.scriptCounts(t)
      T(s, d, "documents")
        .select(col("doc_id"), counts.as("c"))
        .select(col("doc_id"), col("c.latin").as("n_latin"),
          col("c.cyrillic").as("n_cyrillic"), col("c.greek").as("n_greek"),
          col("c.han").as("n_han"),
          CurationOps.dominantScript(col("c")).as("script"))
        .orderBy("doc_id")
    }),
    // Language-ID confidence (the CCNet gate next to the prediction
    // itself — a doc whose top language barely beats the runner-up is
    // mixed/ambiguous and gets routed to review, not a bucket): the
    // four stopword-profile scores, the winner's margin over the
    // runner-up (via one array_sort — engine-portable), and the
    // confident verdict. Map-only.
    "x_langid_confidence" -> ((s, d) => {
      val t = text.tokens(col("text"))
      val score = (ws: Seq[String]) => size(filter(t, x => x.isInCollection(ws)))
      val sEn = score(Seq("the", "and", "of", "is", "a"))
      val sDe = score(Seq("der", "die", "und", "ist", "das"))
      val sEs = score(Seq("el", "los", "y", "es", "una"))
      val sFr = score(Seq("le", "la", "et", "est", "une"))
      val sorted = array_sort(array(sEn, sDe, sEs, sFr))
      val top = element_at(sorted, 4); val second = element_at(sorted, 3)
      T(s, d, "documents")
        .select(col("doc_id"), sEn.as("s_en"), sDe.as("s_de"),
          sEs.as("s_es"), sFr.as("s_fr"),
          (top - second).as("margin"),
          (top > 0 && top - second >= 2).as("confident"))
        .orderBy("doc_id")
    }),
    "x_langid" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"), text.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),
    // Gopher-rule repetition filter: duplicate-line fraction +
    // top-bigram coverage against the published thresholds. Documents
    // get deterministic line structure first (the fixture is one-line),
    // and BOTH reject rules are made live (the corpus alone never
    // crosses either threshold): every 13th doc becomes a repeated-line
    // block (dup_line_frac fires), every 29th gains a modal bigram run
    // (top_bigram_frac fires).
    "x_repetition" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 13 === 0,
            lit("breaking news update\nbreaking news update\n" +
              "breaking news update\nbreaking news update\nfresh line"))
          .when(col("doc_id") % 29 === 0,
            concat(col("text"), repeat(lit(" spark streaming"), 40)))
          .otherwise(regexp_replace(col("text"), " value ", "\n")).as("text"))
      CurationOps.repetitionStats(docs, "doc_id", "text")
        .select(col("doc_id"), round(col("dup_line_frac"), 6).as("dup_line_frac"),
          round(col("top_bigram_frac"), 6).as("top_bigram_frac"), col("keep"))
        .orderBy("doc_id")
    }),
    // Full Gopher rule set: modal 2/3/4-gram coverage, symbol-to-word
    // ratio, bullet/ellipsis line fractions, mean word length. Structure
    // is synthesized deterministically (bullets every 5th doc, a trailing
    // ellipsis every 7th, symbols every 11th) so every signal fires.
    "x_gopher_full" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 5 === 0, lit("- item one\n- item two\n")).otherwise(lit("")),
          regexp_replace(col("text"), " value ", "\n"),
          when(col("doc_id") % 7 === 0, lit("\nwait for it...")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(" ## #")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("\n\nrepeated closing paragraph\n\nrepeated closing paragraph"))
            .otherwise(lit(""))).as("text"))
      CurationOps.gopherStats(docs, "doc_id", "text")
        .select(col("doc_id"), round(col("dup_line_frac"), 6).as("dup_line_frac"),
          round(col("dup_paragraph_frac"), 6).as("dup_paragraph_frac"),
          round(col("dup_line_char_frac"), 6).as("dup_line_char_frac"),
          round(col("dup_paragraph_char_frac"), 6).as("dup_paragraph_char_frac"),
          round(col("top_2gram_frac"), 6).as("top_2gram_frac"),
          round(col("top_3gram_frac"), 6).as("top_3gram_frac"),
          round(col("top_4gram_frac"), 6).as("top_4gram_frac"),
          round(col("symbol_word_ratio"), 6).as("symbol_word_ratio"),
          round(col("bullet_line_frac"), 6).as("bullet_line_frac"),
          round(col("ellipsis_line_frac"), 6).as("ellipsis_line_frac"),
          round(col("mean_word_len"), 6).as("mean_word_len"),
          col("n_words"), round(col("alpha_word_frac"), 6).as("alpha_word_frac"),
          col("n_stop_hits"), col("keep"))
        .orderBy("doc_id")
    }),
    // Train/eval decontamination: every 13th document plays the held-out
    // benchmark; training docs sharing any word 3-gram with it are
    // flagged (3-grams because the fixture docs are ~50 tokens; real
    // pipelines run 8-13).
    "x_decontaminate" -> ((s, d) => {
      val docs = T(s, d, "documents")
      CurationOps.decontaminate(
          docs.filter(col("doc_id") % 13 =!= 0),
          docs.filter(col("doc_id") % 13 === 0),
          "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),
    // The STANDING decontamination registry: the eval slice split into
    // two benchmark suites registered on the additive ledger
    // (EvalStore) — init + register + a replayed register (must no-op)
    // + compact — then the training slice probed against the assembled
    // registry. Overlap counts/flags must equal x_decontaminate's
    // batch computation over the suite union, with per-suite hit
    // attribution on top.
    "x_decontam_store" -> fused(decontamStorePhased),
    // Registering a NEW benchmark after the corpus was admitted: the
    // retro pass screens the admitted corpus against ONLY the new
    // suite's digests (one scan, broadcast probe) and emits the
    // takedown ids — the Admission.unadmit feed.
    "x_decontam_retro" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val dir = tmpStore("eval_store_retro")
      val evalSlice = docs.filter(col("doc_id") % 13 === 0)
      graft.operators.EvalStore.init(s, dir, "suite_a",
        evalSlice.filter(col("doc_id") % 2 === 0), "text", n = 3)
      graft.operators.EvalStore.register(s, dir, "suite_b",
        evalSlice.filter(col("doc_id") % 2 === 1), "text", Some("b"))
      graft.operators.EvalStore.retroScan(s, dir,
          docs.filter(col("doc_id") % 13 =!= 0), "doc_id", "text", "suite_b")
        .orderBy("doc_id")
    }),
    // PII redaction: emails, IPv4s, phone-shaped digit runs — synthetic
    // PII appended deterministically (the corpus itself has none), then
    // counted and redacted; the oracle replays both.
    "x_pii_redact" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail.example.com or +1 (555) 010-"), col("doc_id"),
          lit(" at 192.168."), (col("doc_id") % 256).cast("string"), lit(".17")).as("text"))
      docs.select(col("doc_id"), CurationOps.piiCounts(col("text")).as("pc"),
          CurationOps.redactPii(col("text")).as("redacted"))
        .select(col("doc_id"), col("pc.emails").as("n_emails"),
          col("pc.ips").as("n_ips"), col("redacted"))
        .orderBy("doc_id")
    }),
    // The corpus report card every pipeline prints before training: doc
    // and token totals, mean length, language spread, exact-dup rate —
    // ONE aggregation pass (the countDistincts expand map-side).
    "x_corpus_stats" -> ((s, d) => {
      val st = graft.functions.textStats(col("text"))
      T(s, d, "documents")
        .agg(count(lit(1)).as("n_docs"),
          sum(st.getField("n_tokens").cast("long")).as("n_tokens"),
          round(avg(st.getField("n_tokens")), 6).as("avg_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(md5(col("text"))).as("n_unique_texts"))
        .withColumn("dup_frac",
          round(lit(1.0) - col("n_unique_texts").cast("double") / col("n_docs"), 6))
    }),
    // Deterministic global training shuffle: salted-digest permutation
    // (order-independent, retry-stable — orderBy(rand()) is neither)
    // dealt round-robin into 8 equal shards; the global rank is a
    // range-partitioned sort + broadcast cumsum, never one partition.
    // The C4 banned-word filter (Raffel et al. 2020 drop any page with
    // a "bad word"; Dolma ships the same stage): a tiny lexicon checked
    // per token — set membership against a broadcast-free literal list
    // inside whole-stage codegen (the x_langid stopword idiom), with
    // the per-doc hit count kept so the drop is auditable, not silent.
    // Stand-in lexicon: fixture tokens standing in for a real ban list.
    // The corpus itself is clean, so banned tokens are PLANTED
    // deterministically (the x_pii_redact idiom) — every 17th doc one
    // hit, every 23rd two — keeping the drop branch live.
    "x_badwords_filter" -> ((s, d) => {
      val banned = Seq("spill", "crash", "corrupt")
      val docs = T(s, d, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 17 === 0, lit(" crash")).otherwise(lit("")),
          when(col("doc_id") % 23 === 0, lit(" spill corrupt")).otherwise(lit("")))
          .as("text"))
      val hits = size(filter(text.tokens(col("text")),
        t => t.isInCollection(banned)))
      docs
        .select(col("doc_id"), hits.as("n_banned"),
          (hits === 0).as("keep"))
        .orderBy("doc_id")
    }),
    // Compression-ratio repetitiveness signal (the Dolma/MassiveWeb
    // quality heuristic): deflate_size runs as a codegen kernel per
    // row, map-only. DuckDB exposes no deflate, so the gate is the
    // x_ann_* invariant idiom — Spark-computed booleans the oracle pins
    // true: sizes positive, zlib's documented worst-case overhead
    // bound, and the load-bearing signal property — a 3×-repeated twin
    // of every doc must compress to barely more than the single copy
    // (long-range repetition is exactly what the ratio detects and
    // n-gram rules miss). Kernel laws (determinism, known ratios,
    // ordering) are pinned in CompressSpec.
    "x_compress_ratio" -> ((s, d) => {
      val ds = graft.functions.DeflateSize.deflateSize(col("text"))
      val ds3 = graft.functions.DeflateSize.deflateSize(
        concat(col("text"), lit(" "), col("text"), lit(" "), col("text")))
      T(s, d, "documents")
        .select(col("doc_id"), octet_length(col("text")).as("nb"),
          ds.as("ds"), ds3.as("ds3"))
        .agg(count(lit(1)).as("n_docs"),
          expr("bool_and(ds > 0)").as("sizes_positive"),
          // zlib's documented worst case is nb + 5·(nb/16383) + 11 —
          // the bound holds at ANY doc size, not just small fixtures.
          expr("bool_and(ds <= nb + 5 * (nb div 16383) + 64)").as("bounded_overhead"),
          // The 2nd/3rd copies back-reference only while the original
          // sits inside DEFLATE's 32 KB window — docs past ~16 KB are
          // exempted per row (the signal still fires on every doc the
          // window can see; an unconditional bool_and would break on a
          // long-doc corpus even though nothing is wrong).
          expr("bool_and(nb > 16384 or ds3 < 2 * ds + 16)").as("repetition_detected"))
    }),
    // Opt-out / blocklist compliance — the robots.txt-opt-out pass a
    // crawl-derived corpus must run before anything else: canonicalize
    // the page URL, extract the registrable host, LEFT ANTI against the
    // blocklist (tiny by nature → broadcast; the filter is map-side).
    // Every doc comes back with its verdict so the removal is auditable.
    "x_optout_filter" -> ((s, d) => {
      val urls = T(s, d, "documents").select(col("doc_id"), col("source"),
        concat(lit("HTTPS://WWW."), upper(col("source")), lit(".COM:443/Docs/"),
          (col("doc_id") % 100), lit("/?utm_source=feed#s")).as("url"))
      val canon = urls.withColumn("canonical",
          CurationOps.canonicalizeUrl(col("url")))
        .withColumn("host",
          regexp_extract(col("canonical"), "^[a-z]+://([^/]+)", 1))
      val blocked = canon.select(col("host")).distinct()
        .filter(col("host").rlike("^www\\.src[0-3]\\."))
      canon.join(broadcast(blocked.withColumn("__b", lit(true))),
          Seq("host"), "left")
        .select(col("doc_id"), col("host"),
          coalesce(col("__b"), lit(false)).as("opted_out"))
        .orderBy("doc_id")
    }),
    // Sequence-length histogram: log2-bucketed token counts with doc
    // and token mass per bucket — the statistic that sizes packing
    // budgets and context-length planning. ONE aggregation pass;
    // output is max-log2-buckets-sized.
    "x_seqlen_histogram" -> ((s, d) => {
      T(s, d, "documents")
        .select(text.tokenCount(col("text")).as("n"))
        // floor(log2(n)) computed integer-exactly as bit-length − 1 —
        // a floating log2 at an exact power of two is a cross-engine
        // rounding hazard.
        .select(when(col("n") === 0, lit(-1))
          .otherwise(length(bin(col("n"))) - 1).cast("int").as("bucket"),
          col("n"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
        .orderBy("bucket")
    }),
    // Per-doc n-gram novelty vs a reference corpus — the memorization /
    // freshness signal (what fraction of this doc's 3-shingles has the
    // reference never seen): the per-doc ratio form of decontamination.
    // Shuffles 16-byte shingle digests only; the reference set is a
    // distinct digest relation, the join an equi-join on digest.
    "x_ngram_novelty" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val shOf = (df: org.apache.spark.sql.DataFrame) => df.select(col("doc_id"),
          explode(array_distinct(
            text.shingles(text.tokens(col("text")), 3))).as("__s"))
        .select(col("doc_id"), md5(col("__s").cast("binary")).as("__m"))
      val ref = shOf(docs.filter(col("doc_id") % 2 === 0))
        .select(col("__m")).distinct().withColumn("__seen", lit(true))
      shOf(docs).join(ref, Seq("__m"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          (count(lit(1)) - count(col("__seen"))).as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_shingles"), 6).as("novelty"))
        .orderBy("doc_id")
    }),
    // Character-entropy quality signal: Shannon entropy of the doc's
    // character distribution — template/repeated-char junk sits low,
    // natural prose high; the cheap cousin of x_compress_ratio with an
    // EXACT oracle (entropy is a smooth transform of count ratios).
    // In-place column algebra over the distinct-char array — map-only,
    // O(distinct·len) per row, no shuffle.
    // Every 19th doc collapses to a single repeated character (entropy
    // 0) so the low-entropy drop branch is live — natural fixture prose
    // alone never sinks under the 1.5-nat floor.
    "x_char_entropy" -> ((s, d) => {
      val chars = filter(split(col("text"), ""), c => c =!= "")
      val n = size(chars)
      val ent = (-aggregate(
        transform(array_distinct(chars), ch => {
          val c = size(filter(chars, x => x === ch)).cast("double")
          c / n * log(c / n)
        }), lit(0.0), (acc, v) => acc + v))
      T(s, d, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 19 === 0, repeat(lit("a"), 64))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"), n.as("n_chars"),
          // "+ 0.0" normalizes the sign of zero: a single-distinct-char
          // doc folds to -0.0 under IEEE negation and DuckDB's round
          // keeps the sign while Spark's BigDecimal round drops it —
          // the one hash divergence of round 14. IEEE: -0.0 + 0.0 = +0.0,
          // every other value unchanged. Mirrored in the oracle.
          when(n === 0, lit(0.0)).otherwise(round(ent, 6) + lit(0.0)).as("entropy"))
        .withColumn("keep", col("entropy") >= 1.5)
        .orderBy("doc_id")
    }),
    // HTML -> text extraction — the step every web pipeline runs FIRST
    // (C4/Dolma extract text from fetched HTML before any quality rule
    // sees it). Deterministic HTML wrapper (head/style/script blocks
    // with tag-looking script content, a comment, entities incl. a
    // double-encoded one), then the RE2-safe extraction kernel: blocks
    // dropped WITH contents, tags -> spaces BEFORE entity decode (so a
    // decoded '&lt;here&gt;' stays literal text), '&amp;' decoded LAST,
    // whitespace collapsed. Map-only, whole-stage codegen.
    "x_html_extract" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>Page</title><style type=\"text/css\">p { color: red; }</style>"),
        lit("<script>var x = 1; if (x < 2) { x = 2; }</script></head><body><h1>"),
        col("source"), lit("</h1><!-- nav --><p>"),
        regexp_replace(col("text"), " value ", "</p><p>"),
        lit("</p><div class=\"footer\">&copy; 2024 &amp; friends &lt;here&gt;" +
          "&amp;lt;kept&amp;gt;</div></body></html>"))
      T(s, d, "documents").select(col("doc_id"), html.as("html"))
        .select(col("doc_id"), CurationOps.htmlExtract(col("html")).as("clean"))
        .withColumn("n_chars_clean", length(col("clean")))
        .orderBy("doc_id")
    }),
    // C4 line + page filters (terminal punctuation, >= 5 words,
    // "javascript" lines; "lorem ipsum" / brace pages; >= 3 retained
    // lines to keep the page). Structure synthesized deterministically
    // so every rule fires: sentence-ish lines from the text, lorem
    // every 17th doc, a brace every 19th.
    "x_c4_clean" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"),
        concat(
          regexp_replace(col("text"), " value ", ".\n"),
          when(col("doc_id") % 17 === 0, lit("\nlorem ipsum dolor sit amet.")).otherwise(lit("")),
          when(col("doc_id") % 19 === 0, lit("\nif (x) { return y; }")).otherwise(lit(""))).as("text"))
      val cleaned = CurationOps.c4LineClean(col("text"))
      val flags = CurationOps.c4DocFlags(col("text"))
      docs.select(col("doc_id"),
          size(filter(split(col("text"), "\n"), l => trim(l) =!= "")).as("n_lines"),
          size(filter(split(cleaned, "\n"), l => trim(l) =!= "")).as("n_kept"),
          substring(cleaned, 1, 80).as("cleaned_head"),
          flags.getField("has_lorem").as("has_lorem"),
          flags.getField("has_brace").as("has_brace"))
        .withColumn("keep",
          !col("has_lorem") && !col("has_brace") && col("n_kept") >= 3)
        .orderBy("doc_id")
    }),
    // CCNet-style LM quality: per-doc cross-entropy (nats/token) under
    // the corpus's own add-1 unigram model; keep = under the operating
    // point (3.41, ~the corpus median — CCNet keeps the low-perplexity
    // head/middle). Flag derived from the ROUNDED value so the decision
    // boundary is engine-stable.
    "x_unigram_ppl" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val model = CurationOps.unigramModel(docs, "text")
      CurationOps.unigramCrossEntropy(docs, model, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("cross_entropy"), 6).as("cross_entropy"),
          (col("n_tokens") > 0 && round(col("cross_entropy"), 6) < 3.41).as("keep"))
        .orderBy("doc_id")
    }),
    // Interpolated-bigram LM scoring — the next CCNet rung above
    // x_unigram_ppl: reference = the even-doc_id slice (a SEPARATE
    // corpus, so unseen contexts/pairs really occur and the
    // Jelinek–Mercer backoff to the add-1 unigram leg is exercised,
    // not just defined), scored over ALL docs. Both models broadcast;
    // scoring is three map-side probes on the (doc, pair) stream + one
    // per-doc aggregation.
    "x_bigram_ppl" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val ref = docs.filter(col("doc_id") % 2 === 0)
      val uni = CurationOps.unigramModel(ref, "text")
      val bi = CurationOps.bigramModel(ref, "text")
      bigramPplTail(CurationOps.bigramCrossEntropy(docs, uni, bi, "doc_id", "text"))
    }),
    // The standing-state reference LM: the x_bigram_ppl models
    // persisted on the additive ledger (LmStore) and assembled from
    // init + append + a replayed append (must no-op) + compact —
    // scoring against the stored model must equal scoring against the
    // in-memory model of the same reference union, which is exactly
    // x_bigram_ppl's oracle.
    "x_bigram_ppl_store" -> fused(bigramPplStorePhased),
    // CCNet-style perplexity bucketing: per-language head/middle/tail
    // terciles of the unigram cross-entropy (Wenzek et al. 2020 §4).
    // Thresholds ride the rank-exact percentile sketch (accuracy 2^20 —
    // exact while any language's doc count stays under ~1M, the
    // x_outlier_trim contract) and broadcast back as one row per
    // language; token-less docs get their own 'empty' bucket.
    "x_ppl_buckets" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val model = CurationOps.unigramModel(docs, "text")
      CurationOps.pplBuckets(docs, model, "doc_id", "text", "lang",
          accuracy = 1 << 20)
        .orderBy("doc_id")
    }),
    // Semantic decontamination: max cosine of each training embedding
    // against the (broadcast) eval slice; suspect at >= 0.35 (p90 of the
    // max-sim distribution — the paraphrase-leakage complement of the
    // n-gram x_decontaminate).
    "x_decontaminate_embed" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      CurationOps.decontaminateByEmbedding(
          e.filter(col("vec_id") % 13 =!= 0),
          e.filter(col("vec_id") % 13 === 0),
          "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_id"), round(col("max_sim"), 6).as("max_sim"),
          (round(col("max_sim"), 6) >= 0.35).as("contaminated"))
        .orderBy("vec_id")
    }),
    "x_oov_rate" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val vocab = CurationOps.vocabTopK(docs, "text", 100)
        .select(col("token"), lit(1).as("__in"))
      docs.select(col("doc_id"),
          explode_outer(filter(split(lower(trim(col("text"))), text.WhitespaceRun), t => t =!= ""))
            .as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id")
        .agg(count(col("token")).as("n_tokens"),
          count(when(col("token").isNotNull && col("__in").isNull, 1)).as("n_oov"))
        .withColumn("oov_rate",
          when(col("n_tokens") > 0,
            round(col("n_oov").cast("double") / col("n_tokens"), 6)).otherwise(lit(0.0)))
        .orderBy("doc_id")
    }),
    // Corpus vocabulary head: top-50 tokens by frequency with
    // deterministic ties (count desc, token asc).
    "x_vocab_topk" -> ((s, d) => {
      CurationOps.vocabTopK(T(s, d, "documents"), "text", 50)
    }),
    // Per-source salient terms by tf-idf (each source as one
    // pseudo-document): the datasheet's "what is this source about"
    // report. One corpus explode → one (source, token) exchange;
    // everything after is vocab-sized; top-5 per source via a
    // WindowGroupLimit-pruned rank window.
    "x_tfidf_terms" -> ((s, d) => {
      CurationOps.tfidfTerms(T(s, d, "documents"), "source", "text", 5)
        .orderBy(col("source"), desc("tfidf"), col("token"))
    }),
    // URL canonicalization: messy crawl URLs synthesized from doc fields
    // (uppercase host, default port, utm params, fragment, trailing
    // slash), then normalized; group sizes prove collision behavior.
    "x_url_canon" -> ((s, d) => {
      val urls = T(s, d, "documents").select(col("doc_id"),
        concat(lit("HTTPS://WWW."), upper(col("source")), lit(".COM:443/Docs/"),
          (col("doc_id") % 100), lit("/?utm_source=feed&utm_campaign=x"),
          when(col("doc_id") % 2 === 0, "&ref=a").otherwise(""),
          lit("#section-"), col("doc_id")).as("url"))
      urls.select(col("doc_id"), col("url"),
          CurationOps.canonicalizeUrl(col("url")).as("canonical"))
        .orderBy("doc_id")
    }),
    // The whole curation funnel as ONE verdict per document: language
    // gate, quality score, Gopher keep, PII exposure — the admission
    // decision a corpus filter actually makes, composed from the same
    // kernels the individual queries check.
    "x_curation_verdict" -> ((s, d) => {
      val quality = qualityOf(col("text"))
      val base = T(s, d, "documents").select(col("doc_id"),
        text.langId(col("text")).as("lang_pred"), quality.as("quality"),
        (CurationOps.piiCounts(col("text")).getField("emails") +
          CurationOps.piiCounts(col("text")).getField("ips")).as("n_pii"))
      val gopher = CurationOps.gopherStats(T(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("keep").as("gopher_keep"))
      base.join(gopher, "doc_id")
        .select(col("doc_id"), col("lang_pred"), col("quality"), col("n_pii"),
          col("gopher_keep"),
          (col("lang_pred") =!= "und" && col("quality") >= 0.5 &&
            col("gopher_keep") && col("n_pii") === 0).as("admit"))
        .orderBy("doc_id")
    }),
    // Data-quality expectation report over the orders table: row-level
    // predicates in ONE aggregation pass (conditional sums, map-side
    // partials), key uniqueness in the same idiom, and the one genuine
    // join — FK integrity vs customer — as a LEFT ANTI count.
    "x_data_quality" -> ((s, d) => {
      val o = T(s, d, "orders")
      val rowChecks = graft.operators.ValidateOps.expect(o, Seq(
        "orderkey_not_null" -> col("o_orderkey").isNotNull,
        "totalprice_positive" -> (col("o_totalprice") > 0.0),
        "status_in_domain" -> col("o_orderstatus").isin("O", "F", "P"),
        "orderdate_in_range" -> col("o_orderdate")
          .between(lit("1992-01-01").cast("timestamp_ntz"),
            lit("1998-12-31 23:59:59").cast("timestamp_ntz")),
        "priority_not_blank" -> (length(trim(col("o_orderpriority"))) > 0)))
      val uniq = graft.operators.ValidateOps.uniqueness(o, Seq("o_orderkey"), "orderkey_unique")
      val fk = graft.operators.ValidateOps.fkViolations(
        o, T(s, d, "customer"), Seq("o_custkey" -> "c_custkey"), "custkey_fk")
      rowChecks.unionByName(uniq).unionByName(fk).orderBy("check")
    }),
    // Corpus data card — the per-(source, language) summary a dataset
    // release ships (datasheet/data-card shape): volume (docs / tokens /
    // chars), mean quality, exact-dup structure (distinct fingerprints →
    // dup rate), and the median length — ALL in ONE aggregation pass
    // over the corpus. Scale notes: the exact fingerprint countDistinct
    // exists to STATE the HLL contract (the x_approx_distinct idiom —
    // at 100 TB only the sketch column survives, within its ±10% rsd
    // band); the median rides the rank-exact percentile sketch
    // (x_outlier_trim's accuracy contract); per-doc quality is rounded
    // to 6 BEFORE averaging so both engines average identical values.
    "x_data_card" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val enriched = docs.select(col("source"), col("lang"),
        col("n_chars"),
        text.tokenCount(col("text")).cast("long").as("__nt"),
        // quality in exact integer MILLIONTHS: a double mean of
        // 6-decimal values lands on decimal-half round-4 boundaries
        // where the engines' round() disagree (the mmr_select lesson);
        // summing longs and dividing identically needs no rounding.
        round(round(qualityOf(col("text")), 6) * lit(1000000.0), 0)
          .cast("long").as("__qu"),
        md5(lower(trim(col("text")))).as("__fp"))
      enriched.groupBy("source", "lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("n_tokens"),
          sum(col("n_chars")).as("sum_chars"),
          (sum(col("__qu")).cast("double") /
            (count(lit(1)) * lit(1000000L)).cast("double")).as("avg_quality"),
          countDistinct(col("__fp")).as("n_unique"),
          approx_count_distinct(col("__fp"), 0.02).as("__approx"),
          percentile_approx(col("n_chars").cast("double"), lit(0.5),
            lit(1 << 20)).as("__p50"))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          col("sum_chars"), col("avg_quality"), col("n_unique"),
          round(lit(1.0) - col("n_unique").cast("double") / col("n_docs"), 6)
            .as("dup_rate"),
          round(col("__p50"), 2).as("p50_chars"),
          // HLL contract with an ABSOLUTE floor: Spark's HLL++ carries
          // no sparse mode, so tiny groups (n=5 here) can miss by ±1-2
          // where the x_approx_distinct corpus-sized contract is pure
          // ±10%. max(10%, 10) keeps the check meaningful at scale and
          // honest at the fixture's smallest (source, lang) cells.
          (abs(col("__approx") - col("n_unique")).cast("double")
            <= greatest(lit(0.1) * col("n_unique"), lit(10.0))).as("distinct_ok"))
        .orderBy("source", "lang")
    }),
    // The MAINTAINED form of the data card ([[graft.operators.CardStore]]):
    // the corpus arrives as an init slice plus three ingest batches, each
    // folded in O(batch) — additive sums, mergeable GK/HLL sketches, and
    // the EXACT distinct-fingerprint count via the keep-first attributed
    // fingerprint relation (bucket-pruned probe; a cross-batch duplicate
    // never recounts) — and the folded card must be indistinguishable
    // from x_data_card's one-pass global computation: SAME oracle. At
    // 100 TB this is the dashboard that stays current per admission
    // batch where the global pass is a scheduled luxury.
    "x_data_card_incremental" -> fused(dataCardIncrementalPhased),
    // Unicode NFC canonicalization — required BEFORE any hash-based
    // stage (the same visible text in composed vs decomposed form hashes
    // as different content, so exact dedup misses real duplicates).
    // Structure synthesized so the composition actually fires: every
    // 13th doc carries a decomposed e+U+0301 that NFC composes to é.
    // Map-only codegen'd static call; DuckDB's nfc_normalize is the
    // same TR15 composition, byte-for-byte.
    "x_text_normalize" -> ((s, d) => {
      import graft.functions.NfcNormalize.nfcNormalize
      val raw = when(pmod(col("doc_id"), lit(13)) === 0,
        concat(col("text"), lit(" cafe"), lit("\u0301"))).otherwise(col("text"))
      T(s, d, "documents").select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          (length(col("raw")) - length(nfcNormalize(col("raw")))).as("n_composed"),
          (nfcNormalize(col("raw")) =!= col("raw")).as("changed"),
          substring(nfcNormalize(col("raw")), -6, 6).as("tail"))
        .orderBy("doc_id")
    }),
    // Corpus version diff — the dataset-release delta report ("what
    // changed since v1"): two corpus versions synthesized
    // deterministically from the fixture (v1 drops every 7th doc and
    // carries stale text for every 11th), compared as (id, fingerprint)
    // relations — 16-byte digests in the full-outer join, never text —
    // and classified added/removed/changed/same per source in one
    // aggregation. At 100 TB this is the snapshot-to-snapshot audit the
    // TableSink tags make possible: both sides are fingerprint scans,
    // the join is the only corpus-sized exchange.
    "x_corpus_diff" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val v1Text = when(pmod(col("doc_id"), lit(11)) === 0,
        concat(col("text"), lit(" stale"))).otherwise(col("text"))
      val v1 = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .select(col("doc_id"), col("source"), v1Text.as("text"))
      val v2 = docs.select(col("doc_id"), col("source"), col("text"))
      graft.operators.ValidateOps.diffTables(v1, v2, Seq("doc_id"),
          compareCols = Seq("text"), reportCol = "source")
        .orderBy("source")
    }),
    // Per-source token-distribution drift — the mixture monitor a
    // production corpus runs per release: KL(source ‖ corpus) over the
    // unigram distributions. ONE corpus-sized aggregation (the
    // (source, token) counts); everything after is vocab-sized — the
    // token marginals derive from the counts relation, the per-source
    // divergence is a vocab-keyed sum. KL terms are smooth transforms
    // of count ratios (no decimal-structured boundary; cross-engine
    // libm ln differences sit ~1e-15, absorbed by round 6).
    "x_token_divergence" -> ((s, d) => {
      val toks = T(s, d, "documents").select(col("source"),
        explode(filter(split(lower(trim(col("text"))), text.WhitespaceRun),
          t => t =!= "")).as("token"))
      val cst = toks.groupBy("source", "token").agg(count(lit(1)).as("c_st"))
        .localCheckpoint(true)
      val ct = cst.groupBy("token").agg(sum(col("c_st")).as("c_t"))
      val ns = cst.groupBy("source").agg(sum(col("c_st")).as("n_s"))
      val n = cst.agg(sum(col("c_st")).as("n"))
      cst.join(ct, "token").join(broadcast(ns), "source").crossJoin(broadcast(n))
        .select(col("source"), col("n_s"),
          ((col("c_st").cast("double") / col("n_s")) *
            log((col("c_st").cast("double") / col("n_s")) /
              (col("c_t").cast("double") / col("n")))).as("__term"))
        .groupBy("source")
        .agg(first(col("n_s")).as("n_tokens"),
          round(sum(col("__term")), 6).as("kl_vs_corpus"))
        .orderBy("source")
    }),
    // Per-group quantile outlier trim (drop docs past their source's p99
    // length): thresholds from the partial-combinable percentile sketch,
    // probed back as a broadcast — the sketch is rank-exact at this
    // accuracy/scale, so the oracle replays Spark's documented threshold
    // semantic ("smallest x with cdf(x) >= q") directly, not DuckDB's
    // own quantile convention.
    "x_outlier_trim" -> ((s, d) => {
      val docs = T(s, d, "documents")
      // accuracy = 1<<20: the DuckDB oracle replays an exact-rank
      // threshold, and the sketch is rank-exact only while per-group
      // counts stay ≤ accuracy (quantileTrim's accuracy contract). The
      // documents table carries ~5k rows/source at sf0.1 and ~50k at
      // sf1 — 2^20 keeps the check exact through sf~20 rather than
      // turning scale-fragile at the default 10^4.
      val kept = SampleOps.quantileTrim(docs, "source", "n_chars", q = 0.99,
        accuracy = 1 << 20)
      docs.groupBy("source").agg(count(lit(1)).as("n_total"))
        .join(kept.groupBy("source").agg(count(lit(1)).as("n_kept")), "source")
        .select(col("source"), col("n_total"), col("n_kept"))
        .orderBy("source")
    }),
    // Model-based quality filter (FineWeb-Edu/DCLM shape): logistic
    // regression on weak labels (the Gopher keep rule) over hashing-trick
    // features; inference is pure column algebra (weights as literals —
    // no MLlib, no UDF on the scoring path). Invariant oracle, m7-style:
    // probabilities are probabilities, the model beats-or-ties the
    // majority-class predictor on its training set, and the mean
    // predicted probability tracks the positive rate (calibration).
    "x_quality_model" -> ((s, d) => {
      val docs = T(s, d, "documents")
      // The labeled relation feeds TWO consumers (the fit and the scored
      // eval); materialize once or the Gopher labeling pass runs twice.
      val labeled = CurationOps.gopherStats(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep").cast("int").as("label"))
        .join(docs.select(col("doc_id"), col("text")), "doc_id")
        .localCheckpoint(true)
      val model = QualityModel.train(labeled, "text", "label")
      QualityModel.score(labeled, model, "text")
        .agg(
          count(lit(1)).as("n_docs"),
          expr("bool_and(quality_prob >= 0.0 AND quality_prob <= 1.0)").as("probs_ok"),
          avg(((col("quality_prob") >= 0.5).cast("int") === col("label")).cast("int"))
            .as("__acc"),
          avg(col("label")).as("__pos"),
          avg(col("quality_prob")).as("__avgp"))
        .select(col("n_docs"), col("probs_ok"),
          (col("__acc") >= greatest(col("__pos"), lit(1.0) - col("__pos")))
            .as("beats_majority"),
          (abs(col("__avgp") - col("__pos")) <= 0.1).as("calibrated"))
    }),
    // Multiclass domain tagging (the QualityModel sibling): softmax
    // regression over hashed features predicts the language bucket the
    // mixture recipe samples by; inference is k literal-weight dot
    // products + an argmax CASE chain in whole-stage codegen — no MLlib
    // object, no UDF on the tagging path. Invariant oracle (the m7/
    // x_quality_model idiom): confidences are probabilities (winner ≥
    // 1/k), the model beats the majority-class tagger on its training
    // set, and every prediction is a known class.
    "x_domain_model" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val labeled = docs.select(col("doc_id"), col("text"), col("lang"))
        .localCheckpoint(true)
      val model = DomainModel.train(labeled, "text", "lang")
      val k = model.count().toDouble
      val classes = model.select("cls").collect().map(_.getString(0)).toSeq
      val maj = labeled.groupBy("lang").agg(count(lit(1)).as("__c"))
        .agg(max(col("__c")).cast("double").as("__nmaj"))
      DomainModel.tag(labeled, model, "text")
        .agg(
          count(lit(1)).as("n_docs"),
          expr(s"bool_and(domain_prob >= ${1.0 / k} AND domain_prob <= 1.0)")
            .as("probs_ok"),
          avg((col("domain_pred") === col("lang")).cast("int")).as("__acc"),
          bool_and(col("domain_pred").isin(classes: _*)).as("preds_known"))
        .crossJoin(broadcast(maj))
        .select(col("n_docs"), col("probs_ok"),
          (col("__acc") >= col("__nmaj") / col("n_docs")).as("beats_majority"),
          col("preds_known"))
    }),
    // Domain-graph PageRank — the Common-Crawl-style per-domain quality
    // prior (link farms sink, referenced hubs rise). The link graph is
    // synthesized deterministically (each doc "cites" the domain its
    // salted digest selects — both engines derive the identical edge
    // list), then 3 rounds of FIXED-POINT integer PageRank: every rank
    // is a scaled long, every division floors, so the result is
    // bit-identical across partitionings AND in DuckDB — a float
    // PageRank could never hash-match either.
    "x_domain_pagerank" -> ((s, d) => {
      GraphOps.pageRankFixedPoint(domainLinkEdges(T(s, d, "documents")), iters = 3)
        .select(col("node").as("source"), col("rank_fp"))
        .orderBy("source")
    }),
    // The rank's downstream consumer — authority-weighted sampling (the
    // CommonCrawl-prioritization move: low-authority domains downweight
    // in the mixture): each doc's selection weight is its DOMAIN's
    // PageRank, drawn per language without replacement via the same
    // Efraimidis–Spirakis digest keys as x_weighted_sample.
    "x_pagerank_sample" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val ranks = GraphOps.pageRankFixedPoint(domainLinkEdges(docs), iters = 3)
        .select(col("node").as("source"), col("rank_fp"))
      SampleOps.weightedSample(
          docs.join(broadcast(ranks), "source"),
          "lang", col("doc_id"), col("rank_fp").cast("double"),
          k = 10, salt = "prs|")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
  )

  /** The deterministic domain link graph shared by x_domain_pagerank
    * and x_pagerank_sample: each doc "cites" the domain its salted
    * digest selects. Domain index: the domain list is
    * domain-count-sized (tiny next to the corpus); the single-partition
    * window is the UniMax n_languages-window idiom — at true web scale
    * this indexing rides the rankDeal range-exchange instead. One extra
    * citable target beyond the crawled domains ("external.example" —
    * cited but never crawled, no out-edges) keeps the dangling-mass
    * path LIVE in the oracles, not only in GraphOpsSpec. */
  private def domainLinkEdges(docs: DataFrame): DataFrame = {
    val si = docs.select(col("source")).distinct()
      .withColumn("idx",
        row_number().over(Window.orderBy("source")).cast("long") - 1)
      .localCheckpoint(true)
    val ns = si.agg(count(lit(1)).as("__ns"))
    val targets = si.select(col("source").as("dst"), col("idx"))
      .unionByName(ns.select(lit("external.example").as("dst"),
        col("__ns").cast("long").as("idx")))
    docs.select(col("source").as("src"), col("doc_id"))
      .crossJoin(broadcast(ns))
      .withColumn("__h", sig.md5BucketCol(
        concat(lit("pr|"), col("doc_id").cast("string")), 1L << 62)
        % (col("__ns") + 1))
      .join(broadcast(targets), col("__h") === col("idx"))
      .select("src", "dst")
  }

  /** The x_data_card replay, shared VERBATIM by the one-pass query and
    * the [[graft.operators.CardStore]] maintained form — the store's
    * whole contract is that its folded card is indistinguishable. */
  private val dataCardSql =
    s"""WITH w AS (SELECT source, lang, n_chars, $words wds,
       |        md5(lower(trim(text))) fp FROM documents),
       |m AS (SELECT source, lang, n_chars, fp, len(wds) nt,
       |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
       |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
       |q AS (SELECT source, lang, n_chars, fp, nt, CAST(round(round(
       |  least(nt / 50.0, 1.0) * 0.5 +
       |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
       |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6)
       |  * 1000000.0) AS BIGINT) qu FROM m),
       |n AS (SELECT source, lang, count(*) nd FROM q GROUP BY 1, 2),
       |r AS (SELECT source, lang, n_chars,
       |        count(*) OVER (PARTITION BY source, lang ORDER BY n_chars) cum FROM q),
       |p AS (SELECT r.source, r.lang, min(n_chars) p50
       |      FROM r JOIN n USING (source, lang)
       |      WHERE cum >= ceil(0.5 * nd) GROUP BY 1, 2)
       |SELECT q.source, q.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(qu) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS avg_quality,
       |  CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
       |  round(1.0 - count(DISTINCT fp)::DOUBLE / count(*), 6) AS dup_rate,
       |  round(CAST(max(p.p50) AS DOUBLE), 2) AS p50_chars,
       |  true AS distinct_ok
       |FROM q JOIN p USING (source, lang)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The fixed-point PageRank CTE block (edge synthesis + the three
    * integer rounds) shared by the x_domain_pagerank and
    * x_pagerank_sample oracles — ONE replay of the recurrence. */
  private val pagerankCtes: String =
    """si AS (SELECT source, row_number() OVER (ORDER BY source) - 1 AS idx
        |            FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT count(*) AS c FROM si),
        |tg AS (SELECT source AS dst, idx FROM si
        |       UNION ALL SELECT 'external.example', c FROM ns),
        |e AS (SELECT d.source AS src, tg.dst
        |      FROM documents d, ns, tg
        |      WHERE tg.idx = md5_number_lower('pr|' || CAST(d.doc_id AS VARCHAR))
        |                     % 4611686018427387904 % (ns.c + 1)),
        |od AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |n2 AS (SELECT count(*) AS c FROM nodes),
        |r0 AS (SELECT node, 1000000000 // n2.c AS rank FROM nodes, n2),
        |c1 AS (SELECT e.dst AS node, sum(r.rank // od.od) AS s
        |       FROM e JOIN r0 r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY 1),
        |d1 AS (SELECT coalesce(sum(r.rank), 0) AS dang
        |       FROM r0 r LEFT JOIN od ON od.src = r.node WHERE od.src IS NULL),
        |r1 AS (SELECT n.node, (150000000 // n2.c) + (85 * coalesce(c.s, 0)) // 100
        |         + (85 * (d1.dang // n2.c)) // 100 AS rank
        |       FROM nodes n LEFT JOIN c1 c ON c.node = n.node, n2, d1),
        |c2 AS (SELECT e.dst AS node, sum(r.rank // od.od) AS s
        |       FROM e JOIN r1 r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY 1),
        |d2 AS (SELECT coalesce(sum(r.rank), 0) AS dang
        |       FROM r1 r LEFT JOIN od ON od.src = r.node WHERE od.src IS NULL),
        |r2 AS (SELECT n.node, (150000000 // n2.c) + (85 * coalesce(c.s, 0)) // 100
        |         + (85 * (d2.dang // n2.c)) // 100 AS rank
        |       FROM nodes n LEFT JOIN c2 c ON c.node = n.node, n2, d2),
        |c3 AS (SELECT e.dst AS node, sum(r.rank // od.od) AS s
        |       FROM e JOIN r2 r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY 1),
        |d3 AS (SELECT coalesce(sum(r.rank), 0) AS dang
        |       FROM r2 r LEFT JOIN od ON od.src = r.node WHERE od.src IS NULL),
        |r3 AS (SELECT n.node, (150000000 // n2.c) + (85 * coalesce(c.s, 0)) // 100
        |         + (85 * (d3.dang // n2.c)) // 100 AS rank
        |       FROM nodes n LEFT JOIN c3 c ON c.node = n.node, n2, d3)""".stripMargin

  def oracles: Map[String, String] = Map(
    "x_token_stats" ->
      s"""WITH w AS (SELECT doc_id, text, length(text) nc, $words wds FROM documents)
         |SELECT doc_id, CAST(len(wds) AS INTEGER) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]+')) AS INTEGER) AS n_bpe_tokens,
         |  CAST(nc AS INTEGER) AS n_chars2,
         |  round(list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds), 6) AS avg_word_len,
         |  round(len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds), 6) AS stopword_ratio
         |FROM w ORDER BY doc_id""".stripMargin,
    "x_quality" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |m AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w)
         |SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,
    // Script-detect replay: same 1:1 transliteration, same literal
    // code-point classes (RE2 and Java agree on explicit ranges), same
    // argmax tie order.
    "x_script_detect" ->
      """WITH t AS (SELECT doc_id, CASE
        |    WHEN doc_id % 4 = 1 THEN translate(text,
        |      'abcdefghijklmnopqrstuvwxyz', 'абвгдежзийклмнопрстуфхцчшщ')
        |    WHEN doc_id % 4 = 2 THEN translate(text,
        |      'abcdefghijklmnopqrstuvwxyz', 'αβγδεζηθικλμνξοπρστυφχψωάέ')
        |    WHEN doc_id % 4 = 3 THEN translate(text,
        |      'abcdefghijklmnopqrstuvwxyz', '数据模型训练语言文本分析处理系统网络算法机器学习深度')
        |    ELSE text END AS t FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z]')) AS INTEGER) n_latin,
        |  CAST(len(regexp_extract_all(t, '[Ѐ-ӿ]')) AS INTEGER) n_cyrillic,
        |  CAST(len(regexp_extract_all(t, '[Ͱ-Ͽ]')) AS INTEGER) n_greek,
        |  CAST(len(regexp_extract_all(t, '[一-鿿]')) AS INTEGER) n_han FROM t)
        |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_han,
        |  CASE WHEN greatest(n_latin, n_cyrillic, n_greek, n_han) = 0 THEN 'und'
        |       WHEN n_latin = greatest(n_latin, n_cyrillic, n_greek, n_han) THEN 'latin'
        |       WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_greek, n_han) THEN 'cyrillic'
        |       WHEN n_greek = greatest(n_latin, n_cyrillic, n_greek, n_han) THEN 'greek'
        |       ELSE 'han' END AS script
        |FROM c ORDER BY doc_id""".stripMargin,
    // Language-confidence replay: same profile scores, margin via the
    // same sorted-array positions, same confidence rule.
    "x_langid_confidence" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |s AS (SELECT doc_id,
         |  CAST(len(list_filter(wds, t -> t IN ('the','and','of','is','a'))) AS INTEGER) s_en,
         |  CAST(len(list_filter(wds, t -> t IN ('der','die','und','ist','das'))) AS INTEGER) s_de,
         |  CAST(len(list_filter(wds, t -> t IN ('el','los','y','es','una'))) AS INTEGER) s_es,
         |  CAST(len(list_filter(wds, t -> t IN ('le','la','et','est','une'))) AS INTEGER) s_fr FROM w),
         |m AS (SELECT doc_id, s_en, s_de, s_es, s_fr,
         |  list_sort([s_en, s_de, s_es, s_fr]) srt FROM s)
         |SELECT doc_id, s_en, s_de, s_es, s_fr,
         |  srt[4] - srt[3] AS margin,
         |  (srt[4] > 0 AND srt[4] - srt[3] >= 2) AS confident
         |FROM m ORDER BY doc_id""".stripMargin,
    "x_langid" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |s AS (SELECT doc_id,
         |  len(list_filter(wds, t -> t IN ('the','and','of','is','a'))) s_en,
         |  len(list_filter(wds, t -> t IN ('der','die','und','ist','das'))) s_de,
         |  len(list_filter(wds, t -> t IN ('el','los','y','es','una'))) s_es,
         |  len(list_filter(wds, t -> t IN ('le','la','et','est','une'))) s_fr FROM w)
         |SELECT doc_id, CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |  ELSE 'fr' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,
    // Expectation-report replay: each check is a plain conditional
    // count; uniqueness = count - count(DISTINCT); FK = anti-join count.
    "x_data_quality" ->
      """WITH checks AS (
        |  SELECT 'orderkey_not_null' chk,
        |    count(*) FILTER (WHERE o_orderkey IS NULL) v FROM orders
        |  UNION ALL SELECT 'totalprice_positive',
        |    count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0.0, false)) FROM orders
        |  UNION ALL SELECT 'status_in_domain',
        |    count(*) FILTER (WHERE NOT coalesce(o_orderstatus IN ('O','F','P'), false)) FROM orders
        |  UNION ALL SELECT 'orderdate_in_range',
        |    count(*) FILTER (WHERE NOT coalesce(o_orderdate BETWEEN
        |      TIMESTAMP '1992-01-01' AND TIMESTAMP '1998-12-31 23:59:59', false)) FROM orders
        |  UNION ALL SELECT 'priority_not_blank',
        |    count(*) FILTER (WHERE NOT coalesce(length(trim(o_orderpriority)) > 0, false)) FROM orders
        |  UNION ALL SELECT 'orderkey_unique',
        |    count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
        |  UNION ALL SELECT 'custkey_fk',
        |    (SELECT count(*) FROM orders o LEFT JOIN customer c
        |       ON o.o_custkey = c.c_custkey
        |     WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL))
        |SELECT chk AS check, CAST(v AS BIGINT) AS n_violations, v = 0 AS pass
        |FROM checks ORDER BY 1""".stripMargin,
    // Data card: one grouped replay of the per-(source, lang) summary.
    // Quality rounds to 6 per-doc then converts to integer MILLIONTHS
    // before averaging — a double mean of 6-decimal values lands on
    // decimal-half rounding boundaries where the engines disagree, so
    // the mean is exact-integer-sum / identical-double-division with no
    // rounding at all; the median replays the documented "smallest x
    // with cdf >= ceil(q*n)" sketch semantic; the exact fingerprint
    // distinct carries the HLL contract boolean (±max(10%, 10) — no
    // sparse mode in Spark's HLL++, so tiny cells can miss by ±1-2).
    "x_data_card" -> dataCardSql,
    // The maintained card must be INDISTINGUISHABLE from the global
    // one-pass computation — same oracle, verbatim.
    "x_data_card_incremental" -> dataCardSql,
    // NFC replay: DuckDB's nfc_normalize is the same Unicode TR15
    // canonical composition as java.text.Normalizer — byte-for-byte.
    "x_text_normalize" ->
      """WITH raw AS (SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' cafe' || chr(769)
        |         ELSE text END r
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(r) - length(nfc_normalize(r)) AS INTEGER) AS n_composed,
        |  nfc_normalize(r) <> r AS changed,
        |  substring(nfc_normalize(r), -6, 6) AS tail
        |FROM raw ORDER BY doc_id""".stripMargin,
    // Corpus diff replay: identical synthetic v1 (drop %7, stale text
    // on %11), fingerprint full-outer, per-source status counts.
    "x_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, source s1, md5(lower(trim(
        |        CASE WHEN doc_id % 11 = 0 THEN text || ' stale' ELSE text END))) fp1
        |      FROM documents WHERE doc_id % 7 <> 0),
        |v2 AS (SELECT doc_id, source s2, md5(lower(trim(text))) fp2 FROM documents),
        |j AS (SELECT coalesce(s2, s1) source,
        |        CASE WHEN fp1 IS NULL THEN 'added'
        |             WHEN fp2 IS NULL THEN 'removed'
        |             WHEN fp1 <> fp2 THEN 'changed'
        |             ELSE 'same' END st
        |      FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        |SELECT source,
        |  CAST(count(*) FILTER (WHERE st = 'added') AS BIGINT) AS n_added,
        |  CAST(count(*) FILTER (WHERE st = 'removed') AS BIGINT) AS n_removed,
        |  CAST(count(*) FILTER (WHERE st = 'changed') AS BIGINT) AS n_changed,
        |  CAST(count(*) FILTER (WHERE st = 'same') AS BIGINT) AS n_same
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // Token-divergence replay: same unigram KL over the shared token
    // stream; ln differences across libms sit at ulp scale, absorbed by
    // the 6-decimal round.
    "x_token_divergence" ->
      s"""WITH t AS (SELECT source, unnest($words) token FROM documents),
        |cst AS (SELECT source, token, count(*) c_st FROM t GROUP BY 1, 2),
        |ct AS (SELECT token, sum(c_st) c_t FROM cst GROUP BY 1),
        |ns AS (SELECT source, sum(c_st) n_s FROM cst GROUP BY 1),
        |n AS (SELECT sum(c_st) n FROM cst)
        |SELECT cst.source, CAST(max(ns.n_s) AS BIGINT) AS n_tokens,
        |  round(sum((c_st::DOUBLE / n_s) * ln((c_st::DOUBLE / n_s) / (c_t::DOUBLE / n.n))), 6)
        |    AS kl_vs_corpus
        |FROM cst JOIN ct USING (token) JOIN ns ON cst.source = ns.source, n
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Outlier trim replay: the threshold is Spark percentile_approx's
    // documented semantic — the SMALLEST value whose cumulative count
    // reaches ceil(q*n) — spelled out as a window cumsum + min, so the
    // two engines' differing quantile conventions never meet.
    "x_outlier_trim" ->
      """WITH n AS (SELECT source, count(*) n_total FROM documents GROUP BY 1),
        |r AS (SELECT source, n_chars,
        |        count(*) OVER (PARTITION BY source ORDER BY n_chars) cum
        |      FROM documents),
        |thr AS (SELECT r.source, min(n_chars) thr FROM r JOIN n USING (source)
        |        WHERE cum >= ceil(0.99 * n_total) GROUP BY 1)
        |SELECT d.source, CAST(n.n_total AS BIGINT) AS n_total,
        |  CAST(count(*) FILTER (WHERE d.n_chars <= thr.thr) AS BIGINT) AS n_kept
        |FROM documents d JOIN n USING (source) JOIN thr ON thr.source = d.source
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // Model-output invariant oracle (the m7 idiom): the classifier's
    // contract — probability range, beats-majority, calibration — is
    // checked in-plan; DuckDB confirms the count and the booleans.
    "x_quality_model" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS probs_ok,
        |  true AS beats_majority, true AS calibrated
        |FROM documents""".stripMargin,
    // Model-output invariant oracle (the x_quality_model idiom) for the
    // multiclass tagger: count + the three contract booleans.
    "x_domain_model" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS probs_ok,
        |  true AS beats_majority, true AS preds_known
        |FROM documents""".stripMargin,
    // Fixed-point PageRank replay: the identical digest-derived edge
    // list, then the three integer-arithmetic rounds written out —
    // every // is the same floor division the engine runs, so the
    // longs match bit for bit.
    "x_domain_pagerank" ->
      s"""WITH $pagerankCtes
        |SELECT node AS source, CAST(rank AS BIGINT) AS rank_fp
        |FROM r3 ORDER BY source""".stripMargin,
    // Authority-weighted sampling: the r3 ranks joined onto docs by
    // domain, then the x_weighted_sample Efraimidis–Spirakis draw with
    // rank_fp as the weight.
    "x_pagerank_sample" ->
      s"""WITH $pagerankCtes,
        |dw AS (SELECT d.doc_id, d.lang, r.rank
        |       FROM documents d JOIN r3 r ON r.node = d.source)
        |SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY round(-ln((md5_number_lower('prs|' || CAST(doc_id AS VARCHAR)) % 1000000 + 0.5)
        |      / 1000000.0) / CAST(rank AS DOUBLE), 9), doc_id) rk
        |  FROM dw WHERE rank > 0)
        |WHERE rk <= 10 ORDER BY doc_id""".stripMargin,
    // Gopher repetition rules: line structure synthesized identically,
    // then duplicate-line fraction + modal-bigram coverage.
    "x_repetition" ->
      s"""WITH t AS (SELECT doc_id,
        |        CASE WHEN doc_id % 13 = 0 THEN
        |               'breaking news update' || chr(10) || 'breaking news update' || chr(10) ||
        |               'breaking news update' || chr(10) || 'breaking news update' || chr(10) || 'fresh line'
        |             WHEN doc_id % 29 = 0 THEN text || repeat(' spark streaming', 40)
        |             ELSE regexp_replace(text, ' value ', chr(10), 'g') END AS text
        |           FROM documents),
        |l AS (SELECT doc_id,
        |        list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') ls,
        |        $words wds
        |      FROM t),
        |d AS (SELECT doc_id,
        |        CASE WHEN len(ls) > 0 THEN 1.0 - len(list_distinct(ls))::DOUBLE / len(ls)
        |             ELSE 0.0 END dlf,
        |        list_transform(generate_series(1, greatest(len(wds) - 1, 0)),
        |          i -> wds[i] || ' ' || wds[i + 1]) bg
        |      FROM l),
        |e AS (SELECT doc_id, unnest(bg) g FROM d),
        |m AS (SELECT doc_id, max(c) top, sum(c) tot
        |      FROM (SELECT doc_id, g, count(*) c FROM e GROUP BY 1, 2) GROUP BY 1)
        |SELECT d.doc_id, round(dlf, 6) AS dup_line_frac,
        |  round(coalesce(top::DOUBLE / tot, 0.0), 6) AS top_bigram_frac,
        |  (dlf < 0.3 AND coalesce(top::DOUBLE / tot, 0.0) < 0.2) AS keep
        |FROM d LEFT JOIN m ON m.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // Full Gopher rules: same deterministic structure synthesis, same
    // modal-n-gram coverage per n ∈ {2,3,4}, same line/word signals.
    "x_gopher_full" ->
      s"""WITH t AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 5 = 0 THEN '- item one' || chr(10) || '- item two' || chr(10) ELSE '' END) ||
        |    regexp_replace(text, ' value ', chr(10), 'g') ||
        |    (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'wait for it...' ELSE '' END) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN ' ## #' ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10) || 'repeated closing paragraph' ||
        |      chr(10) || chr(10) || 'repeated closing paragraph' ELSE '' END) AS text
        |  FROM documents),
        |tw AS (SELECT doc_id, text, $words wds FROM t),
        |${gopherCtes("tw")}
        |SELECT gst.doc_id, round(dlf, 6) AS dup_line_frac,
        |  round(dpf, 6) AS dup_paragraph_frac,
        |  round(dlcf, 6) AS dup_line_char_frac,
        |  round(dpcf, 6) AS dup_paragraph_char_frac,
        |  round(coalesce(t2, 0.0), 6) AS top_2gram_frac,
        |  round(coalesce(t3, 0.0), 6) AS top_3gram_frac,
        |  round(coalesce(t4, 0.0), 6) AS top_4gram_frac,
        |  round(swr, 6) AS symbol_word_ratio,
        |  round(blf, 6) AS bullet_line_frac,
        |  round(elf, 6) AS ellipsis_line_frac,
        |  round(mwl, 6) AS mean_word_len,
        |  nw AS n_words, round(awf, 6) AS alpha_word_frac,
        |  nsh AS n_stop_hits,
        |  $gopherKeepSql AS keep
        |FROM gst LEFT JOIN gp USING (doc_id)
        |ORDER BY gst.doc_id""".stripMargin,
    // Decontamination: distinct 3-gram digests of the eval slice probed
    // by every training doc.
    "x_decontaminate" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |g AS (SELECT doc_id,
        |        list_distinct(list_transform(generate_series(1, greatest(len(wds) - 2, 0)),
        |          i -> md5(array_to_string(wds[i:i+2], ' ')))) gs
        |      FROM w),
        |ev AS (SELECT DISTINCT unnest(gs) g FROM g WHERE doc_id % 13 = 0),
        |tr AS (SELECT doc_id, unnest(gs) g FROM g WHERE doc_id % 13 <> 0),
        |c AS (SELECT t.doc_id, count(ev.g) n FROM tr t LEFT JOIN ev ON ev.g = t.g GROUP BY 1)
        |SELECT tb.doc_id, coalesce(c.n, 0) AS n_overlap,
        |  coalesce(c.n, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 13 <> 0) tb
        |LEFT JOIN c ON c.doc_id = tb.doc_id
        |ORDER BY tb.doc_id""".stripMargin,
    // Standing registry probe: the two suites' distinct 3-gram digests
    // (per-suite), every training doc's distinct-gram overlap vs the
    // union plus the sorted hit-suite list.
    "x_decontam_store" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |g AS (SELECT doc_id,
        |        list_distinct(list_transform(generate_series(1, greatest(len(wds) - 2, 0)),
        |          i -> md5(array_to_string(wds[i:i+2], ' ')))) gs
        |      FROM w),
        |ev AS (SELECT 'suite_a' AS suite, unnest(gs) g FROM g
        |         WHERE doc_id % 13 = 0 AND doc_id % 2 = 0
        |       UNION
        |       SELECT 'suite_b', unnest(gs) FROM g
        |         WHERE doc_id % 13 = 0 AND doc_id % 2 = 1),
        |tr AS (SELECT doc_id, unnest(gs) g FROM g WHERE doc_id % 13 <> 0),
        |c AS (SELECT t.doc_id,
        |        count(DISTINCT CASE WHEN ev.suite IS NOT NULL THEN t.g END) n,
        |        string_agg(DISTINCT ev.suite, ',' ORDER BY ev.suite) hs
        |      FROM tr t LEFT JOIN ev ON ev.g = t.g GROUP BY 1)
        |SELECT tb.doc_id, coalesce(c.n, 0) AS n_overlap,
        |  coalesce(c.n, 0) > 0 AS contaminated,
        |  coalesce(c.hs, '') AS hit_suites
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 13 <> 0) tb
        |LEFT JOIN c ON c.doc_id = tb.doc_id
        |ORDER BY tb.doc_id""".stripMargin,
    // Retro pass: the training corpus vs ONLY suite_b's digests,
    // contaminated rows only.
    "x_decontam_retro" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |g AS (SELECT doc_id,
        |        list_distinct(list_transform(generate_series(1, greatest(len(wds) - 2, 0)),
        |          i -> md5(array_to_string(wds[i:i+2], ' ')))) gs
        |      FROM w),
        |ev AS (SELECT DISTINCT unnest(gs) g FROM g
        |       WHERE doc_id % 13 = 0 AND doc_id % 2 = 1),
        |tr AS (SELECT doc_id, unnest(gs) g FROM g WHERE doc_id % 13 <> 0),
        |c AS (SELECT t.doc_id, count(ev.g) n
        |      FROM tr t LEFT JOIN ev ON ev.g = t.g GROUP BY 1)
        |SELECT doc_id, n AS n_overlap FROM c WHERE n > 0
        |ORDER BY doc_id""".stripMargin,
    // PII redaction replay: same synthetic PII, same RE2-safe patterns,
    // same replacement order (emails → IPs → spaced phones → contiguous
    // phones). DuckDB backreferences are \1-style where Spark's are $1.
    "x_pii_redact" ->
      """WITH t AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@mail.example.com or +1 (555) 010-' ||
        |    doc_id || ' at 192.168.' || (doc_id % 256) || '.17' AS text FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '(^|[^\d])((\+?\d{1,3}[\s.-])?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4})([^\d]|$)', '\1<PHONE>\4', 'g'),
        |    '\+?\d[\d().-]{6,}\d', '<PHONE>', 'g') AS redacted
        |FROM t ORDER BY doc_id""".stripMargin,
    // Curation funnel replay: the x_langid, x_quality, x_gopher_full
    // (raw text, no synthesis) and PII-count fragments composed into the
    // one admission verdict.
    "x_curation_verdict" ->
      s"""WITH w AS (SELECT doc_id, text, $words wds FROM documents),
         |lg AS (SELECT doc_id,
         |  len(list_filter(wds, t -> t IN ('the','and','of','is','a'))) s_en,
         |  len(list_filter(wds, t -> t IN ('der','die','und','ist','das'))) s_de,
         |  len(list_filter(wds, t -> t IN ('el','los','y','es','una'))) s_es,
         |  len(list_filter(wds, t -> t IN ('le','la','et','est','une'))) s_fr FROM w),
         |lang AS (SELECT doc_id, CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |  ELSE 'fr' END AS lang_pred FROM lg),
         |qm AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS quality
         |  FROM qm),
         |pii AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
         |       len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INTEGER) n_pii
         |  FROM w),
         |${gopherCtes("w")},
         |g AS (SELECT gst.doc_id, $gopherKeepSql AS gopher_keep
         |  FROM gst LEFT JOIN gp USING (doc_id))
         |SELECT w.doc_id, lang.lang_pred, q.quality, pii.n_pii, g.gopher_keep,
         |  (lang.lang_pred <> 'und' AND q.quality >= 0.5 AND g.gopher_keep
         |   AND pii.n_pii = 0) AS admit
         |FROM w JOIN lang USING (doc_id) JOIN q USING (doc_id)
         |JOIN pii USING (doc_id) JOIN g USING (doc_id)
         |ORDER BY w.doc_id""".stripMargin,
    // Corpus report card: one aggregation over the same token stream.
    "x_corpus_stats" ->
      s"""WITH w AS (SELECT doc_id, lang, text, $words wds FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(wds)) AS BIGINT) AS n_tokens,
        |  round(avg(len(wds)), 6) AS avg_tokens,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
        |  round(1.0 - count(DISTINCT md5(text))::DOUBLE / count(*), 6) AS dup_frac
        |FROM w""".stripMargin,
    // Global-shuffle replay: same salted digest (unsigned lower-64 md5
    // mod 2^62), same (digest, key-as-STRING) order — both engines
    // string-order the tie-break — same round-robin deal.
    // Banned-words replay: same token stream, same literal lexicon.
    "x_badwords_filter" ->
      s"""WITH p AS (SELECT doc_id,
         |    text || (CASE WHEN doc_id % 17 = 0 THEN ' crash' ELSE '' END)
         |         || (CASE WHEN doc_id % 23 = 0 THEN ' spill corrupt' ELSE '' END) AS text
         |  FROM documents),
         |w AS (SELECT doc_id, $words wds FROM p)
         |SELECT doc_id,
         |  CAST(len(list_filter(wds, t -> t IN ('spill', 'crash', 'corrupt')))
         |    AS INTEGER) AS n_banned,
         |  len(list_filter(wds, t -> t IN ('spill', 'crash', 'corrupt'))) = 0 AS keep
         |FROM w ORDER BY doc_id""".stripMargin,
    // Compression-ratio invariants are Spark-computed (no deflate in
    // DuckDB) — the oracle pins the doc count and all-true verdicts.
    "x_compress_ratio" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS sizes_positive,
        |  true AS bounded_overhead, true AS repetition_detected
        |FROM documents""".stripMargin,
    // Opt-out replay: the canonical host of this synthesis reduces to
    // www.<source>.com — deriving it directly re-asserts the
    // canonicalization chain's output; same blocklist regex.
    "x_optout_filter" ->
      """WITH h AS (SELECT doc_id, 'www.' || lower(source) || '.com' host
        |           FROM documents)
        |SELECT doc_id, host,
        |  regexp_matches(host, '^www\.src[0-3]\.') AS opted_out
        |FROM h ORDER BY doc_id""".stripMargin,
    // Sequence-length histogram replay: bucket = bit-length − 1
    // (integer-exact floor(log2); %b printf), token-less docs in their
    // own -1 bucket.
    "x_seqlen_histogram" ->
      s"""WITH w AS (SELECT $words wds FROM documents),
        |b AS (SELECT CASE WHEN len(wds) = 0 THEN -1
        |        ELSE CAST(length(printf('%b', len(wds))) - 1 AS INTEGER) END bucket,
        |        len(wds) n FROM w)
        |SELECT bucket, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // Novelty replay: same shingle stream (string-keyed — proving the
    // digest join collision-free), same reference slice, same ratio.
    "x_ngram_novelty" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |  CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2),
         |    i -> array_to_string(wds[i:i+2], ' ')) END)) m FROM w),
         |ref AS (SELECT DISTINCT m FROM sh WHERE doc_id % 2 = 0),
         |j AS (SELECT sh.doc_id, count(*) ns, count(ref.m) seen
         |      FROM sh LEFT JOIN ref ON ref.m = sh.m GROUP BY 1)
         |SELECT doc_id, ns AS n_shingles, ns - seen AS n_novel,
         |  round((ns - seen)::DOUBLE / ns, 6) AS novelty
         |FROM j ORDER BY doc_id""".stripMargin,
    // Char-entropy replay: same char stream, same p·ln p fold over the
    // distinct chars (fp association differences sit ~1e-16, absorbed
    // by round 6). "+ 0.0" after round normalizes -0.0 on the planted
    // single-char docs — DuckDB's round preserves the negated-sum sign,
    // Spark's drops it; mirrored on the Spark side.
    "x_char_entropy" ->
      """WITH p AS (SELECT doc_id,
        |    CASE WHEN doc_id % 19 = 0 THEN repeat('a', 64) ELSE text END AS text
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, ''), x -> x <> '') ch FROM p),
        |e AS (SELECT doc_id, len(ch) n,
        |  -list_sum(list_transform(list_distinct(ch), d2 ->
        |    (len(list_filter(ch, x -> x = d2))::DOUBLE / len(ch)) *
        |    ln(len(list_filter(ch, x -> x = d2))::DOUBLE / len(ch)))) ent
        |  FROM c)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_chars,
        |  CASE WHEN n = 0 THEN 0.0 ELSE round(ent, 6) + 0.0 END AS entropy,
        |  (CASE WHEN n = 0 THEN 0.0 ELSE round(ent, 6) + 0.0 END) >= 1.5 AS keep
        |FROM e ORDER BY doc_id""".stripMargin,
    // HTML extraction replay: same wrapper, same RE2 patterns (the
    // kernel is RE2-safe by construction), same entity order with
    // &amp; last, same explicit whitespace class.
    "x_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head><title>Page</title><style type="text/css">p { color: red; }</style>' ||
        |    '<script>var x = 1; if (x < 2) { x = 2; }</script></head><body><h1>' ||
        |    source || '</h1><!-- nav --><p>' ||
        |    regexp_replace(text, ' value ', '</p><p>', 'g') ||
        |    '</p><div class="footer">&copy; 2024 &amp; friends &lt;here&gt;' ||
        |    '&amp;lt;kept&amp;gt;</div></body></html>' AS html
        |  FROM documents),
        |e AS (SELECT doc_id, trim(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(html,
        |      '(?is)(?:<!--.*?-->|<script\b[^>]*>.*?</script[ \t\n\x0b\f\r]*>|<style\b[^>]*>.*?</style[ \t\n\x0b\f\r]*>)', ' ', 'g'),
        |      '(?is)<(?:script|style)\b[^>]*>.*$', ' ', 'g'),
        |      '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |      '&#39;', chr(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
        |    '[ \t\n\x0b\f\r]+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, clean, CAST(length(clean) AS INTEGER) AS n_chars_clean
        |FROM e ORDER BY doc_id""".stripMargin,
    // C4 line/page filters: same synthesized structure, same line
    // predicate (terminal punctuation, >= 5 words, no "javascript"),
    // same page flags and >= 3-retained-lines keep.
    "x_c4_clean" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_replace(text, ' value ', '.' || chr(10), 'g') ||
        |    (CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END) ||
        |    (CASE WHEN doc_id % 19 = 0 THEN chr(10) || 'if (x) { return y; }' ELSE '' END) AS text
        |  FROM documents),
        |c AS (SELECT doc_id, text,
        |    list_filter(string_split(text, chr(10)), l ->
        |      regexp_matches(trim(l), '[.!?"'']$')
        |      AND len(list_filter(regexp_split_to_array(trim(l), '[ \t\n\x0b\f\r]+'), w -> w <> '')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) kept
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '')) AS INTEGER) AS n_lines,
        |  CAST(len(kept) AS INTEGER) AS n_kept,
        |  substring(coalesce(array_to_string(kept, chr(10)), ''), 1, 80) AS cleaned_head,
        |  contains(lower(text), 'lorem ipsum') AS has_lorem,
        |  contains(text, '{') AS has_brace,
        |  (NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
        |    AND len(kept) >= 3) AS keep
        |FROM c ORDER BY doc_id""".stripMargin,
    // Unigram cross-entropy: H = ln(N+V) − mean ln(c(w)+1), summed in
    // the same sum/count form as the Spark agg; keep gated on the
    // rounded value and on n_tokens > 0 (token-less docs never keep).
    "x_unigram_ppl" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |e AS (SELECT doc_id, unnest(wds) token FROM w),
        |c AS (SELECT token, count(*) c FROM e GROUP BY 1),
        |t AS (SELECT sum(c) n, count(*) v FROM c),
        |h AS (SELECT e.doc_id, count(*) n_tokens,
        |        ln((SELECT n + v FROM t)) - sum(ln(c.c + 1)) / count(*) ce
        |      FROM e JOIN c ON c.token = e.token GROUP BY e.doc_id)
        |SELECT w.doc_id, coalesce(h.n_tokens, 0) AS n_tokens,
        |  round(coalesce(h.ce, 0.0), 6) AS cross_entropy,
        |  coalesce(round(h.ce, 6) < 3.41, false) AS keep
        |FROM w LEFT JOIN h ON h.doc_id = w.doc_id
        |ORDER BY w.doc_id""".stripMargin,
    // Interpolated-bigram cross-entropy replay: same even-slice
    // reference, same pair extraction (list_zip of the shifted lists),
    // same 0.7/0.3 decimal weights, unseen context zeroing the bigram
    // leg, add-1 unigram leg over (N+V). The SAME oracle also gates
    // x_bigram_ppl_store: the persisted-ledger model over init ∪ append
    // must be indistinguishable from the in-memory model of the union.
    "x_bigram_ppl" -> bigramPplSql,
    "x_bigram_ppl_store" -> bigramPplSql,
    // CCNet perplexity buckets: same cross-entropy chain, then
    // per-language tercile thresholds replayed with Spark's documented
    // percentile semantic — smallest x with cdf >= q at rank
    // ceil(q * n) — as a cumulative count window (the x_outlier_trim
    // idiom), never DuckDB's own quantile convention.
    "x_ppl_buckets" ->
      s"""WITH w AS (SELECT doc_id, lang, $words wds FROM documents),
        |e AS (SELECT doc_id, unnest(wds) token FROM w),
        |c AS (SELECT token, count(*) c FROM e GROUP BY 1),
        |t AS (SELECT sum(c) n, count(*) v FROM c),
        |h AS (SELECT e.doc_id, count(*) n_tokens,
        |        ln((SELECT n + v FROM t)) - sum(ln(c.c + 1)) / count(*) ce
        |      FROM e JOIN c ON c.token = e.token GROUP BY e.doc_id),
        |d AS (SELECT w.doc_id, w.lang, coalesce(h.n_tokens, 0) nt,
        |        round(coalesce(h.ce, 0.0), 6) ce
        |      FROM w LEFT JOIN h ON h.doc_id = w.doc_id),
        |nz AS (SELECT * FROM d WHERE nt > 0),
        |n AS (SELECT lang, count(*) n FROM nz GROUP BY 1),
        |r AS (SELECT lang, ce,
        |        count(*) OVER (PARTITION BY lang ORDER BY ce) cum FROM nz),
        |t1 AS (SELECT r.lang, min(ce) t1 FROM r JOIN n USING (lang)
        |       WHERE cum >= ceil(n.n / 3.0) GROUP BY 1),
        |t2 AS (SELECT r.lang, min(ce) t2 FROM r JOIN n USING (lang)
        |       WHERE cum >= ceil(2 * n.n / 3.0) GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.ce AS cross_entropy,
        |  CASE WHEN d.nt = 0 THEN 'empty'
        |       WHEN d.ce <= t1.t1 THEN 'head'
        |       WHEN d.ce <= t2.t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM d LEFT JOIN t1 ON t1.lang = d.lang
        |  LEFT JOIN t2 ON t2.lang = d.lang
        |ORDER BY d.doc_id""".stripMargin,
    // Embedding decontamination: per-train max cosine vs the eval slice,
    // flag on the rounded value.
    "x_decontaminate_embed" ->
      """WITH tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 13 <> 0),
        |ev AS (SELECT vec_id eid, embedding ee FROM embeddings WHERE vec_id % 13 = 0),
        |u AS (SELECT t.vec_id, e.eid, unnest(t.embedding)::DOUBLE x,
        |        unnest(e.ee)::DOUBLE y FROM tr t, ev e),
        |s AS (SELECT vec_id, eid,
        |        sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim
        |      FROM u GROUP BY 1, 2),
        |m AS (SELECT vec_id, max(sim) ms FROM s GROUP BY 1)
        |SELECT t.vec_id, round(coalesce(m.ms, 0.0), 6) AS max_sim,
        |  coalesce(round(m.ms, 6) >= 0.35, false) AS contaminated
        |FROM tr t LEFT JOIN m ON m.vec_id = t.vec_id
        |ORDER BY t.vec_id""".stripMargin,
    "x_oov_rate" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |v AS (SELECT token FROM (
        |    SELECT unnest(wds) token FROM w) GROUP BY token
        |  ORDER BY count(*) DESC, token LIMIT 100),
        |e AS (SELECT doc_id, unnest(wds) token FROM w),
        |c AS (SELECT e.doc_id, count(*) n_tokens,
        |    count(CASE WHEN v.token IS NULL THEN 1 END) n_oov
        |  FROM e LEFT JOIN v ON v.token = e.token GROUP BY e.doc_id)
        |SELECT w.doc_id, coalesce(c.n_tokens, 0) AS n_tokens,
        |  coalesce(c.n_oov, 0) AS n_oov,
        |  CASE WHEN coalesce(c.n_tokens, 0) > 0
        |       THEN round(c.n_oov::DOUBLE / c.n_tokens, 6) ELSE 0.0 END AS oov_rate
        |FROM w LEFT JOIN c ON c.doc_id = w.doc_id
        |ORDER BY w.doc_id""".stripMargin,
    // Vocabulary head: same token stream, same deterministic tie-break.
    "x_vocab_topk" ->
      s"""WITH w AS (SELECT unnest($words) token FROM documents)
        |SELECT token, count(*) AS cnt FROM w GROUP BY token
        |ORDER BY cnt DESC, token LIMIT 50""".stripMargin,
    // Per-source tf-idf replay: same tokenization, each source one
    // pseudo-document, gf = sources containing the term, idf over the
    // source count, same round-6 score and (score desc, token) ties.
    "x_tfidf_terms" ->
      s"""WITH w AS (SELECT source, unnest($words) token FROM documents),
         |tf AS (SELECT source, token, count(*) cnt FROM w GROUP BY 1, 2),
         |gf AS (SELECT token, count(*) gf FROM tf GROUP BY 1),
         |ns AS (SELECT count(DISTINCT source) n FROM tf),
         |sc AS (SELECT tf.source, tf.token, tf.cnt,
         |  round(tf.cnt * ln(ns.n::DOUBLE / gf.gf), 6) AS tfidf
         |  FROM tf JOIN gf USING (token) CROSS JOIN ns),
         |r AS (SELECT *, row_number() OVER
         |  (PARTITION BY source ORDER BY tfidf DESC, token) rn FROM sc)
         |SELECT source, token, cnt, tfidf FROM r WHERE rn <= 5
         |ORDER BY source, tfidf DESC, token""".stripMargin,
    // URL canonicalization: identical synthesis, identical replace
    // chain (fragment → utm + repair → default port → lowercase prefix
    // → trailing slash); RE2 backrefs are \n where Java's are $n.
    "x_url_canon" ->
      """WITH t AS (SELECT doc_id,
        |    'HTTPS://WWW.' || upper(source) || '.COM:443/Docs/' || (doc_id % 100) ||
        |    '/?utm_source=feed&utm_campaign=x' ||
        |    CASE WHEN doc_id % 2 = 0 THEN '&ref=a' ELSE '' END ||
        |    '#section-' || doc_id AS url FROM documents),
        |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '', 'g') u FROM t),
        |s2 AS (SELECT doc_id, url, regexp_replace(u, '[?&]utm_[A-Za-z_]*=[^&#]*', '', 'g') u FROM s1),
        |s3 AS (SELECT doc_id, url, regexp_replace(u, '^([^?]*)&', '\1?') u FROM s2),
        |s4 AS (SELECT doc_id, url, regexp_replace(u, '^([^/?#]*//(?:[^/?#@]*@)?(?:\[[^\]]*\]|[^/?#:@]*)):(80|443)([/?#]|$)', '\1\3') u FROM s3),
        |s5 AS (SELECT doc_id, url, u, regexp_extract(u, '^([^/?#]*//[^/?#]*)', 1) p FROM s4),
        |s6 AS (SELECT doc_id, url, lower(p) || substr(u, len(p) + 1) u FROM s5)
        |SELECT doc_id, url, regexp_replace(u, '/$', '') AS canonical
        |FROM s6 ORDER BY doc_id""".stripMargin,
  )
}
