package graft

import graft.functions.{sig, text, vector, VectorMeanFast}
import graft.operators.{Bm25, Bm25Store, ClusterRefine, CurationOps, DedupOps, DomainModel, IvfAnn, LayoutOps, MultimodalOps, PqOps, QualityModel, QuantizeOps, Recommend, RecommendML, Rerank, Rrf, SampleOps, SemDedup, SemDedupStore, SimilarityOps, SkewOps, SpanDedup, StoryOps, TemporalOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QShared._
import OracleDefs._

/** Mixing / sampling / ordering / packing / tokenizer queries — the training-data assembly families.
 *
 * One `queries` entry per operator with its DuckDB oracle in
 * `oracles` side by side (rows-only queries omit the oracle);
 * aggregated into the driver contract by [[SparkEntry]] /
 * [[OracleSql]]. Shared plan helpers live in [[QShared]], shared
 * SQL fragments in [[OracleDefs]].
 */
private[graft] object QMix {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic stratified curation sample: downsample the head
    // language, keep more of the tail; decisions are md5-derived so the
    // oracle replays the exact predicate.
    "x_stratified_sample" -> ((s, d) => {
      graft.operators.SampleOps.stratifiedSample(
          T(s, d, "documents"), "lang", col("doc_id"),
          fractions = Map("en" -> 0.25, "zh" -> 0.5), default = 0.8, salt = "s1|")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
    // Out-of-vocabulary rate per document against the corpus's own
    // top-100 vocabulary — the tokenizer-coverage statistic. The vocab
    // is tiny by construction, so it broadcasts; only (doc_id, token)
    // pairs shuffle for the per-doc counts.
    // Deterministic train/val/test assignment: contiguous digest-bucket
    // ranges — disjoint, exhaustive, growth-stable; exact label replay.
    "x_split_assign" -> ((s, d) => {
      T(s, d, "documents").select(col("doc_id"),
          SampleOps.assignSplit(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "sp|").as("split"))
        .orderBy("doc_id")
    }),
    // Exact-size stratified split: within every language, digest-ranked
    // documents cut at exact cumulative counts — a 2%-of-corpus
    // language still gets its exact 10% val slice, where
    // x_split_assign's digest rule hits fractions only in expectation.
    "x_split_stratified" -> ((s, d) => {
      SampleOps.stratifiedSplit(T(s, d, "documents"), "lang", col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "ss|")
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy("doc_id")
    }),
    // Exact-size deterministic sample: the 50 lowest salted digests —
    // reproducible "exactly K docs" (TakeOrderedAndProject, no global
    // sort, corpus-order-independent).
    "x_fixed_sample" -> ((s, d) => {
      SampleOps.fixedSizeSample(T(s, d, "documents"), col("doc_id"), k = 50,
          salt = "fx|")
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),
    // Per-domain quota: at most 20 docs per language, chosen by digest
    // rank — the source-balancing cap every mixture pipeline applies.
    "x_domain_cap" -> ((s, d) => {
      SampleOps.capPerGroup(T(s, d, "documents"), "lang", col("doc_id"),
          cap = 20, salt = "dc|")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
    // The full training-data recipe as ONE declarative plan — the
    // composition a data team actually ships: quality gate → exact
    // dedup (keep lowest id per content fingerprint) → per-language
    // token-budget fill → deterministic split assignment. Every stage
    // is the engine's own oracle-checked operator; Catalyst fuses the
    // gate+fingerprint+dedup into one scan-side pipeline before the
    // two bounded exchanges (fingerprint window, budget cumsum).
    "pipe_recipe_e2e" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val gated = docs
        .withColumn("quality", qualityOf(col("text")))
        .filter(col("quality") >= 0.5)
      val deduped = gated
        .withColumn("__fp", text.fingerprint(col("text")))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("__fp").orderBy("doc_id")))
        .filter(col("__rn") === 1)
      val budgeted = SampleOps.tokenBudgetCap(
        deduped.withColumn("n_tokens", text.tokenCount(col("text")).cast("long")),
        "lang", col("doc_id"), "n_tokens", budget = 400L, salt = "rc|")
      budgeted.select(col("doc_id"), col("lang"), col("n_tokens"),
          SampleOps.assignSplit(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "rcs|").as("split"))
        .orderBy("doc_id")
    }),
    // Token-budget domain cap: each language contributes at most 500
    // TOKENS (the mixture knob training recipes specify), greedy-filled
    // in the deterministic digest order. Exact running sums via the
    // per-domain broadcast-cumsum decomposition — no domain ever
    // funnels through a single-partition window.
    "x_token_budget" -> ((s, d) => {
      val docs = T(s, d, "documents")
        .withColumn("n_tokens", text.tokenCount(col("text")).cast("long"))
      SampleOps.tokenBudgetCap(docs, "lang", col("doc_id"), "n_tokens",
          budget = 500L, salt = "tb|")
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy("doc_id")
    }),
    // UniMax language allocation (Chung et al. 2023) — the fairness fix
    // for temperature sampling (x_temperature_mix): waterfill 40% of the
    // corpus' token budget across languages with each language capped at
    // maxEpochs passes over its own tokens. maxEpochs = 0.5 is chosen so
    // THIS fixture's mild language skew exercises both branches (the
    // four tail languages saturate their caps, the head language takes
    // the residual water level); real deployments run integer epoch caps
    // over far heavier skew — same closed form. The allocation itself is
    // windows over the n_languages counts relation: corpus-sized work is
    // only the token count, the waterfill costs nothing at any scale.
    "x_unimax_mix" -> ((s, d) => {
      // counts feeds two consumers (the rows and the budget scalar);
      // materialize the n_languages relation or the corpus token-count
      // pass runs twice.
      val counts = T(s, d, "documents")
        .withColumn("nt", text.tokenCount(col("text")).cast("long"))
        .groupBy("lang").agg(sum(col("nt")).as("n_tokens"))
        .localCheckpoint(true)
      val withBudget = counts.crossJoin(broadcast(
        counts.agg((sum(col("n_tokens")) * lit(0.4)).as("__budget"))))
      SampleOps.unimaxAlloc(withBudget, "lang", "n_tokens",
          col("__budget"), maxEpochs = 0.5)
        .orderBy("lang")
    }),
    // The full mixture materialization as ONE declarative plan — the
    // mixing counterpart of pipe_recipe_e2e: UniMax derives the
    // per-language epochs, epoch expansion materializes the repeat
    // stream, the deterministic digest shuffle deals it into 8 equal
    // shards, and each shard's stream packs greedily into 64-token
    // sequences. Stage boundaries: one broadcast epochs join (map-only
    // expand), one range exchange for the permutation, one shard-keyed
    // window for the pack — the corpus-sized work is bounded by those
    // three; the plan/counts relations are all n_languages-sized.
    "pipe_mix_e2e" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"), col("lang"),
          text.tokenCount(col("text")).cast("long").as("ntok"))
        .localCheckpoint(true)
      val counts = docs.groupBy("lang").agg(sum(col("ntok")).as("n_tokens"))
        .localCheckpoint(true)
      val withBudget = counts.crossJoin(broadcast(
        counts.agg((sum(col("n_tokens")) * lit(1.5)).as("__budget"))))
      val plan = SampleOps.unimaxAlloc(withBudget, "lang", "n_tokens",
          col("__budget"), maxEpochs = 3.0)
        .select(col("lang"), col("epochs"))
      val expanded = SampleOps.epochExpand(docs, "lang", col("doc_id"), plan,
        salt = "ee|")
      val key = concat(col("doc_id").cast("string"), lit("#"),
        col("copy").cast("string"))
      val shuffled = SampleOps.globalShuffle(expanded, key, shards = 8,
        salt = "ms|")
      val w = Window.partitionBy("shard").orderBy("pos")
      shuffled.withColumn("__start", sum(col("ntok")).over(w) - col("ntok"))
        .select(col("doc_id"), col("copy").cast("int").as("copy"),
          col("shard"), col("pos"), col("ntok").as("n_tokens"),
          expr("__start div 64L").as("seq_first"),
          pmod(col("__start"), lit(64L)).as("tok_offset"))
        .orderBy("doc_id", "copy")
    }),
    // Fill-in-the-middle transformation (Bavarian et al. 2022) — the
    // code-training data-prep step: two deterministic digest-drawn cut
    // points split the token stream into prefix/middle/suffix, emitted
    // in the PSM sentinel format. Map-only (the draw is pure column
    // algebra over md5, modulus = the doc's own n−1); docs with < 3
    // tokens cannot split and are filtered (the chunker's job).
    "x_fim_transform" -> ((s, d) => {
      val t = text.tokens(col("text"))
      val n = size(t)
      val h = (salt: String) => pmod(
        sig.md5Lower64Col(concat(lit(salt), col("doc_id").cast("string"))),
        (n - 1).cast("decimal(20,0)")).cast("int")
      val lo = h("fim1|") + 1
      val hi = h("fim2|") + 1
      val a = least(lo, hi); val b = greatest(lo, hi)
      T(s, d, "documents")
        .select(col("doc_id"), t.as("__t"), n.as("n_tokens"),
          a.as("cut_a"), b.as("cut_b"))
        .filter(col("n_tokens") >= 3)
        .select(col("doc_id"), col("n_tokens"), col("cut_a"), col("cut_b"), {
          val tt = col("__t")
          concat(lit("<fim_prefix> "),
            array_join(slice(tt, lit(1), col("cut_a")), " "),
            lit(" <fim_suffix> "),
            array_join(slice(tt, col("cut_b") + 1, col("n_tokens") - col("cut_b")), " "),
            lit(" <fim_middle> "),
            array_join(slice(tt, col("cut_a") + 1, col("cut_b") - col("cut_a")), " "))
            .as("fim_text")
        })
        .orderBy("doc_id")
    }),
    // Completion-only loss masking (SFT prep): synthesize two-turn
    // chat-format text from each doc's tokens, then emit the loss spans
    // — token ranges after each `assistant:` marker — that the trainer
    // masks loss to. Map-only marker/span algebra + one explode.
    "x_loss_mask" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"), chatOf.as("text"))
      CurationOps.lossSpans(docs, "doc_id", "text")
        .orderBy("doc_id", "s")
    }),
    // Annealing / midtraining schedule: the end-of-training mixture
    // shift every modern run performs — the cleanest quality tercile
    // upsamples to 2 epochs, the middle stays at 1, the tail subsamples
    // to 0.25 — executed as an epochExpand over quality tiers (floor
    // copies + the deterministic fractional draw). Terciles ride the
    // rank-exact percentile contract; expansion is map-only after the
    // broadcast epochs join.
    "x_anneal_mix" -> ((s, d) => {
      import s.implicits._
      val tiered = qualityTierOf(T(s, d, "documents"))
        .select(col("doc_id"), col("q"),
          concat(lit("t"), col("tier")).as("tier"))
      val epochs = Seq(("t0", 2.0), ("t1", 1.0), ("t2", 0.25)).toDF("tier", "epochs")
      SampleOps.epochExpand(tiered, "tier", col("doc_id"), epochs, salt = "an|")
        .select(col("doc_id"), col("q"), col("tier"),
          col("copy").cast("int").as("copy"))
        .orderBy("doc_id", "copy")
    }),
    // Quality-weighted sampling (the DCLM/quality-proportional mix):
    // acceptance probability (q/q_max)² emphasizes the head without a
    // hard cutoff — deterministic salted-digest draw (retry-stable,
    // the x_mix_to_target idiom), q_max one broadcast scalar, the keep
    // decision map-side. All arithmetic is IEEE-deterministic over the
    // rounded quality, so the oracle replays the draw bit-for-bit.
    "x_quality_sample" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val qmax = docs.agg(max(qualityOf(col("text"))).as("qm"))
      docs.select(col("doc_id"), qualityOf(col("text")).as("q"))
        .crossJoin(broadcast(qmax))
        .withColumn("__u",
          (sig.md5BucketCol(concat(lit("qs|"), col("doc_id").cast("string")),
            1000000L).cast("double") + 0.5) / 1000000.0)
        .select(col("doc_id"), col("q"),
          (col("__u") < col("q") * col("q") / (col("qm") * col("qm"))).as("keep"))
        .orderBy("doc_id")
    }),
    // Curriculum ordering: quality terciles (the x_outlier_trim
    // rank-exact percentile contract) become training phases — phase 0
    // = cleanest third first — and the corpus deals into 4 equal
    // worker streams, each internally phase-ordered with the
    // deterministic digest shuffle inside each phase. One range
    // exchange + the broadcast-cumsum global rank.
    "x_curriculum" -> ((s, d) => {
      val phased = qualityTierOf(T(s, d, "documents"))
        .withColumnRenamed("tier", "ph")
      SampleOps.curriculumOrder(phased, col("ph"), col("doc_id"),
          shards = 4, salt = "cur|")
        .select(col("doc_id"), col("q"), col("phase"), col("shard"), col("pos"))
        .orderBy("doc_id")
    }),
    "x_global_shuffle" -> ((s, d) => {
      SampleOps.globalShuffle(T(s, d, "documents").select("doc_id", "lang"),
          col("doc_id"), shards = 8, salt = "gs|")
        .select(col("doc_id"), col("lang"), col("shard"), col("pos"))
        .orderBy("doc_id")
    }),
    // Epoch expansion: the UniMax plan EXECUTED — waterfill 1.5× the
    // corpus tokens at a 3-epoch cap (tail languages land ~2 epochs,
    // the head ~0.7), then materialize the repeat stream: floor(e)
    // copies per doc plus a digest-drawn fractional copy. Map-only
    // after the broadcast epochs join.
    "x_epoch_expand" -> ((s, d) => {
      val counts = T(s, d, "documents")
        .withColumn("nt", text.tokenCount(col("text")).cast("long"))
        .groupBy("lang").agg(sum(col("nt")).as("n_tokens"))
        .localCheckpoint(true)
      val withBudget = counts.crossJoin(broadcast(
        counts.agg((sum(col("n_tokens")) * lit(1.5)).as("__budget"))))
      val plan = SampleOps.unimaxAlloc(withBudget, "lang", "n_tokens",
          col("__budget"), maxEpochs = 3.0)
        .select(col("lang"), col("epochs"))
      SampleOps.epochExpand(
          T(s, d, "documents").select(col("doc_id"), col("lang")),
          "lang", col("doc_id"), plan, salt = "ee|")
        .select(col("doc_id"), col("lang"), col("copy").cast("int").as("copy"))
        .orderBy("doc_id", "copy")
    }),
    // Mix-to-specification: hit an externally-given target mixture
    // (en .5 / de .2 / es .2 / fr .1; zh absent → dropped) by
    // downsampling only — the binding domain keeps everything, the
    // rest accept p_d·N*/n_d via the salted-digest draw. The execution
    // stage for DoReMi-style weights, next to the derivation stages
    // (temperature, UniMax).
    "x_mix_to_target" -> ((s, d) => {
      SampleOps.mixToTarget(T(s, d, "documents"), "lang", col("doc_id"),
          Map("en" -> 0.5, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1), salt = "mt|")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
    // Weighted sampling without replacement (Efraimidis–Spirakis): 5
    // docs per source, selection probability ∝ n_chars — the biased
    // form of x_domain_cap's quota. Deterministic digest draw, so the
    // DuckDB oracle replays the exponential keys exactly (rounded to 9
    // decimals; raw ln differs in final ulps across libms).
    "x_weighted_sample" -> ((s, d) => {
      SampleOps.weightedSample(T(s, d, "documents"), "source", col("doc_id"),
          col("n_chars").cast("double"), k = 5, salt = "ws|")
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),
    // BPE training step 1: adjacent symbol-pair counts over the word-
    // frequency dict (the classic formulation — pair stats never rescan
    // the corpus), top 30 with deterministic ties.
    "x_bpe_pairs" -> ((s, d) => {
      CurationOps.bpePairCounts(T(s, d, "documents"), "text", 30)
    }),
    // BPE training step 2: the iterative merge loop itself — 8 merges
    // learned from the word dict (argmax with count-desc/pair-asc ties,
    // greedy left-to-right application), corpus scanned exactly once.
    "x_bpe_merges" -> ((s, d) => {
      CurationOps.bpeMerges(T(s, d, "documents"), "text", 8)
        .orderBy("merge_rank")
    }),
    // BPE training step 3: encode the corpus under the learned 8-merge
    // vocabulary — per-doc word and BPE-token counts via one broadcast
    // join against the trained dict (no per-merge corpus work).
    "x_bpe_encode" -> ((s, d) => {
      CurationOps.bpeEncode(T(s, d, "documents"), "doc_id", "text", 8)
        .orderBy("doc_id")
    }),
    // Per-language tokenizer fertility (BPE tokens per word) under the
    // same 8-merge vocabulary — the multilingual tokenizer-eval metric:
    // a vocab trained on mixed text over-segments the languages it
    // under-saw, and this is the number that shows it. Rides the
    // x_bpe_encode chain (corpus scanned once, vocab-sized merge loop);
    // the per-language fold is one tiny aggregation over the per-doc
    // counts.
    "x_tokenizer_fertility" -> ((s, d) => {
      val docs = T(s, d, "documents")
      CurationOps.bpeEncode(docs, "doc_id", "text", 8)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang")
        .agg(sum(col("n_words")).as("n_words"),
          sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
        .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
          round(col("n_bpe_tokens").cast("double") / col("n_words"), 6)
            .as("fertility"))
        .orderBy("lang")
    }),
    // The production tokenizer shape (train once, encode forever):
    // persist the 8-merge vocabulary + word dict as TableSink tables,
    // then encode UNDER THE STORED artifacts — no retraining; unseen
    // words replay the stored merge table. On the training corpus this
    // equals x_bpe_encode exactly (same oracle SQL).
    "x_bpe_encode_stored" -> ((s, d) => {
      val dir = tmpStore("graft_bpe_store")
      CurationOps.bpeStore(s, dir, T(s, d, "documents"), "text", 8)
      CurationOps.bpeEncodeStored(s, dir, T(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),
    // DSIR importance resampling (Xie et al. 2023): target = the %7
    // slice (stand-in for "looks like this high-quality corpus"), raw =
    // the rest. Per-doc log importance weight under hashed unigram+bigram
    // bag-of-words models (B = 1024, add-1 smoothed), then Gumbel top-64
    // selection ∝ w without replacement — deterministic md5 noise, key
    // rounded to 6 with doc-id tie-break, TakeOrderedAndProject (never a
    // global sort), selected flag via a broadcast join of the 64 ids.
    "x_dsir_sample" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val raw = docs.filter(col("doc_id") % 7 =!= 0)
      val target = docs.filter(col("doc_id") % 7 === 0)
      val lw = CurationOps.dsirLogWeights(raw, target, "doc_id", "text",
        buckets = 1024)
      val u = (sig.md5BucketCol(concat(lit("dsir|"),
        col("doc_id").cast("string")), 1000000L).cast("double") + 0.5) / 1000000L
      val keyed = lw.withColumn("__k",
        round(col("log_weight") - log(-log(u)), 6))
      val sel = keyed.select(col("doc_id"), col("__k"))
        .orderBy(col("__k").desc, col("doc_id").asc).limit(64)
        .select(col("doc_id"), lit(true).as("__sel"))
      keyed.join(broadcast(sel), Seq("doc_id"), "left")
        .select(col("doc_id"), col("log_weight"),
          coalesce(col("__sel"), lit(false)).as("selected"))
        .orderBy("doc_id")
    }),
    // Concat-and-chunk sequence packing: 64-token budget, 8 shards —
    // every doc's (sequence, offset) bookkeeping replays in SQL.
    "x_pack_sequences" -> ((s, d) => {
      CurationOps.packSequences(T(s, d, "documents"), "doc_id", "text",
          budget = 64, shards = 8)
        .orderBy("doc_id")
    }),
    // First-fit-decreasing packing (Krell et al. 2021): the bin-quality
    // upgrade over the streaming fill — longest-first into the first
    // bin that fits, one exact integer ffd_pack call per digest shard.
    // The DuckDB oracle replays the placement loop as a linear
    // recursive CTE carrying the bin-load list.
    "x_pack_ffd" -> ((s, d) => {
      CurationOps.packFirstFitDecreasing(T(s, d, "documents"), "doc_id", "text",
          capacity = 64, shards = 8)
        .orderBy("doc_id")
    }),
    // Global-order packing: the exact end-to-end token stream in doc_id
    // order — one 64-token-budget stream for the whole corpus.
    "x_pack_global" -> ((s, d) => {
      CurationOps.packSequencesGlobal(T(s, d, "documents"), "doc_id", "text",
          budget = 64)
        .orderBy("doc_id")
    }),
    // Temperature-scaled language mixture: alpha=0.5 upweights tail
    // languages; keep decisions replay from (salt, doc_id, rate) alone.
    // Every 17th doc's domain is nulled to exercise the null-safe rate
    // join — the null shard must be sampled, not silently dropped.
    "x_temperature_mix" -> ((s, d) => {
      val docs = T(s, d, "documents").withColumn("lang",
        when(col("doc_id") % 17 === 0, lit(null).cast("string"))
          .otherwise(col("lang")))
      CurationOps.temperatureMixture(docs, "lang",
          col("doc_id"), alpha = 0.5, targetFraction = 0.5, salt = "mix1|")
        .select(col("doc_id"), col("lang"), col("keep_frac"))
        .orderBy("doc_id")
    }),
    // BM25 keyword retrieval: queries = first-5-token prefixes of every
    // 97th document, scored against the whole corpus. The synthetic
    // vocabulary is ~31 words over 500 docs so every term is
    // near-ubiquitous — maxDfFrac stays 1.0 (the stopword cutoff would
    // empty the index here); idf still discriminates through df, and
    // tf/dl carry the ranking.
    // The SFT-EXPORT pipe: chat-format docs → loss spans → packed
    // placement → ABSOLUTE mask offsets in shard token space — the
    // (shard, abs_start, abs_end) index a masked-loss dataloader seeks
    // by. One join of the spans relation with the placement relation on
    // doc_id (both O(corpus), digests/ints only), arithmetic map-side.
    "pipe_sft_e2e" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"), chatOf.as("text"))
        .localCheckpoint(true) // spans + lengths both read it
      val spans = CurationOps.lossSpans(docs, "doc_id", "text")
      val placed = CurationOps.packLengths(
        docs.select(col("doc_id"), text.tokenCount(col("text")).as("n")),
        "doc_id", "n", budget = 64, shards = 8)
      spans.join(placed, "doc_id")
        .select(col("doc_id"), col("shard"),
          (col("seq_first") * 64 + col("tok_offset") + col("s") - 1).as("abs_s"),
          (col("seq_first") * 64 + col("tok_offset") + col("e") - 1).as("abs_e"))
        .orderBy("doc_id", "abs_s")
    }),
    // The SHARD-EXPORT pipe — the last mile of the training-data
    // pipeline, raw docs → tokenized training shards entirely
    // in-engine: quality gate → BPE token counts under the STORED
    // vocabulary (the persisted tokenizer artifact) → concat-and-chunk
    // packing over BPE lengths into 8 shards of 64-token sequences.
    // Output = per-doc placement (shard, seq range, offset) — exactly
    // the index a dataloader seeks by. Corpus-sized work: one encode
    // pass (broadcast dict join) + the shard-keyed packing window.
    "pipe_shard_export_e2e" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val dir = tmpStore("shard_bpe")
      CurationOps.bpeStore(s, dir, docs, "text", 8)
      val kept = docs.filter(qualityOf(col("text")) >= 0.5)
      val enc = CurationOps.bpeEncodeStored(s, dir, kept, "doc_id", "text")
      CurationOps.packLengths(enc.select(col("doc_id"), col("n_bpe_tokens")),
          "doc_id", "n_bpe_tokens", budget = 64, shards = 8)
        .orderBy("doc_id")
    }),
    // Sliding token chunking (RAG / long-context split): size-64 windows
    // at stride 48 (16-token overlap); final chunk always reaches the
    // last token, no degenerate tails. Map-only — tokenize, transform,
    // explode — no shuffle.
    "x_chunk_tokens" -> ((s, d) => {
      CurationOps.chunkTokens(T(s, d, "documents"), "doc_id", "text",
          size = 64, stride = 48)
        .orderBy("doc_id", "chunk_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    // The sampling decision is a pure function of (salt, key, stratum
    // fraction) — the oracle replays it with md5_number_lower.
    "x_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE md5_number_lower('s1|' || CAST(doc_id AS VARCHAR)) % 1000000 <
        |  CAST(floor(CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.5
        |             ELSE 0.8 END * 1000000) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    // SimHash: per-token 64-bit hash = md5_number_lower (same byte order as
    // the JVM kernel), ±1 votes per bit, majority sign; built as HUGEINT
    // then wrapped to signed 64-bit to match Spark's LongType. The final
    // LEFT JOIN back to documents keeps zero-token docs (empty/whitespace
    // text): the JVM kernel votes nothing and emits fingerprint 0, so the
    // oracle coalesces the missing aggregate row to 0 instead of dropping
    // the document.
    // Okapi BM25 replay: idf = ln(1 + (N - df + ½)/(df + ½)), score =
    // Σ idf·tf·(k1+1)/(tf + k1(1 − b + b·dl/avgdl)) with k1=1.2 b=0.75;
    // rank on the 6-decimal-rounded score (the engine's TopK heap keys
    // on the same rounded value), doc_id tie-break.
    // SFT-export replay: the x_loss_mask span chain + the pack
    // placement over the chat token counts, absolute offsets =
    // start-of-doc (seq_first·64 + tok_offset ≡ the running total) +
    // span − 1.
    "pipe_sft_e2e" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
         |c AS (SELECT doc_id,
         |  'user: ' || coalesce(array_to_string(t[1:5], ' '), '') || ' assistant: ' ||
         |  coalesce(array_to_string(t[6:10], ' '), '') || ' user: ' ||
         |  coalesce(array_to_string(t[11:15], ' '), '') || ' assistant: ' ||
         |  coalesce(array_to_string(t[16:], ' '), '') AS text FROM w),
         |tt AS (SELECT doc_id, $words t FROM c),
         |mk AS (SELECT doc_id, len(t) n,
         |  list_filter(list_zip(t, generate_series(1, len(t))),
         |    z -> z[1] IN ('user:', 'assistant:')) m FROM tt),
         |sp AS (SELECT doc_id, n, unnest(list_filter(
         |  list_transform(generate_series(1, len(m)), i ->
         |    CASE WHEN m[i][1] = 'assistant:'
         |         THEN [m[i][2] + 1,
         |               CASE WHEN i < len(m) THEN m[i+1][2] - 1 ELSE n END]
         |         ELSE NULL END),
         |  x -> x IS NOT NULL AND x[1] <= x[2])) s2 FROM mk),
         |b AS (SELECT doc_id, CAST(len(t) AS INTEGER) nt2,
         |  CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8 AS BIGINT) shard
         |  FROM tt),
         |f AS (SELECT * FROM b WHERE nt2 > 0),
         |pc AS (SELECT doc_id, shard,
         |  CAST(sum(nt2) OVER (PARTITION BY shard ORDER BY doc_id) - nt2
         |    AS BIGINT) strt FROM f)
         |SELECT sp.doc_id, pc.shard,
         |  strt + s2[1] - 1 AS abs_s, strt + s2[2] - 1 AS abs_e
         |FROM sp JOIN pc USING (doc_id) ORDER BY doc_id, abs_s""".stripMargin,
    // Shard-export replay: quality gate over w0's token stream, BPE
    // counts from the shared d8 chain restricted to kept docs, then the
    // x_pack_sequences placement arithmetic over BPE lengths.
    "pipe_shard_export_e2e" ->
      s"""WITH ${bpeCtes(8)},
         |nt AS (SELECT wrd, len(list_filter(string_split(trim(w), ' '), x -> x <> '')) n
         |  FROM d8),
         |qs AS (SELECT doc_id, len(wds) nt2,
         |  len(list_filter(wds, t2 -> t2 IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t2 -> length(t2)))::DOUBLE / len(wds) awl
         |  FROM w0),
         |qq AS (SELECT doc_id, round(least(nt2 / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) q
         |  FROM qs),
         |k AS (SELECT doc_id FROM qq WHERE q >= 0.5),
         |tkn AS (SELECT w0.doc_id, unnest(wds) wrd FROM w0 JOIN k USING (doc_id)),
         |e AS (SELECT k.doc_id, CAST(coalesce(sum(nt.n), 0) AS BIGINT) nb
         |  FROM k LEFT JOIN tkn ON tkn.doc_id = k.doc_id
         |  LEFT JOIN nt ON nt.wrd = tkn.wrd GROUP BY k.doc_id),
         |b AS (SELECT doc_id, nb n_tokens,
         |  CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8 AS BIGINT) shard
         |  FROM e WHERE nb > 0),
         |c AS (SELECT doc_id, shard, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens
         |    AS BIGINT) strt FROM b)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(strt // 64 AS BIGINT) AS seq_first,
         |  CAST((strt + n_tokens - 1) // 64 AS BIGINT) AS seq_last,
         |  CAST(strt % 64 AS BIGINT) AS tok_offset
         |FROM c ORDER BY doc_id""".stripMargin,
    // Sliding-chunk replay: identical start arithmetic (inclusive
    // stepped series to greatest(1, n - size + stride)) and DuckDB's
    // inclusive 1-based list slice == Spark's slice(start, length).
    "x_chunk_tokens" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
        |c AS (SELECT doc_id, len(t) n, t,
        |        unnest(generate_series(1, greatest(1, len(t) - 64 + 48), 48)) s
        |      FROM w WHERE len(t) > 0)
        |SELECT doc_id, CAST((s - 1) / 48 AS INTEGER) AS chunk_id,
        |  array_to_string(t[s:s+63], ' ') AS chunk_text,
        |  CAST(least(64, n - s + 1) AS INTEGER) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // OOV rate vs the corpus top-100 vocabulary (same deterministic
    // tie-break as x_vocab_topk), per document.
    // Split assignment: same salted digest, contiguous bucket ranges.
    "x_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN md5_number_lower('sp|' || CAST(doc_id AS VARCHAR)) % 1000000 < 800000 THEN 'train'
        |       WHEN md5_number_lower('sp|' || CAST(doc_id AS VARCHAR)) % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Stratified split replay: same per-stratum digest rank, same
    // ceil(f·n) cuts — the FP product (0.8·n can land a hair above the
    // integer) is computed identically by both engines, so the cut
    // points agree even at the wobble.
    "x_split_stratified" ->
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5_number_lower('ss|' || CAST(doc_id AS VARCHAR)) % 1000000,
        |        CAST(doc_id AS VARCHAR)) rk,
        |    count(*) OVER (PARTITION BY lang) n
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN rk <= ceil(0.8 * n) THEN 'train'
        |       WHEN rk <= ceil(0.9 * n) THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r ORDER BY doc_id""".stripMargin,
    // Exact-size sample: same salted-digest order, k-row prefix.
    "x_fixed_sample" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id FROM documents
        |  ORDER BY md5_number_lower('fx|' || CAST(doc_id AS VARCHAR)) % 1000000, doc_id
        |  LIMIT 50)
        |ORDER BY doc_id""".stripMargin,
    // UniMax waterfill replay: identical closed form — sort by capacity
    // ascending, per-position uniform level over the remaining budget,
    // water level = max level among unsaturated positions. Every number
    // is integer-valued-in-double or an exact half (cap = nt * 0.5), so
    // the window sums are bit-exact across engines; rounding is
    // cosmetic.
    "x_unimax_mix" ->
      s"""WITH w AS (SELECT lang, CAST(sum(len($words)) AS DOUBLE) nt
        |      FROM documents GROUP BY 1),
        |tot AS (SELECT 0.4 * sum(nt) b, count(*) n FROM w),
        |s AS (SELECT lang, nt, nt * 0.5 cap,
        |        row_number() OVER (ORDER BY nt * 0.5, lang) i,
        |        coalesce(sum(nt * 0.5) OVER (ORDER BY nt * 0.5, lang
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) p
        |      FROM w),
        |lv AS (SELECT s.*, (tot.b - s.p) / (tot.n - s.i + 1) lvl FROM s, tot),
        |el AS (SELECT coalesce(max(lvl) FILTER (WHERE cap > lvl), 1e308) ell FROM lv)
        |SELECT lang, CAST(nt AS BIGINT) AS n_tokens,
        |  round(cap, 4) AS capacity,
        |  round(least(cap, ell), 4) AS alloc,
        |  round(least(cap, ell) / nt, 6) AS epochs,
        |  cap <= ell AS saturated
        |FROM lv, el ORDER BY lang""".stripMargin,
    // FIM replay: same digest cuts (modulus n−1 per doc), same slice
    // boundaries, same PSM sentinel concatenation (coalesce guards
    // DuckDB's NULL array_to_string on empty slices).
    "x_fim_transform" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
         |c AS (SELECT doc_id, t, len(t) n,
         |  CAST(md5_number_lower('fim1|' || CAST(doc_id AS VARCHAR))
         |    % (len(t) - 1) AS INTEGER) + 1 lo,
         |  CAST(md5_number_lower('fim2|' || CAST(doc_id AS VARCHAR))
         |    % (len(t) - 1) AS INTEGER) + 1 hi
         |  FROM w WHERE len(t) >= 3),
         |s AS (SELECT doc_id, n, t, least(lo, hi) a, greatest(lo, hi) b FROM c)
         |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
         |  a AS cut_a, b AS cut_b,
         |  '<fim_prefix> ' || coalesce(array_to_string(t[1:a], ' '), '') ||
         |  ' <fim_suffix> ' || coalesce(array_to_string(t[b+1:n], ' '), '') ||
         |  ' <fim_middle> ' || coalesce(array_to_string(t[a+1:b], ' '), '') AS fim_text
         |FROM s ORDER BY doc_id""".stripMargin,
    // Loss-mask replay: same chat synthesis, same marker positions,
    // same span arithmetic (successor marker − 1, end-capped at n),
    // empty spans dropped.
    "x_loss_mask" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
         |c AS (SELECT doc_id,
         |  'user: ' || coalesce(array_to_string(t[1:5], ' '), '') || ' assistant: ' ||
         |  coalesce(array_to_string(t[6:10], ' '), '') || ' user: ' ||
         |  coalesce(array_to_string(t[11:15], ' '), '') || ' assistant: ' ||
         |  coalesce(array_to_string(t[16:], ' '), '') AS text FROM w),
         |tt AS (SELECT doc_id, $words t FROM c),
         |mk AS (SELECT doc_id, len(t) n,
         |  list_filter(list_zip(t, generate_series(1, len(t))),
         |    z -> z[1] IN ('user:', 'assistant:')) m FROM tt),
         |sp AS (SELECT doc_id, n, unnest(list_filter(
         |  list_transform(generate_series(1, len(m)), i ->
         |    CASE WHEN m[i][1] = 'assistant:'
         |         THEN [m[i][2] + 1,
         |               CASE WHEN i < len(m) THEN m[i+1][2] - 1 ELSE n END]
         |         ELSE NULL END),
         |  x -> x IS NOT NULL AND x[1] <= x[2])) s2 FROM mk)
         |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
         |  CAST(s2[1] AS INTEGER) AS s, CAST(s2[2] AS INTEGER) AS e
         |FROM sp ORDER BY doc_id, s""".stripMargin,
    // Annealing replay: quality terciles (cumulative-count window),
    // tier epochs 2.0/1.0/0.25, floor copies + the 'an|' digest draw
    // (frac·10⁶ = 250000 exactly), series unnest.
    "x_anneal_mix" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |m AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS q
         |  FROM m),
         |nn AS (SELECT count(*) n FROM q),
         |r AS (SELECT q, count(*) OVER (ORDER BY q) cum FROM q),
         |t1 AS (SELECT min(q) t1 FROM r, nn WHERE cum >= ceil(nn.n / 3.0)),
         |t2 AS (SELECT min(q) t2 FROM r, nn WHERE cum >= ceil(2 * nn.n / 3.0)),
         |p AS (SELECT doc_id, q.q,
         |  CASE WHEN q.q <= t1.t1 THEN 't2' WHEN q.q <= t2.t2 THEN 't1'
         |       ELSE 't0' END tier FROM q, t1, t2),
         |cnt AS (SELECT doc_id, q, tier,
         |  CAST(CASE tier WHEN 't0' THEN 2 WHEN 't1' THEN 1 ELSE 0 END AS BIGINT)
         |  + (CASE WHEN tier = 't2' AND
         |       md5_number_lower('an|' || CAST(doc_id AS VARCHAR)) % 1000000 < 250000
         |     THEN 1 ELSE 0 END) n2 FROM p)
         |SELECT doc_id, q, tier, CAST(t.copy AS INTEGER) AS copy
         |FROM cnt, unnest(generate_series(1, n2)) t(copy)
         |WHERE n2 > 0 ORDER BY doc_id, copy""".stripMargin,
    // Quality-weighted sampling replay: x_quality's score, the same
    // md5 draw, the same squared-ratio acceptance arithmetic.
    "x_quality_sample" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |m AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS q
         |  FROM m),
         |qm AS (SELECT max(q) qm FROM q)
         |SELECT doc_id, q,
         |  (md5_number_lower('qs|' || CAST(doc_id AS VARCHAR)) % 1000000 + 0.5)
         |    / 1000000.0 < q * q / (qm.qm * qm.qm) AS keep
         |FROM q, qm ORDER BY doc_id""".stripMargin,
    // Curriculum replay: x_quality's score, tercile thresholds via the
    // cumulative-count window (Spark's documented percentile semantic),
    // then the x_global_shuffle rank replay with phase as the leading
    // sort key.
    "x_curriculum" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |m AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS q
         |  FROM m),
         |n AS (SELECT count(*) n FROM q),
         |r AS (SELECT q, count(*) OVER (ORDER BY q) cum FROM q),
         |t1 AS (SELECT min(q) t1 FROM r, n WHERE cum >= ceil(n.n / 3.0)),
         |t2 AS (SELECT min(q) t2 FROM r, n WHERE cum >= ceil(2 * n.n / 3.0)),
         |p AS (SELECT doc_id, q.q,
         |  CASE WHEN q.q <= t1.t1 THEN 2 WHEN q.q <= t2.t2 THEN 1 ELSE 0 END ph
         |  FROM q, t1, t2),
         |b AS (SELECT doc_id, q, ph,
         |  md5_number_lower('cur|' || CAST(doc_id AS VARCHAR))
         |    % 4611686018427387904 d FROM p),
         |r2 AS (SELECT doc_id, q, ph,
         |  row_number() OVER (ORDER BY ph, d, CAST(doc_id AS VARCHAR)) - 1 rk FROM b)
         |SELECT doc_id, q, CAST(ph AS INTEGER) AS phase,
         |  CAST(rk % 4 AS INTEGER) AS shard, CAST(rk // 4 AS BIGINT) AS pos
         |FROM r2 ORDER BY doc_id""".stripMargin,
    "x_global_shuffle" ->
      """WITH b AS (SELECT doc_id, lang,
        |        md5_number_lower('gs|' || CAST(doc_id AS VARCHAR))
        |          % 4611686018427387904 d
        |      FROM documents),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (ORDER BY d, CAST(doc_id AS VARCHAR)) - 1 rk
        |      FROM b)
        |SELECT doc_id, lang, CAST(rk % 8 AS INTEGER) AS shard,
        |  CAST(rk // 8 AS BIGINT) AS pos
        |FROM r ORDER BY doc_id""".stripMargin,
    // Epoch-expansion replay: the x_unimax_mix waterfill (3-epoch cap,
    // 1.5× token budget), epochs rounded to 6 exactly as unimaxAlloc
    // outputs them — the rounded value IS the plan both engines
    // execute — then floor + fractional digest draw + series unnest.
    "x_epoch_expand" ->
      s"""$epochExpandCtes
        |SELECT doc_id, lang, CAST(t.copy AS INTEGER) AS copy
        |FROM cnt, unnest(generate_series(1, n)) t(copy)
        |WHERE n > 0 ORDER BY doc_id, copy""".stripMargin,
    // The full mixture materialization in ONE plan, stitched from the
    // stages' own proven replays: the x_epoch_expand waterfill +
    // expansion, the x_global_shuffle digest permutation over
    // (doc_id, copy) keys, and the x_pack_sequences running-sum pack
    // per shard. Every number is integer or rounded-6 — exact.
    "pipe_mix_e2e" ->
      s"""$epochExpandCtes,
        |exp AS (SELECT doc_id, lang, ntok, CAST(t.copy AS BIGINT) AS copy
        |        FROM cnt, unnest(generate_series(1, n)) t(copy) WHERE n > 0),
        |b2 AS (SELECT *, md5_number_lower('ms|' || CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(copy AS VARCHAR)) % 4611686018427387904 dd FROM exp),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY dd,
        |          CAST(doc_id AS VARCHAR) || '#' || CAST(copy AS VARCHAR)) - 1 rk
        |       FROM b2),
        |shf AS (SELECT doc_id, ntok, copy, CAST(rk % 8 AS INTEGER) shard,
        |          CAST(rk // 8 AS BIGINT) pos FROM r2),
        |c3 AS (SELECT *, CAST(sum(ntok) OVER (PARTITION BY shard ORDER BY pos)
        |          - ntok AS BIGINT) strt FROM shf)
        |SELECT doc_id, CAST(copy AS INTEGER) AS copy, shard, pos,
        |  ntok AS n_tokens,
        |  CAST(strt // 64 AS BIGINT) AS seq_first,
        |  CAST(strt % 64 AS BIGINT) AS tok_offset
        |FROM c3 ORDER BY doc_id, copy""".stripMargin,
    // Mix-to-target replay: same feasibility bound N* = min(n/p), same
    // per-domain acceptance rate, same salted-digest draw. Proportions
    // forced to DOUBLE so the rate arithmetic runs in the same IEEE
    // ops as the engine (a DECIMAL literal would divide differently).
    "x_mix_to_target" ->
      """WITH c AS (SELECT lang, count(*) n FROM documents
        |           WHERE lang IN ('en','de','es','fr') GROUP BY 1),
        |p AS (SELECT lang, n, CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.2
        |        WHEN 'es' THEN 0.2 ELSE 0.1 END AS DOUBLE) p FROM c),
        |ns AS (SELECT min(n::DOUBLE / p) nstar FROM p),
        |r AS (SELECT lang, least(CAST(1.0 AS DOUBLE), p * ns.nstar / n::DOUBLE) rate
        |      FROM p, ns)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.lang
        |WHERE md5_number_lower('mt|' || CAST(doc_id AS VARCHAR)) % 1000000 <
        |  CAST(floor(rate * 1000000) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    // Weighted sample: Efraimidis–Spirakis exponential keys from the
    // same salted digest, rounded to 9 decimals (libm ln ulp parity),
    // digest-then-key tie-break — replays the engine's draw exactly.
    "x_weighted_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY round(-ln((md5_number_lower('ws|' || CAST(doc_id AS VARCHAR)) % 1000000 + 0.5)
        |      / 1000000.0) / CAST(n_chars AS DOUBLE), 9), doc_id) rk
        |  FROM documents WHERE n_chars > 0)
        |WHERE rk <= 5 ORDER BY doc_id""".stripMargin,
    // Per-domain cap: digest-ranked row_number per language, <= 20.
    "x_domain_cap" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5_number_lower('dc|' || CAST(doc_id AS VARCHAR)) % 1000000, doc_id) rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY doc_id""".stripMargin,
    // The stitched recipe replay: x_quality's gate formula, keep-first
    // over md5(lower(trim(text))) fingerprints, x_token_budget's
    // (segment, id)-ordered cumsum at budget 400, x_split_assign's CASE
    // chain — each fragment identical to its standalone oracle.
    "pipe_recipe_e2e" ->
      s"""WITH w AS (SELECT doc_id, lang, text, $words wds FROM documents),
        |m AS (SELECT doc_id, lang, text, len(wds) nt,
        |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
        |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
        |g AS (SELECT doc_id, lang, text, nt FROM m
        |  WHERE round(least(nt / 50.0, 1.0) * 0.5 +
        |    (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
        |    (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) >= 0.5),
        |dd AS (SELECT doc_id, lang, nt FROM (
        |    SELECT doc_id, lang, nt, row_number() OVER (
        |      PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) rn FROM g)
        |  WHERE rn = 1),
        |b AS (SELECT doc_id, lang, nt,
        |    md5_number_lower('rc|' || CAST(doc_id AS VARCHAR)) % 256 seg FROM dd),
        |c AS (SELECT doc_id, lang, nt,
        |    sum(nt) OVER (PARTITION BY lang ORDER BY seg, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM b)
        |SELECT doc_id, lang, CAST(nt AS BIGINT) AS n_tokens,
        |  CASE WHEN md5_number_lower('rcs|' || CAST(doc_id AS VARCHAR)) % 1000000 < 800000 THEN 'train'
        |       WHEN md5_number_lower('rcs|' || CAST(doc_id AS VARCHAR)) % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM c WHERE cum <= 400 ORDER BY doc_id""".stripMargin,
    // Token-budget cap replay: the oracle computes the per-domain
    // running sum directly (one window — fine at oracle scale); the
    // engine's segment-decomposed cumsum reproduces the identical
    // prefix sums because the global order is (segment, doc_id) on both
    // sides. Prefix rule: keep while the INCLUSIVE cumsum stays within
    // budget; null-token docs cost 0 mid-stream and drop in an all-null
    // prefix (null cum fails the filter) — both engines agree.
    "x_token_budget" ->
      s"""WITH w AS (SELECT doc_id, lang, len($words) nt FROM documents),
        |b AS (SELECT doc_id, lang, nt,
        |        md5_number_lower('tb|' || CAST(doc_id AS VARCHAR)) % 256 seg FROM w),
        |c AS (SELECT doc_id, lang, nt,
        |        sum(nt) OVER (PARTITION BY lang ORDER BY seg, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM b)
        |SELECT doc_id, lang, CAST(nt AS BIGINT) AS n_tokens FROM c
        |WHERE cum <= 500 ORDER BY doc_id""".stripMargin,
    // BPE pair counts: adjacent 2-char substrings of each distinct word,
    // weighted by the word's corpus frequency.
    "x_bpe_pairs" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |d AS (SELECT w2 w, count(*) f FROM (SELECT unnest(wds) w2 FROM w) GROUP BY 1),
        |p AS (SELECT substring(d.w, CAST(t.i AS INT), 2) pair, d.f
        |      FROM d, unnest(generate_series(1, length(d.w) - 1)) t(i)
        |      WHERE length(d.w) >= 2),
        |c AS (SELECT pair, sum(f) cnt FROM p GROUP BY 1)
        |SELECT pair, CAST(cnt AS BIGINT) AS cnt FROM c
        |ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,
    // BPE merge loop, unrolled (the merge count is a fixed parameter, so
    // the loop is M chained CTE stages): per stage, count adjacent
    // symbol pairs weighted by word frequency, argmax with count-desc /
    // pair-asc ties, apply the merge via non-overlapping left-to-right
    // replace — the exact greedy semantics of the Spark loop.
    "x_bpe_merges" ->
      s"""WITH ${bpeCtes(8)}
         |${(1 to 8).map(i =>
             s"SELECT $i merge_rank, l l_sym, r r_sym, cnt FROM b$i")
           .mkString("\nUNION ALL\n")}
         |ORDER BY merge_rank""".stripMargin,
    // BPE encode: per document, word count and token count under the
    // 8-merge vocabulary — each word contributes the length of its final
    // segmentation in the trained dict (d8 of the same unrolled chain).
    "x_bpe_encode" -> bpeEncodeSql,
    // Store-then-encode over the SAME corpus is the identical function
    // (the stored dict IS d8; replay only fires on unseen words, of
    // which the training corpus has none) — same parity SQL.
    "x_bpe_encode_stored" -> bpeEncodeSql,
    "x_tokenizer_fertility" -> tokenizerFertilitySql,
    // DSIR: identical hashed unigram+bigram feature stream (md5 bucket,
    // u|/b| prefixes), add-1 models of target (%7 slice) and raw pool,
    // per-raw-doc lambda sum, then the same deterministic Gumbel top-64.
    "x_dsir_sample" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
        |uf AS (SELECT doc_id, 'u|' || unnest(t) f FROM w),
        |bf AS (SELECT w.doc_id,
        |         'b|' || t[CAST(s.i AS INT)] || ' ' || t[CAST(s.i + 1 AS INT)] f
        |       FROM w, unnest(generate_series(1, len(t) - 1)) AS s(i)),
        |feats AS (SELECT doc_id, md5_number_lower(f) % 1024 b
        |          FROM (SELECT * FROM uf UNION ALL SELECT * FROM bf)),
        |rf AS (SELECT * FROM feats WHERE doc_id % 7 <> 0),
        |tf AS (SELECT * FROM feats WHERE doc_id % 7 = 0),
        |rc AS (SELECT b, count(*) cr FROM rf GROUP BY 1),
        |tc AS (SELECT b, count(*) ct FROM tf GROUP BY 1),
        |tot AS (SELECT (SELECT coalesce(sum(cr), 0) FROM rc) nr,
        |               (SELECT coalesce(sum(ct), 0) FROM tc) nt),
        |lam AS (SELECT rc.b,
        |          ln((coalesce(tc.ct, 0) + 1) / (tot.nt + 1024))
        |            - ln((rc.cr + 1) / (tot.nr + 1024)) l
        |        FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tot),
        |pd AS (SELECT rf.doc_id, sum(lam.l) lw
        |       FROM rf JOIN lam ON lam.b = rf.b GROUP BY 1),
        |base AS (SELECT d.doc_id, round(coalesce(pd.lw, 0.0), 6) lw
        |         FROM (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0) d
        |         LEFT JOIN pd ON pd.doc_id = d.doc_id),
        |g AS (SELECT doc_id, lw,
        |        round(lw - ln(-ln((md5_number_lower('dsir|' || CAST(doc_id AS VARCHAR))
        |          % 1000000 + 0.5) / 1000000)), 6) k
        |      FROM base),
        |sel AS (SELECT doc_id FROM g ORDER BY k DESC, doc_id LIMIT 64)
        |SELECT g.doc_id, g.lw AS log_weight,
        |  (sel.doc_id IS NOT NULL) AS selected
        |FROM g LEFT JOIN sel ON sel.doc_id = g.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    // Sequence packing: same shard hash, same per-shard running total,
    // same integer-division chunking.
    "x_pack_sequences" ->
      s"""WITH b AS (SELECT doc_id, CAST(len($words) AS INTEGER) n_tokens,
        |      CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8 AS BIGINT) shard
        |    FROM documents),
        |f AS (SELECT * FROM b WHERE n_tokens > 0),
        |c AS (SELECT doc_id, shard, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS BIGINT) strt
        |  FROM f)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(strt // 64 AS BIGINT) AS seq_first,
        |  CAST((strt + n_tokens - 1) // 64 AS BIGINT) AS seq_last,
        |  CAST(strt % 64 AS BIGINT) AS tok_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    // FFD packing replay: the placement loop as a LINEAR recursive CTE
    // (one row per shard per step — the next item is determined, no
    // argmax needed) carrying the bin-load list; list_position returns
    // 0 for not-found in this DuckDB, hence the `> 0` fit test. Pure
    // integer arithmetic — exact.
    "x_pack_ffd" -> {
      val fit = "list_position(list_transform(r.bins, b -> b + c.nt <= 64), true)"
      s"""WITH RECURSIVE
        |b AS (SELECT doc_id, CAST(len($words) AS BIGINT) nt,
        |        CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8 AS BIGINT) shard
        |      FROM documents),
        |f AS (SELECT doc_id, nt, shard,
        |        row_number() OVER (PARTITION BY shard ORDER BY nt DESC, doc_id) i
        |      FROM b WHERE nt > 0),
        |rec AS (
        |  SELECT shard, 0 AS i, []::BIGINT[] bins,
        |         NULL::BIGINT doc_id, NULL::BIGINT nt, NULL::INTEGER bin
        |  FROM (SELECT DISTINCT shard FROM f)
        |  UNION ALL
        |  SELECT r.shard, r.i + 1,
        |    CASE WHEN c.nt > 64 THEN r.bins
        |         WHEN $fit > 0 THEN
        |           list_transform(r.bins, (b, j) -> CASE WHEN j = $fit THEN b + c.nt ELSE b END)
        |         ELSE list_append(r.bins, c.nt) END,
        |    c.doc_id, c.nt,
        |    CASE WHEN c.nt > 64 THEN -1
        |         WHEN $fit > 0 THEN CAST($fit AS INTEGER)
        |         ELSE CAST(len(r.bins) + 1 AS INTEGER) END
        |  FROM rec r JOIN f c ON c.shard = r.shard AND c.i = r.i + 1
        |)
        |SELECT doc_id, shard, nt AS n_tokens, CAST(bin AS INTEGER) AS bin
        |FROM rec WHERE doc_id IS NOT NULL ORDER BY doc_id""".stripMargin
    },
    // Global-order packing: one running total over the whole corpus in
    // doc_id order — the single-stream form of x_pack_sequences.
    "x_pack_global" ->
      s"""WITH b AS (SELECT doc_id, CAST(len($words) AS INTEGER) n_tokens FROM documents),
        |f AS (SELECT * FROM b WHERE n_tokens > 0),
        |c AS (SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT) strt
        |  FROM f)
        |SELECT doc_id, n_tokens,
        |  CAST(strt // 64 AS BIGINT) AS seq_first,
        |  CAST((strt + n_tokens - 1) // 64 AS BIGINT) AS seq_last,
        |  CAST(strt % 64 AS BIGINT) AS tok_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    // Temperature mixture: identical rate formula (same operation order,
    // rounded to 6), then the md5 keep-decision replay. Every 17th doc
    // gets a NULL domain in both engines: the join is null-SAFE, so the
    // null shard is a domain of its own, sampled at its tempered rate.
    "x_temperature_mix" ->
      """WITH d0 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 THEN NULL ELSE lang END AS lang FROM documents),
        |c AS (SELECT lang, count(*)::DOUBLE c FROM d0 GROUP BY lang),
        |t AS (SELECT sum(power(c, 0.5)) z, sum(c) n FROM c),
        |r AS (SELECT lang, round(least(1.0, 0.5 * t.n * (power(c.c, 0.5) / t.z) / c.c), 6) keep_frac
        |      FROM c, t)
        |SELECT d.doc_id, d.lang, r.keep_frac
        |FROM d0 d JOIN r ON d.lang IS NOT DISTINCT FROM r.lang
        |WHERE md5_number_lower('mix1|' || CAST(d.doc_id AS VARCHAR)) % 1000000 <
        |  CAST(floor(r.keep_frac * 1000000) AS BIGINT)
        |ORDER BY d.doc_id""".stripMargin,

    // For queries whose exact values are model outputs (ALS/KMeans/ANN),
    // hash equality against SQL is impossible — but their CONTRACTS are
    // not. Each oracle below computes the deterministic part (counts from
    // the raw tables) and states every invariant as a literal `true`; the
    // Spark side computes the same columns from its own output, so the
    // driver's hash compare passes iff every invariant actually holds.,
  )
}
