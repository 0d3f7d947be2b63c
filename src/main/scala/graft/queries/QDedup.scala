package graft

import graft.functions.{sig, text, vector, VectorMeanFast}
import graft.operators.{Bm25, Bm25Store, ClusterRefine, CurationOps, DedupOps, DomainModel, IvfAnn, LayoutOps, MultimodalOps, PqOps, QualityModel, QuantizeOps, Recommend, RecommendML, Rerank, Rrf, SampleOps, SemDedup, SemDedupStore, SimilarityOps, SkewOps, SpanDedup, StoryOps, TemporalOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QShared._
import OracleDefs._

/** Text dedup families (exact / MinHash-LSH / SimHash / CDC / substring / boilerplate / line) and the admission pipeline.
 *
 * One `queries` entry per operator with its DuckDB oracle in
 * `oracles` side by side (rows-only queries omit the oracle);
 * aggregated into the driver contract by [[SparkEntry]] /
 * [[OracleSql]]. Shared plan helpers live in [[QShared]], shared
 * SQL fragments in [[OracleDefs]].
 */
private[graft] object QDedup {

  /** The planted fixture x_substr_maximal and its incremental form
    * share: a 14-token group phrase (group = doc_id % 8, docs < 40)
    * inserted at offsets that VARY WITHIN a group ((doc_id div 8) % 4 —
    * doc_id % 4 would be constant across members that differ by 8,
    * making every planted pair diagonal-0 and the misalignment claim
    * vacuous); a universal 8-token footer on EVERY doc keeping the
    * occurrence cap live (n_docs ≫ 64 occurrences, confirmed dropped
    * from every pair), behind a doc-unique separator token so
    * doc-tail→footer boundary windows don't pair docs that merely end
    * in the same word; and — for the incremental form only — a
    * batch-shared 12-token phrase BEFORE the separator (each planted
    * group holds exactly one batch member, so batch-vs-batch pairs
    * need their own plant). */
  private def substrPlanted(s: SparkSession, d: String,
                            batchShared: Boolean): DataFrame = {
    val docs = T(s, d, "documents")
    val t = text.tokens(col("text"))
    val grp = (col("doc_id") % 8).cast("string")
    val o = expr("(doc_id div 8) % 4").cast("int")
    val phrase = array_join(transform(sequence(lit(1), lit(14)),
      j => concat(lit("seg"), grp, lit("tok"), j.cast("string"))), " ")
    val planted = concat_ws(" ",
      array_join(slice(t, lit(1), o), " "), phrase,
      array_join(slice(t, o + lit(1), greatest(size(t) - o, lit(0))), " "))
    val share =
      if (!batchShared) lit("")
      else when(col("doc_id") % 5 === 0 && col("doc_id") < 50,
        lit(" bshare1 bshare2 bshare3 bshare4 bshare5 bshare6" +
          " bshare7 bshare8 bshare9 bshare10 bshare11 bshare12"))
        .otherwise(lit(""))
    val footer = concat(lit(" sep"), col("doc_id").cast("string"),
      lit(" foot1 foot2 foot3 foot4 foot5 foot6 foot7 foot8"))
    docs.select(col("doc_id"),
      concat(when(col("doc_id") < 40, planted).otherwise(col("text")),
        share, footer).as("text"))
  }

  /** Stored-family phased form (QShared.Phased; see QVector.phased):
    * the benchmark registry build in init; the four-stage admission
    * funnel (with the contamination screen on) in serve. The two
    * runAgainst-only admission pipes stay unsplit — they build no
    * standing store, their whole cost IS the per-batch plan. */
  private val admissionDeconPhased: Phased = (s, d) => {
    lazy val docs = T(s, d, "documents")
    lazy val dir = tmpStore("admission_decon_registry")
    val init = () => {
      graft.operators.EvalStore.init(s, dir, "bench_v1",
        docs.filter(col("doc_id") % 13 === 0), "text", n = 5); ()
    }
    val serve = () => {
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      graft.pipelines.Admission.runAgainst(batch, corpus, "doc_id", "text",
        graft.pipelines.Admission.Config(decon = Some(
          graft.pipelines.Admission.DeconStage(dir))))
        .orderBy("doc_id")
    }
    (init, serve)
  }

  /** The positional span store probe (QShared.Phased): init builds the
    * standing (id, i, digest) window relation + occurrence inventory
    * over the corpus slice — the one-time cost that frees every later
    * batch from re-deriving corpus windows; serve is the per-batch
    * maximal-repeats report against the store. SAME oracle as
    * x_substr_maximal_incremental (the store is a pure execution
    * strategy — the law SpanPosStoreSpec pins, replayed here against
    * DuckDB at sf scale). */
  private val substrStorePhased: Phased = (s, d) => {
    lazy val p = substrPlanted(s, d, batchShared = true).localCheckpoint(true)
    lazy val dir = tmpStore("substr_pos_store")
    val init = () => {
      graft.operators.SpanPosStore.init(s, dir,
        p.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", k = 8)
    }
    val serve = () =>
      graft.operators.SpanPosStore.probeMaximalRepeats(s, dir,
          p.filter(col("doc_id") % 5 === 0), "doc_id", "text", maxOcc = 64)
        .orderBy("id_a", "start_a", "id_b", "start_b")
    (init, serve)
  }

  private[graft] val phased: Map[String, Phased] = Map(
    "pipe_admission_decon_e2e" -> admissionDeconPhased,
    "x_substr_store" -> substrStorePhased)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_fingerprint" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"), text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),
    "x_cdc_chunks" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"),
          array_join(transform(sig.cdcBoundaries(col("text"), 8, 31L),
            _.cast("string")), ",").as("chunk_ends"))
        .orderBy("doc_id")
    }),
    // Duplicate components: n-gram-Jaccard pairs closed into groups by
    // min-label propagation; docs in no pair are their own singleton.
    // The oracle replays the propagation as a recursive CTE.
    "x_dup_components" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.02)
      val comp = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      docs.select(col("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
        .orderBy("doc_id")
    }),
    // Duplicate-cluster size histogram — the dedup AUDIT number a
    // release reports ("how much of the corpus is 2-copies, how much is
    // boilerplate with 50"): same closure, then two bounded
    // aggregations (per-component size → per-size counts); everything
    // after the closure is component-count-sized.
    "x_dup_histogram" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.02)
      val comp = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      docs.select(col("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(coalesce(col("component"), col("doc_id")).as("component"))
        .groupBy("component").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_components"),
          sum(col("sz")).as("n_docs"))
        .select(col("sz").as("cluster_size"), col("n_components"), col("n_docs"))
        .orderBy("cluster_size")
    }),
    // Duplicate-count loss weighting — the keep-one-train-weighted
    // alternative to plain dropping (the survivor carries its cluster's
    // multiplicity so the training distribution is preserved without
    // storing the copies): same shared closure, weight = component
    // size, survivor = the min-id representative (free — the component
    // label IS the min member id). One component-count-sized
    // aggregation past the closure.
    "x_dedup_weight" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.02)
      val comp = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      docs.select(col("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
        .groupBy("component").agg(count(lit(1)).as("weight"))
        .select(col("component").as("doc_id"), col("weight"))
        .orderBy("doc_id")
    }),
    // Quality-aware dedup representative: same component closure, but
    // the survivor is the LONGEST member (n_chars argmax, doc-id
    // tie-break) instead of min-id — the policy real fuzzy-dedup
    // pipelines run, where near-dup clusters keep their best copy, not
    // an arbitrary one. Argmax via one max_by aggregation (map-side
    // partials) — no per-component window over the corpus.
    "x_dup_rep_quality" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.02)
      val comp = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      // Two consumers (the argmax and the join back) — materialize once,
      // the x_quality_model idiom (A/B'd: 7.26 -> 6.56 isolated median;
      // the residual over x_dup_components' ~4.35 closure is the rep
      // aggregation + component join themselves).
      val labeled = docs.select(col("doc_id"), col("n_chars"))
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"), col("n_chars"))
        .localCheckpoint(true)
      val rep = labeled.groupBy("component")
        .agg(max_by(col("doc_id"),
          struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("rep_id"))
      labeled.join(rep, "component")
        .select(col("doc_id"), col("component"), col("rep_id"),
          (col("doc_id") === col("rep_id")).as("keep"))
        .orderBy("doc_id")
    }),
    // End-to-end dedup cascade: LSH candidates → Jaccard verify on
    // candidates only → connected components → min-id representative.
    // Same parameters as the standalone stages so the oracle replays
    // candidate generation and closure exactly.
    "pipe_dedup_e2e" -> ((s, d) => {
      DedupOps.dedupCascade(T(s, d, "documents"), "doc_id", "text",
          shingleN = 3, k = 4, bands = 4, threshold = 0.02)
        .orderBy("doc_id")
    }),
    // Full admission pipeline end-to-end — the three ingest stages a
    // production corpus runs per batch, composed in ONE plan: (1) the
    // curation funnel (langid + quality + Gopher + PII — the
    // x_curation_verdict predicate) rejects junk before anything
    // heavier runs; (2) curation survivors probe the corpus exact-dup
    // fingerprints (Bloom-prefiltered anti-join — x_bloom_incremental's
    // shape); (3) novel survivors span-scrub against the corpus'
    // standing span-digest inventory (duplication counted over
    // corpus ∪ survivors, so batch-internal boilerplate is caught too).
    // Verdict precedence: curation rejects before dup checks — the
    // cheaper stage guards the costlier ones, which is the point of
    // the composition.
    "pipe_admission_e2e" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      // The whole composition lives in the production entry point
      // (graft.pipelines.Admission) — this query IS its in-memory form,
      // oracle-checked; Admission.run is the standing-store twin, pinned
      // batch-for-batch equal by AdmissionStoreSpec.
      graft.pipelines.Admission.runAgainst(batch, corpus, "doc_id", "text")
        .orderBy("doc_id")
    }),
    // Admission under the EXACT span policy (Config.exactSpans) — the
    // fixed-k digest screen replaced by the cap-free variable-length
    // ExactSubstr scrub: a survivor token leaves when covered by a
    // >= 8-token run occurring (occurrence >= 2, same-doc repeats
    // included) in corpus ∪ exact-novel survivors. The standing twin
    // (SaStore under storeDir/exact_spans, probed O(batch), grown in
    // absorb) is pinned run == runAgainst by AdmissionStoreSpec.
    "pipe_admission_exact_e2e" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      graft.pipelines.Admission.runAgainst(batch, corpus, "doc_id", "text",
        graft.pipelines.Admission.Config(exactSpans = Some(
          graft.pipelines.Admission.ExactSpanStage(minLen = 8))))
        .orderBy("doc_id")
    }),
    // The exact funnel WITH the attribution report on (attributeSites
    // > 0): the verdict frame carries sa_match_len + sa_sites over the
    // WHOLE batch (rejected docs included — a report, never a gate).
    // The sites array flattens to one row per (doc, site) via
    // posexplode_outer so the driver's hash covers the composed
    // verdict+report frame exactly (no-site docs keep one row with -1
    // sentinels); the oracle replays the same funnel CTEs plus the
    // independent union-suffix-sort tail-match + window-equality site
    // construction.
    "pipe_admission_attr_e2e" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      graft.pipelines.Admission.runAgainst(batch, corpus, "doc_id", "text",
          graft.pipelines.Admission.Config(exactSpans = Some(
            graft.pipelines.Admission.ExactSpanStage(minLen = 8,
              attributeSites = 3))))
        .select(col("doc_id"), col("verdict"), col("n_tokens"),
          col("n_removed"), col("clean_text"), col("sa_match_len"),
          posexplode_outer(col("sa_sites")))
        .select(col("doc_id"), col("verdict"), col("n_tokens"),
          col("n_removed"), col("clean_text"), col("sa_match_len"),
          coalesce(col("pos").cast("int"), lit(-1)).as("site_ord"),
          coalesce(col("col.doc_id"), lit(-1L)).as("site_doc"),
          coalesce(col("col.pos"), lit(-1)).as("site_pos"))
        .orderBy("doc_id", "site_ord")
    }),
    // Admission with the OPTIONAL fourth stage on — semantic near-dup
    // (pipe_admission_e2e's funnel + exact-dup + span scrub, plus a
    // SemDeDup-incremental probe of the exact-novel survivors against
    // the corpus's embeddings under fixed per-label centroids; the
    // rewording/re-encoding case the fingerprint hash can never catch).
    // Precedence, cheapest stage first: rejected > duplicate >
    // semantic_duplicate > admitted. Semantic dups are excluded from
    // the span scrub and from every absorb. The standing-store twin
    // (SemDedupStore under storeDir/semantic, probed bucket-pruned,
    // grown O(batch) on admit) is pinned run == runAgainst by
    // AdmissionStoreSpec.
    "pipe_admission_sem_e2e" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val emb = T(s, d, "embeddings")
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      // Deterministic fixed centroids (the x_semdedup_incremental
      // fixture): per-label means over the CORPUS slice's embeddings.
      val cents = emb.join(corpus.select(col("doc_id").as("vec_id")), "vec_id")
        .groupBy("label")
        .agg(VectorMeanFast(col("embedding").cast("array<double>")).as("cent"))
      val vecsFor = (df: org.apache.spark.sql.DataFrame) => df.select("doc_id")
        .join(emb.select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      graft.pipelines.Admission.runAgainst(batch, corpus, "doc_id", "text",
        graft.pipelines.Admission.Config(sem = Some(
          graft.pipelines.Admission.SemStage(vecsFor, eps = 0.3,
            centroids = Some(cents)))))
        .orderBy("doc_id")
    }),
    // Admission with the OPTIONAL contamination screen on — the
    // benchmark slice (doc_id % 13 = 0) registered as one suite in a
    // standing EvalStore (5-gram digests), probed by the curation
    // survivors BEFORE the dup stages (a broadcast digest probe is the
    // cheapest standing check in the funnel). Hits → verdict
    // 'contaminated', excluded from the exact-dup probe, the span
    // scrub, and every absorb — benchmark text must never enter the
    // corpus or its indexes. Precedence: rejected > contaminated >
    // duplicate > admitted.
    "pipe_admission_decon_e2e" -> fused(admissionDeconPhased),
    // Incremental maximal repeats via the standing POSITIONAL span store
    // (SpanPosStore): same answer as x_substr_maximal_incremental — the
    // store is an execution strategy, not a semantics change — but the
    // corpus side is bucket-pruned scans of the persisted (id, i,
    // digest) relation instead of a per-batch re-derivation of corpus
    // windows; corpus TEXT is never read (spans re-attach from the
    // batch side). The last O(corpus)-text-per-batch path in the
    // admission family, closed.
    "x_substr_store" -> fused(substrStorePhased),
    // Chunk-level dedup payoff of CDC: shared paragraphs meet on their
    // chunk digest regardless of byte offset.
    "x_cdc_dedup" -> ((s, d) => {
      DedupOps.cdcChunkDups(T(s, d, "documents"), "doc_id", "text")
        .orderBy("fp")
    }),
    // Incremental ingestion: bloom-prefiltered exact dedup of a new
    // batch against an existing corpus (output == the plain anti-join,
    // which is what the oracle runs).
    "x_bloom_incremental" -> ((s, d) => {
      val docs = T(s, d, "documents")
      DedupOps.incrementalNewDocs(
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          "text")
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),
    // Incremental NEAR-dup admission: the new batch (doc_id % 10 ∈ {8,9})
    // probes the standing corpus LSH band index (doc_id % 10 < 8), exact
    // Jaccard verifies only the candidates, one admission verdict per
    // batch doc — the per-ingest shape a production pipeline runs daily
    // (corpus side never reshuffles; see docs/PLANS.md).
    "x_neardup_incremental" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
      val idx = DedupOps.minhashBandIndex(corpus, "doc_id", "text", 3, 4, 4)
      DedupOps.neardupIncremental(batch, corpus, idx, "doc_id", "text",
          shingleN = 3, k = 4, bands = 4, threshold = 0.05)
        .select(col("doc_id"), col("n_matches"), col("match_id"),
          round(col("match_jaccard"), 6).as("match_jaccard"), col("admit"))
        .orderBy("doc_id")
    }),
    // Append-only band-index refresh: the standing index (corpus side)
    // plus the band rows of the batch docs the admission check admits —
    // index maintenance is a union of batch-derived rows, NEVER a corpus
    // rescan (the corpus contributes its existing index rows unchanged;
    // shingle-less docs carry no band value and stay out of the index).
    "x_index_refresh" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
      // The standing index feeds BOTH the probe and the refreshed output;
      // checkpoint it so the corpus minhash scan runs once (in production
      // the standing index is a persisted table, read not recomputed).
      val idx = DedupOps.minhashBandIndex(corpus, "doc_id", "text", 3, 4, 4)
        .localCheckpoint(false)
      val admitted = batch.join(
        DedupOps.neardupIncremental(batch, corpus, idx, "doc_id", "text",
          shingleN = 3, k = 4, bands = 4, threshold = 0.05)
          .filter(col("admit")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      idx.unionByName(
          DedupOps.minhashBandIndex(admitted, "doc_id", "text", 3, 4, 4))
        .filter(col("bv") =!= "")
        .orderBy("doc_id", "band")
    }),
    // The complete incremental admission: within-batch near-dup closure
    // (one representative per batch component) AND the standing-corpus
    // check — the verdict an ingest pipeline actually enforces.
    "x_admit_incremental" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
      val idx = DedupOps.minhashBandIndex(corpus, "doc_id", "text", 3, 4, 4)
      DedupOps.admitIncremental(batch, corpus, idx, "doc_id", "text",
          shingleN = 3, k = 4, bands = 4, threshold = 0.05)
        .orderBy("doc_id")
    }),
    "x_exact_dup_groups" -> ((s, d) => {
      DedupOps.exactDupGroups(T(s, d, "documents"), "doc_id", "text")
        .select(col("fp"), col("n"),
          array_join(transform(col("ids"), _.cast("string")), ",").as("ids"))
        .orderBy("fp")
    }),
    "x_minhash_sig" -> ((s, d) => {
      DedupOps.minhashSignatures(T(s, d, "documents"), "doc_id", "text", 3, 4)
        .select(col("doc_id"), array_join(col("sig"), ",", "null").as("sig"))
        .orderBy("doc_id")
    }),
    "x_lsh_pairs" -> ((s, d) => {
      DedupOps.lshCandidatePairs(T(s, d, "documents"), "doc_id", "text", 3, 4, 4)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),
    // LSH banding evaluation — the tuning report that decides bands×rows
    // before a corpus-scale dedup run: candidate-stage precision/recall
    // against the exact ≥ 0.05-Jaccard ground truth at THESE parameters
    // (4 bands of 1 hash = high recall, low precision — the report
    // quantifies exactly that trade). Both sides are relations the suite
    // already proves; the comparison is two semi-join counts.
    "x_lsh_eval" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val cand = DedupOps.lshCandidatePairs(docs, "doc_id", "text", 3, 4, 4)
        .select("id_a", "id_b").localCheckpoint(true)
      val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.05)
        .select("id_a", "id_b").localCheckpoint(true)
      val tp = cand.join(exact, Seq("id_a", "id_b"), "left_semi")
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(exact.agg(count(lit(1)).as("n_true_pairs")))
        .crossJoin(tp.agg(count(lit(1)).as("n_hits")))
        .select(col("n_candidates"), col("n_true_pairs"), col("n_hits"),
          when(col("n_candidates") === 0, lit(0.0))
            .otherwise(round(col("n_hits").cast("double") / col("n_candidates"), 6))
            .as("precision"),
          when(col("n_true_pairs") === 0, lit(0.0))
            .otherwise(round(col("n_hits").cast("double") / col("n_true_pairs"), 6))
            .as("recall"))
    }),
    "x_ngram_jaccard" -> ((s, d) => {
      DedupOps.ngramJaccardPairs(T(s, d, "documents"), "doc_id", "text", 3, 0.02)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
    // Asymmetric containment |A∩B|/|A| (Broder 1997) — the
    // quote-inclusion signal Jaccard misses: a short doc copied into a
    // long one is near-invisible to resemblance but containment-1.0.
    // Both directions per pair, kept where either rounded direction
    // ≥ 0.4.
    "x_containment_pairs" -> ((s, d) => {
      DedupOps.ngramContainmentPairs(T(s, d, "documents"), "doc_id", "text", 3, 0.4)
        .orderBy("id_a", "id_b")
    }),
    // MinHash Jaccard ESTIMATE vs exact, per LSH candidate pair: the
    // agreement fraction of the k=4 signature slots is the unbiased
    // resemblance estimator (Broder 1997) a 100 TB pipeline uses to skip
    // exact verification; shown side by side with the true Jaccard so
    // the estimator itself is oracle-checked.
    "x_minhash_est" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 4)
      val cand = DedupOps.lshCandidatePairs(docs, "doc_id", "text", 3, 4, 4)
        .select("id_a", "id_b")
      // Exact side via the plain co-shingle join, intersected with the
      // candidates. A/B'd against the cascade's candidate-restricted
      // verify: at THESE parameters (4 bands of one hash each — high
      // recall, low precision) candidates are a near-superset of the
      // co-shingle pairs, so restricting measured 2× SLOWER (7.8 vs
      // 3.5 s): each candidate pair dragged its shingle list through two
      // joins, and the LSH subplan re-evaluated per consumer. With
      // production banding (e.g. 16 bands × 8 hashes, tight precision)
      // the restricted shape wins — parameter regime decides, which is
      // why dedupCascade keeps the restricted form.
      val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 1e-12)
      cand
        .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sa")), "id_a")
        .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sb")), "id_b")
        .withColumn("est",
          size(filter(zip_with(col("sa"), col("sb"),
            (x, y) => coalesce(x === y, lit(false))), b => b)).cast("double") / 4.0)
        .join(exact, Seq("id_a", "id_b"))
        .select(col("id_a"), col("id_b"), col("est"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
    // Intra-document line dedup — the within-page cleanup every web
    // corpus runs (repeated nav bars / footers / menus INSIDE one page;
    // cross-page duplication is the span index's job): keep each
    // non-blank line's first occurrence, order preserved. Map-only
    // higher-order-function column algebra — no shuffle, no UDF.
    // Structure synthesized so every doc carries a real duplicate (its
    // first line re-appended).
    // CROSS-document boilerplate scrub (RefinedWeb recipe): lines whose
    // trimmed text appears in ≥ 5 distinct docs (here: the synthesized
    // per-source nav header and copyright footer, plus any naturally
    // repeated segment) are furniture and are removed in place; text
    // never rides an exchange (digests-only df count + scrub-list join).
    "x_boilerplate_scrub" -> ((s, d) => {
      val lined = concat(lit("home | about | "), col("source"),
        lit("\n"), regexp_replace(col("text"), " value ", ".\n"),
        lit("\n(c) 2024 "), col("source"), lit(" all rights reserved"))
      val docs = T(s, d, "documents").select(col("doc_id"), lined.as("text"))
      CurationOps.scrubBoilerplateLines(docs, "doc_id", "text", minDocs = 5)
        .orderBy("doc_id")
    }),
    // The admission-time form on the standing line inventory: corpus =
    // the %5≠0 slice persisted as a (digest, df) ledger, the %5=0 batch
    // probed against it in O(batch) — total df = stored + within-batch,
    // exact. Gated by the SAME global oracle restricted to the batch
    // (the LineStore incremental-equality law).
    "x_boilerplate_incremental" -> ((s, d) => {
      val lined = concat(lit("home | about | "), col("source"),
        lit("\n"), regexp_replace(col("text"), " value ", ".\n"),
        lit("\n(c) 2024 "), col("source"), lit(" all rights reserved"))
      val docs = T(s, d, "documents").select(col("doc_id"), lined.as("text"))
      val dir = tmpStore("line_store")
      graft.operators.LineStore.init(s, dir,
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
      graft.operators.LineStore.scrubIncremental(s, dir,
          docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", minDocs = 5)
        .orderBy("doc_id")
    }),
    "x_line_dedup" -> ((s, d) => {
      val lined = regexp_replace(col("text"), " value ", ".\n")
      val docs = T(s, d, "documents").select(col("doc_id"),
        concat(lined, lit("\n"), element_at(split(lined, "\n"), 1)).as("text"))
      val ded = CurationOps.dedupLines(col("text"))
      docs.select(col("doc_id"),
          size(filter(split(col("text"), "\n"), l => trim(l) =!= "")).as("n_lines"),
          size(filter(split(ded, "\n"), l => trim(l) =!= "")).as("n_kept"),
          substring(ded, 1, 60).as("head"))
        .orderBy("doc_id")
    }),
    "x_simhash" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"), DedupOps.simhash(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),
    // SimHash near-dup pairs via Manku banding: candidates from per-band
    // buckets, Hamming verify inside buckets — fingerprints, never bodies.
    // Operating point hamming ≤ 3 per Manku WWW'07: 16-bit bands keep
    // buckets near-empty at corpus scale, and ≤ 3 is where actual
    // near-dups live (at ≤ 8, >90% of reported pairs on this corpus are
    // band-collision noise and the 7-bit bands cost ~10× the wall time).
    "x_simhash_pairs" -> ((s, d) => {
      DedupOps.simhashNearDupPairs(T(s, d, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),
    // The duplicated-span inventory: 8-token windows occurring in ≥ 2
    // distinct documents — the partial-duplication signal the document-
    // level cascade cannot see. Runs the DIGEST-keyed scale form (the
    // corpus-wide exchange carries 16-byte digests, never span text);
    // SpanDedupSpec pins it pointwise equal to the string-keyed
    // duplicatedSpans the oracle SQL replays.
    "x_dup_spans" -> ((s, d) => {
      SpanDedup.duplicatedSpansDigest(T(s, d, "documents"), "doc_id", "text", k = 8)
        .orderBy("span")
    }),
    // Span removal: mask every token covered by a duplicated window and
    // rebuild the surviving text in order — one row per input document,
    // short/empty docs pass through untouched with zero counts. Digest
    // form: the duplicated-span set probes the windows as a broadcast.
    "x_substring_scrub" -> ((s, d) => {
      SpanDedup.scrubSpansDigest(T(s, d, "documents"), "doc_id", "text", k = 8)
        .orderBy("doc_id")
    }),
    // Keep-first span removal — the ExactSubstr survivorship policy:
    // ONE canonical occurrence (min (doc, pos)) of every duplicated
    // window survives, the rest scrub; duplication counts total
    // occurrences (within-doc repeats dedup too). The all-copies scrub
    // above deletes a license block from the corpus entirely; this
    // keeps exactly one copy — the keep-first rule the doc/line/media
    // families already apply, at span granularity.
    "x_substring_scrub_keepfirst" -> ((s, d) => {
      // Every 17th doc gets a doc-parameterized 8-token run repeated
      // WITHIN itself — the occurrence-counted branch (vs the all-copies
      // scrub's distinct-doc counting) is live, not vacuous: natural
      // fixture prose never repeats an 8-gram inside one doc.
      val rep = array_join(transform(sequence(lit(1), lit(8)),
        j => concat(lit("rep"), col("doc_id").cast("string"),
          lit("x"), j.cast("string"))), " ")
      val planted = when(col("doc_id") % 17 === 0,
        concat(col("text"), lit(" "), rep, lit(" between "), rep))
        .otherwise(col("text"))
      val docs = T(s, d, "documents").select(col("doc_id"), planted.as("text"))
      SpanDedup.scrubSpansKeepFirst(docs, "doc_id", "text", k = 8)
        .orderBy("doc_id")
    }),
    // The standing span-digest inventory, summarized as its doc-frequency
    // histogram (digest values are engine-internal; the histogram is
    // exactly replayable from the string spans, so a hash match proves
    // the inventory's counts are right span-for-span, collision-free).
    "x_span_index_stats" -> ((s, d) => {
      SpanDedup.spanDigestIndex(T(s, d, "documents"), "doc_id", "text", k = 8)
        .groupBy("n_docs")
        .agg(count(lit(1)).as("n_spans"), sum(col("n_occ")).as("n_occ"))
        .orderBy("n_docs")
    }),
    // TRUE variable-length substring dedup (Lee et al. 2022 ExactSubstr,
    // suffix-GROUPING form): every maximal matched token range ≥ 8
    // tokens between two sites, exact extent + both exact offsets — the
    // spans the fixed-k shingle index (x_dup_spans) provably cannot
    // report as single ranges. Fixture plants a 14-token group phrase
    // into docs 0..39 (5 docs per group of doc_id % 8) at MISALIGNED
    // offsets ((doc_id div 8) % 4 tokens in): the planted matches come back as
    // ONE 14-token-or-longer span per doc pair with per-doc offsets the
    // k-grid can't align; natural prose repeats surface too, replayed
    // identically. Digest-keyed windows (text never shuffles), pair
    // generation capped at 64 occurrences per digest (the documented
    // skew trade vs the suffix array's linearity).
    "x_substr_maximal" -> ((s, d) => {
      SpanDedup.maximalRepeats(substrPlanted(s, d, batchShared = false),
          "doc_id", "text", minLen = 8, maxOcc = 64)
        .orderBy("id_a", "start_a", "id_b", "start_b")
    }),
    // Admission-time maximal repeats: every maximal matched range
    // TOUCHING the new batch (doc_id % 5 = 0) vs the corpus or within
    // the batch — corpus-internal pairs never generated; occurrence
    // eligibility counts over the union so the result is exactly the
    // global report restricted to batch-touching pairs. The extra
    // batch-only 12-token phrase (batch docs < 50) keeps the
    // batch-vs-batch lane live — each planted phrase group holds
    // exactly ONE batch member (group stride 8 walks all residues
    // mod 5), so without it only the batch-vs-corpus lane would fire.
    "x_substr_maximal_incremental" -> ((s, d) => {
      val p = substrPlanted(s, d, batchShared = true)
      SpanDedup.maximalRepeatsAgainst(
          p.filter(col("doc_id") % 5 === 0),
          p.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text", minLen = 8, maxOcc = 64)
        .orderBy("id_a", "start_a", "id_b", "start_b")
    }),
    // Duplicated-span LOSS-MASK ranges — the soft alternative to
    // scrubbing: merged (start, end) token ranges a dataloader zeroes
    // loss on, so boilerplate stays readable in context but is never
    // trained on. One row per maximal masked range per doc.
    "x_dup_mask_spans" -> ((s, d) => {
      SpanDedup.dupMaskRanges(T(s, d, "documents"), "doc_id", "text", k = 8)
        .orderBy("doc_id", "mask_start")
    }),
    // Admission-time KEEP-FIRST scrub: the batch probes the standing
    // inventory — any corpus-held span scrubs from the batch entirely
    // (the corpus copy is the canonical survivor, by arrival order),
    // corpus-novel spans duplicated within the batch keep their batch-
    // canonical occurrence. O(batch) windows + one map-only index scan
    // under a broadcast of the batch's digests.
    "x_span_keepfirst_incremental" -> ((s, d) => {
      // Batch docs 0,5,10,15,20,25 share an 8-token phrase the corpus
      // never holds: the corpus-NOVEL within-batch branch is live (the
      // batch-canonical copy in doc 0 survives, the rest scrub) — at
      // natural fixture data every batch dup also exists corpus-side
      // and that branch would be vacuously green.
      val planted = when(col("doc_id") % 5 === 0 && col("doc_id") < 30,
        concat(col("text"),
          lit(" bnov1 bnov2 bnov3 bnov4 bnov5 bnov6 bnov7 bnov8")))
        .otherwise(col("text"))
      val docs = T(s, d, "documents").select(col("doc_id"), planted.as("text"))
      SpanDedup.scrubKeepFirstAgainstIndex(
          docs.filter(col("doc_id") % 5 === 0),
          SpanDedup.spanDigestIndex(
            docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", k = 8),
          "doc_id", "text", k = 8)
        .orderBy("doc_id")
    }),
    // Admission-time span scrub: the batch (doc_id % 5 = 0) is scrubbed
    // against the standing inventory of the corpus (doc_id % 5 <> 0) —
    // O(batch) windows + a filter-pushed index scan, corpus text never
    // read. Output equals the full-corpus scrub restricted to the batch.
    "x_span_scrub_incremental" -> ((s, d) => {
      val docs = T(s, d, "documents")
      SpanDedup.scrubAgainstIndex(
          docs.filter(col("doc_id") % 5 === 0),
          SpanDedup.spanDigestIndex(
            docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", k = 8),
          "doc_id", "text", k = 8)
        .orderBy("doc_id")
    }),
  )

  /** Shared maximal-repeat replay (x_substr_maximal and its incremental
    * form — the same planted text, windows, union-counted eligibility,
    * canonical pair order, and gaps-and-islands diagonals; the
    * incremental form adds the batch-shared phrase and restricts pairs
    * to batch-touching ones). */
  private def substrMaximalSql(batchShared: Boolean, pairWhere: String): String = {
    // The fragment's lines carry margin chars for the OUTER stripMargin
    // (an already-stripped fragment would lose the first '|' of each
    // '||' concat operator to the outer strip).
    val share =
      if (!batchShared) ""
      else "\n       |      || CASE WHEN doc_id % 5 = 0 AND doc_id < 50" +
        "\n       |           THEN ' bshare1 bshare2 bshare3 bshare4 bshare5" +
        " bshare6 bshare7 bshare8 bshare9 bshare10 bshare11 bshare12'" +
        "\n       |           ELSE '' END"
    s"""WITH w0 AS (SELECT doc_id, text, $words AS wds0 FROM documents),
       |p AS (SELECT doc_id, CASE WHEN doc_id < 40 THEN
       |        coalesce(array_to_string(wds0[1:CAST((doc_id // 8) % 4 AS INT)], ' '), '') || ' ' ||
       |        array_to_string(list_transform(generate_series(1, 14),
       |          j -> 'seg' || CAST(doc_id % 8 AS VARCHAR) || 'tok' || CAST(j AS VARCHAR)), ' ')
       |        || ' ' ||
       |        coalesce(array_to_string(wds0[CAST((doc_id // 8) % 4 AS INT) + 1:len(wds0)], ' '), '')
       |      ELSE text END$share
       |      || ' sep' || CAST(doc_id AS VARCHAR)
       |      || ' foot1 foot2 foot3 foot4 foot5 foot6 foot7 foot8' AS text
       |  FROM w0),
       |toks AS (SELECT doc_id, $words AS t FROM p),
       |win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
       |        FROM (SELECT doc_id, t,
       |                unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
       |elig AS (SELECT span FROM win GROUP BY 1
       |         HAVING count(*) >= 2 AND count(*) <= 64),
       |pr AS (SELECT a.doc_id ida, a.i ia, b.doc_id idb, b.i ib
       |       FROM win a JOIN elig USING (span) JOIN win b USING (span)
       |       WHERE $pairWhere(a.doc_id < b.doc_id
       |          OR (a.doc_id = b.doc_id AND a.i < b.i))),
       |runs AS (SELECT ida, idb, ia, ib, ia - ib AS diag,
       |           ia - row_number() OVER (
       |             PARTITION BY ida, idb, ia - ib ORDER BY ia) AS grp
       |         FROM pr),
       |agg AS (SELECT ida, idb, min(ia) sa, min(ib) sb,
       |          max(ia) - min(ia) + 8 AS len
       |        FROM runs GROUP BY ida, idb, diag, grp)
       |SELECT agg.ida AS id_a, CAST(sa AS INTEGER) AS start_a,
       |  agg.idb AS id_b, CAST(sb AS INTEGER) AS start_b,
       |  CAST(len AS INTEGER) AS len_tokens,
       |  array_to_string(t[sa:sa+len-1], ' ') AS span
       |FROM agg JOIN toks ON toks.doc_id = agg.ida
       |ORDER BY id_a, start_a, id_b, start_b""".stripMargin
  }

  /** The EXACT-policy funnel replay, CTE chain only (through `agg`):
    * pipe_admission_e2e's funnel + exact-dup stages verbatim, then the
    * variable-length coverage — corpus side by the independent
    * union-suffix-sort max-LCP construction (the x_sa_dup_len_stored
    * oracle's shape), batch-internal side by the x_sa_dup_len
    * adjacent-LCP construction restricted to survivors; a token leaves
    * under ANY >= 8 interval from either side. Shared by the exact
    * funnel oracle and its attribution-report extension. */
  private val exactFunnelCtes =
    s"""WITH w AS (SELECT doc_id, text, $words wds FROM documents WHERE doc_id % 5 = 0),
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
         |  FROM gst LEFT JOIN gp USING (doc_id)),
         |cur AS (SELECT w.doc_id, (lang.lang_pred <> 'und' AND q.quality >= 0.5
         |          AND g.gopher_keep AND pii.n_pii = 0) AS admit
         |  FROM w JOIN lang USING (doc_id) JOIN q USING (doc_id)
         |  JOIN pii USING (doc_id) JOIN g USING (doc_id)),
         |novel AS (SELECT c1.doc_id FROM cur c1 JOIN documents i USING (doc_id)
         |  WHERE c1.admit AND NOT EXISTS (
         |    SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0
         |    AND md5(lower(trim(c.text))) = md5(lower(trim(i.text))))),
         |ct0 AS (SELECT doc_id, $words t FROM documents WHERE doc_id % 5 <> 0),
         |st0 AS (SELECT doc_id, $words t FROM documents
         |        WHERE doc_id IN (SELECT doc_id FROM novel)),
         |cs2 AS (SELECT t, CAST(i.i AS INTEGER) AS pos,
         |          CAST(len(t) - i.i + 1 AS INTEGER) AS rem,
         |          array_to_string(t[i.i:len(t)], ' ') AS suf
         |        FROM ct0, unnest(generate_series(1, len(t))) AS i(i)),
         |qs2 AS (SELECT doc_id, t, CAST(i.i AS INTEGER) AS pos,
         |          CAST(len(t) - i.i + 1 AS INTEGER) AS rem,
         |          array_to_string(t[i.i:len(t)], ' ') AS suf
         |        FROM st0, unnest(generate_series(1, len(t))) AS i(i)),
         |u2 AS (SELECT CAST(NULL AS BIGINT) AS doc_id, t, pos, rem, suf, 0 AS isq FROM cs2
         |       UNION ALL SELECT doc_id, t, pos, rem, suf, 1 FROM qs2),
         |w2 AS (SELECT doc_id, t, pos, rem, isq,
         |         last_value(CASE WHEN isq = 0
         |             THEN struct_pack(ct := t, cpos := pos, crem := rem) END
         |           IGNORE NULLS) OVER (ORDER BY suf, isq
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc,
         |         first_value(CASE WHEN isq = 0
         |             THEN struct_pack(ct := t, cpos := pos, crem := rem) END
         |           IGNORE NULLS) OVER (ORDER BY suf, isq
         |             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc
         |       FROM u2),
         |dc AS (SELECT doc_id, pos, greatest(
         |         CASE WHEN pc IS NULL THEN 0 ELSE
         |           coalesce(nullif(list_position(list_transform(
         |               generate_series(1, least(rem, pc.crem)),
         |               j -> t[pos + j - 1] = pc.ct[pc.cpos + j - 1]), false), 0) - 1,
         |             least(rem, pc.crem)) END,
         |         CASE WHEN nc IS NULL THEN 0 ELSE
         |           coalesce(nullif(list_position(list_transform(
         |               generate_series(1, least(rem, nc.crem)),
         |               j -> t[pos + j - 1] = nc.ct[nc.cpos + j - 1]), false), 0) - 1,
         |             least(rem, nc.crem)) END) AS dl
         |       FROM w2 WHERE isq = 1),
         |o2 AS (SELECT doc_id, pos, t, rem,
         |         lead(doc_id) OVER w3 AS nid, lead(pos) OVER w3 AS npos,
         |         lead(t) OVER w3 AS nt, lead(rem) OVER w3 AS nrem
         |       FROM qs2 WINDOW w3 AS (ORDER BY suf, doc_id, pos)),
         |pr2 AS (SELECT doc_id, pos, nid, npos,
         |          coalesce(nullif(list_position(list_transform(
         |              generate_series(1, least(rem, nrem)),
         |              j -> t[pos + j - 1] = nt[npos + j - 1]), false), 0) - 1,
         |            least(rem, nrem)) AS lcp
         |        FROM o2 WHERE nid IS NOT NULL),
         |db AS (SELECT doc_id, pos, max(lcp) AS dl FROM (
         |         SELECT doc_id, pos, lcp FROM pr2
         |         UNION ALL SELECT nid AS doc_id, npos AS pos, lcp FROM pr2)
         |       GROUP BY 1, 2),
         |dall AS (SELECT doc_id, pos, dl FROM dc WHERE dl >= 8
         |         UNION ALL SELECT doc_id, pos, dl FROM db WHERE dl >= 8),
         |cover AS (SELECT DISTINCT doc_id, u3.cp AS pos
         |          FROM dall, unnest(generate_series(dall.pos, dall.pos + dall.dl - 1)) AS u3(cp)),
         |tok_pos AS (SELECT doc_id, CAST(i.i AS INTEGER) AS pos, t[i.i] AS tok
         |            FROM st0, unnest(generate_series(1, len(t))) AS i(i)),
         |agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
         |          count(c.pos) AS n_removed,
         |          coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
         |            ' ' ORDER BY tp.pos), '') AS clean_text
         |        FROM tok_pos tp LEFT JOIN cover c
         |          ON c.doc_id = tp.doc_id AND c.pos = tp.pos
         |        GROUP BY 1)""".stripMargin

  def oracles: Map[String, String] = Map(
    "x_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents ORDER BY doc_id""".stripMargin,
    // Content-defined chunking parity: the closed-form window hash
    // Σ cp(i)·B^(e−i) mod M over each 8-codepoint window equals the JVM
    // kernel's O(n) rolling recurrence, so boundary sets match exactly.
    "x_cdc_chunks" ->
      s"""$cdcCtes
         |SELECT doc_id, array_to_string(ends, ',') AS chunk_ends
         |FROM b ORDER BY doc_id""".stripMargin,
    // Chunk-level dedup: cut each document at the CDC ends, md5 every
    // chunk, group fingerprints seen more than once.
    "x_cdc_dedup" ->
      s"""$cdcCtes,
         |ch AS (SELECT doc_id, CAST(i.i AS INTEGER) AS pos,
         |        substring(text,
         |          CASE WHEN i.i = 1 THEN 1 ELSE CAST(ends[CAST(i.i AS INT) - 1] + 1 AS INT) END,
         |          CAST(ends[CAST(i.i AS INT)] - CASE WHEN i.i = 1 THEN 0 ELSE ends[CAST(i.i AS INT) - 1] END AS INT)) AS chunk
         |       FROM b, unnest(generate_series(1, len(ends))) AS i(i)),
         |f AS (SELECT md5(chunk) fp, doc_id, pos FROM ch)
         |SELECT fp, count(*) AS n,
         |  string_agg(doc_id || ':' || pos, ',' ORDER BY doc_id, pos) AS ids
         |FROM f GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin,
    // Substring-level dedup (Lee et al. 2022, shingle form): 8-token
    // windows over the shared tokenization, duplicated when seen in >= 2
    // distinct docs. t[i:i+7] is DuckDB's 1-based INCLUSIVE slice = the
    // engine's slice(toks, i, 8); generate_series(1, n) is empty for
    // n < 1, matching the engine's guarded short-doc branch.
    "x_dup_spans" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks))
        |SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_occ
        |FROM win GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY 1""".stripMargin,
    // Maximal-repeat replay: same planted text (list slicing replays
    // Spark's slice — both 1-based, DuckDB's end-inclusive t[a:b] ≡
    // slice(t, a, b-a+1); re-tokenization absorbs the double spaces the
    // empty-prefix concat leaves; coalesce because DuckDB's
    // array_to_string over an EMPTY slice is NULL where Spark's
    // array_join is '' — one NULL leg would null the planted text and
    // silently drop every offset-0 doc), same 8-token windows, cap
    // 2..64, canonical pair order, and the SAME gaps-and-islands window
    // (ia − row_number over each (id_a, id_b, ia−ib) diagonal). String
    // keys here vs digests in the engine — a hash match proves the
    // digest grouping collision-free, the x_dup_spans idiom.
    "x_substr_maximal" -> substrMaximalSql(batchShared = false, pairWhere = ""),
    // Incremental replay: SAME CTE chain (eligibility over the union),
    // pairs restricted to those touching the batch slice — the
    // incremental-equality law stated as SQL.
    "x_substr_maximal_incremental" -> substrMaximalSql(batchShared = true,
      pairWhere = "(a.doc_id % 5 = 0 OR b.doc_id % 5 = 0) AND "),
    // The store-probed form answers IDENTICALLY (the SpanPosStore law) —
    // the oracle IS the incremental replay; a hash match proves the
    // persisted window relation, the signed occurrence inventory, and
    // the batch-side span re-attachment all collision- and drift-free.
    "x_substr_store" -> substrMaximalSql(batchShared = true,
      pairWhere = "(a.doc_id % 5 = 0 OR b.doc_id % 5 = 0) AND "),
    // Span removal: coverage = distinct (doc, pos) under any duplicated
    // window (overlaps merge via DISTINCT), kept tokens re-join in
    // position order; docs shorter than the window (or empty) fall out
    // of tok_pos and re-enter via the documents left join with zeros.
    "x_substring_scrub" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |     dup AS (SELECT span FROM win GROUP BY 1
        |             HAVING count(DISTINCT doc_id) >= 2),
        |     cover AS (SELECT DISTINCT w.doc_id, u.pos
        |               FROM win w JOIN dup USING (span),
        |                    unnest(generate_series(w.i, w.i + 7)) AS u(pos)),
        |     tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
        |                 FROM (SELECT doc_id, t,
        |                         unnest(generate_series(1, len(t))) AS i FROM toks)),
        |     agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
        |               count(c.pos) AS n_removed,
        |               coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
        |                 ' ' ORDER BY tp.pos), '') AS clean_text
        |             FROM tok_pos tp LEFT JOIN cover c
        |               ON c.doc_id = tp.doc_id AND c.pos = tp.pos
        |             GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
        |       coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // Mask-range replay: same duplicated set (distinct-doc >= 2) and
    // distinct coverage as the scrub oracle, then the SAME
    // gaps-and-islands window (pos - row_number per doc) the engine
    // runs, aggregated to merged inclusive ranges.
    "x_dup_mask_spans" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |     dup AS (SELECT span FROM win GROUP BY 1
        |             HAVING count(DISTINCT doc_id) >= 2),
        |     cover AS (SELECT DISTINCT w.doc_id, u.pos
        |               FROM win w JOIN dup USING (span),
        |                    unnest(generate_series(w.i, w.i + 7)) AS u(pos)),
        |     runs AS (SELECT doc_id, pos,
        |                pos - row_number() OVER (
        |                  PARTITION BY doc_id ORDER BY pos) AS grp
        |              FROM cover)
        |SELECT doc_id, CAST(min(pos) AS INTEGER) AS mask_start,
        |  CAST(max(pos) AS INTEGER) AS mask_end,
        |  CAST(max(pos) - min(pos) + 1 AS INTEGER) AS mask_len
        |FROM runs GROUP BY doc_id, grp
        |ORDER BY doc_id, mask_start""".stripMargin,
    // Incremental keep-first replay: a batch window is covered iff its
    // span exists ANYWHERE in the corpus slice (the corpus copy is
    // canonical by arrival order — mere presence, no threshold), or it
    // is a corpus-novel span duplicated within the batch and not the
    // batch-canonical (doc_id, i) occurrence.
    "x_span_keepfirst_incremental" ->
      s"""WITH p AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 AND doc_id < 30
        |        THEN text || ' bnov1 bnov2 bnov3 bnov4 bnov5 bnov6 bnov7 bnov8'
        |        ELSE text END AS text FROM documents),
        |     toks AS (SELECT doc_id, $words AS t FROM p),
        |     bw AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |            FROM (SELECT doc_id, t,
        |                    unnest(generate_series(1, len(t) - 7)) AS i FROM toks)
        |            WHERE doc_id % 5 = 0),
        |     cw AS (SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS span
        |            FROM (SELECT doc_id, t,
        |                    unnest(generate_series(1, len(t) - 7)) AS i FROM toks)
        |            WHERE doc_id % 5 <> 0),
        |     occ AS (SELECT doc_id, i, span,
        |               count(*) OVER (PARTITION BY span) AS bn,
        |               row_number() OVER (PARTITION BY span
        |                 ORDER BY doc_id, i) AS rn
        |             FROM bw),
        |     cover AS (SELECT DISTINCT o.doc_id, u.pos
        |               FROM occ o, unnest(generate_series(o.i, o.i + 7)) AS u(pos)
        |               WHERE o.span IN (SELECT span FROM cw)
        |                  OR (o.bn >= 2 AND o.rn > 1)),
        |     tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
        |                 FROM (SELECT doc_id, t,
        |                         unnest(generate_series(1, len(t))) AS i FROM toks)
        |                 WHERE doc_id % 5 = 0),
        |     agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
        |               count(c.pos) AS n_removed,
        |               coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
        |                 ' ' ORDER BY tp.pos), '') AS clean_text
        |             FROM tok_pos tp LEFT JOIN cover c
        |               ON c.doc_id = tp.doc_id AND c.pos = tp.pos
        |             GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
        |       coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |WHERE d.doc_id % 5 = 0
        |ORDER BY d.doc_id""".stripMargin,
    // Keep-first replay: duplicated = total occurrences >= 2 (NOT
    // distinct docs — within-doc repeats dedup under this policy), the
    // canonical survivor is row_number() = 1 over (doc_id, i) per span,
    // coverage unions over the non-canonical occurrences only.
    "x_substring_scrub_keepfirst" ->
      s"""WITH p AS (SELECT doc_id, CASE WHEN doc_id % 17 = 0 THEN text || ' ' ||
        |        array_to_string(list_transform(generate_series(1, 8),
        |          j -> 'rep' || CAST(doc_id AS VARCHAR) || 'x' || CAST(j AS VARCHAR)), ' ')
        |        || ' between ' ||
        |        array_to_string(list_transform(generate_series(1, 8),
        |          j -> 'rep' || CAST(doc_id AS VARCHAR) || 'x' || CAST(j AS VARCHAR)), ' ')
        |      ELSE text END AS text FROM documents),
        |     toks AS (SELECT doc_id, $words AS t FROM p),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |     occ AS (SELECT doc_id, i, span,
        |               count(*) OVER (PARTITION BY span) AS n_occ,
        |               row_number() OVER (PARTITION BY span
        |                 ORDER BY doc_id, i) AS rn
        |             FROM win),
        |     cover AS (SELECT DISTINCT o.doc_id, u.pos
        |               FROM occ o, unnest(generate_series(o.i, o.i + 7)) AS u(pos)
        |               WHERE o.n_occ >= 2 AND o.rn > 1),
        |     tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
        |                 FROM (SELECT doc_id, t,
        |                         unnest(generate_series(1, len(t))) AS i FROM toks)),
        |     agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
        |               count(c.pos) AS n_removed,
        |               coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
        |                 ' ' ORDER BY tp.pos), '') AS clean_text
        |             FROM tok_pos tp LEFT JOIN cover c
        |               ON c.doc_id = tp.doc_id AND c.pos = tp.pos
        |             GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
        |       coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // The engine's inventory keys spans by a 128-bit digest; the
    // doc-frequency histogram is digest-free and replayable from the
    // string spans — a hash match proves the digest grouping merged
    // exactly the spans the strings would (collision-free).
    "x_span_index_stats" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |     g AS (SELECT span, count(DISTINCT doc_id) nd, count(*) nocc
        |           FROM win GROUP BY 1)
        |SELECT CAST(nd AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_spans,
        |       CAST(sum(nocc) AS BIGINT) AS n_occ
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    // Incremental admission scrub = the full-corpus scrub (duplication
    // counted over corpus ∪ batch = all documents) restricted to the
    // batch's rows — the invariant scrubAgainstIndex is built to hold.
    "x_span_scrub_incremental" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |     dup AS (SELECT span FROM win GROUP BY 1
        |             HAVING count(DISTINCT doc_id) >= 2),
        |     cover AS (SELECT DISTINCT w.doc_id, u.pos
        |               FROM win w JOIN dup USING (span),
        |                    unnest(generate_series(w.i, w.i + 7)) AS u(pos)),
        |     tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
        |                 FROM (SELECT doc_id, t,
        |                         unnest(generate_series(1, len(t))) AS i FROM toks)),
        |     agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
        |               count(c.pos) AS n_removed,
        |               coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
        |                 ' ' ORDER BY tp.pos), '') AS clean_text
        |             FROM tok_pos tp LEFT JOIN cover c
        |               ON c.doc_id = tp.doc_id AND c.pos = tp.pos
        |             GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
        |       coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |WHERE d.doc_id % 5 = 0
        |ORDER BY d.doc_id""".stripMargin,
    // The bloom prefilter is exact end-to-end (suspects get verified),
    // so the oracle is the plain fingerprint anti-join.
    "x_bloom_incremental" ->
      """SELECT i.doc_id FROM documents i
        |WHERE i.doc_id % 5 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0
        |  AND md5(lower(trim(c.text))) = md5(lower(trim(i.text))))
        |ORDER BY i.doc_id""".stripMargin,
    "x_exact_dup_groups" ->
      """SELECT md5(lower(trim(text))) AS fp, count(*) AS n,
        |  array_to_string(list_sort(list(doc_id)), ',') AS ids
        |FROM documents GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin,
    // Incremental near-dup admission: batch (doc_id % 10 >= 8) bands
    // probe the corpus (doc_id % 10 < 8) band index, candidates verify by
    // exact shingle Jaccard, one verdict row per batch doc. Same
    // signature chain as x_lsh_pairs, split across the two sides.
    "x_neardup_incremental" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END s
         |  FROM w),
         |sig AS (SELECT doc_id, [
         |  list_min(list_transform(s, x -> md5('0|' || x))),
         |  list_min(list_transform(s, x -> md5('1|' || x))),
         |  list_min(list_transform(s, x -> md5('2|' || x))),
         |  list_min(list_transform(s, x -> md5('3|' || x)))] sg FROM sh),
         |bnd AS (SELECT doc_id, generate_subscripts(sg, 1) band, unnest(sg) bv FROM sig),
         |cand AS (SELECT DISTINCT b.doc_id batch_id, c.doc_id corpus_id
         |  FROM bnd b JOIN bnd c ON b.band = c.band AND b.bv = c.bv
         |  WHERE b.doc_id % 10 >= 8 AND c.doc_id % 10 < 8),
         |m AS (SELECT doc_id, unnest(list_distinct(s)) sh FROM sh),
         |sz AS (SELECT doc_id, count(*) n FROM m GROUP BY doc_id),
         |i AS (SELECT cd.batch_id, cd.corpus_id, count(*) inter
         |  FROM cand cd JOIN m a ON a.doc_id = cd.batch_id
         |  JOIN m b2 ON b2.doc_id = cd.corpus_id AND b2.sh = a.sh GROUP BY 1, 2),
         |mt AS (SELECT i.batch_id, i.corpus_id,
         |    i.inter::DOUBLE / (x.n + y.n - i.inter) jac
         |  FROM i JOIN sz x ON x.doc_id = i.batch_id
         |  JOIN sz y ON y.doc_id = i.corpus_id
         |  WHERE i.inter::DOUBLE / (x.n + y.n - i.inter) >= 0.05),
         |st AS (SELECT batch_id, count(*) nm FROM mt GROUP BY 1),
         |bst AS (SELECT batch_id, corpus_id, jac FROM (
         |  SELECT mt.*, row_number() OVER (PARTITION BY batch_id
         |    ORDER BY jac DESC, corpus_id) rn FROM mt) WHERE rn = 1)
         |SELECT d.doc_id, CAST(coalesce(st.nm, 0) AS BIGINT) AS n_matches,
         |  bst.corpus_id AS match_id, round(bst.jac, 6) AS match_jaccard,
         |  (st.nm IS NULL) AS admit
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) d
         |LEFT JOIN st ON st.batch_id = d.doc_id
         |LEFT JOIN bst ON bst.batch_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "x_minhash_sig" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END s
         |  FROM w)
         |SELECT doc_id, array_to_string(list_transform([
         |  list_min(list_transform(s, x -> md5('0|' || x))),
         |  list_min(list_transform(s, x -> md5('1|' || x))),
         |  list_min(list_transform(s, x -> md5('2|' || x))),
         |  list_min(list_transform(s, x -> md5('3|' || x)))],
         |  h -> coalesce(h, 'null')), ',') AS sig
         |FROM sh ORDER BY doc_id""".stripMargin,
    // LSH evaluation replay: the shared candidate chain vs the exact
    // ≥ 0.05 ground truth — two counts and their rounded ratios.
    "x_lsh_eval" ->
      s"""WITH $lshCandCtes,
         |ex AS (SELECT li.ia, li.ib FROM li
         |  JOIN lsz x ON x.doc_id = li.ia JOIN lsz y ON y.doc_id = li.ib
         |  WHERE li.inter::DOUBLE / (x.n + y.n - li.inter) >= 0.05),
         |tp AS (SELECT c.ia, c.ib FROM cand c JOIN ex ON ex.ia = c.ia AND ex.ib = c.ib),
         |n AS (SELECT (SELECT count(*) FROM cand) nc,
         |             (SELECT count(*) FROM ex) ne,
         |             (SELECT count(*) FROM tp) nh)
         |SELECT nc AS n_candidates, ne AS n_true_pairs, nh AS n_hits,
         |  CASE WHEN nc = 0 THEN 0.0 ELSE round(nh::DOUBLE / nc, 6) END AS precision,
         |  CASE WHEN ne = 0 THEN 0.0 ELSE round(nh::DOUBLE / ne, 6) END AS recall
         |FROM n""".stripMargin,
    "x_lsh_pairs" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END s
         |  FROM w),
         |sig AS (SELECT doc_id, [
         |  list_min(list_transform(s, x -> md5('0|' || x))),
         |  list_min(list_transform(s, x -> md5('1|' || x))),
         |  list_min(list_transform(s, x -> md5('2|' || x))),
         |  list_min(list_transform(s, x -> md5('3|' || x)))] sg FROM sh),
         |b AS (SELECT doc_id, generate_subscripts(sg, 1) band, unnest(sg) bv FROM sig)
         |SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         |FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id
         |ORDER BY id_a, id_b""".stripMargin,
    "x_ngram_jaccard" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END) s
         |  FROM w),
         |m AS (SELECT doc_id, unnest(s) sh FROM sh),
         |sz AS (SELECT doc_id, count(*) n FROM m GROUP BY doc_id),
         |i AS (SELECT a.doc_id ia, b.doc_id ib, count(*) inter
         |        FROM m a JOIN m b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |j AS (SELECT ia, ib, inter, inter::DOUBLE / (x.n + y.n - inter) jac
         |        FROM i JOIN sz x ON x.doc_id = ia JOIN sz y ON y.doc_id = ib)
         |SELECT ia AS id_a, ib AS id_b, round(jac, 6) AS jaccard
         |FROM j WHERE jac >= 0.02 ORDER BY id_a, id_b""".stripMargin,
    // Containment replay: same 3-shingle sets, both direction ratios,
    // keep where either ROUNDED direction reaches 0.4 (the rounded
    // value is the shared decision key).
    "x_containment_pairs" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END) s
         |  FROM w),
         |m AS (SELECT doc_id, unnest(s) sh FROM sh),
         |sz AS (SELECT doc_id, count(*) n FROM m GROUP BY doc_id),
         |i AS (SELECT a.doc_id ia, b.doc_id ib, count(*) inter
         |        FROM m a JOIN m b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |c AS (SELECT ia, ib, round(inter::DOUBLE / x.n, 6) ca, round(inter::DOUBLE / y.n, 6) cb
         |        FROM i JOIN sz x ON x.doc_id = ia JOIN sz y ON y.doc_id = ib)
         |SELECT ia AS id_a, ib AS id_b, ca AS cont_a_in_b, cb AS cont_b_in_a
         |FROM c WHERE greatest(ca, cb) >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    // Cross-document boilerplate scrub replay: same synthetic
    // header/footer lines, df over DISTINCT docs per trimmed line
    // (string-keyed — proving the Spark side's md5 digest grouping
    // collision-free), same ≥ 5 cutoff, same in-place keep filter
    // (whitespace-only lines structural, never counted, never removed).
    "x_boilerplate_scrub" -> boilerplateScrubSql(""),
    "x_boilerplate_incremental" -> boilerplateScrubSql("WHERE t.doc_id % 5 = 0"),
    // Line-dedup replay: same synthetic duplicate (first line
    // re-appended), keep-first via DuckDB's indexed list lambda
    // (list_position = first occurrence, exactly Spark's
    // array_position).
    "x_line_dedup" ->
      """WITH w AS (SELECT doc_id,
        |        regexp_replace(text, ' value ', '.' || chr(10), 'g') t0 FROM documents),
        |w2 AS (SELECT doc_id,
        |        t0 || chr(10) || string_split(t0, chr(10))[1] t FROM w),
        |d AS (SELECT doc_id,
        |        list_filter(string_split(t, chr(10)), l -> trim(l) <> '') lines FROM w2),
        |k AS (SELECT doc_id, lines,
        |        list_filter(lines, (l, i) -> list_position(lines, l) = i) kept FROM d)
        |SELECT doc_id, CAST(len(lines) AS INTEGER) AS n_lines,
        |  CAST(len(kept) AS INTEGER) AS n_kept,
        |  substring(array_to_string(kept, chr(10)), 1, 60) AS head
        |FROM k ORDER BY doc_id""".stripMargin,
    "x_simhash" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |t AS (SELECT doc_id, md5_number_lower(unnest(wds)) h FROM w),
        |v AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) vote
        |      FROM t CROSS JOIN range(64) r(b) GROUP BY doc_id, b),
        |u AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN 1::HUGEINT << b ELSE 0 END) sh FROM v GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL
        |       ELSE coalesce((CASE WHEN u.sh >= 9223372036854775808 THEN u.sh - 18446744073709551616
        |                           ELSE u.sh END)::BIGINT, 0) END AS simhash
        |FROM documents d LEFT JOIN u ON u.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "x_simhash_pairs" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |t AS (SELECT doc_id, md5_number_lower(unnest(wds)) h FROM w),
        |v AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) vote
        |      FROM t CROSS JOIN range(64) r(b) GROUP BY doc_id, b),
        |u AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN 1::HUGEINT << b ELSE 0 END) sh FROM v GROUP BY doc_id),
        |s AS (SELECT d.doc_id,
        |        coalesce((CASE WHEN u.sh >= 9223372036854775808 THEN u.sh - 18446744073709551616
        |                       ELSE u.sh END)::BIGINT, 0) sh
        |      FROM documents d LEFT JOIN u ON u.doc_id = d.doc_id
        |      WHERE d.text IS NOT NULL)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // Duplicate components: the same Jaccard pairs as x_ngram_jaccard,
    // closed under connectivity by a recursive reachability CTE — the
    // min reachable id IS the min-label-propagation fixpoint.
    "x_dup_components" ->
      s"""$dupComponentCtes
         |SELECT doc.doc_id, coalesce(c.component, doc.doc_id) AS component
         |FROM documents doc LEFT JOIN c ON c.id = doc.doc_id
         |ORDER BY doc.doc_id""".stripMargin,
    // Dedup loss-weight replay: same closure, survivor = min-id (= the
    // component label), weight = member count.
    "x_dedup_weight" ->
      s"""$dupComponentCtes
         |SELECT coalesce(c.component, doc.doc_id) AS doc_id,
         |  count(*) AS weight
         |FROM documents doc LEFT JOIN c ON c.id = doc.doc_id
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // Cluster-size histogram: same closure, two grouped counts.
    "x_dup_histogram" ->
      s"""$dupComponentCtes,
         |hmemb AS (SELECT coalesce(c.component, doc.doc_id) component
         |      FROM documents doc LEFT JOIN c ON c.id = doc.doc_id),
         |hsz AS (SELECT component, count(*) csz FROM hmemb GROUP BY 1)
         |SELECT CAST(csz AS BIGINT) AS cluster_size,
         |  CAST(count(*) AS BIGINT) AS n_components,
         |  CAST(sum(csz) AS BIGINT) AS n_docs
         |FROM hsz GROUP BY 1 ORDER BY 1""".stripMargin,
    // Quality-aware representative: same closure, survivor = n_chars
    // argmax with doc-id tie-break (row_number replay of max_by).
    "x_dup_rep_quality" ->
      s"""$dupComponentCtes,
         |q AS (SELECT doc.doc_id, coalesce(c.component, doc.doc_id) component,
         |        doc.n_chars
         |      FROM documents doc LEFT JOIN c ON c.id = doc.doc_id),
         |rk AS (SELECT doc_id, component,
         |         row_number() OVER (PARTITION BY component
         |           ORDER BY n_chars DESC, doc_id ASC) rn FROM q),
         |r1 AS (SELECT component, doc_id rep_id FROM rk WHERE rn = 1)
         |SELECT q.doc_id, q.component, r1.rep_id,
         |  (q.doc_id = r1.rep_id) AS keep
         |FROM q JOIN r1 ON r1.component = q.component
         |ORDER BY q.doc_id""".stripMargin,
    // MinHash estimate replay: same signatures (salted-md5 mins), same
    // candidate pairs, agreement fraction over the 4 slots vs the exact
    // Jaccard of the same pair.
    "x_minhash_est" ->
      s"""WITH $lshCandCtes
         |SELECT c.ia AS id_a, c.ib AS id_b,
         |  len(list_filter([1, 2, 3, 4], k -> coalesce(x.sg[k] = y.sg[k], false)))::DOUBLE / 4.0 AS est,
         |  round(li.inter::DOUBLE / (sx.n + sy.n - li.inter), 6) AS jaccard
         |FROM cand c
         |JOIN lsig x ON x.doc_id = c.ia JOIN lsig y ON y.doc_id = c.ib
         |JOIN li ON li.ia = c.ia AND li.ib = c.ib
         |JOIN lsz sx ON sx.doc_id = c.ia JOIN lsz sy ON sy.doc_id = c.ib
         |ORDER BY id_a, id_b""".stripMargin,
    // Dedup cascade: LSH candidates (as x_lsh_pairs) intersected with
    // the ≥-threshold Jaccard pairs (as x_ngram_jaccard), closed by the
    // recursive reachability CTE (as x_dup_components); kept = the doc
    // IS its component's min-id label.
    "pipe_dedup_e2e" ->
      s"""WITH RECURSIVE $lshCandCtes,
         |p AS (SELECT li.ia, li.ib FROM li JOIN cand USING (ia, ib)
         |  JOIN lsz x ON x.doc_id = li.ia JOIN lsz y ON y.doc_id = li.ib
         |  WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.02),
         |e AS (SELECT ia s, ib d FROM p UNION SELECT ib, ia FROM p),
         |r AS (SELECT s AS id, s AS lbl FROM e
         |      UNION
         |      SELECT e.d, r.lbl FROM r JOIN e ON e.s = r.id),
         |cc AS (SELECT id, min(lbl) component FROM r GROUP BY id)
         |SELECT doc.doc_id, coalesce(cc.component, doc.doc_id) AS component,
         |  (coalesce(cc.component, doc.doc_id) = doc.doc_id) AS kept
         |FROM documents doc LEFT JOIN cc ON cc.id = doc.doc_id
         |ORDER BY doc.doc_id""".stripMargin,
    // Admission pipeline replay: the x_curation_verdict funnel restricted
    // to the batch slice, the exact-fingerprint anti-join over its
    // admitted docs, and the span scrub with duplication counted over
    // corpus ∪ survivors — stage precedence mirrored by the CASE order.
    "pipe_admission_e2e" ->
      s"""WITH w AS (SELECT doc_id, text, $words wds FROM documents WHERE doc_id % 5 = 0),
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
         |  FROM gst LEFT JOIN gp USING (doc_id)),
         |cur AS (SELECT w.doc_id, (lang.lang_pred <> 'und' AND q.quality >= 0.5
         |          AND g.gopher_keep AND pii.n_pii = 0) AS admit
         |  FROM w JOIN lang USING (doc_id) JOIN q USING (doc_id)
         |  JOIN pii USING (doc_id) JOIN g USING (doc_id)),
         |novel AS (SELECT c1.doc_id FROM cur c1 JOIN documents i USING (doc_id)
         |  WHERE c1.admit AND NOT EXISTS (
         |    SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0
         |    AND md5(lower(trim(c.text))) = md5(lower(trim(i.text))))),
         |toksall AS (SELECT doc_id, $words t FROM documents
         |  WHERE doc_id % 5 <> 0 OR doc_id IN (SELECT doc_id FROM novel)),
         |win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
         |        FROM (SELECT doc_id, t,
         |                unnest(generate_series(1, len(t) - 7)) AS i FROM toksall)),
         |dup AS (SELECT span FROM win GROUP BY 1
         |        HAVING count(DISTINCT doc_id) >= 2),
         |cover AS (SELECT DISTINCT w2.doc_id, u.pos
         |          FROM win w2 JOIN dup USING (span),
         |               unnest(generate_series(w2.i, w2.i + 7)) AS u(pos)
         |          WHERE w2.doc_id IN (SELECT doc_id FROM novel)),
         |tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
         |            FROM (SELECT doc_id, t,
         |                    unnest(generate_series(1, len(t))) AS i FROM toksall)
         |            WHERE doc_id IN (SELECT doc_id FROM novel)),
         |agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
         |          count(c.pos) AS n_removed,
         |          coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
         |            ' ' ORDER BY tp.pos), '') AS clean_text
         |        FROM tok_pos tp LEFT JOIN cover c
         |          ON c.doc_id = tp.doc_id AND c.pos = tp.pos
         |        GROUP BY 1)
         |SELECT cur.doc_id,
         |  CASE WHEN NOT cur.admit THEN 'rejected'
         |       WHEN cur.doc_id NOT IN (SELECT doc_id FROM novel) THEN 'duplicate'
         |       ELSE 'admitted' END AS verdict,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM cur LEFT JOIN agg a USING (doc_id)
         |ORDER BY cur.doc_id""".stripMargin,

    // The EXACT-policy replay: pipe_admission_e2e's funnel + exact-dup
    // stages verbatim, then the variable-length coverage — corpus side
    // by the independent union-suffix-sort max-LCP construction (the
    // x_sa_dup_len_stored oracle's shape), batch-internal side by the
    // x_sa_dup_len adjacent-LCP construction restricted to survivors;
    // a token leaves under ANY >= 8 interval from either side.
    "pipe_admission_exact_e2e" ->
      s"""$exactFunnelCtes
         |SELECT cur.doc_id,
         |  CASE WHEN NOT cur.admit THEN 'rejected'
         |       WHEN cur.doc_id NOT IN (SELECT doc_id FROM novel) THEN 'duplicate'
         |       ELSE 'admitted' END AS verdict,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM cur LEFT JOIN agg a USING (doc_id)
         |ORDER BY cur.doc_id""".stripMargin,
    // The exact funnel + attribution report: the same funnel CTEs, plus
    // an INDEPENDENT tail-match construction over the whole batch (the
    // x_sa_attribution oracle's shape on the funnel's slices) — longest
    // batch-doc tail occurring in the corpus via the union suffix sort
    // (token-granular sentinel-space containment), then the matched
    // span's corpus sites by direct window equality, capped at 3 in
    // (doc_id, pos) order, flattened to one row per site with -1
    // sentinels for no-site docs.
    "pipe_admission_attr_e2e" ->
      s"""$exactFunnelCtes,
         |aqs AS (SELECT doc_id AS qid, CAST(len(wds) - i.i + 1 AS INTEGER) AS rem,
         |          array_to_string(wds[i.i:len(wds)], ' ') AS suf
         |        FROM w, unnest(generate_series(1, len(wds))) AS i(i)),
         |au AS (SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS INTEGER) AS rem,
         |         suf, 0 AS isq FROM cs2
         |       UNION ALL SELECT qid, rem, suf, 1 FROM aqs),
         |aw AS (SELECT qid, rem, suf, isq,
         |         last_value(CASE WHEN isq = 0 THEN suf END IGNORE NULLS)
         |           OVER (ORDER BY suf, isq
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc,
         |         first_value(CASE WHEN isq = 0 THEN suf END IGNORE NULLS)
         |           OVER (ORDER BY suf, isq
         |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc
         |       FROM au),
         |am AS (SELECT qid, max(rem) AS ml FROM aw
         |       WHERE isq = 1 AND (starts_with(pc || ' ', suf || ' ')
         |                       OR starts_with(nc || ' ', suf || ' '))
         |       GROUP BY qid),
         |aspan AS (SELECT am.qid, am.ml,
         |            array_to_string(wb.wds[len(wb.wds) - am.ml + 1:len(wb.wds)], ' ') AS span
         |          FROM am JOIN w wb ON wb.doc_id = am.qid WHERE am.ml >= 1),
         |asite AS (SELECT s3.qid, s3.ml, c.doc_id, CAST(i.i AS INTEGER) AS pos,
         |            row_number() OVER (PARTITION BY s3.qid
         |                               ORDER BY c.doc_id, i.i) AS rn
         |          FROM aspan s3, ct0 c,
         |               unnest(generate_series(1, len(c.t) - s3.ml + 1)) AS i(i)
         |          WHERE array_to_string(c.t[i.i:i.i + s3.ml - 1], ' ') = s3.span)
         |SELECT cur.doc_id,
         |  CASE WHEN NOT cur.admit THEN 'rejected'
         |       WHEN cur.doc_id NOT IN (SELECT doc_id FROM novel) THEN 'duplicate'
         |       ELSE 'admitted' END AS verdict,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text,
         |  CAST(coalesce(am.ml, 0) AS INTEGER) AS sa_match_len,
         |  CAST(coalesce(st.rn - 1, -1) AS INTEGER) AS site_ord,
         |  CAST(coalesce(st.doc_id, -1) AS BIGINT) AS site_doc,
         |  CAST(coalesce(st.pos, -1) AS INTEGER) AS site_pos
         |FROM cur LEFT JOIN agg a USING (doc_id)
         |LEFT JOIN am ON am.qid = cur.doc_id
         |LEFT JOIN (SELECT * FROM asite WHERE rn <= 3) st ON st.qid = cur.doc_id
         |ORDER BY cur.doc_id, site_ord""".stripMargin,
    // Admission with the semantic stage on: pipe_admission_e2e's funnel
    // + exact-dup stages, then the x_semdedup_incremental probe of the
    // exact-novel survivors (corpus-fitted per-label centroids; every
    // corpus vector earlier, paper order within the batch) — dropped
    // ids verdict 'semantic_duplicate' and leave the span scrub.
    "pipe_admission_sem_e2e" ->
      s"""WITH w AS (SELECT doc_id, text, $words wds FROM documents WHERE doc_id % 5 = 0),
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
         |  FROM gst LEFT JOIN gp USING (doc_id)),
         |cur AS (SELECT w.doc_id, (lang.lang_pred <> 'und' AND q.quality >= 0.5
         |          AND g.gopher_keep AND pii.n_pii = 0) AS admit
         |  FROM w JOIN lang USING (doc_id) JOIN q USING (doc_id)
         |  JOIN pii USING (doc_id) JOIN g USING (doc_id)),
         |novel AS (SELECT c1.doc_id FROM cur c1 JOIN documents i USING (doc_id)
         |  WHERE c1.admit AND NOT EXISTS (
         |    SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0
         |    AND md5(lower(trim(c.text))) = md5(lower(trim(i.text))))),
         |semcent AS (SELECT label clabel, pos, avg(x) m FROM (
         |    SELECT label, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
         |    FROM embeddings WHERE vec_id % 5 <> 0) GROUP BY 1, 2),
         |semev AS (SELECT vec_id, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
         |    FROM embeddings
         |    WHERE vec_id % 5 <> 0 OR vec_id IN (SELECT doc_id FROM novel)),
         |sems AS (SELECT vec_id, clabel,
         |    sum(semev.x * semcent.m) / (sqrt(sum(semev.x * semev.x)) * sqrt(sum(semcent.m * semcent.m))) sim
         |  FROM semev JOIN semcent ON semev.pos = semcent.pos GROUP BY vec_id, clabel),
         |semr AS (SELECT vec_id, clabel, sim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, clabel) rn FROM sems),
         |semasg AS (SELECT vec_id, clabel cl, sim csim, round(sim, 6) ord FROM semr WHERE rn = 1),
         |semp AS (SELECT xa.vec_id ia, xb.vec_id ib, ea.embedding va, eb.embedding vb
         |    FROM semasg xa JOIN semasg xb ON xa.cl = xb.cl
         |     AND xb.vec_id IN (SELECT doc_id FROM novel)
         |     AND (xa.vec_id % 5 <> 0
         |          OR xa.ord < xb.ord
         |          OR (xa.ord = xb.ord AND xa.vec_id < xb.vec_id))
         |    JOIN embeddings ea ON ea.vec_id = xa.vec_id
         |    JOIN embeddings eb ON eb.vec_id = xb.vec_id),
         |sempu AS (SELECT ia, ib, unnest(va)::DOUBLE x, unnest(vb)::DOUBLE y FROM semp),
         |semps AS (SELECT ia, ib, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim
         |    FROM sempu GROUP BY ia, ib),
         |semdrop AS (SELECT DISTINCT ib doc_id FROM semps WHERE sim >= 0.3),
         |semnovel AS (SELECT doc_id FROM novel
         |    WHERE doc_id NOT IN (SELECT doc_id FROM semdrop)),
         |toksall AS (SELECT doc_id, $words t FROM documents
         |  WHERE doc_id % 5 <> 0 OR doc_id IN (SELECT doc_id FROM semnovel)),
         |win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
         |        FROM (SELECT doc_id, t,
         |                unnest(generate_series(1, len(t) - 7)) AS i FROM toksall)),
         |dup AS (SELECT span FROM win GROUP BY 1
         |        HAVING count(DISTINCT doc_id) >= 2),
         |cover AS (SELECT DISTINCT w2.doc_id, u.pos
         |          FROM win w2 JOIN dup USING (span),
         |               unnest(generate_series(w2.i, w2.i + 7)) AS u(pos)
         |          WHERE w2.doc_id IN (SELECT doc_id FROM semnovel)),
         |tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
         |            FROM (SELECT doc_id, t,
         |                    unnest(generate_series(1, len(t))) AS i FROM toksall)
         |            WHERE doc_id IN (SELECT doc_id FROM semnovel)),
         |agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
         |          count(c.pos) AS n_removed,
         |          coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
         |            ' ' ORDER BY tp.pos), '') AS clean_text
         |        FROM tok_pos tp LEFT JOIN cover c
         |          ON c.doc_id = tp.doc_id AND c.pos = tp.pos
         |        GROUP BY 1)
         |SELECT cur.doc_id,
         |  CASE WHEN NOT cur.admit THEN 'rejected'
         |       WHEN cur.doc_id NOT IN (SELECT doc_id FROM novel) THEN 'duplicate'
         |       WHEN cur.doc_id IN (SELECT doc_id FROM semdrop) THEN 'semantic_duplicate'
         |       ELSE 'admitted' END AS verdict,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM cur LEFT JOIN agg a USING (doc_id)
         |ORDER BY cur.doc_id""".stripMargin,
    // Admission with the contamination screen: pipe_admission_e2e's
    // funnel, plus the 5-gram digest probe of the curation survivors
    // against the benchmark slice (doc_id % 13 = 0) — hits leave the
    // dup probe, the span scrub, and the output as 'contaminated'.
    "pipe_admission_decon_e2e" ->
      s"""WITH w AS (SELECT doc_id, text, $words wds FROM documents WHERE doc_id % 5 = 0),
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
         |  FROM gst LEFT JOIN gp USING (doc_id)),
         |cur AS (SELECT w.doc_id, (lang.lang_pred <> 'und' AND q.quality >= 0.5
         |          AND g.gopher_keep AND pii.n_pii = 0) AS admit
         |  FROM w JOIN lang USING (doc_id) JOIN q USING (doc_id)
         |  JOIN pii USING (doc_id) JOIN g USING (doc_id)),
         |cg AS (SELECT doc_id, list_distinct(list_transform(
         |          generate_series(1, greatest(len(wds2) - 4, 0)),
         |          i -> md5(array_to_string(wds2[i:i+4], ' ')))) gs
         |       FROM (SELECT doc_id, $words wds2 FROM documents)),
         |evg AS (SELECT DISTINCT unnest(gs) g FROM cg WHERE doc_id % 13 = 0),
         |contam AS (SELECT DISTINCT t.doc_id
         |  FROM (SELECT doc_id, unnest(gs) g FROM cg WHERE doc_id % 5 = 0) t
         |  JOIN evg USING (g)
         |  JOIN cur ON cur.doc_id = t.doc_id AND cur.admit),
         |novel AS (SELECT c1.doc_id FROM cur c1 JOIN documents i USING (doc_id)
         |  WHERE c1.admit AND c1.doc_id NOT IN (SELECT doc_id FROM contam)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0
         |    AND md5(lower(trim(c.text))) = md5(lower(trim(i.text))))),
         |toksall AS (SELECT doc_id, $words t FROM documents
         |  WHERE doc_id % 5 <> 0 OR doc_id IN (SELECT doc_id FROM novel)),
         |win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
         |        FROM (SELECT doc_id, t,
         |                unnest(generate_series(1, len(t) - 7)) AS i FROM toksall)),
         |dup AS (SELECT span FROM win GROUP BY 1
         |        HAVING count(DISTINCT doc_id) >= 2),
         |cover AS (SELECT DISTINCT w2.doc_id, u.pos
         |          FROM win w2 JOIN dup USING (span),
         |               unnest(generate_series(w2.i, w2.i + 7)) AS u(pos)
         |          WHERE w2.doc_id IN (SELECT doc_id FROM novel)),
         |tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
         |            FROM (SELECT doc_id, t,
         |                    unnest(generate_series(1, len(t))) AS i FROM toksall)
         |            WHERE doc_id IN (SELECT doc_id FROM novel)),
         |agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
         |          count(c.pos) AS n_removed,
         |          coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
         |            ' ' ORDER BY tp.pos), '') AS clean_text
         |        FROM tok_pos tp LEFT JOIN cover c
         |          ON c.doc_id = tp.doc_id AND c.pos = tp.pos
         |        GROUP BY 1)
         |SELECT cur.doc_id,
         |  CASE WHEN NOT cur.admit THEN 'rejected'
         |       WHEN cur.doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
         |       WHEN cur.doc_id NOT IN (SELECT doc_id FROM novel) THEN 'duplicate'
         |       ELSE 'admitted' END AS verdict,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM cur LEFT JOIN agg a USING (doc_id)
         |ORDER BY cur.doc_id""".stripMargin,
    // Append-only index refresh: standing corpus band rows UNION the
    // admitted batch docs' band rows (admit = no verified corpus match,
    // the x_neardup_incremental chain). Band is 0-based to match the
    // engine's posexplode; null band values (shingle-less docs) stay out.
    "x_index_refresh" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END s
         |  FROM w),
         |sig AS (SELECT doc_id, [
         |  list_min(list_transform(s, x -> md5('0|' || x))),
         |  list_min(list_transform(s, x -> md5('1|' || x))),
         |  list_min(list_transform(s, x -> md5('2|' || x))),
         |  list_min(list_transform(s, x -> md5('3|' || x)))] sg FROM sh),
         |bnd AS (SELECT doc_id, generate_subscripts(sg, 1) band, unnest(sg) bv FROM sig),
         |cand AS (SELECT DISTINCT b.doc_id batch_id, c.doc_id corpus_id
         |  FROM bnd b JOIN bnd c ON b.band = c.band AND b.bv = c.bv
         |  WHERE b.doc_id % 10 >= 8 AND c.doc_id % 10 < 8),
         |m AS (SELECT doc_id, unnest(list_distinct(s)) sh FROM sh),
         |sz AS (SELECT doc_id, count(*) n FROM m GROUP BY doc_id),
         |i AS (SELECT cd.batch_id, cd.corpus_id, count(*) inter
         |  FROM cand cd JOIN m a ON a.doc_id = cd.batch_id
         |  JOIN m b2 ON b2.doc_id = cd.corpus_id AND b2.sh = a.sh GROUP BY 1, 2),
         |blocked AS (SELECT DISTINCT i.batch_id FROM i
         |  JOIN sz x ON x.doc_id = i.batch_id JOIN sz y ON y.doc_id = i.corpus_id
         |  WHERE i.inter::DOUBLE / (x.n + y.n - i.inter) >= 0.05)
         |SELECT doc_id, CAST(band - 1 AS INT) AS band, bv FROM bnd
         |WHERE bv IS NOT NULL AND (doc_id % 10 < 8
         |  OR doc_id NOT IN (SELECT batch_id FROM blocked))
         |ORDER BY doc_id, band""".stripMargin,
    // Complete incremental admission: within-batch components over the
    // LSH-candidate verified pairs restricted to batch docs (banding is
    // per-doc deterministic, so the all-docs candidate chain filtered to
    // batch pairs equals a batch-only run), plus the batch↔corpus
    // verified-pair check — admit = own-component representative AND no
    // member of the component has a corpus match (component-wide block).
    "x_admit_incremental" ->
      s"""WITH RECURSIVE $lshCandCtes,
         |bp AS (SELECT li.ia, li.ib FROM li JOIN cand USING (ia, ib)
         |  JOIN lsz x ON x.doc_id = li.ia JOIN lsz y ON y.doc_id = li.ib
         |  WHERE li.ia % 10 >= 8 AND li.ib % 10 >= 8
         |    AND inter::DOUBLE / (x.n + y.n - inter) >= 0.05),
         |e AS (SELECT ia s, ib d FROM bp UNION SELECT ib, ia FROM bp),
         |r AS (SELECT s AS id, s AS lbl FROM e
         |      UNION
         |      SELECT e.d, r.lbl FROM r JOIN e ON e.s = r.id),
         |cc AS (SELECT id, min(lbl) component FROM r GROUP BY id),
         |xp AS (SELECT CASE WHEN cand.ia % 10 >= 8 THEN cand.ia ELSE cand.ib END batch_id
         |  FROM cand JOIN li USING (ia, ib)
         |  JOIN lsz x ON x.doc_id = cand.ia JOIN lsz y ON y.doc_id = cand.ib
         |  WHERE (cand.ia % 10 >= 8) <> (cand.ib % 10 >= 8)
         |    AND li.inter::DOUBLE / (x.n + y.n - li.inter) >= 0.05),
         |blocked AS (SELECT DISTINCT batch_id FROM xp),
         |bcomp AS (SELECT DISTINCT coalesce(cc.component, b.batch_id) AS component
         |  FROM blocked b LEFT JOIN cc ON cc.id = b.batch_id)
         |SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS component,
         |  (coalesce(cc.component, d.doc_id) = d.doc_id
         |    AND bcomp.component IS NULL) AS admit
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) d
         |LEFT JOIN cc ON cc.id = d.doc_id
         |LEFT JOIN bcomp ON bcomp.component = coalesce(cc.component, d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,
  )
}
