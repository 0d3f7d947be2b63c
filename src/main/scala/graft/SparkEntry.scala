package graft

import graft.functions.{sig, text, vector, VectorMeanFast}
import graft.operators.{Bm25, Bm25Store, ClusterRefine, CurationOps, DedupOps, DomainModel, IvfAnn, LayoutOps, MultimodalOps, PqOps, QualityModel, QuantizeOps, Recommend, RecommendML, Rerank, Rrf, SampleOps, SemDedup, SemDedupStore, SimilarityOps, SkewOps, SpanDedup, StoryOps, TemporalOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract: one named query per implemented operator from
 * SURVEY.md §2 (+ the LLM-data-pipeline extensions), each with a DuckDB
 * oracle in [[SparkEntry.oracleSql]] over the same parquet tables.
 *
 * Column names and types are aligned between the Spark plan and the oracle
 * SQL; every query ends in a deterministic total order and rounds
 * float-sensitive aggregates so the driver's hash compare is stable.
 */
object SparkEntry {

  /**
   * Table loader. Physical fixture encodings drift between driver
   * regenerations (TIMESTAMP(NANOS) → µs-no-tz/NTZ so far); every query
   * here is built against ONE logical schema, so the load goes through
   * [[graft.core.Fixtures]] which declaratively casts any compatible
   * encoding onto that schema and fails loudly on an incompatible one.
   */
  private def T(s: SparkSession, dir: String, name: String): DataFrame = {
    val raw = graft.core.Fixtures.load(s, dir, name)
    // The test fixtures are single-row-group parquet files, which scan as
    // ONE partition and serialize every map stage. Spread non-tiny tables
    // across the cluster once at load; tiny dimension tables stay as-is
    // (they get broadcast by their joins — spreading them only adds an
    // exchange). On production multi-file/multi-row-group data the scan
    // already yields ≥ defaultParallelism splits → no-op.
    val target = s.sparkContext.defaultParallelism
    val tiny = new java.io.File(s"$dir/$name.parquet").length() < 100000L
    if (!tiny && raw.rdd.getNumPartitions < target) raw.repartition(target) else raw
  }

  /** Flagship (SURVEY §7.2): scored-popularity top-50 over the events stream. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = T(spark, dir, "events")
    ev.withColumn("score", eventsScore(col("event_type")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"), round(sum(col("score")), 4).as("sum_score"))
      .orderBy(desc("cnt"), col("user_id"))
      .limit(50)
  }

  /**
   * Resolve a comma-separated query-name filter against [[queries]] —
   * the ONE definition Bench and Verify share. Whitespace and empty
   * segments are dropped; an empty or all-unknown filter fails loudly
   * (a typo must never read as a fast green run of zero queries).
   */
  def selectQueries(filter: String): Map[String, (SparkSession, String) => DataFrame] = {
    val ns = filter.split(',').map(_.trim).filter(_.nonEmpty).toSet
    require(ns.nonEmpty, s"query-name filter is empty: '$filter'")
    val unknown = ns -- queries.keySet
    require(unknown.isEmpty, s"unknown query names in filter: ${unknown.mkString(", ")}")
    queries.filter { case (n, _) => ns(n) }
  }

  /** The documented quality score — ONE definition (now owned by the
    * production pipeline, [[graft.pipelines.Admission.quality]]) shared
    * by x_quality, x_curation_verdict, and the admission funnel so the
    * operating points cannot drift apart. */
  /** Shared ANN-gate tail for the PQ family (x_ann_pq / x_ann_ivf_pq /
    * x_ann_pq_stored): exact top-5 reference, exactly-k-rows shape
    * check, recall band — ONE definition so the verdict semantics
    * cannot drift between the three queries. `approx` carries
    * (query_id, neighbor_id). */
  private def annGate(approx: DataFrame, q: DataFrame, ed: DataFrame,
                      recallMin: Double): DataFrame = {
    val exact = graft.operators.SimilarityOps
      .knnJoinCosine(q, ed, "vec_id", "embedding", k = 5)
    val hits = approx.join(exact.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi")
    val shape = approx.groupBy("query_id").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_queries"), expr("bool_and(n = 5)").as("rows_ok"))
    val recall = hits.agg(count(lit(1)).as("hit"))
      .crossJoin(exact.agg(count(lit(1)).as("tot")))
      .select((col("hit").cast("double") / col("tot") >= recallMin).as("recall_ok"))
    shape.crossJoin(recall)
  }

  /** The PQ shortlist→exact-refine second stage shared by the family. */
  private def refineShortlist(shortlist: DataFrame, ed: DataFrame,
                              q: DataFrame): DataFrame =
    graft.operators.Rerank.rerankCosine(
        shortlist.select(col("query_id"), col("neighbor_id").as("doc_id")),
        ed, "vec_id", "embedding", q, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("doc_id").as("neighbor_id"))

  /** The synthesized two-turn chat text shared by x_loss_mask and
    * pipe_sft_e2e — ONE definition: the pipe's span arithmetic replays
    * the mask query's oracle, so the two syntheses must stay
    * byte-identical. */
  private def chatOf: Column = {
    val t = text.tokens(col("text"))
    val seg = (a: Int) => array_join(slice(t, lit(a), lit(5)), " ")
    concat(lit("user: "), seg(1), lit(" assistant: "), seg(6),
      lit(" user: "), seg(11), lit(" assistant: "),
      array_join(slice(t, lit(16), greatest(size(t) - 15, lit(0))), " "))
  }

  /** The rounded-score + keep-gate projection shared by x_bigram_ppl
    * and x_bigram_ppl_store (same operating point by construction). */
  private def bigramPplTail(scored: DataFrame): DataFrame = scored
    .select(col("doc_id"), col("n_pairs"),
      round(col("cross_entropy"), 6).as("cross_entropy"),
      (col("n_pairs") > 0 && round(col("cross_entropy"), 6) < 3.41).as("keep"))
    .orderBy("doc_id")

  /** Quality terciles as a 0/1/2 ordinal (0 = the cleanest third; the
    * rank-exact percentile contract) — the shared tier definition of
    * x_curriculum and x_anneal_mix. */
  private def qualityTierOf(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), qualityOf(col("text")).as("q"))
    val thr = scored.agg(
      percentile_approx(col("q"), lit(1.0 / 3), lit(1 << 20)).as("t1"),
      percentile_approx(col("q"), lit(2.0 / 3), lit(1 << 20)).as("t2"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("q"),
        when(col("q") <= col("t1"), 2).when(col("q") <= col("t2"), 1)
          .otherwise(0).as("tier"))
  }

  private def qualityOf(textCol: org.apache.spark.sql.Column) =
    graft.pipelines.Admission.quality(textCol)

  /** events.event_type → implicit score (reference weights shape, P10). */
  private def eventsScore(c: org.apache.spark.sql.Column) =
    Recommend.eventScore(c, Seq(
      "purchase" -> 1.0, "click" -> 0.1, "view" -> 0.01, "signup" -> 0.5, "error" -> 0.0))

  // Shared literal cutoffs (deterministic — data spans 2024-01-01..2024-01-30).
  private val RecentCutoff = "2024-01-24 00:00:00"
  private val NowTs = "2024-02-01 00:00:00"

  /** Temp dir for queries that exercise a persisted-store shape in-query
    * (BPE dict, incremental BM25): ONE directory per prefix per JVM,
    * emptied at each invocation (the store re-inits from scratch) and
    * deleted by a single per-prefix shutdown hook — so neither repeated
    * in-session bench passes nor repeated driver runs accumulate
    * corpus-sized directories. Queries run at most once concurrently
    * per name (Verify's pool runs DISTINCT queries in parallel). */
  private val tmpStores = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def tmpStore(prefix: String): String = {
    val base = tmpStores.computeIfAbsent(prefix, p => {
      val d = java.nio.file.Files.createTempDirectory(p).toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graft.sources.DeltaParts.rmDir(d)))
      d
    })
    graft.sources.DeltaParts.rmDir(base)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    base
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ───────────────────────── projections / filters / scalars ──────────
    "p10_event_score" -> ((s, d) => {
      T(s, d, "events")
        .select(col("event_id"), col("event_type"),
          eventsScore(col("event_type")).as("score"))
        .orderBy("event_id")
    }),
    "p11_freshness" -> ((s, d) => {
      T(s, d, "events")
        .select(col("event_id"),
          round(Recommend.freshnessMs(col("ts"), lit(NowTs).cast("timestamp")), 6).as("freshness"))
        .orderBy("event_id")
    }),
    "p12_minmax_norm" -> ((s, d) => {
      Recommend.minMaxNorm(T(s, d, "events"), "user_id", "value", "norm")
        .select(col("user_id"), col("event_id"), round(col("norm"), 6).as("norm"))
        .orderBy("user_id", "event_id")
    }),
    "p13_time_parse" -> ((s, d) => {
      T(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_ms"))
        .orderBy("o_orderkey")
    }),
    "p15_json_extract" -> ((s, d) => {
      T(s, d, "events")
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
        .orderBy("event_id")
    }),
    // MapType surface (reference user_behaviour_service.py:61 metadata
    // map<string,string>): parse, element access, key enumeration.
    "p19_map_metadata" -> ((s, d) => {
      T(s, d, "events")
        .withColumn("metadata", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
        .select(col("event_id"),
          col("metadata")("k").cast("int").as("time_spent"),
          array_join(map_keys(col("metadata")), ",").as("keys"))
        .orderBy("event_id")
    }),
    "p16_cosine_pairs" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"))
      a.join(b, col("idb") === col("ida") + 1)
        .select(col("ida"), col("idb"),
          round(vector.cosineSim(col("ea"), col("eb")), 6).as("sim"))
        .orderBy("ida")
    }),
    // ─────────────────────────────── joins ──────────────────────────────
    "j_star_revenue" -> ((s, d) => {
      val li = T(s, d, "lineitem"); val o = T(s, d, "orders")
      val c = T(s, d, "customer"); val n = T(s, d, "nation"); val r = T(s, d, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),
    "j3_semi_join" -> ((s, d) => {
      val o = T(s, d, "orders")
      val big = T(s, d, "lineitem").filter(col("l_quantity") >= 45)
      o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),
    "j7_anti_join" -> ((s, d) => {
      T(s, d, "customer")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),
    "j5_hybrid_full_outer" -> ((s, d) => {
      val ev = T(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(sum(col("value")).as("click_score"))
      val buys = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(sum(col("value")).as("buy_score"))
      Recommend.hybrid(clicks, buys, Seq("user_id"), "click_score", "buy_score", 0.5, 0.5)
        .select(col("user_id"),
          round(coalesce(col("click_score"), lit(0.0)), 4).as("click_score"),
          round(coalesce(col("buy_score"), lit(0.0)), 4).as("buy_score"),
          round(col("score"), 4).as("score"))
        .orderBy("user_id")
    }),
    "j6_jaccard_sets" -> ((s, d) => {
      // The deduped membership relation feeds three subplans (a-side,
      // b-side, per-group sizes); checkpoint it so the lineitem scan +
      // distinct run once — the deployment shape, where membership is a
      // maintained bucketed table, not a per-query derivation.
      val m = T(s, d, "lineitem").select(col("l_orderkey").as("g"), col("l_partkey").as("m"))
        .distinct().localCheckpoint(false)
      SimilarityOps.jaccardJoin(
          m.select(col("g").as("id_a"), col("m")),
          m.select(col("g").as("id_b"), col("m")),
          "id_a", "id_b", "m", 0.5)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("inter"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
    "j8_knn_cosine" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      SimilarityOps.knnJoinCosine(e.filter(col("vec_id") < 20), e, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    "j1_centroid_assign" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val cents = e.groupBy("label")
        .agg(VectorMeanFast(col("embedding").cast("array<double>")).as("cent"))
      SimilarityOps.assignNearestCentroid(
          e, cents, "vec_id", "embedding", "label", "cent", 0.3)
        .select(col("item_id").as("vec_id"), col("assigned_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy("vec_id")
    }),
    // ──────────────────────────── aggregations ──────────────────────────
    "a1_popularity" -> ((s, d) => {
      Recommend.popularity(T(s, d, "events"), "user_id", 50)
        .orderBy(desc("cnt"), col("user_id"))
    }),
    "a2_drift" -> ((s, d) => {
      Recommend.drift(T(s, d, "events"), col("value"),
          col("ts") >= lit(RecentCutoff).cast("timestamp"))
        .select(round(col("drift_score"), 6).as("drift_score"))
    }),
    // Array results are serialized to canonical strings (fixed 6-decimal
    // element format, comma-joined) so the driver's checker — which sorts
    // result columns — can hash them; comparison stays element-level.
    "a3_vector_mean" -> ((s, d) => {
      T(s, d, "embeddings").groupBy("label")
        .agg(VectorMeanFast(col("embedding").cast("array<double>")).as("c"))
        .select(col("label"),
          array_join(transform(col("c"), x => format_string("%.6f", round(x, 6))), ",").as("centroid"))
        .orderBy("label")
    }),
    "a5_set_union" -> ((s, d) => {
      T(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
        .select(col("l_orderkey"),
          array_join(transform(col("parts"), _.cast("string")), ",").as("parts"),
          size(col("parts")).as("n_parts"))
        .orderBy("l_orderkey")
    }),
    "a7_string_agg" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("lang"), struct(col("doc_id"), substring(col("text"), 1, 20).as("s")).as("r"))
        .groupBy("lang")
        .agg(array_join(transform(array_sort(collect_list(col("r"))), x => x("s")), " | ").as("txt"))
        .orderBy("lang")
    }),
    "a8_diversity" -> ((s, d) => {
      T(s, d, "documents").groupBy("lang")
        .agg(countDistinct(col("source")).as("n_sources"), count(lit(1)).as("n_docs"))
        .withColumn("diversity", round(col("n_sources").cast("double") / col("n_docs"), 6))
        .orderBy("lang")
    }),
    "a9_sentiment" -> ((s, d) => {
      val st = graft.functions.textStats(col("text"))
      val sent = when(st("n_tokens") === 0, 0.0)
        .otherwise((st("n_pos") - st("n_neg")).cast("double") / st("n_tokens"))
      T(s, d, "documents").groupBy("lang")
        .agg(round(avg(sent), 6).as("avg_sentiment"))
        .orderBy("lang")
    }),
    // ─────────────────────────── top-k / sort ───────────────────────────
    "t1_topk_per_key" -> ((s, d) => {
      Recommend.topKPerKey(T(s, d, "events"), "user_id",
          Seq(desc("value"), col("event_id")), 10)
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy(col("user_id"), desc("value"), col("event_id"))
    }),
    "t2_latest_n" -> ((s, d) => {
      T(s, d, "orders")
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_orderdate"))
    }),
    // ──────────────────────────── dedup / set ───────────────────────────
    "d2_keep_first" -> ((s, d) => {
      DedupOps.keepFirst(T(s, d, "events"),
          Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy("user_id", "event_type")
    }),
    "d5_distinct" -> ((s, d) => {
      T(s, d, "events").select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type")
    }),
    // ─────────────── LLM-training-data pipeline operators ───────────────
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
    // Gopher-rule repetition filter: duplicate-line fraction +
    // top-bigram coverage against the published thresholds. Documents
    // get deterministic line structure first (the fixture is one-line).
    "x_repetition" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"),
        regexp_replace(col("text"), " value ", "\n").as("text"))
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
    "x_badwords_filter" -> ((s, d) => {
      val banned = Seq("spill", "crash", "corrupt")
      val hits = size(filter(text.tokens(col("text")),
        t => t.isInCollection(banned)))
      T(s, d, "documents")
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
    // Character-entropy quality signal: Shannon entropy of the doc's
    // character distribution — template/repeated-char junk sits low,
    // natural prose high; the cheap cousin of x_compress_ratio with an
    // EXACT oracle (entropy is a smooth transform of count ratios).
    // In-place column algebra over the distinct-char array — map-only,
    // O(distinct·len) per row, no shuffle.
    "x_char_entropy" -> ((s, d) => {
      val chars = filter(split(col("text"), ""), c => c =!= "")
      val n = size(chars)
      val ent = (-aggregate(
        transform(array_distinct(chars), ch => {
          val c = size(filter(chars, x => x === ch)).cast("double")
          c / n * log(c / n)
        }), lit(0.0), (acc, v) => acc + v))
      T(s, d, "documents")
        .select(col("doc_id"), n.as("n_chars"),
          when(n === 0, lit(0.0)).otherwise(round(ent, 6)).as("entropy"))
        .withColumn("keep", col("entropy") >= 1.5)
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
    // HLL++ cardinality estimation — the corpus-stats primitive a 100 TB
    // deployment uses where exact countDistinct is a full shuffle of the
    // key space: vocabulary size estimated at rsd 2% (one map-side
    // sketch per partition, constant-size merge), checked in-plan
    // against the exact count with a ±10% contract the oracle states.
    "x_approx_distinct" -> ((s, d) => {
      T(s, d, "documents")
        .select(explode(filter(split(lower(trim(col("text"))), text.WhitespaceRun),
          t => t =!= "")).as("token"))
        .agg(countDistinct(col("token")).as("n_exact"),
          approx_count_distinct(col("token"), 0.02).as("__a"))
        .select(col("n_exact"),
          (abs(col("__a") - col("n_exact")) <=
            col("n_exact") * lit(0.1)).as("approx_ok"))
    }),
    // Misra–Gries heavy hitters — the frequency leg of the sketch family
    // (HLL = cardinality, approx_percentile = rank): per-source token
    // summaries at capacity m=24, below the ~31-token vocabulary so
    // eviction genuinely fires. The sketch shuffles ≤ m counters per
    // group per map partition — universe-independent, the scale win over
    // x_vocab_topk's exact (group, token) shuffle. MG estimates are
    // partitioning-dependent but the MG BOUND is not, so the output
    // carries exact values plus guarantee booleans (the x_approx_distinct
    // idiom): est ≤ c and c − est ≤ n/(m+1) for EVERY token, which
    // implies every token above the threshold survives in the sketch.
    "x_heavy_hitters" -> ((s, d) => {
      val m = 24
      val toks = T(s, d, "documents").select(col("source"),
        explode(filter(split(lower(trim(col("text"))), text.WhitespaceRun),
          t => t =!= "")).as("token"))
      val sk = toks.groupBy("source").agg(
        graft.functions.MisraGriesAgg.misraGries(col("token"), m).as("__mg"),
        count(lit(1)).as("n_tokens"))
      val exact = toks.groupBy("source", "token").agg(count(lit(1)).as("c"))
      val j = exact.join(sk, "source").select(col("source"), col("token"),
        col("c"), col("n_tokens"),
        coalesce(element_at(col("__mg"), col("token")), lit(0L)).as("__est"),
        (col("n_tokens").cast("double") / lit(m + 1)).as("__thr"))
      j.groupBy("source").agg(
          first(col("n_tokens")).as("n_tokens"),
          sum(when(col("c") > col("__thr"), 1L).otherwise(0L)).as("n_hh"),
          max(struct(col("c"), col("token"))).as("__top"),
          bool_and(!(col("c") > col("__thr")) || col("__est") > 0)
            .as("hh_in_sketch"),
          bool_and(col("__est") <= col("c") &&
            (col("c") - col("__est")).cast("double") <= col("__thr"))
            .as("mg_bounds_ok"))
        .select(col("source"), col("n_tokens"), col("n_hh"),
          col("__top").getField("token").as("top_token"),
          col("__top").getField("c").as("top_count"),
          col("hh_in_sketch"), col("mg_bounds_ok"))
        .orderBy("source")
    }),
    // Incremental heavy hitters — the frequency sketch's MAINTENANCE
    // shape, the pattern every standing summary here follows (span-index
    // merge, band-index refresh, IVF append): each ingest batch persists
    // its per-source (misra_gries map, n) pair, and misra_gries_merge
    // folds stored pairs into one summary that still honors the MG bound
    // over the UNION — compaction reads m-bounded rows, never the
    // corpus. The batch/corpus split mirrors the other x_*_incremental
    // queries; the contract is the x_heavy_hitters one, now checked on
    // the MERGED summary.
    "x_hh_incremental" -> ((s, d) => {
      val m = 24
      val toks = T(s, d, "documents").select(col("doc_id"), col("source"),
        explode(filter(split(lower(trim(col("text"))), text.WhitespaceRun),
          t => t =!= "")).as("token"))
      def sketch(slice: Column) = toks.filter(slice).groupBy("source").agg(
        graft.functions.MisraGriesAgg.misraGries(col("token"), m).as("items"),
        count(lit(1)).as("n"))
      val stored = sketch(pmod(col("doc_id"), lit(5)) =!= 0)
        .unionByName(sketch(pmod(col("doc_id"), lit(5)) === 0))
      val merged = stored.groupBy("source")
        .agg(graft.functions.MisraGriesAgg.misraGriesMerge(
          col("items"), col("n"), m).as("mg"))
        .select(col("source"), col("mg").getField("items").as("__mg"),
          col("mg").getField("n").as("n_tokens"))
      val exact = toks.groupBy("source", "token").agg(count(lit(1)).as("c"))
      val j = exact.join(merged, "source").select(col("source"), col("c"),
        col("n_tokens"),
        coalesce(element_at(col("__mg"), col("token")), lit(0L)).as("__est"),
        (col("n_tokens").cast("double") / lit(m + 1)).as("__thr"))
      j.groupBy("source").agg(
          first(col("n_tokens")).as("n_tokens"),
          sum(when(col("c") > col("__thr"), 1L).otherwise(0L)).as("n_hh"),
          bool_and(!(col("c") > col("__thr")) || col("__est") > 0)
            .as("hh_in_sketch"),
          bool_and(col("__est") <= col("c") &&
            (col("c") - col("__est")).cast("double") <= col("__thr"))
            .as("mg_bounds_ok"))
        .orderBy("source")
    }),
    // Incremental quantile sketch — the rank leg's MAINTENANCE shape,
    // completing the sketch family's standing-state story (frequency =
    // x_hh_incremental, rank = this): each ingest batch persists its
    // per-source serialized Greenwald–Khanna summary, and
    // quantile_sketch_merge folds stored sketches into the corpus
    // summary — compaction reads sketch-sized rows, never the corpus.
    // This is how x_outlier_trim's p99 admission thresholds refresh in
    // O(batch) instead of a rescan. Rank-exact at accuracy 2^20 while
    // per-source counts stay ≤ 2^19 (exact through ~sf10 here), so the
    // oracle replays the documented "smallest x with cdf ≥ q" semantic
    // over the UNION — the split and the stored-sketch fold must be
    // invisible, the x_hh_incremental law.
    "x_quantile_incremental" -> ((s, d) => {
      import graft.functions.QuantileSketch._
      val acc = 1 << 20
      val docs = T(s, d, "documents")
        .select(col("source"), col("doc_id"), col("n_chars").cast("double").as("v"))
      def sketch(slice: Column) = docs.filter(slice).groupBy("source").agg(
        quantileSketch(col("v"), acc).as("sketch"), count(lit(1)).as("n"))
      val stored = sketch(pmod(col("doc_id"), lit(5)) =!= 0)
        .unionByName(sketch(pmod(col("doc_id"), lit(5)) === 0))
      val merged = stored.groupBy("source").agg(
        quantileSketchMerge(col("sketch")).as("sketch"), sum(col("n")).as("n_total"))
      val qs = quantileSketchQuery(col("sketch"),
        array(lit(0.5), lit(0.9), lit(0.99)))
      merged.select(col("source"), col("n_total"),
          round(element_at(qs, 1), 2).as("p50"),
          round(element_at(qs, 2), 2).as("p90"),
          round(element_at(qs, 3), 2).as("p99"))
        .orderBy("source")
    }),
    // The PERSISTED form of x_quantile_incremental (the
    // x_bm25_incremental pattern: build the standing store in-query so
    // the oracle can check it): five batch appends land one O(batch)
    // summary row per (batch, source) on the StatsStore ledger, a
    // compaction folds them to one row per source, and the query probes
    // the standing state — identical answers to the in-memory fold
    // prove the stored rank statistics are current over the union.
    "x_quantile_store" -> ((s, d) => {
      val docs = T(s, d, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
      val dir = tmpStore("stats_store")
      graft.operators.StatsStore.init(s, dir,
        docs.filter(pmod(col("doc_id"), lit(5)) === 1), "source", "n_chars")
      for (i <- Seq(2, 3, 4, 0))
        graft.operators.StatsStore.append(s, dir,
          docs.filter(pmod(col("doc_id"), lit(5)) === i), "source", "n_chars",
          name = Some(s"batch_$i"))
      graft.operators.StatsStore.compact(s, dir)
      graft.operators.StatsStore.quantiles(s, dir, Seq(0.5, 0.9, 0.99))
        .select(col("g").as("source"), col("n").as("n_total"),
          round(element_at(col("qs"), 1), 2).as("p50"),
          round(element_at(col("qs"), 2), 2).as("p90"),
          round(element_at(col("qs"), 3), 2).as("p99"))
        .orderBy("source")
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
    // Distributed quantile sketch (the percentile counterpart of the
    // HLL idiom): per-group approx_percentile at 1e-4 rank accuracy,
    // contract-checked in-plan against the exact quantiles with a
    // ±1-percentile rank window — at 100 TB only the sketch runs (fixed-
    // size per-partition summaries, constant-size merge); the exact side
    // exists to state the contract, like countDistinct in
    // x_approx_distinct.
    "x_quantile_sketch" -> ((s, d) => {
      val q = T(s, d, "orders").groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          expr("percentile(o_totalprice, array(0.39, 0.40, 0.41, 0.49, 0.50, 0.51, " +
            "0.89, 0.90, 0.91, 0.98, 0.99, 1.0))").as("__e"),
          percentile_approx(col("o_totalprice"), array(lit(0.4), lit(0.5), lit(0.9), lit(0.99)),
            lit(10000)).as("__a"))
      def ok(i: Int, lo: Int, hi: Int) =
        (element_at(col("__a"), i) >= element_at(col("__e"), lo)) &&
          (element_at(col("__a"), i) <= element_at(col("__e"), hi))
      q.select(col("o_orderpriority"), col("n"),
          round(element_at(col("__e"), 5), 2).as("p50_exact"),
          round(element_at(col("__e"), 8), 2).as("p90_exact"),
          ok(1, 1, 3).as("ok40"), ok(2, 4, 6).as("ok50"),
          ok(3, 7, 9).as("ok90"), ok(4, 10, 12).as("ok99"))
        .orderBy("o_orderpriority")
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
    "x_bigram_ppl_store" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val dir = tmpStore("lm_store")
      val ref = docs.filter(col("doc_id") % 2 === 0)
      graft.operators.LmStore.init(s, dir, ref.filter(col("doc_id") % 4 === 0), "text")
      graft.operators.LmStore.append(s, dir,
        ref.filter(col("doc_id") % 4 =!= 0), "text", Some("b1"))
      // Replay of an absorbed name must be a no-op (crash-retry shape).
      graft.operators.LmStore.append(s, dir,
        ref.filter(col("doc_id") % 4 =!= 0), "text", Some("b1"))
      graft.operators.LmStore.compact(s, dir)
      val (uni, bi) = graft.operators.LmStore.readModels(s, dir)
      bigramPplTail(CurationOps.bigramCrossEntropy(docs, uni, bi, "doc_id", "text"))
    }),
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
    // Product quantization (Jégou et al. 2011) + exact refine — the
    // FAISS IndexRefineFlat serving shape: the corpus re-expressed as
    // m=16 tinyint codes per vector (16× less than float32 at dim 64 —
    // what makes a 100 TB embedding corpus servable at all); the coded
    // scan nominates a 50-candidate shortlist per query (reconstruct-in-
    // scan + cosine, value-identical to the classical ADC table lookup),
    // and ONLY the shortlist hydrates back to float vectors for the
    // exact top-5 — at scale an id-keyed point lookup of queries×50
    // rows, never a second corpus pass. Codebooks train as map-only
    // Lloyd passes over centroid literals — one job per iteration, the
    // only exchange m·ksub-bounded. Invariants: exact top-5 shape,
    // codes in [0, ksub), refined recall ≥ 0.8 vs the exact kNN
    // (measured 0.93 here; the unrefined coded scan alone sits ~0.3 on
    // these synthetic no-subspace-correlation vectors — the refine
    // stage is load-bearing, as deployed PQ always is).
    "x_ann_pq" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val ed = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .localCheckpoint(true) // consumed by training, encode, and the exact arm
      val cb = PqOps.trainCodebooks(ed, "vec_id", "embedding", m = 16, ksub = 16, dim = 64)
      val coded = ed.select(col("vec_id"),
        PqOps.encode(col("embedding"), cb, dim = 64).as("codes"))
      val recon = coded.select(col("vec_id"),
        PqOps.reconstruct(col("codes"), cb).as("embedding"))
      val q = ed.filter(col("vec_id") < 20)
      val shortlist = SimilarityOps.knnJoinCosine(q, recon, "vec_id", "embedding", k = 50)
      val approx = refineShortlist(shortlist, ed, q)
      val codesOk = coded.agg(expr(
        "bool_and(forall(codes, c -> c >= 0 and c < 16))").as("codes_ok"))
      annGate(approx, q, ed, recallMin = 0.8).crossJoin(codesOk)
        .select(col("n_queries"), lit(5).as("k"), col("rows_ok"),
          col("codes_ok"), col("recall_ok"))
    }),
    // kNN over the QUANTIZED corpus: search runs against int8-dequantized
    // vectors (the 4×-smaller table a 100 TB deployment actually scans),
    // with the float-exact top-k as the recall reference — the measured
    // invariant is recall ≥ 0.8 at k=5 plus exact result shape.
    "x_ann_quant" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val qcorpus = e
        .select(col("vec_id"), QuantizeOps.int8Scale(col("embedding")).as("scale"),
          col("embedding"))
        .withColumn("__q", QuantizeOps.quantizeInt8(col("embedding"), col("scale")))
        .select(col("vec_id"),
          transform(col("__q"), c => c.cast("double") * col("scale")).as("embedding"))
      // Both arms run in double so the float query side never mixes
      // element types with the (double) dequantized corpus.
      val ed = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val q = ed.filter(col("vec_id") < 20)
      val approx = SimilarityOps.knnJoinCosine(q, qcorpus, "vec_id", "embedding", k = 5)
      val exact = SimilarityOps.knnJoinCosine(q, ed, "vec_id", "embedding", k = 5)
      val hits = approx.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
      val shape = approx.groupBy("query_id").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_queries"), expr("bool_and(n = 5)").as("rows_ok"))
      val recall = hits.agg(count(lit(1)).as("hit"))
        .crossJoin(exact.agg(count(lit(1)).as("tot")))
        .select((col("hit").cast("double") / col("tot") >= 0.8).as("recall_ok"))
      shape.crossJoin(recall)
        .select(col("n_queries"), lit(5).as("k"), col("rows_ok"), col("recall_ok"))
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
    // Symmetric int8 embedding quantization: scale, codes, and the
    // reconstruction-error contract — every value replayed exactly by
    // the oracle (floor-based rounding is engine-unambiguous).
    "x_embed_quant" -> ((s, d) => {
      val scale = QuantizeOps.int8Scale(col("embedding"))
      T(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"), scale.as("scale"))
        .withColumn("__q", QuantizeOps.quantizeInt8(col("embedding"), col("scale")))
        .select(col("vec_id"), col("scale"),
          array_join(transform(col("__q"), c => c.cast("string")), ",").as("q"),
          QuantizeOps.errOk(col("embedding"), col("__q"), col("scale")).as("err_ok"))
        .orderBy("vec_id")
    }),
    // Cosine-LSH candidate generation (signed random projections; md5-
    // derived hyperplanes, reproducible by the SQL oracle).
    "x_cosine_lsh_pairs" -> ((s, d) => {
      SimilarityOps.sketchCandidatePairs(T(s, d, "embeddings"), "vec_id", "embedding", nbits = 8)
        .orderBy("id_a", "id_b")
    }),
    // Exact epsilon-grid join (candidates-then-verify); output identical
    // to the all-pairs form, plan free of any nested-loop join.
    "x_neardup_cosine" -> ((s, d) => {
      SimilarityOps.nearDupByCosine(T(s, d, "embeddings"), "vec_id", "embedding", 0.3)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
        .orderBy("id_a", "id_b")
    }),
    // SemDeDup (Abbas et al. 2023): cluster-partitioned semantic dedup.
    // Centroids = per-label vector means (deterministic, so the oracle
    // replays the whole pipeline: assign → order by centroid-sim →
    // ∃-earlier-neighbor drop test). eps sits at the corpus' 99th
    // within-cluster percentile so the drop set is small but non-empty.
    "x_semdedup" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val cents = e.groupBy("label")
        .agg(VectorMeanFast(col("embedding").cast("array<double>")).as("cent"))
      SemDedup.semDedup(e, cents, "vec_id", "embedding", "label", "cent", eps = 0.3)
        .select(col("id").as("vec_id"), col("cluster_id"),
          round(col("centroid_sim"), 6).as("centroid_sim"), col("kept"))
        .orderBy("vec_id")
    }),
    // Incremental SemDeDup: the admission-funnel form — fixed centroids
    // (fitted on the standing corpus), every corpus vector earlier than
    // every batch vector, paper order within the batch. Corpus probes are
    // cluster-pruned before any exchange; per-batch cost is O(batch)
    // against the touched clusters only. One verdict row per BATCH doc.
    "x_semdedup_incremental" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val batch = e.filter(pmod(col("vec_id"), lit(5)) === 0)
      val cents = corpus.groupBy("label")
        .agg(VectorMeanFast(col("embedding").cast("array<double>")).as("cent"))
      SemDedup.incremental(batch, corpus, cents,
          "vec_id", "embedding", "label", "cent", eps = 0.3)
        .select(col("id").as("vec_id"), col("cluster_id"),
          round(col("centroid_sim"), 6).as("centroid_sim"), col("kept"))
        .orderBy("vec_id")
    }),
    // The STANDING-STATE twin of x_semdedup_incremental: the corpus's
    // member vectors persisted cluster-laid-out, the batch probed off a
    // bucket-pruned read — same deterministic per-label centroids, so
    // the SAME oracle replays both (probe ≡ incremental is additionally
    // spec-pinned on the store's own k-means path).
    "x_semdedup_store" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val batch = e.filter(pmod(col("vec_id"), lit(5)) === 0)
      val cents = corpus.groupBy("label")
        .agg(VectorMeanFast(col("embedding").cast("array<double>")).as("cent"))
      val dir = tmpStore("semdedup_store")
      SemDedupStore.initWithCentroids(s, dir, corpus, cents,
        "vec_id", "embedding", "label", "cent")
      SemDedupStore.probe(s, dir, batch, "vec_id", "embedding", eps = 0.3)
        .select(col("id").as("vec_id"), col("cluster_id"),
          round(col("centroid_sim"), 6).as("centroid_sim"), col("kept"))
        .orderBy("vec_id")
    }),
    // Embedding-dedup cascade end-to-end — the vector analog of
    // pipe_dedup_e2e: exact epsilon-grid cosine pairs → connected
    // components → min-id representative; one verdict row per vector.
    // Same scale shape as the text cascade: candidates from the grid
    // equi-join (never all-pairs), (id, label) rounds, free
    // representative off the min label.
    "pipe_embed_dedup_e2e" -> ((s, d) => {
      val e = T(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val pairs = SimilarityOps.nearDupByCosine(e, "vec_id", "embedding", 0.3)
        .select("id_a", "id_b")
      val comp = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      e.select(col("vec_id"))
        .join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("component"))
        .withColumn("kept", col("vec_id") === col("component"))
        .orderBy("vec_id")
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
    // The RAG retrieval serving pipe in ONE plan: sliding-window token
    // chunks (the x_chunk_tokens kernel) become the retrieval unit, a
    // chunk-level BM25 index nominates top-20 chunks per query, and
    // chunk hits attribute back to documents (best-chunk score per doc,
    // top-3 docs) — the standard chunk-index/doc-answer shape a RAG
    // stack runs. Scale: chunking is map-only; the only corpus-sized
    // exchanges are the BM25 postings aggregations; attribution joins
    // the queries×20 hit set as a BROADCAST against the chunk→doc map
    // and tops out via a WindowGroupLimit-pruned rank window.
    "pipe_rag_e2e" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val chunks = CurationOps.chunkTokens(docs, "doc_id", "text",
          size = 16, stride = 12)
        .select((col("doc_id") * 1000 + col("chunk_id")).as("cid"),
          col("doc_id").as("src_doc"), col("chunk_text"))
        .localCheckpoint(true) // consumed by the index and the attribution map
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          text.firstKTokens(col("text"), 5).as("qtext"))
      val hits = Bm25.bm25TopK(chunks, queries, "cid", "chunk_text",
          "qid", "qtext", k = 20, maxDfFrac = 1.0)
        .select(col("query_id"), col("doc_id").as("cid"), col("score"))
      val attr = chunks.select(col("cid"), col("src_doc"))
        .join(broadcast(hits), "cid")
        .groupBy(col("query_id"), col("src_doc"))
        .agg(max(col("score")).as("doc_score"))
      val w = Window.partitionBy("query_id")
        .orderBy(desc("doc_score"), col("src_doc"))
      attr.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("src_doc").as("doc_id"),
          col("doc_score"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    "x_bm25_topk" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          text.firstKTokens(col("text"), 5).as("qtext"))
      Bm25.bm25TopK(docs, queries, "doc_id", "text", "qid", "qtext",
          k = 10, maxDfFrac = 1.0)
        .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
        .orderBy("query_id", "rank")
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
    // Sliding token chunking (RAG / long-context split): size-64 windows
    // at stride 48 (16-token overlap); final chunk always reaches the
    // last token, no degenerate tails. Map-only — tokenize, transform,
    // explode — no shuffle.
    "x_chunk_tokens" -> ((s, d) => {
      CurationOps.chunkTokens(T(s, d, "documents"), "doc_id", "text",
          size = 64, stride = 48)
        .orderBy("doc_id", "chunk_id")
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
    // Incremental BM25 maintenance: the standing postings/df/stats store
    // refreshed by an O(batch) APPEND (the monolithic index's per-row
    // corpus stats force a rebuild; the decomposed store's relations are
    // additive over disjoint doc sets). Init on 4/5 of the corpus, append
    // the last 1/5, search the assembled relation — must equal the
    // monolithic BM25 oracle over the FULL corpus, proving the appended
    // statistics are current, not stale.
    "x_bm25_incremental" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val dir = tmpStore("bm25_inc")
      Bm25Store.init(s, dir,
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text")
      Bm25Store.append(s, dir,
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          text.firstKTokens(col("text"), 5).as("qtext"))
      Bm25.searchIndex(Bm25Store.readIndex(s, dir), queries, "qid", "qtext",
          k = 10, maxDfFrac = 1.0)
        .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    // Deletion on the standing BM25 store: init over the full corpus,
    // tombstone-delete the %5 slice, compact (physical removal + df
    // rebuild — the Lucene segment-merge point where stale idf becomes
    // exact again), search. Must equal the monolithic BM25 oracle over
    // the SURVIVORS — proving the negative stats decrements, the
    // tombstone anti-join, and the rebuilt df are all current.
    "x_bm25_delete" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val dir = tmpStore("bm25_del")
      Bm25Store.init(s, dir, docs, "doc_id", "text")
      Bm25Store.delete(s, dir,
        docs.filter(pmod(col("doc_id"), lit(5)) === 0).select(col("doc_id")),
        "doc_id", name = Some("del_0"))
      Bm25Store.compact(s, dir)
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          text.firstKTokens(col("text"), 5).as("qtext"))
      Bm25.searchIndex(Bm25Store.readIndex(s, dir), queries, "qid", "qtext",
          k = 10, maxDfFrac = 1.0)
        .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    // Z-order layout key: exact equi-width buckets (integer math) of
    // (o_custkey, o_orderkey) interleaved into the Morton code that
    // zorderBy clusters files on. Map-only: the min/max stats ride a
    // broadcast 1-row cross join.
    "x_zorder_key" -> ((s, d) => {
      LayoutOps.zorderKey(T(s, d, "orders").select("o_orderkey", "o_custkey"),
          "o_custkey", "o_orderkey", bits = 8)
        .select(col("o_orderkey"), col("bucket_a"), col("bucket_b"), col("zval"))
        .orderBy("o_orderkey")
    }),
    // Hybrid retrieval: RRF fusion of the BM25 lexical run and the
    // embedding-cosine semantic run (query embedding = the query doc's
    // own vector; self-hit legitimately ranks first). Rank-based fusion
    // needs no score calibration between the two runs.
    "x_hybrid_rrf" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val emb = T(s, d, "embeddings")
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          text.firstKTokens(col("text"), 5).as("qtext"))
      val lex = Bm25.bm25TopK(docs, queries, "doc_id", "text", "qid", "qtext",
          k = 20, maxDfFrac = 1.0)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val sem = SimilarityOps.knnJoinCosine(
          emb.filter(col("vec_id") % 97 === 0), emb, "vec_id", "embedding",
          k = 20, excludeSelf = false)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      Rrf.fuse(Seq(lex, sem), k = 10)
        .orderBy("query_id", "rank")
    }),
    // Retrieve-then-rerank: BM25 narrows the corpus to 20 candidates per
    // query, exact cosine against the query doc's own vector re-scores
    // ONLY those candidates, top-5 kept. The candidate run broadcasts
    // into one map-side pass over the vector table — the second stage
    // never scans vectors the first stage didn't nominate.
    "x_rerank" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val emb = T(s, d, "embeddings")
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          text.firstKTokens(col("text"), 5).as("qtext"))
      val lex = Bm25.bm25TopK(docs, queries, "doc_id", "text", "qid", "qtext",
        k = 20, maxDfFrac = 1.0)
      Rerank.rerankCosine(lex, emb, "vec_id", "embedding",
          emb.filter(col("vec_id") % 97 === 0), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),
    // MMR diversified rerank (Carbonell & Goldstein 1998) — the
    // diversity stage of the serving stack: stage 1 nominates top-20
    // cosine candidates per query (bounded-heap kNN, the j8 path);
    // stage 2 greedily selects 5 maximizing λ·rel − (1−λ)·max-sim-to-
    // selected, so the answer set is relevant but not five copies of
    // the same page. The greedy is sequential only WITHIN a query's 20
    // candidates (one mmr_select call per query row, zero shuffle past
    // the collect_list); every comparison runs in exact integer
    // micro-units (mmr_select's parity contract) so the DuckDB
    // recursive-CTE replay reproduces the selection exactly.
    "x_mmr_rerank" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val queries = e.filter(pmod(col("vec_id"), lit(25)) === 0)
      val cand = SimilarityOps.knnJoinCosine(queries, e, "vec_id", "embedding", 20)
        .select(col("query_id"), col("neighbor_id"), col("sim").as("rel"))
      // vectors re-attach by broadcasting the CANDIDATE run (queries×20
      // rows by contract) into one map-side pass over the vector table —
      // never the other way around; without the hint the toy fixture's
      // stats would build on the corpus side.
      val withVec = e.select(col("vec_id").as("neighbor_id"), col("embedding"))
        .join(broadcast(cand), "neighbor_id")
      withVec.groupBy("query_id")
        .agg(collect_list(struct(col("neighbor_id"), col("rel"),
          col("embedding"))).as("cands"))
        .select(col("query_id"),
          explode(graft.functions.Mmr.mmrSelect(col("cands"), k = 5, lambdaTenths = 7)).as("m"))
        .select(col("query_id"), col("m.neighbor_id").as("neighbor_id"),
          col("m.rank").as("rank"), col("m.mmr_score").as("mmr_score"))
        .orderBy("query_id", "rank")
    }),
    // Hard-negative mining (contrastive training data): for each anchor
    // (the %83 slice — a training batch), the 5 most cosine-similar
    // vectors with a DIFFERENT label. Anchors broadcast with vectors +
    // labels into one map-side corpus pass; bounded-heap top-k.
    "x_hard_negatives" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      SimilarityOps.hardNegatives(emb.filter(col("vec_id") % 83 === 0), emb,
          "vec_id", "embedding", "label", k = 5)
        .orderBy("anchor_id", "rank")
    }),
    // The full contrastive-training pair export (anchor, 1 positive,
    // 5 hard negatives): positives = nearest same-label (self
    // excluded), negatives = the x_hard_negatives mining — both legs
    // the same broadcast map-side pass over the corpus, unioned into
    // one dataloader-ready relation.
    "x_contrastive_pairs" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val anchors = emb.filter(col("vec_id") % 83 === 0)
      val pos = SimilarityOps.positivePairs(anchors, emb,
          "vec_id", "embedding", "label", k = 1)
        .select(col("anchor_id"), lit("pos").as("role"),
          col("positive_id").as("pair_id"), col("sim"), col("rank"))
      val neg = SimilarityOps.hardNegatives(anchors, emb,
          "vec_id", "embedding", "label", k = 5)
        .select(col("anchor_id"), lit("neg").as("role"),
          col("negative_id").as("pair_id"), col("sim"), col("rank"))
      pos.unionByName(neg).orderBy("anchor_id", "role", "rank")
    }),
    // Persisted-store hybrid retrieval (Hybrid.search): both standing
    // indexes built once, then ONE callable fuses a term-in-list-pruned
    // BM25 postings read with a probed-cell file-pruned ANN read. At
    // nprobe = nlist the semantic run is exact, so the result equals the
    // in-memory x_hybrid_rrf fusion — same oracle replays both.
    "x_hybrid_stored" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val emb = T(s, d, "embeddings")
      val dir = tmpStore("hybrid_store")
      // nprobe = nlist makes the semantic run EXACT regardless of
      // centroid quality, so the in-query build keeps Lloyd to one
      // iteration — the store build is the honest price of an
      // oracle-checkable store query (the x_bm25_incremental pattern),
      // not the serving path, which amortizes init across batches.
      graft.pipelines.Hybrid.init(s, dir, docs, "doc_id", "text",
        emb, "vec_id", "embedding", nlist = 8, iters = 1)
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          text.firstKTokens(col("text"), 5).as("qtext"))
        .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qvec")), "qid")
      graft.pipelines.Hybrid.search(s, dir, queries, "qid", "qtext", "qvec",
          k = 10, kPerRun = 20, nprobe = 8, maxDfFrac = 1.0)
        .orderBy("query_id", "rank")
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
    // S1 in-engine parse: build one RSS document per source from the
    // documents table (XML-escaped), then parse entries back out with
    // the engine's split+XPath stage. The oracle knows construction and
    // parsing invert each other, so it checks the round-trip directly.
    "s1_rss_parse" -> ((s, d) => {
      val items = T(s, d, "documents").select(col("source"), col("doc_id"),
        concat(lit("<item><title>d"), col("doc_id"),
          lit("</title><link>https://"), col("source"), lit("/"), col("doc_id"),
          lit("</link><description>"),
          graft.sources.FeedOps.xmlEscape(coalesce(col("text"), lit(""))),
          lit("</description></item>")).as("item"))
      val feeds = items.groupBy("source")
        .agg(concat(lit("<rss><channel>"),
          array_join(transform(array_sort(collect_list(struct(col("doc_id"), col("item")))),
            x => x.getField("item")), ""),
          lit("</channel></rss>")).as("xml"))
      graft.sources.FeedOps.parseRssItems(feeds, "xml")
        .select(col("source"), col("title"), col("link"), col("description"))
        .orderBy("source", "title")
    }),
    // Skew-safe equi-join: salted fact × replicated dim equals the plain
    // join row-for-row (the oracle runs the unsalted join), while a hot
    // l_partkey spreads over 8 reducers instead of one.
    "x_salted_join" -> ((s, d) => {
      SkewOps.saltedJoin(T(s, d, "lineitem"), T(s, d, "part"),
          "l_partkey", "p_partkey", saltSource = col("l_orderkey"), salts = 8)
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),
    // Adaptive salted join: the MG frequency sketch detects hot keys in
    // one bounded pass and ONLY those salt — cold keys skip the salts×
    // dim replication x_salted_join pays universally. hotFrac=0.6 on
    // l_returnflag splits the arms DETERMINISTICALLY under the MG bound:
    // N (~51%) always flags hot (est ≥ 0.51n − n/5 ≥ 0.3n), A/R (~25%)
    // never do (est ≤ 0.25n < 0.3n) — so both arms execute regardless
    // of merge order, and the union equals the plain join row-for-row.
    "x_adaptive_salted_join" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val dim = li.groupBy(col("l_returnflag").as("rf"))
        .agg(round(avg(col("l_tax")), 6).as("avg_tax"))
      SkewOps.adaptiveSaltedJoin(li, dim, "l_returnflag", "rf",
          saltSource = col("l_orderkey"), salts = 8, hotFrac = 0.6)
        .groupBy(col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) + col("avg_tax"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("l_linestatus")
    }),
    // Two-phase salted distinct-set: partials per (key, value-salt) are
    // disjoint, so flatten-union equals a direct collect_set per key.
    "x_salted_set_union" -> ((s, d) => {
      SkewOps.saltedDistinctSet(T(s, d, "lineitem"), "l_orderkey", "l_partkey", salts = 8)
        .select(col("l_orderkey"),
          array_join(transform(col("values"), _.cast("string")), ",").as("parts"),
          size(col("values")).as("n_parts"))
        .orderBy("l_orderkey")
    }),
    // ─────────────── temporal joins / sessionization ────────────────────
    // As-of join: every click gains the user's most recent view at or
    // before the click (left semantics — 151 clicks at sf0.01 precede any
    // view and carry nulls). No join node: union + one key exchange + one
    // sort + a running last(ignoreNulls) window. The right side is
    // pre-deduped per (user, ts) so the carried row is pinned.
    "x_asof_join" -> ((s, d) => {
      val ev = T(s, d, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"), col("value"))
        .groupBy("user_id", "view_ts")
        .agg(max(col("value")).as("view_value"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      TemporalOps.asofJoin(clicks, views, Seq("user_id"), "ts", "view_ts")
        // events.ts is tz-adjusted (timestamp_micros in T); emit NTZ so
        // the parquet matches DuckDB's naive µs timestamps (identity
        // under the UTC session — same wall clock, same micros).
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("view_ts").cast("timestamp_ntz").as("view_ts"), col("view_value"))
        .orderBy("event_id")
    }),
    // Interval join on a time grid: each error event opens a 30-minute
    // window; count/sum the user's events inside it. The grid bucket
    // equals the window length, so an interval fans out to ≤ 2 cells and
    // the inequality rides a plain equi-join — no cross product. Left
    // join back keeps windows with only their own opening event.
    "x_range_join" -> ((s, d) => {
      val ev = T(s, d, "events")
      val wins = ev.where(col("event_type") === "error")
        .select(col("event_id").as("win_id"), col("user_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
      val points = ev.select(col("user_id"), col("ts"), col("value"))
      val pairs = TemporalOps.rangeJoin(points, wins, Seq("user_id"),
        "ts", "w_start", "w_end", bucketMicros = 30L * 60 * 1000000)
      wins.select(col("win_id"))
        .join(pairs.groupBy(col("win_id"))
          .agg(count(lit(1)).as("__n"), sum(col("value")).as("__sv")), Seq("win_id"), "left")
        .select(col("win_id"),
          coalesce(col("__n"), lit(0L)).as("n_events"),
          round(coalesce(col("__sv"), lit(0.0)), 4).as("sum_value"))
        .orderBy("win_id")
    }),
    // Gap-based sessionization (30-min inactivity), then per-session
    // summaries — the batch twin of Structured Streaming's
    // session_window, replayed exactly by the oracle. One exchange + one
    // sort serves both the lag and the running session counter.
    "x_sessionize" -> ((s, d) => {
      TemporalOps.sessionize(T(s, d, "events"), Seq("user_id"), "ts",
          gapMicros = 30L * 60 * 1000000, tieBreak = Seq(col("event_id")))
        .groupBy(col("user_id"), col("session_seq"))
        // NTZ on output for the same reason as x_asof_join (the session
        // math itself runs on the tz-adjusted column — unix_micros).
        .agg(min(col("ts")).cast("timestamp_ntz").as("session_start"),
          max(col("ts")).cast("timestamp_ntz").as("session_end"),
          count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy("user_id", "session_seq")
    }),
    // ──────── substring-level dedup (Lee et al. 2022, shingle form) ─────
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
    // ──────────── wave 2: remaining §2 operator ids ────────────
    "p1_projection" -> ((s, d) => {
      T(s, d, "orders")
        .select(col("o_orderkey"),
          coalesce(col("o_orderpriority"), lit("NONE")).as("priority"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"))
        .orderBy("o_orderkey")
    }),
    "p2_filter_notnull" -> ((s, d) => {
      T(s, d, "events").filter(col("props").isNotNull)
        .select(col("event_id")).orderBy("event_id")
    }),
    "p3_filter_nonempty" -> ((s, d) => {
      T(s, d, "documents").filter(length(trim(col("text"))) > 0)
        .select(col("doc_id")).orderBy("doc_id")
    }),
    "p4_needs_summary" -> ((s, d) => {
      val st = T(s, d, "events").groupBy("user_id").agg(
        max(col("ts")).as("last_updated"),
        max(when(col("event_type") === "signup", col("ts"))).as("last_summarized"))
      StoryOps.needsSummary(st, "last_updated", "last_summarized")
        .select(col("user_id")).orderBy("user_id")
    }),
    "p5_recent_filter" -> ((s, d) => {
      T(s, d, "events")
        .filter(col("ts") >= lit(RecentCutoff).cast("timestamp"))
        .select(col("event_id")).orderBy("event_id")
    }),
    "p6_score_filter" -> ((s, d) => {
      T(s, d, "events")
        .filter(col("value").isNotNull && col("value") >= 100.0)
        .select(col("event_id"), col("value")).orderBy("event_id")
    }),
    "p8_unprocessed" -> ((s, d) => {
      T(s, d, "events")
        .withColumn("processed", col("value") > 100.0)
        .filter(!col("processed"))
        .select(col("event_id")).orderBy("event_id")
    }),
    "p9_nonempty_vec" -> ((s, d) => {
      T(s, d, "embeddings").filter(size(col("embedding")) > 0)
        .select(col("vec_id")).orderBy("vec_id")
    }),
    "p14_concat" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"),
          concat_ws(" ", col("lang"), substring(col("text"), 1, 10)).as("headline"))
        .orderBy("doc_id")
    }),
    // P17 — distributed id generation. The driver-checked form is the
    // content-addressed UUIDv3 (idempotent under re-ingestion, md5-
    // reproducible by the oracle) plus a deterministic sequence; the
    // reference's random-ObjectId shape (ids.uuid4 / monotonically_
    // increasing_id) stays covered by OperatorSpec's format checks.
    "p17_idgen" -> ((s, d) => {
      graft.functions.ids.orderedSeqId(
          T(s, d, "documents")
            .select(col("doc_id"),
              graft.functions.ids.contentUuid(concat(col("doc_id").cast("string"), lit(":"), col("text"))).as("content_id")),
          "doc_id")
        .select(col("doc_id"), col("content_id"), col("seq_id"))
        .orderBy("doc_id")
    }),
    "p18_cast_project" -> ((s, d) => {
      T(s, d, "orders")
        .select(col("o_orderkey").cast("string").as("id_str"),
          col("o_custkey").cast("int").as("cust_int"))
        .orderBy("id_str")
    }),
    "j2_explode_join" -> ((s, d) => {
      val o = T(s, d, "orders")
      val stories = o.groupBy(col("o_custkey").as("story_id"))
        .agg(collect_list(col("o_orderkey")).as("arr"))
      StoryOps.explodeJoinMembers(stories, o.select("o_orderkey", "o_totalprice"),
          "story_id", "arr", "o_orderkey")
        .groupBy("story_id")
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("story_id")
    }),
    "a6_member_list" -> ((s, d) => {
      T(s, d, "embeddings").groupBy("label")
        .agg(sort_array(collect_list(col("vec_id"))).as("m"),
          count(lit(1)).as("n_members"))
        .select(col("label"),
          array_join(transform(col("m"), _.cast("string")), ",").as("members"),
          col("n_members"))
        .orderBy("label")
    }),
    "a10_minmax_agg" -> ((s, d) => {
      T(s, d, "events").groupBy("user_id")
        .agg(max(col("value")).as("mx"), min(col("value")).as("mn"))
        .withColumn("rng", round(col("mx") - col("mn"), 4))
        .orderBy("user_id")
    }),
    "a11_counts" -> ((s, d) => {
      T(s, d, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n")).orderBy("event_type")
    }),
    "t5_order_limit" -> ((s, d) => {
      T(s, d, "events")
        .orderBy(desc("ts"), col("event_id")).limit(20)
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"))
    }),
    "t6_argmax" -> ((s, d) => {
      T(s, d, "events").groupBy("user_id")
        .agg(max(struct(col("value"), (-col("event_id")).as("neg"))).as("b"))
        .select(col("user_id"), col("b.value").as("value"), (-col("b.neg")).as("event_id"))
        .orderBy("user_id")
    }),
    "d1_ttl_dedup" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("day", to_date(col("ts")))
      DedupOps.keepFirst(ev, Seq("user_id", "event_type", "day"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("day"), col("event_id"))
        .orderBy("user_id", "event_type", "day")
    }),
    "d3_jaccard_scalar" -> ((s, d) => {
      val p = T(s, d, "lineitem").groupBy("l_orderkey")
        .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
      val a = p.select(col("l_orderkey").as("ka"), col("parts").as("pa"))
      val b = p.select(col("l_orderkey").as("kb"), col("parts").as("pb"))
      a.join(b, col("kb") === col("ka") + 1)
        .select(col("ka"), col("kb"),
          size(array_intersect(col("pa"), col("pb"))).as("inter"),
          size(array_union(col("pa"), col("pb"))).as("uni"))
        .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
        .orderBy("ka")
    }),
    "m4_l2_normalize" -> ((s, d) => {
      T(s, d, "embeddings").filter(col("vec_id") < 50)
        .select(col("vec_id"),
          array_join(transform(vector.l2Normalize(col("embedding").cast("array<double>")),
            x => format_string("%.6f", round(x, 6))), ",").as("unit"))
        .orderBy("vec_id")
    }),
    "x_mm_meta" -> ((s, d) => {
      MultimodalOps.withPayloadMeta(
          T(s, d, "documents").select(col("doc_id"), col("text").cast("binary").as("payload")),
          col("payload"))
        .select(col("doc_id"), col("payload_bytes"), col("payload_sha256"))
        .orderBy("doc_id")
    }),
    // Exact media dedup — the first multimodal curation stage (two
    // crawls of one image are byte-identical far more often than text
    // is): keep-first per payload sha256 with the copy count kept for
    // loss weighting. The payload BYTES never shuffle — only the
    // 32-byte hash rides the exchange (map-side partial min/count).
    // (Near-dup of compressed media is a codec-level problem — pHash
    // needs the decode seam — and is honestly out of scope for the
    // stubbed codec.)
    "x_mm_exact_dedup" -> ((s, d) => {
      // Every 9th payload is the same shared asset (a site banner two
      // crawls both fetched) — byte-identical duplication, the case
      // this stage exists for.
      val payload = when(col("doc_id") % 9 === 0, lit("shared banner asset"))
        .otherwise(col("text")).cast("binary")
      MultimodalOps.withPayloadMeta(
          T(s, d, "documents").select(col("doc_id"), payload.as("payload")),
          col("payload"))
        .groupBy(col("payload_sha256"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("payload_sha256"), col("n_copies"),
          (col("n_copies") > 1).as("had_dups"))
        .orderBy("doc_id")
    }),
    // Deterministic fake decode over binary payloads (stub dims derived
    // from md5 lower-64 — oracle-checked via md5_number_lower).
    "x_mm_decode" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"), MultimodalOps.decodeStub(col("payload")).as("m"),
          MultimodalOps.sampleOffsets(col("payload"), 4).as("offsets"))
        .select(col("doc_id"), col("m.width"), col("m.height"), col("m.channels"),
          array_join(transform(col("offsets"), _.cast("string")), ",").as("offsets"))
        .orderBy("doc_id")
    }),
    // Aspect-preserving resize geometry over the decoded stub dims
    // (multimodal resize stage; oracle mirrors the md5-derived math).
    "x_mm_resize" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          MultimodalOps.resizeStub(MultimodalOps.decodeStub(col("payload")), 224, 224).as("r"))
        .select(col("doc_id"), col("r.out_w").as("out_w"), col("r.out_h").as("out_h"),
          col("r.scale").as("scale"))
        .orderBy("doc_id")
    }),
    // Partition-batched media decode (mapPartitions path — one codec
    // instance per partition, iterator-in/iterator-out); stub dims share
    // decodeStub's md5_number_lower convention so the whole stage is
    // oracle-checked, mean byte computed from the payload itself.
    "x_mm_batch_decode" -> ((s, d) => {
      MultimodalOps.decodeBatches(
          T(s, d, "documents").select(col("doc_id").as("id"),
            col("text").cast("binary").as("payload")))
        .toDF()
        .select(col("id"), col("width"), col("height"), col("channels"),
          round(col("meanByte"), 6).as("mean_byte"))
        .orderBy("id")
    }),
    // REAL image decode through javax.imageio: solid-colour RGB PNGs
    // with doc_id-derived dims/colour are ENCODED with the JDK PNG
    // writer per partition, then decoded back by decodeImages — true
    // width/height/channels plus the exact integer pixel sum, so the
    // oracle is pure doc_id arithmetic (PNG is lossless). Payload bytes
    // are born and die inside one partition; only feature rows move.
    "x_mm_real_decode" -> ((s, d) => {
      import s.implicits._
      val png = T(s, d, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map { id =>
            val w = (id % 29).toInt + 8; val h = (id % 13).toInt + 8
            val r = ((id * 7) % 251).toInt; val g = ((id * 13) % 251).toInt
            val b = ((id * 31) % 251).toInt
            (id, MultimodalOps.synthesizePng(w, h, (_, _) => (r << 16) | (g << 8) | b))
          }
        }.toDF("id", "payload")
      MultimodalOps.decodeImages(png).toDF()
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("channels"), col("lumaSum3").as("luma3_sum"), col("ok"))
        .orderBy("doc_id")
    }),
    // Perceptual near-dup over REAL decoded pixels: 40 source images
    // (fmix64 pixel pattern keyed by doc_id % 40), each re-published as
    // brightness-shifted re-encodes (+0/+5/+10 — byte-DIFFERENT
    // payloads, pixel-DIFFERENT images). dHash's difference structure
    // is invariant under the shift, so every group collapses to one
    // cluster — the re-encoded-copy case x_mm_exact_dedup's byte hash
    // can never catch. Oracle predicts the clusters from the group
    // arithmetic; n_byte_variants pins that members really were
    // byte-distinct per shift (sha256 computed map-side, id-keyed
    // feature join — payloads still never shuffle).
    "x_mm_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val png = T(s, d, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map { id =>
            val g = (id % 40).toInt
            val off = ((id / 40) % 3).toInt * 5
            (id, MultimodalOps.synthesizePng(9, 8, (x, y) => {
              val v = (java.lang.Long.remainderUnsigned(
                MultimodalOps.fmix64(g * 1000003L + x * 1009L + y * 9176L),
                200L).toInt + off) & 0xff
              (v << 16) | (v << 8) | v
            }))
          }
        }.toDF("id", "payload")
      val sha = png.select(col("id"), sha2(col("payload"), 256).as("sha"))
      MultimodalOps.decodeImages(png).toDF()
        .join(sha, "id")
        .groupBy(col("dhash"))
        .agg(min(col("id")).as("rep_id"), count(lit(1)).as("n_members"),
          countDistinct(col("sha")).as("n_byte_variants"))
        .select(col("rep_id"), col("n_members"), col("n_byte_variants"))
        .orderBy("rep_id")
    }),
    // Invariant oracle: IVF ANN is inherently approximate, so the
    // driver-checkable contract is (a) every query returns exactly k
    // neighbors and (b) recall vs the EXACT brute-force top-k (computed
    // in the same plan) clears a threshold with wide margin — measured
    // recall at nprobe=8/nlist=16 is 0.82-0.85 across SFs vs the 0.6
    // gate (nprobe=4 sat at 0.57-0.61, straddling it). The oracle
    // states the contract; the hash matches iff it holds.
    // IVF-PQ with residual encoding + exact refine — the composed FAISS
    // IVFPQ(+refine) deployment shape, and the 100 TB endgame of the ANN
    // family: coarse cells bound the scan (nprobe/nlist of the corpus),
    // PQ codes over the RESIDUAL vec − cell_centroid (residuals have
    // far less variance than raw vectors, so the same codebook budget
    // quantizes tighter — the reason FAISS encodes residuals) cut the
    // probed bytes 16×, and only the 50-candidate shortlist hydrates
    // float vectors for the exact top-5. Invariants: exact shape, codes
    // in [0, ksub), refined recall ≥ 0.7 vs the float-exact kNN
    // (nprobe 8/16 caps attainable recall below the full-scan PQ's).
    "x_ann_ivf_pq" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val ed = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .localCheckpoint(true)
      val cells = IvfAnn.buildCells(ed, "vec_id", "embedding", nlist = 16)
      val withCells = IvfAnn.assignCells(ed, "vec_id", "embedding", cells)
        .join(broadcast(cells), col("cell") === col("cell_id"))
        .select(col("vec_id"), col("cell"), col("cell_vec"),
          zip_with(col("embedding"), col("cell_vec"), (x, y) => x - y).as("resid"))
        .localCheckpoint(true) // codebook training + encode both scan it
      val cb = PqOps.trainCodebooks(withCells, "vec_id", "resid", m = 16, ksub = 16, dim = 64)
      val coded = withCells.select(col("vec_id"), col("cell"), col("cell_vec"),
        PqOps.encode(col("resid"), cb, dim = 64).as("codes"))
      val recon = coded.select(col("cell"), col("vec_id"),
        zip_with(col("cell_vec"), PqOps.reconstruct(col("codes"), cb),
          (a, b) => a + b).as("embedding"))
      val q = ed.filter(col("vec_id") < 20)
      val shortlist = IvfAnn.annSearch(q, recon, cells, "vec_id", "embedding",
          k = 50, nprobe = 8)
      val approx = refineShortlist(shortlist, ed, q)
      val codesOk = coded.agg(expr(
        "bool_and(forall(codes, c -> c >= 0 and c < 16))").as("codes_ok"))
      annGate(approx, q, ed, recallMin = 0.7).crossJoin(codesOk)
        .select(col("n_queries"), lit(5).as("k"), col("rows_ok"),
          col("codes_ok"), col("recall_ok"))
    }),
    // PQ at rest — the x_ann_ivf_pq shape served from the persisted
    // store: residual codes live in a cell-laid-out TableSink (probe
    // opens ONLY the probed cells' FILES, each row m code bytes — the
    // two compressions multiply), built from an 80% slice + an O(batch)
    // append of the rest under the fixed (cells, codebook). Gates: the
    // stored shortlist must EQUAL the in-memory search over the same
    // reconstruction (the store adds no approximation), and refined
    // recall holds the x_ann_ivf_pq band.
    "x_ann_pq_stored" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val ed = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .localCheckpoint(true)
      val cells = IvfAnn.buildCells(ed, "vec_id", "embedding", nlist = 16)
      val withCells = IvfAnn.assignCells(ed, "vec_id", "embedding", cells)
        .join(broadcast(cells), col("cell") === col("cell_id"))
        .select(col("vec_id"), col("cell"), col("cell_vec"), col("embedding"),
          zip_with(col("embedding"), col("cell_vec"), (x, y) => x - y).as("resid"))
        .localCheckpoint(true)
      val cb = PqOps.trainCodebooks(withCells, "vec_id", "resid", m = 16, ksub = 16, dim = 64)
      val dir = tmpStore("pq_store")
      val codedOf = (df: org.apache.spark.sql.DataFrame) =>
        graft.operators.PqStore.encodeResiduals(
          IvfAnn.assignCells(df, "vec_id", "embedding", cells),
          cells, "vec_id", "embedding", cb, 64)
      graft.operators.PqStore.write(s, dir,
        codedOf(ed.filter(col("vec_id") % 5 =!= 0)), "vec_id")
      graft.operators.PqStore.append(s, dir, ed.filter(col("vec_id") % 5 === 0),
        cells, "vec_id", "embedding", cb, 64, version = 1L)
      val q = ed.filter(col("vec_id") < 20)
      val stored = graft.operators.PqStore.search(dir, q, cells, cb,
          "vec_id", "embedding", k = 50, nprobe = 8)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val recon = codedOf(ed)
        .join(broadcast(cells), col("cell") === col("cell_id"))
        .select(col("cell"), col("vec_id"),
          zip_with(col("cell_vec"), PqOps.reconstruct(col("codes"), cb),
            (a, b) => a + b).as("embedding"))
      val mem = IvfAnn.annSearch(q, recon, cells, "vec_id", "embedding",
          k = 50, nprobe = 8)
        .select(col("query_id"), col("neighbor_id"))
      val storedEq = stored.unionByName(mem).distinct().count() == stored.count() &&
        stored.count() == mem.count()
      val approx = refineShortlist(stored, ed, q)
      annGate(approx, q, ed, recallMin = 0.7)
        .select(col("n_queries"), lit(5).as("k"), col("rows_ok"),
          lit(storedEq).as("stored_eq_memory"), col("recall_ok"))
    }),
    "x_ann_ivf" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val cells = IvfAnn.buildCells(e, "vec_id", "embedding", nlist = 16)
      val corpus = IvfAnn.assignCells(e, "vec_id", "embedding", cells)
      val q = e.filter(col("vec_id") < 20)
      val ann = IvfAnn.annSearch(q, corpus, cells, "vec_id", "embedding", k = 5, nprobe = 8)
      val exact = SimilarityOps.knnJoinCosine(q, e, "vec_id", "embedding", k = 5)
      val hits = ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
      val shape = ann.groupBy("query_id").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_queries"), expr("bool_and(n = 5)").as("rows_ok"))
      val recall = hits.agg(count(lit(1)).as("hit"))
        .crossJoin(exact.agg(count(lit(1)).as("tot")))
        .select((col("hit").cast("double") / col("tot") >= 0.6).as("recall_ok"))
      shape.crossJoin(recall)
        .select(col("n_queries"), lit(5).as("k"), col("rows_ok"), col("recall_ok"))
    }),
    // IVF-SQ8 — the composed shape a 100 TB ANN deployment actually runs:
    // cells store int8 codes + per-vector scale (4× less hot IO than
    // float32; coarse centroids stay float), the probe dequantizes
    // IN-CELL, and the invariant is the same in-plan contract as
    // x_ann_ivf — exactly k rows per query and recall vs the float-EXACT
    // brute-force top-k ≥ 0.6 (measured 0.82-0.85: int8 rounding does
    // not cost recall here because cosine is scale-invariant and the
    // quantization error is ≤ scale/2 per coordinate). `codes_ok`
    // additionally pins in-plan that every stored code fits int8 — the
    // tinyint schema itself is spec-asserted in AnnSpec.
    "x_ann_ivf_quant" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val cells = IvfAnn.buildCells(e, "vec_id", "embedding", nlist = 16)
      val corpus = IvfAnn.assignCells(e, "vec_id", "embedding", cells)
      val sq8 = IvfAnn.quantizeCells(corpus, "vec_id", "embedding")
      val q = e.filter(col("vec_id") < 20)
      val ann = IvfAnn.annSearchQuantized(q, sq8, cells, "vec_id", "embedding",
        k = 5, nprobe = 8)
      val exact = SimilarityOps.knnJoinCosine(q, e, "vec_id", "embedding", k = 5)
      val hits = ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
      val shape = ann.groupBy("query_id").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_queries"), expr("bool_and(n = 5)").as("rows_ok"))
      val recall = hits.agg(count(lit(1)).as("hit"))
        .crossJoin(exact.agg(count(lit(1)).as("tot")))
        .select((col("hit").cast("double") / col("tot") >= 0.6).as("recall_ok"))
      val codes = sq8.agg(coalesce(expr(
        "bool_and(forall(codes, c -> c >= -127 AND c <= 127))"), lit(true)).as("codes_ok"))
      shape.crossJoin(recall).crossJoin(codes)
        .select(col("n_queries"), lit(5).as("k"), col("rows_ok"),
          col("recall_ok"), col("codes_ok"))
    }),
    // Deletion on the standing ANN index (the x_bm25_delete counterpart
    // for the vector store): build the IVF-SQ8 index, remove the %5
    // slice, probe ALL cells. Contract (the x_ann_ivf_quant idiom): a
    // removed vector NEVER serves, every query still gets exactly k
    // rows, and full-probe recall vs the exact kNN over the SURVIVORS
    // clears the quantized bound — proving the delete rewrote the
    // victims' buckets and nothing else.
    "x_ann_delete" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      val dir = tmpStore("ann_del")
      val cells = IvfAnn.buildCells(e, "vec_id", "embedding", nlist = 16)
      val sq8 = IvfAnn.quantizeCells(
        IvfAnn.assignCells(e, "vec_id", "embedding", cells), "vec_id", "embedding")
      IvfAnn.writeIndex(s, dir, sq8, "vec_id", numBuckets = 16)
      IvfAnn.removeFromIndex(s, dir,
        e.filter(pmod(col("vec_id"), lit(5)) === 0).select("vec_id"), "vec_id")
      val q = e.filter(col("vec_id") < 20)
      val ann = IvfAnn.annSearchQuantizedStored(dir, q, cells,
        "vec_id", "embedding", k = 5, nprobe = 16)
      val survivors = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val exact = SimilarityOps.knnJoinCosine(q, survivors, "vec_id", "embedding",
        k = 5, excludeSelf = true)
      val hits = ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
      val shape = ann.groupBy("query_id").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_queries"), expr("bool_and(n = 5)").as("rows_ok"))
      val clean = ann.agg(
        expr("bool_and(neighbor_id % 5 != 0)").as("no_removed_served"))
      val recall = hits.agg(count(lit(1)).as("hit"))
        .crossJoin(exact.agg(count(lit(1)).as("tot")))
        .select((col("hit").cast("double") / col("tot") >= 0.8).as("recall_ok"))
      shape.crossJoin(clean).crossJoin(recall)
        .select(col("n_queries"), lit(5).as("k"), col("rows_ok"),
          col("no_removed_served"), col("recall_ok"))
    }),
    // Invariant oracle: ALS scores are model outputs, but the serving
    // contract is exact — every rated user gets exactly k recs with dense
    // ranks and rank-monotone scores. The oracle computes the user count
    // from the raw events and states the per-user contract as truths.
    "m7_als_recommend" -> ((s, d) => {
      val ev = T(s, d, "events")
      val ratings = ev
        .select(col("user_id").cast("string").as("user_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("item"),
          eventsScore(col("event_type")).as("score"))
        .groupBy("user_id", "item").agg(sum(col("score")).as("score"))
      val recs = RecommendML.alsTopK(ratings, "user_id", "item", "score", k = 5)
      recs.groupBy("user_id")
        .agg(count(lit(1)).as("n"), min("rank").as("rmin"), max("rank").as("rmax"),
          countDistinct("rank").as("rd"),
          array_sort(collect_list(struct(col("rank").as("r"), col("score").as("sc")))).as("rs"))
        .agg(count(lit(1)).as("n_users"),
          expr("bool_and(n = 5 AND rmin = 1 AND rmax = 5 AND rd = 5)").as("per_user_k_ok"),
          expr("bool_and(forall(zip_with(slice(rs, 1, size(rs) - 1), slice(rs, 2, size(rs) - 1), (a, b) -> a.sc >= b.sc), x -> x))").as("monotone_ok"))
        .select(col("n_users"), lit(5).as("k"), col("per_user_k_ok"), col("monotone_ok"))
    }),
    // Invariant oracle: M4-M6 surrogate memberships are model-specific,
    // but the refinement contract is exact — one label per input vector,
    // labels in {-1} ∪ [0, numClusters), and every surviving cluster at
    // least minClusterSize strong (the reference's HDBSCAN noise rule).
    "m5m6_cluster_refine" -> ((s, d) => {
      val r = ClusterRefine.refine(T(s, d, "embeddings"), "vec_id", "embedding",
        dim = Some(64))
      val minSize = r.filter(col("cluster") =!= -1)
        .groupBy("cluster").agg(count(lit(1)).as("n"))
        .agg(coalesce(expr("bool_and(n >= 5)"), lit(true)).as("min_size_ok"))
      r.agg(count(lit(1)).as("n_rows"), countDistinct("vec_id").as("n_ids"),
          expr("bool_and(cluster = -1 OR (cluster >= 0 AND cluster < 10))").as("labels_ok"))
        .crossJoin(minSize)
        .select(col("n_rows"), (col("n_ids") === col("n_rows")).as("one_row_per_id"),
          col("labels_ok"), col("min_size_ok"))
    }),
    // M10 — extractive lead-k summarization stand-in (RE2-safe sentence
    // prefix, mirrored exactly by the DuckDB oracle).
    "m10_summarize" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"),
          substring(text.leadKSummary(col("text"), 2), 1, 80).as("summary"))
        .orderBy("doc_id")
    }),
    // P7 — drop noise rows (cluster == -1); noise synthesized
    // deterministically so the filter itself is oracle-checkable.
    "p7_noise_filter" -> ((s, d) => {
      T(s, d, "embeddings")
        .withColumn("cluster",
          when(col("vec_id") % 7 === 0, -1).otherwise(col("label")))
        .filter(col("cluster") =!= -1)
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),
    "a8a9_bias_reports" -> ((s, d) => {
      val logs = T(s, d, "documents")
        .select((col("doc_id") % 50).as("log_id"),
          struct(col("doc_id").cast("string").as("story_id"), col("source"),
            substring(col("text"), 1, 50).as("headline")).as("r"))
        .groupBy("log_id")
        .agg(collect_list(col("r")).as("recommendations"))
        .withColumn("user_id", col("log_id").cast("string"))
      graft.operators.Bias.processLogs(logs)
        .select(col("log_id"),
          round(col("diversity_score"), 6).as("diversity_score"),
          round(col("average_sentiment"), 6).as("average_sentiment"),
          col("bias_flag"))
        .orderBy("log_id")
    }),
    // Invariant oracle: §3.1 e2e — documents as raw articles through
    // filter → dedup → featurize → story assignment → story build. On a
    // cold start every surviving article opens its own singleton story
    // with a content-addressed id, so the oracle can state the exact
    // story count (articles with non-empty text) plus the singleton and
    // id-scheme contracts.
    "pipe_ingest_cluster" -> ((s, d) => {
      val raw = T(s, d, "documents").select(
        concat(lit("doc-"), col("doc_id")).as("link"), col("lang").as("title"),
        col("text").as("txt"), lit("2024-01-01 00:00:00").cast("timestamp").as("ingestion_time"))
      val (_, stories) = graft.pipelines.NewsPipeline.ingestAndCluster(raw, s.emptyDataFrame)
      stories.agg(
        count(lit(1)).as("n_stories"),
        sum(col("n_members")).cast("long").as("total_members"),
        expr("bool_and(n_members = 1)").as("singletons_ok"),
        expr("bool_and(story_id = concat('s-', md5(members[0])))").as("ids_ok"))
    }),
    // Invariant oracle: §3.2 e2e — hybrid ALS + content-kNN + freshness +
    // top-N. Model scores are not SQL-reproducible, but the serving
    // contract is: every user with events gets exactly topN rows, dense
    // ranks, rank-monotone scores, and only story ids that exist.
    "pipe_hybrid_e2e" -> ((s, d) => {
      val ev = T(s, d, "events")
      val interactions = ev.select(
        col("user_id").cast("string").as("user_id"),
        concat(lit("story-"), pmod(regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"), lit(50))).as("story_id"),
        when(col("event_type") === "purchase", "like")
          .when(col("event_type") === "signup", "share")
          .when(col("event_type") === "click", "click").otherwise("read").as("event_type"),
        col("ts").as("event_time"))
      // Deterministic story universe (vec_id < 200, NOT limit(200)): the
      // stories subplan executes more than once below (hybrid arms + the
      // FK check), and an unordered limit may pick a different row set
      // per execution — a residue class could vanish between runs.
      val stories = T(s, d, "embeddings").filter(col("vec_id") < 200)
        .select(concat(lit("story-"), pmod(col("vec_id"), lit(50))).as("story_id"),
          col("embedding"))
        .groupBy("story_id")
        .agg(VectorMeanFast(col("embedding").cast("array<double>")).as("centroid"))
        .withColumn("last_updated", lit("2024-01-20 00:00:00").cast("timestamp"))
      val recs = graft.pipelines.NewsPipeline.hybridRecommend(
        interactions, stories, lit(NowTs).cast("timestamp"), topN = 10, candK = 20)
      recs.join(stories.select(col("story_id"), lit(1).as("__hit")), Seq("story_id"), "left")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), min("rank").as("rmin"), max("rank").as("rmax"),
          countDistinct("rank").as("rd"),
          expr("bool_and(__hit IS NOT NULL)").as("fk"),
          array_sort(collect_list(struct(col("rank").as("r"), col("score").as("sc")))).as("rs"))
        .agg(count(lit(1)).as("n_users"),
          expr("bool_and(n = 10 AND rmin = 1 AND rmax = 10 AND rd = 10)").as("per_user_n_ok"),
          expr("bool_and(fk)").as("fk_ok"),
          expr("bool_and(forall(zip_with(slice(rs, 1, size(rs) - 1), slice(rs, 2, size(rs) - 1), (a, b) -> a.sc >= b.sc), x -> x))").as("monotone_ok"))
        .select(col("n_users"), lit(10).as("topn"), col("per_user_n_ok"),
          col("fk_ok"), col("monotone_ok"))
    }),
    // rows-only: greedy 1-to-1 Jaccard matching (J6 full semantics).
    "j6_greedy_match" -> ((s, d) => {
      val m = T(s, d, "lineitem").select(col("l_orderkey").as("g"), col("l_partkey").as("m")).distinct()
      val cand = SimilarityOps.jaccardJoin(
          m.select(col("g").as("id_a"), col("m")),
          m.select(col("g").as("id_b"), col("m")),
          "id_a", "id_b", "m", 0.5)
        .filter(col("id_a") < col("id_b"))
      StoryOps.greedyMatch(cand, "id_a", "id_b", "jaccard")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
  )

  def oracleSql: Map[String, String] = OracleSql.all
}
