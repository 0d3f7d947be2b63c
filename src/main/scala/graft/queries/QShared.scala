package graft

import graft.functions.text
import graft.operators.Recommend
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shared plan helpers for the per-family query groups — moved verbatim
 * from the pre-split [[SparkEntry]] header; one definition per shared
 * kernel so operating points cannot drift between the queries (and the
 * flagship `entry`) that share them.
 */
private[graft] object QShared {

  /**
   * A stored-family query split at its natural seam: `init` builds the
   * standing store in-query (the one-time cost production amortizes
   * across every batch that follows), `serve` probes it (the per-batch
   * cost the round-over-round trend line should track). Bench times the
   * two phases separately for these queries — their in-suite totals are
   * init-dominated, which made every round's mover audit re-litigate
   * host noise against store-build time (BASELINE.md r13/r14).
   *
   * The plain [[SparkEntry.queries]] entry is always [[fused]] over the
   * SAME definition, so the driver-facing query and the phased bench
   * form cannot drift.
   */
  private[graft] type Phased =
    (SparkSession, String) => (() => Unit, () => DataFrame)

  /** The ordinary query form of a [[Phased]] definition: init, then
    * serve — exactly what the unsplit query did. */
  private[graft] def fused(p: Phased): (SparkSession, String) => DataFrame =
    (s, d) => { val (init, serve) = p(s, d); init(); serve() }

  /**
   * Table loader. Physical fixture encodings drift between driver
   * regenerations (TIMESTAMP(NANOS) → µs-no-tz/NTZ so far); every query
   * is built against ONE logical schema, so the load goes through
   * [[graft.core.Fixtures]] which declaratively casts any compatible
   * encoding onto that schema and fails loudly on an incompatible one.
   */
  private[graft] def T(s: SparkSession, dir: String, name: String): DataFrame = {
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

  /** Shared ANN-gate tail for the PQ family (x_ann_pq / x_ann_ivf_pq /
    * x_ann_pq_stored): exact top-5 reference, exactly-k-rows shape
    * check, recall band — ONE definition so the verdict semantics
    * cannot drift between the three queries. `approx` carries
    * (query_id, neighbor_id). */
  private[graft] def annGate(approx: DataFrame, q: DataFrame, ed: DataFrame,
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
  private[graft] def refineShortlist(shortlist: DataFrame, ed: DataFrame,
                                     q: DataFrame): DataFrame =
    graft.operators.Rerank.rerankCosine(
        shortlist.select(col("query_id"), col("neighbor_id").as("doc_id")),
        ed, "vec_id", "embedding", q, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("doc_id").as("neighbor_id"))

  /** The synthesized two-turn chat text shared by x_loss_mask and
    * pipe_sft_e2e — ONE definition: the pipe's span arithmetic replays
    * the mask query's oracle, so the two syntheses must stay
    * byte-identical. */
  private[graft] def chatOf: Column = {
    val t = text.tokens(col("text"))
    val seg = (a: Int) => array_join(slice(t, lit(a), lit(5)), " ")
    concat(lit("user: "), seg(1), lit(" assistant: "), seg(6),
      lit(" user: "), seg(11), lit(" assistant: "),
      array_join(slice(t, lit(16), greatest(size(t) - 15, lit(0))), " "))
  }

  /** The rounded-score + keep-gate projection shared by x_bigram_ppl
    * and x_bigram_ppl_store (same operating point by construction). */
  private[graft] def bigramPplTail(scored: DataFrame): DataFrame = scored
    .select(col("doc_id"), col("n_pairs"),
      round(col("cross_entropy"), 6).as("cross_entropy"),
      (col("n_pairs") > 0 && round(col("cross_entropy"), 6) < 3.41).as("keep"))
    .orderBy("doc_id")

  /** Quality terciles as a 0/1/2 ordinal (0 = the cleanest third; the
    * rank-exact percentile contract) — the shared tier definition of
    * x_curriculum and x_anneal_mix. */
  private[graft] def qualityTierOf(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), qualityOf(col("text")).as("q"))
    val thr = scored.agg(
      percentile_approx(col("q"), lit(1.0 / 3), lit(1 << 20)).as("t1"),
      percentile_approx(col("q"), lit(2.0 / 3), lit(1 << 20)).as("t2"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("q"),
        when(col("q") <= col("t1"), 2).when(col("q") <= col("t2"), 1)
          .otherwise(0).as("tier"))
  }

  /** The documented quality score — ONE definition (owned by the
    * production pipeline, [[graft.pipelines.Admission.quality]]) shared
    * by x_quality, x_curation_verdict, and the admission funnel so the
    * operating points cannot drift apart. */
  private[graft] def qualityOf(textCol: Column) =
    graft.pipelines.Admission.quality(textCol)

  /** events.event_type → implicit score (reference weights shape, P10). */
  private[graft] def eventsScore(c: Column) =
    Recommend.eventScore(c, Seq(
      "purchase" -> 1.0, "click" -> 0.1, "view" -> 0.01, "signup" -> 0.5, "error" -> 0.0))

  // Shared literal cutoffs (deterministic — data spans 2024-01-01..2024-01-30).
  private[graft] val RecentCutoff = "2024-01-24 00:00:00"
  private[graft] val NowTs = "2024-02-01 00:00:00"

  /** Temp dir for queries that exercise a persisted-store shape in-query
    * (BPE dict, incremental BM25): ONE directory per prefix per JVM,
    * emptied at each invocation (the store re-inits from scratch) and
    * deleted by a single per-prefix shutdown hook — so neither repeated
    * in-session bench passes nor repeated driver runs accumulate
    * corpus-sized directories. Queries run at most once concurrently
    * per name (Verify's pool runs DISTINCT queries in parallel). */
  private val tmpStores = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def tmpStore(prefix: String): String = {
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
}
