package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Streaming ingestion surface (reference: ingestion_service.py +
 * duplication_service.py re-expressed as ONE Structured Streaming query):
 * Kafka/file source → JSON decode → TTL dedup → stateful story assignment
 * → idempotent sink.
 *
 * Delivery semantics upgrade over the reference (ST2): the reference is
 * at-least-once (auto-commit consumer); checkpointed Structured Streaming
 * + idempotent foreachBatch upsert gives exactly-once table state.
 */
object ArticleStream {

  /** S4: Kafka source decoded from keyed JSON (schema explicit, never
    * inferred). Deploy note: requires the `spark-sql-kafka-0-10` connector
    * on the classpath (`--packages org.apache.spark:spark-sql-kafka-0-10_2.13`);
    * this environment ships without it, so the Kafka path is exercised in
    * tests through MemoryStream sources with identical downstream plans. */
  def fromKafka(spark: SparkSession, servers: String, topic: String,
                schema: StructType): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(from_json(col("value").cast("string"), schema).as("a"))
      .select("a.*")

  /** S3/S5 shape: keyed JSON Kafka sink for any streaming frame. */
  def toKafka(df: DataFrame, servers: String, topic: String, keyCol: String,
              checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.selectExpr(s"CAST($keyCol AS STRING) AS key", "to_json(struct(*)) AS value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /**
   * D1: streaming dedup with TTL — the Redis seen-set
   * (ingestion_service.py:74-77, 24 h expiry) replaced by watermarked
   * state: duplicates arriving within the watermark horizon are dropped,
   * state for keys older than the TTL is evicted automatically.
   */
  /** `setWatermark = false` lets a SECOND dedup stage in one query reuse
    * the watermark an upstream stage already declared — Spark forbids
    * redefining the watermark once stateful operators are chained (e.g.
    * [[StreamingJob]] composing [[curate]]'s canonical-url dedup with the
    * link dedup). */
  def dedupWithTtl(df: DataFrame, eventTimeCol: String, keyCol: String,
                   ttl: String = "24 hours", setWatermark: Boolean = true): DataFrame =
    (if (setWatermark) df.withWatermark(eventTimeCol, ttl) else df)
      .dropDuplicatesWithinWatermark(keyCol)

  /**
   * Streaming curation gate at ingest — the curation stack applied where
   * it is cheapest, before anything lands: canonicalize the URL
   * (stateless), drop docs outside token bounds or under the quality
   * floor (stateless codegen kernels), drop Gopher-rule failures (the
   * shuffle-free signal subset — [[graft.operators.CurationOps.gopherRowKeep]]:
   * line/paragraph repetition, symbol ratio, bullet/ellipsis lines, mean
   * word length — per-row, replay-identical), redact PII (stateless
   * regex), then TTL-dedup on the CANONICAL url (watermarked state) so
   * two crawl variants of one page count as the duplicate they are.
   * Every stage but the dedup is pure column work, so the whole gate is
   * streaming-safe in append mode with exactly the one dedup state
   * store.
   */
  def curate(df: DataFrame, urlCol: String, textCol: String,
             eventTimeCol: String, minTokens: Int = 5,
             maxTokens: Int = 1000000, minQuality: Double = 0.2,
             ttl: String = "24 hours", gopherGate: Boolean = true,
             maxCompressRatio: Double = 0.0,
             htmlInput: Boolean = false): DataFrame = {
    import graft.functions.text
    val gated = df
      // Crawl payloads arrive as HTML: extract text FIRST (stateless
      // regex kernel, streaming-safe) so every gate below judges prose,
      // not markup — a tag-heavy page would otherwise pass the length
      // band on markup bytes alone.
      .withColumn(textCol, if (htmlInput)
        graft.operators.CurationOps.htmlExtract(col(textCol)) else col(textCol))
      .withColumn("canonical_url",
        graft.operators.CurationOps.canonicalizeUrl(col(urlCol)))
      .withColumn("__n", text.tokenCount(col(textCol)))
      .filter(col("__n") >= minTokens && col("__n") <= maxTokens)
      .filter(text.qualityScore(col(textCol)) >= minQuality)
      // The stream's length band is curate's OWN (minTokens, maxTokens)
      // — already applied above — and the alpha/stop gates stay off
      // here (the quality-score gate covers degenerate text); batch
      // gopherStats keeps the paper defaults.
      .filter(if (gopherGate)
        graft.operators.CurationOps.gopherRowKeep(col(textCol),
          minWords = minTokens, maxWords = maxTokens,
          minAlphaFrac = 0.0, minStopHits = 0) else lit(true))
      // Optional compression-ratio gate (the x_compress_ratio signal —
      // long-range repetition the Gopher n-gram rules miss): drop rows
      // whose bytes/deflate ratio exceeds the cap. Stateless codegen
      // kernel, streaming-safe like every other per-row gate; 0 = off.
      .filter(if (maxCompressRatio > 0.0)
        octet_length(col(textCol)).cast("double") /
          graft.functions.DeflateSize.deflateSize(col(textCol)) <= maxCompressRatio
        else lit(true))
      .withColumn(textCol, graft.operators.CurationOps.redactPii(col(textCol)))
      .drop("__n")
    dedupWithTtl(gated, eventTimeCol, "canonical_url", ttl)
  }

  /**
   * A11 streaming form: per-source ingest counts over tumbling event-time
   * windows (observability metric the reference logs per cycle,
   * ingestion_service.py:105-116). Watermark bounds the agg state; late
   * rows beyond it are dropped rather than accumulating state forever.
   */
  def windowedCounts(df: DataFrame, eventTimeCol: String, keyCol: String,
                     windowLen: String = "5 minutes",
                     lateness: String = "10 minutes"): DataFrame =
    df.withWatermark(eventTimeCol, lateness)
      .groupBy(window(col(eventTimeCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /**
   * Gap-session aggregates over the stream — the streaming twin of
   * [[graft.operators.TemporalOps.sessionize]]: per key, consecutive
   * events merge into one session while the gap between them stays
   * under `gap`; the watermark closes sessions and bounds state exactly
   * as in [[windowedCounts]]. One output row per session:
   * (session_start, key, n).
   *
   * Boundary semantics vs the batch twin: Spark's `session_window`
   * starts a NEW session when a gap equals `gap` EXACTLY (each event
   * spans [ts, ts+gap) and windows merge only when they overlap), while
   * the batch sessionizer breaks on strictly-greater-than-gap, keeping
   * an exactly-at-gap event in-session. Pick a `gap` finer than the
   * event timestamp granularity (e.g. "10500 milliseconds" against
   * second-resolution events) and the boundary is unreachable — the two
   * assignments agree on every log, which StreamingSpec pins by
   * replaying one through both.
   */
  def sessionCounts(df: DataFrame, eventTimeCol: String, keyCol: String,
                    gap: String = "30 minutes",
                    lateness: String = "10 minutes"): DataFrame =
    df.withWatermark(eventTimeCol, lateness)
      .groupBy(session_window(col(eventTimeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"), col(keyCol), col("n"))

  /**
   * Trending tokens per tumbling event-time window — the streaming twin
   * of `x_heavy_hitters` and the sketch generalization of the
   * reference's popularity/trending recount (A1 top-50,
   * recommendation_service.py): a [[graft.functions.MisraGriesAgg]]
   * summary plus the processed count per window. The MG buffer rides
   * the streaming state store through the aggregate's own
   * serialize/deserialize, so per-window state is ≤ m counters no
   * matter how many distinct tokens the window saw — a windowed exact
   * (window, token) count would grow state with the universe instead.
   * Output per closed window: the surviving counters map and `n`, from
   * which every token with true count > n/(m+1) is guaranteed present
   * (the MG bound; estimates are merge-order-dependent, the bound is
   * not — consumers threshold, they don't trust raw estimates).
   */
  def trendingTokens(df: DataFrame, eventTimeCol: String, tokenCol: String,
                     m: Int, windowLen: String = "5 minutes",
                     lateness: String = "10 minutes"): DataFrame =
    df.withWatermark(eventTimeCol, lateness)
      .groupBy(window(col(eventTimeCol), windowLen))
      .agg(graft.functions.MisraGriesAgg.misraGries(col(tokenCol), m).as("tokens"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("tokens"), col("n"))

  /**
   * Per-window distribution quantiles — the streaming twin of
   * `x_quantile_incremental` and the rank leg of [[trendingTokens]]'s
   * sketch family: a [[graft.functions.QuantileSketchAgg]] summary per
   * tumbling event-time window, queried at the requested quantiles when
   * the window closes. The Greenwald–Khanna buffer rides the state
   * store through the aggregate's own serialize/deserialize, so
   * per-window state is O(accuracy) samples regardless of how many
   * values the window saw — the live "are document lengths drifting"
   * monitor whose thresholds the standing [[graft.operators.StatsStore]]
   * maintains batch-side. Answers at a closed window are EXACTLY the
   * batch `percentile_approx` over that window's values (same digest
   * code path), rank-exact while a window's count stays ≤ accuracy/2.
   */
  def windowQuantiles(df: DataFrame, eventTimeCol: String, valueCol: String,
                      qs: Seq[Double], accuracy: Int = 1 << 12,
                      windowLen: String = "5 minutes",
                      lateness: String = "10 minutes"): DataFrame = {
    import graft.functions.QuantileSketch._
    df.withWatermark(eventTimeCol, lateness)
      .groupBy(window(col(eventTimeCol), windowLen))
      .agg(quantileSketch(col(valueCol).cast("double"), accuracy).as("sketch"),
        count(col(valueCol)).as("n"))
      .select(col("window.start").as("window_start"),
        quantileSketchQuery(col("sketch"),
          array(qs.map(lit(_)): _*)).as("qs"), col("n"))
  }
}
