package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * In-engine half of RSS ingestion (SURVEY §2 S1): the reference polls
 * feed URLs and parses entries with feedparser
 * (`services/ingestion-service/ingestion_service.py:26-36,106-107`);
 * here the side-effecting fetch stays outside the engine (snapshots land
 * as rows) and the PARSE runs inside it — per-entry split plus XPath
 * field extraction, all codegen-friendly built-ins, embarrassingly
 * parallel over feed documents. No driver-side loops: a 100 TB crawl of
 * feed snapshots parses as one map stage.
 */
object FeedOps {

  /** Escape text for XML element content (feed construction / tests). */
  def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /**
   * Explode RSS 2.0 `<item>` entries of `xmlCol` into one row per entry
   * with `title`, `link`, `pub_date`, `description` columns (entities
   * resolved by the XPath parser; missing fields become empty strings,
   * exactly feedparser's permissive behavior). Input columns are kept.
   *
   * Split-then-parse (rather than one document-level `xpath()` per
   * field) keeps fields of the same entry together even when some
   * entries omit a field — parallel field arrays would silently shift.
   * Each entry is parsed ONCE by `from_xml` into a struct (one DOM pass
   * per item, vs one per field with `xpath_string`).
   */
  private val itemSchema = StructType(Seq(
    StructField("title", StringType), StructField("link", StringType),
    StructField("pubDate", StringType), StructField("description", StringType),
    StructField("guid", StringType)))

  def parseRssItems(df: DataFrame, xmlCol: String): DataFrame = {
    // The parse EMITS these names (withColumn replaces in place) —
    // refuse a frame already carrying any of them rather than silently
    // overwriting a caller's column of the same name.
    val emitted = Seq("title", "link", "pub_date", "description", "guid",
      "item_xml", "__entry")
    val clash = df.columns.filter(emitted.contains)
    require(clash.isEmpty,
      s"parseRssItems emits columns ${emitted.mkString(", ")}; the input " +
        s"already has ${clash.mkString(", ")} — rename or drop them first")
    // ignoreSurroundingSpaces=false: element content round-trips intact
    // (the default would trim ' padded ' to 'padded')
    import scala.jdk.CollectionConverters._
    val opts = Map("ignoreSurroundingSpaces" -> "false").asJava
    df.withColumn("item_xml",
        explode(expr(s"regexp_extract_all($xmlCol, '<item>(?s:.*?)</item>', 0)")))
      .withColumn("__entry", from_xml(col("item_xml"), itemSchema, opts))
      .withColumn("title", coalesce(col("__entry.title"), lit("")))
      .withColumn("link", coalesce(col("__entry.link"), lit("")))
      .withColumn("pub_date", coalesce(col("__entry.pubDate"), lit("")))
      .withColumn("description", coalesce(col("__entry.description"), lit("")))
      .withColumn("guid", coalesce(col("__entry.guid"), lit("")))
      .drop("item_xml", "__entry")
  }

  /**
   * S2 — the full-text scrape SEAM. The reference downloads each
   * entry's link and projects the scraped text as one more column
   * (`scrape_article_text` + `extract_article_data`,
   * `services/ingestion-service/ingestion_service.py:38-47,49-72`);
   * the side-effecting HTTP fetch itself stays OUTSIDE the engine by
   * design (SURVEY §2.1 — a distributed engine must not hide network
   * I/O inside a projection). `fetchFn` is the pluggable seam:
   * production binds it to whatever text a crawl snapshot / external
   * fetcher landed (typically a join column, or a UDF over a local
   * content store); tests bind [[fetchDouble]]. Everything else of the
   * reference's projection runs in-engine, row-parallel:
   *
   *  - entries without a link DROP (`ingestion_service.py:52-55`);
   *  - `guid` falls back to the link (`:56` — feedparser's
   *    `entry.get('id', link)`);
   *  - `pub_date` parses RFC-822 (`Tue, 05 Mar 2024 10:00:00 +0000`,
   *    the RSS 2.0 format) or ISO-8601 to a real timestamp, null when
   *    unparseable (`:58-60` — the reference's `published_parsed`
   *    fallback chain), via `try_to_timestamp` so one malformed entry
   *    nulls its own row, never kills the batch;
   *  - `summary` mirrors `description` (feedparser aliases the two for
   *    RSS 2.0; `:57,69`);
   *  - `ingestion_time` is the caller's clock COLUMN (`:71`) — pass a
   *    literal for deterministic replays, `current_timestamp()` live.
   *
   * Output: (guid, title, description, pub_date, link, source, summary,
   * text, ingestion_time) — the [[graft.core.Schema]] Article base
   * projection the streaming pipeline consumes.
   */
  def extractArticles(entries: DataFrame, sourceCol: Column,
                      fetchFn: Column => Column,
                      ingestionTime: Column): DataFrame =
    entries
      .filter(col("link").isNotNull && col("link") =!= "")
      .select(
        coalesce(when(col("guid") =!= "", col("guid")), col("link")).as("guid"),
        col("title"),
        col("description"),
        rfc822OrIso(col("pub_date")).as("pub_date"),
        col("link"),
        sourceCol.as("source"),
        col("description").as("summary"),
        fetchFn(col("link")).as("text"),
        ingestionTime.as("ingestion_time"))

  /** RFC-822 ('Tue, 05 Mar 2024 10:00:00 +0000' / '… GMT', the RSS 2.0
    * wire format) or ISO-8601, null when neither parses. Spark ≥ 3's
    * parser has no weekday token ('E' is output-only), so the optional
    * weekday prefix strips first; offset and zone-name forms each get a
    * try_to_timestamp leg (per-row null on mismatch, never a throw).
    * RFC 822/5322 allow a ONE-digit day ('Tue, 5 Mar 2024 …' — the
    * reference's feedparser accepts it), and the strict parser's 'dd'
    * requires two — a single-digit day zero-pads before the legs
    * instead of growing two more 'd MMM' legs. */
  private def rfc822OrIso(c: Column): Column = {
    val noDay = regexp_replace(c, "^[A-Za-z]{3},[ \\t]*", "")
    val padded = regexp_replace(noDay, "^([0-9]) ", "0$1 ")
    coalesce(
      try_to_timestamp(padded, lit("dd MMM yyyy HH:mm:ss Z")),
      try_to_timestamp(padded, lit("dd MMM yyyy HH:mm:ss zzz")),
      try_to_timestamp(c))
  }

  /** Deterministic stand-in for the scrape seam (tests / offline
    * replays): a pure function of the link, so every replay projects
    * identical text — the M1/M2 stand-in discipline applied to S2. */
  def fetchDouble(prefix: String = "fetched:"): Column => Column =
    link => concat(lit(prefix), link)
}
