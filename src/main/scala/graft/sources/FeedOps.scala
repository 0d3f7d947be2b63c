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
    StructField("pubDate", StringType), StructField("description", StringType)))

  def parseRssItems(df: DataFrame, xmlCol: String): DataFrame = {
    // The parse EMITS these names (withColumn replaces in place) —
    // refuse a frame already carrying any of them rather than silently
    // overwriting a caller's column of the same name.
    val emitted = Seq("title", "link", "pub_date", "description",
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
      .drop("item_xml", "__entry")
  }
}
