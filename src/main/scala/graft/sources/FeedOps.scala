package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
   */
  def parseRssItems(df: DataFrame, xmlCol: String): DataFrame = {
    df.withColumn("item_xml",
        explode(expr(s"regexp_extract_all($xmlCol, '<item>(?s:.*?)</item>', 0)")))
      .withColumn("title", expr("xpath_string(item_xml, '/item/title')"))
      .withColumn("link", expr("xpath_string(item_xml, '/item/link')"))
      .withColumn("pub_date", expr("xpath_string(item_xml, '/item/pubDate')"))
      .withColumn("description", expr("xpath_string(item_xml, '/item/description')"))
      .drop("item_xml")
  }
}
