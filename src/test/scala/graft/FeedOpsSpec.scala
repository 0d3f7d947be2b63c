package graft

import graft.sources.FeedOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeedOpsSpec extends AnyFunSuite with SparkSpec {

  test("parseRssItems: entries split, fields extracted, entities resolved") {
    import spark.implicits._
    val xml =
      """<rss><channel>
        |<item><title>A &amp; B</title><link>http://x/1</link>
        |  <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
        |  <description>first
        |multiline &lt;tagged&gt; body</description></item>
        |<item><title>plain</title><link>http://x/2</link><description></description></item>
        |<item><description>no title or link</description></item>
        |</channel></rss>""".stripMargin
    val got = FeedOps.parseRssItems(Seq(("f1", xml)).toDF("feed", "xml"), "xml")
      .select("feed", "title", "link", "pub_date", "description")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(got.length == 3)
    assert(got(0) == ("A & B", "http://x/1", "Mon, 01 Jan 2024 00:00:00 GMT",
      "first\nmultiline <tagged> body"))
    assert(got(1) == ("plain", "http://x/2", "", "")) // empty + missing fields stay aligned
    assert(got(2) == ("", "", "", "no title or link"))
  }

  test("extractArticles: scrape seam projects via fetchFn; link/guid/pub_date rules match the reference") {
    import spark.implicits._
    val xml =
      """<rss><channel>
        |<item><title>hasguid</title><link>http://x/1</link>
        |  <guid>urn:guid-1</guid>
        |  <pubDate>Tue, 05 Mar 2024 10:00:00 +0000</pubDate>
        |  <description>d1</description></item>
        |<item><title>noguid</title><link>http://x/2</link>
        |  <pubDate>2024-03-06 11:30:00</pubDate><description>d2</description></item>
        |<item><title>badpub</title><link>http://x/3</link>
        |  <pubDate>not a date</pubDate><description>d3</description></item>
        |<item><title>oneday</title><link>http://x/4</link>
        |  <pubDate>Tue, 5 Mar 2024 10:00:00 +0000</pubDate>
        |  <description>d4</description></item>
        |<item><title>nolink</title><description>dropped</description></item>
        |</channel></rss>""".stripMargin
    val entries = FeedOps.parseRssItems(Seq(("feedA", xml)).toDF("src", "xml"), "xml")
    val got = FeedOps.extractArticles(entries, col("src"),
        FeedOps.fetchDouble(), lit("2024-03-07 00:00:00").cast("timestamp"))
      .orderBy("link")
      .collect()
    assert(got.length == 4, "the linkless entry must drop (ingestion_service.py:52-55)")
    val byLink = got.map(r => r.getAs[String]("link") -> r).toMap
    val r1 = byLink("http://x/1")
    assert(r1.getAs[String]("guid") == "urn:guid-1")
    assert(r1.getAs[String]("text") == "fetched:http://x/1", "text = fetchFn(link)")
    assert(r1.getAs[java.sql.Timestamp]("pub_date").toString == "2024-03-05 10:00:00.0")
    assert(r1.getAs[String]("summary") == "d1", "summary mirrors description")
    assert(r1.getAs[String]("source") == "feedA")
    val r2 = byLink("http://x/2")
    assert(r2.getAs[String]("guid") == "http://x/2", "guid falls back to the link")
    assert(r2.getAs[java.sql.Timestamp]("pub_date") != null, "ISO fallback parses")
    assert(byLink("http://x/3").getAs[java.sql.Timestamp]("pub_date") == null,
      "unparseable pubDate nulls its own row, never kills the batch")
    assert(byLink("http://x/4").getAs[java.sql.Timestamp]("pub_date").toString
      == "2024-03-05 10:00:00.0",
      "RFC 822 allows a ONE-digit day (feedparser parses it) — " +
        "the zero-pad leg must too")
    assert(got.forall(_.getAs[java.sql.Timestamp]("ingestion_time") != null))
  }

  test("extractArticles: a custom fetchFn binds external content (join-column seam)") {
    import spark.implicits._
    // The production shape: text fetched OUTSIDE the engine lands as a
    // map the seam closes over (here a literal map; in production a
    // join against the crawl snapshot plays this role).
    val xml = "<rss><item><title>t</title><link>k1</link></item></rss>"
    val entries = FeedOps.parseRssItems(Seq(Tuple1(xml)).toDF("xml"), "xml")
    val lookup = typedLit(Map("k1" -> "externally fetched body"))
    val got = FeedOps.extractArticles(entries, lit("s"),
        link => lookup(link), lit(null).cast("timestamp"))
      .select("text").collect()(0).getString(0)
    assert(got == "externally fetched body")
  }

  test("xmlEscape round-trips through the parser") {
    import spark.implicits._
    val nasty = "  5 < 6 && <b>bold</b> > plain " // incl. surrounding spaces
    val df = Seq(Tuple1(nasty)).toDF("t")
      .select(concat(lit("<rss><item><description>"), FeedOps.xmlEscape(col("t")),
        lit("</description></item></rss>")).as("xml"))
    val back = FeedOps.parseRssItems(df, "xml").select("description")
      .collect()(0).getString(0)
    assert(back == nasty)
  }
}
