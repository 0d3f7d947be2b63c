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
