package graft

import graft.sources.TableSink
import graft.streaming.StreamingJob
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** E2E: streaming articles through dedup → featurize → assignment → tables. */
class StreamingJobSpec extends AnyFunSuite with SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming job: articles land with story ids; stories table grows across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val tmp = Files.createTempDirectory("sj").toString
    val mem = MemoryStream[(String, String, String, Timestamp)]
    val src = mem.toDF().toDF("link", "title", "txt", "ingestion_time")
    val q = StreamingJob.start(src, s"$tmp/articles", s"$tmp/stories",
      s"$tmp/ckpt", simThreshold = 0.8, trigger = Trigger.ProcessingTime(0L))
    try {
      mem.addData(
        ("l1", "t", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:00:00")),
        ("l2", "t", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:01:00")), // same text → same story
        ("l1", "t", "duplicate link", ts("2024-01-01 10:02:00")),                              // D1 dropped
        ("l3", "t", "completely different topic entirely elsewhere", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val schemaLike = spark.range(0).select(lit("").as("link"))
      val articles = TableSink.read(spark, s"$tmp/articles", schemaLike)
      assert(articles.count() == 3, "duplicate link dropped by watermark dedup")
      val byLink = articles.select("link", "story_id").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(byLink("l1") == byLink("l2"), "identical text joins the same story")
      assert(byLink("l1") != byLink("l3"), "different text opens a new story")
      val stories = TableSink.read(spark, s"$tmp/stories", schemaLike)
      assert(stories.count() == 2)
      // A11: per-trigger observed metric is reported in progress
      val observed = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("ingest")).map(_.getAs[Long]("n_articles")))
      assert(observed.sum == 3, s"observed ingest counts: ${observed.mkString(",")}")
    } finally q.stop()
  }
}
