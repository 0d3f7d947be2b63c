package graft

import graft.sources.TableSink
import graft.streaming.ArticleStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** ST2 end-to-end: a checkpointed stateful query stopped mid-stream and
  * restarted must (a) restore dedup state from the checkpoint — a key
  * already seen before the stop is still a duplicate after restart — and
  * (b) leave the idempotent MERGE sink with exactly-once table state. */
class RestartSpec extends AnyFunSuite with SparkSpec {

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("checkpointed dedup + MERGE sink survive a stop/restart exactly-once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val checkpoint = Files.createTempDirectory("restart_ckpt").toString
    val table = Files.createTempDirectory("restart_tbl").toString

    val mem = MemoryStream[(Timestamp, String, Int)]
    def start() = {
      val deduped = ArticleStream.dedupWithTtl(
        mem.toDF().toDF("ingestion_time", "link", "ver"), "ingestion_time", "link")
      deduped.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          TableSink.upsert(batch.sparkSession, table, batch, Seq("link"), "ver")
        }
        .start()
    }

    val q1 = start()
    try {
      mem.addData((ts(1), "a", 1), (ts(1), "b", 1))
      q1.processAllAvailable()
    } finally q1.stop()

    // Restart from the same checkpoint: "a" was seen before the stop, so
    // the restored state must still reject it; "c" is genuinely new.
    val q2 = start()
    try {
      mem.addData((ts(2), "a", 2), (ts(2), "c", 1))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = TableSink.read(spark, table, Seq.empty[(Timestamp, String, Int)]
        .toDF("ingestion_time", "link", "ver"))
      .select("link", "ver").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows === Map("a" -> 1, "b" -> 1, "c" -> 1),
      s"state must survive restart (a stays at ver 1) and c must land once: $rows")
  }
}
