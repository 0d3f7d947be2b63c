package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextSource

/** Quarantine-lane ingestion: every input line lands in exactly one of
  * the two relations — schema-conforming rows parse completely, corrupt
  * or type-violating lines survive verbatim in the reject lane. */
class TextSourceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def write(lines: Seq[String], suffix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("textsource")
    val f = dir.resolve(s"part$suffix")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("jsonl: good rows parse, malformed and type-violating lines quarantine verbatim") {
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """{"doc_id": "notanumber", "text": "beta"}""",
      """not json at all""",
      """{"doc_id": 4, "text": "delta"}""")
    val (good, bad) = TextSource.readJsonl(spark, write(lines, ".jsonl"), schema)
    assert(good.columns.toSeq === Seq("doc_id", "text"))
    assert(good.as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "alpha"), (4L, "delta")))
    assert(bad.as[String].collect().sorted.toSeq ===
      Seq("not json at all", """{"doc_id": "notanumber", "text": "beta"}"""))
  }

  test("jsonl: every line lands in exactly one lane") {
    val lines = (1 to 50).map {
      case i if i % 7 == 0 => s"""broken $i"""
      case i => s"""{"doc_id": $i, "text": "t$i"}"""
    }
    val (good, bad) = TextSource.readJsonl(spark, write(lines, ".jsonl"), schema)
    assert(good.count() + bad.count() === 50L)
    assert(bad.count() === 7L)
  }

  test("csv: same contract, headerless lines against the schema") {
    val lines = Seq("1,alpha", "x,beta", "3,gamma")
    val (good, bad) = TextSource.readCsv(spark, write(lines, ".csv"), schema)
    assert(good.as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "alpha"), (3L, "gamma")))
    assert(bad.as[String].collect().toSeq === Seq("x,beta"))
  }

  test("streaming jsonl: both lanes flow per micro-batch as files land") {
    val dir = java.nio.file.Files.createTempDirectory("textstream")
    java.nio.file.Files.write(dir.resolve("a.jsonl"),
      "{\"doc_id\": 1, \"text\": \"alpha\"}\nbroken".getBytes("UTF-8"))
    val (good, bad) = TextSource.streamJsonl(spark, dir.toString, schema)
    val q1 = good.writeStream.format("memory").queryName("ts_good")
      .outputMode("append").start()
    val q2 = bad.writeStream.format("memory").queryName("ts_bad")
      .outputMode("append").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(spark.table("ts_good").as[(Long, String)].collect().toSeq ===
        Seq((1L, "alpha")))
      assert(spark.table("ts_bad").as[String].collect().toSeq === Seq("broken"))
      // a second file lands; both lanes advance
      java.nio.file.Files.write(dir.resolve("b.jsonl"),
        "{\"doc_id\": 2, \"text\": \"beta\"}\n{\"bad\"".getBytes("UTF-8"))
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(spark.table("ts_good").count() === 2L)
      assert(spark.table("ts_bad").count() === 2L)
    } finally { q1.stop(); q2.stop() }
  }

  test("parsing is map-only — no exchange in either lane's plan") {
    val p = write(Seq("""{"doc_id": 1, "text": "a"}"""), ".jsonl")
    val (good, bad) = TextSource.readJsonl(spark, p, schema)
    assert(!good.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(!bad.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
