package graft

import graft.serve.Serve
import graft.sources.TableSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import java.nio.file.Files

class ServeSinkSpec extends AnyFunSuite with SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)

  private def storiesDf = {
    import spark.implicits._
    Seq(
      ("s1", "sum one", ts("2024-01-03 00:00:00")),
      ("s2", "sum two", ts("2024-01-02 00:00:00")),
      ("s3", "sum three", ts("2024-01-01 00:00:00")))
      .toDF("story_id", "summary", "last_updated")
  }

  test("recommendationsFor: hydrated recs ordered by score") {
    import spark.implicits._
    val recs = Seq(("u1", "s1", 0.9), ("u1", "s2", 0.5), ("u2", "s3", 0.7))
      .toDF("user_id", "story_id", "score")
    val got = Serve.recommendationsFor(recs, storiesDf, "u1").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("s1", "s2"))
  }

  test("recommendationsFor: cold-start fallback = latest stories (T2)") {
    import spark.implicits._
    val recs = Seq.empty[(String, String, Double)].toDF("user_id", "story_id", "score")
    val got = Serve.recommendationsFor(recs, storiesDf, "unknown", fallbackN = 2).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("s1", "s2"), "latest-first fallback")
  }

  test("storyById point lookup") {
    val got = Serve.storyById(storiesDf, "s2").collect()
    assert(got.length == 1 && got(0).getString(1) == "sum two")
  }

  test("TableSink upsert: batch wins, old keys survive, delete drops") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sink").toString
    val v1 = Seq(("k1", "a", 1L), ("k2", "b", 1L)).toDF("key", "payload", "ver")
    TableSink.upsert(spark, dir, v1, Seq("key"), "ver")
    val v2 = Seq(("k2", "b2", 2L), ("k3", "c", 2L)).toDF("key", "payload", "ver")
    TableSink.upsert(spark, dir, v2, Seq("key"), "ver")
    val state = TableSink.read(spark, dir, v1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state == Map("k1" -> "a", "k2" -> "b2", "k3" -> "c"))
    // idempotent re-run of the same batch changes nothing (ST2 exactly-once)
    TableSink.upsert(spark, dir, v2, Seq("key"), "ver")
    val state2 = TableSink.read(spark, dir, v1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state2 == state)
    TableSink.delete(spark, dir, Seq(Tuple1("k1")).toDF("key"), Seq("key"))
    val state3 = TableSink.read(spark, dir, v1).collect().map(_.getString(0)).toSet
    assert(state3 == Set("k2", "k3"))
  }
}
