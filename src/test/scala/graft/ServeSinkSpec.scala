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

  test("driftScore serves A2 on demand; registerViews enables SQL reads") {
    import spark.implicits._
    val interactions = Seq(
      ("u1", "like", ts("2024-01-01 00:00:00")),
      ("u1", "click", ts("2024-01-20 00:00:00")))
      .toDF("user_id", "event_type", "event_time")
    // hist mean = (1.0 + 0.1)/2 = 0.55; recent mean = 0.1 → drift ≈ 0.818
    val d = Serve.driftScore(interactions, lit("2024-01-10 00:00:00").cast("timestamp"))
      .collect()(0).getDouble(0)
    assert(math.abs(d - 0.45 / 0.55) < 1e-12)
    Serve.registerViews(spark, Map("stories_v" -> storiesDf))
    assert(spark.sql("SELECT count(*) FROM stories_v").collect()(0).getLong(0) == 3)
  }

  test("bias reports: thresholds flag low diversity or negative sentiment") {
    import spark.implicits._
    val logs = Seq(
      (1L, "u1", Seq(("s1", "srcA", "big win today"), ("s2", "srcB", "fast good news"))),
      (2L, "u2", Seq(("s3", "srcC", "slow bad error"), ("s4", "srcC", "fail small crash"))))
      .toDF("log_id", "user_id", "recs")
      .select(col("log_id"), col("user_id"),
        expr("transform(recs, r -> struct(r._1 AS story_id, r._2 AS source, r._3 AS headline))").as("recommendations"))
    val got = graft.operators.Bias.processLogs(logs)
      .collect().map(r => r.getAs[Long]("log_id") -> r.getAs[Boolean]("bias_flag")).toMap
    assert(!got(1L), "diverse sources + positive sentiment → no flag")
    assert(got(2L), "single source + negative sentiment → flagged")
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
