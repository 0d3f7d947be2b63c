package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StatsStore

/** Standing quantile store: the incremental-equality law (init + N
  * appends ≡ one summary over the union), replay idempotence including
  * after a compaction folded the named part, snapshot-tag time travel,
  * and the run-once init guard. */
class StatsStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Acc = 1 << 20

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("statsstore").toString

  private def data(lo: Int, hi: Int) =
    (lo until hi).map(i => (s"g${i % 3}", i.toLong, ((i * 2654435761L) % 10000).toDouble))
      .toDF("g0", "id", "v")

  private def q(dir: String, tag: Option[String] = None): Map[String, (Long, Seq[Double])] =
    StatsStore.quantiles(spark, dir, Seq(0.5, 0.9, 0.99), tag)
      .as[(String, Long, Seq[Double])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def direct(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Seq[Double])] = {
    import graft.functions.QuantileSketch._
    df.groupBy(col("g0"))
      .agg(quantileSketch(col("v"), Acc).as("s"), count(col("v")).as("n"))
      .select(col("g0"), col("n"),
        quantileSketchQuery(col("s"), array(lit(0.5), lit(0.9), lit(0.99))).as("qs"))
      .as[(String, Long, Seq[Double])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("init + appends + compact answer exactly like one summary over the union") {
    val dir = freshDir()
    StatsStore.init(spark, dir, data(0, 300), "g0", "v", Acc)
    StatsStore.append(spark, dir, data(300, 500), "g0", "v", Acc, Some("b1"))
    StatsStore.append(spark, dir, data(500, 650), "g0", "v", Acc, Some("b2"))
    val want = direct(data(0, 650))
    assert(q(dir) === want, "before compaction")
    StatsStore.compact(spark, dir)
    assert(q(dir) === want, "after compaction")
  }

  test("named append replays are no-ops, including after a compaction folded the part") {
    val dir = freshDir()
    StatsStore.init(spark, dir, data(0, 300), "g0", "v", Acc)
    StatsStore.append(spark, dir, data(300, 500), "g0", "v", Acc, Some("b1"))
    val want = q(dir)
    StatsStore.append(spark, dir, data(300, 500), "g0", "v", Acc, Some("b1"))
    assert(q(dir) === want, "immediate replay must not double-count")
    StatsStore.compact(spark, dir)
    StatsStore.append(spark, dir, data(300, 500), "g0", "v", Acc, Some("b1"))
    assert(q(dir) === want, "replay after compaction must not double-count")
  }

  test("snapshot tag replays the pinned state across appends, compactions, and restore") {
    val dir = freshDir()
    StatsStore.init(spark, dir, data(0, 300), "g0", "v", Acc)
    StatsStore.snapshot(dir, "run1")
    val pinned = q(dir)
    StatsStore.append(spark, dir, data(300, 500), "g0", "v", Acc, Some("b1"))
    StatsStore.compact(spark, dir)
    assert(q(dir) !== pinned, "live state must have moved")
    assert(q(dir, Some("run1")) === pinned, "tag must replay the pinned state")
    StatsStore.restore(dir, "run1")
    assert(q(dir) === pinned, "restore must roll the live state back")
  }

  test("init refuses a previously-used dir") {
    val dir = freshDir()
    StatsStore.init(spark, dir, data(0, 100), "g0", "v", Acc)
    val e = intercept[IllegalStateException] {
      StatsStore.init(spark, dir, data(0, 100), "g0", "v", Acc)
    }
    assert(e.getMessage.contains("already initialized"))
  }

  test("null values never count; an all-null group still reads back") {
    val dir = freshDir()
    val withNulls = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)).toDF("g0", "v")
    StatsStore.init(spark, dir, withNulls, "g0", "v", Acc)
    val got = q(dir)
    assert(got("a")._1 === 2L)
    assert(got("a")._2 === Seq(1.0, 3.0, 3.0))
    assert(got("b")._1 === 0L)
  }
}
