package graft

import graft.operators.RecommendML
import graft.sources.JdbcStore
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.DriverManager

/** S8 (JDBC relational store) against embedded Derby + S11 (model
  * persistence) round-trip. */
class JdbcModelStoreSpec extends AnyFunSuite with SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val s = c.createStatement(); s.execute(sql); s.close() } finally c.close()
  }

  test("S8: upsert inserts new keys and updates conflicting keys; scan pushes the flag filter") {
    exec("""CREATE TABLE logs (log_id INT PRIMARY KEY, user_id VARCHAR(32),
           | diversity_score DOUBLE, processed_for_bias BOOLEAN)""".stripMargin)
    import spark.implicits._
    val seed = Seq((1, "u1", 0.5, false), (2, "u2", 0.7, true))
      .toDF("log_id", "user_id", "diversity_score", "processed_for_bias")
    JdbcStore.upsert(seed, url, "logs", Seq("log_id"), numPartitions = 1)

    // conflict on log_id=2 (score changes), new key 3
    val batch = Seq((2, "u2", 0.9, false), (3, "u3", 0.1, false))
      .toDF("log_id", "user_id", "diversity_score", "processed_for_bias")
    JdbcStore.upsert(batch, url, "logs", Seq("log_id"), numPartitions = 1)

    val all = JdbcStore.readTable(spark, url, "logs")
      .orderBy("log_id").collect().toSeq
    assert(all === Seq(
      Row(1, "u1", 0.5, false), Row(2, "u2", 0.9, false), Row(3, "u3", 0.1, false)))

    // unprocessed scan: flag filter reaches the JDBC source
    val unproc = JdbcStore.readUnprocessed(spark, url, "logs", "processed_for_bias")
    val pushed = unproc.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") &&
      pushed.toLowerCase.contains("equalto(processed_for_bias"),
      s"flag filter not pushed down:\n$pushed")
    assert(unproc.select("log_id").collect().map(_.getInt(0)).sorted === Array(1, 2, 3))

    // mark 1 and 3 processed (reference mark_log_as_processed)
    JdbcStore.markProcessed(unproc.filter("log_id <> 2"), url, "logs",
      "processed_for_bias", Seq("log_id"), numPartitions = 1)
    val left = JdbcStore.readUnprocessed(spark, url, "logs", "processed_for_bias")
      .select("log_id").collect().map(_.getInt(0))
    assert(left === Array(2))
  }

  test("S8: range-partitioned read splits the scan into parallel JDBC partitions") {
    exec("CREATE TABLE wide (id INT PRIMARY KEY, v DOUBLE)")
    import spark.implicits._
    // numPartitions=1: embedded Derby can lock-contend across concurrent
    // MERGE writers (a property of the embedded engine, not the store —
    // the knob exists precisely to match what the target DB can take).
    JdbcStore.upsert((1 to 100).map(i => (i, i * 0.5)).toDF("id", "v"),
      url, "wide", Seq("id"), numPartitions = 1)
    val df = JdbcStore.readTable(spark, url, "wide",
      partitionColumn = Some(("id", 1L, 100L, 4)))
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
    assert(df.agg(org.apache.spark.sql.functions.sum("v")).collect()(0).getDouble(0)
      === (1 to 100).map(_ * 0.5).sum)
  }

  test("S8: upsert is idempotent (re-running a batch converges)") {
    exec("CREATE TABLE idem (k INT PRIMARY KEY, v VARCHAR(8))")
    import spark.implicits._
    val b = Seq((1, "a"), (2, "b")).toDF("k", "v")
    JdbcStore.upsert(b, url, "idem", Seq("k"), numPartitions = 1)
    JdbcStore.upsert(b, url, "idem", Seq("k"), numPartitions = 1) // retry of the same batch
    assert(JdbcStore.readTable(spark, url, "idem").count() === 2)
  }

  test("S11: saved ALS model reloads and reproduces its recommendations") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ratings = (1 to 300).map { _ =>
      (s"u${rnd.nextInt(12)}", s"s${rnd.nextInt(20)}", rnd.nextDouble() * 5)
    }.toDF("user_id", "story_id", "score")

    val fitted = RecommendML.fit(ratings, "user_id", "story_id", "score")
    val dir = Files.createTempDirectory("als_model").toString
    RecommendML.save(fitted, dir)
    val reloaded = RecommendML.load(dir)

    val direct = RecommendML.topK(fitted, spark, "user_id", "story_id", k = 5)
      .orderBy("user_id", "rank").collect().toSeq
    val viaDisk = RecommendML.topK(reloaded, spark, "user_id", "story_id", k = 5)
      .orderBy("user_id", "rank").collect().toSeq
    assert(direct.nonEmpty)
    assert(direct === viaDisk)
  }
}
