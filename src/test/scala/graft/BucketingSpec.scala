package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/**
 * Co-located joins via bucketing: both sides bucketed by the join key →
 * the join plans with ZERO shuffle exchanges (only scans + the join).
 * This is the storage-layout lever for the repeated big-big joins at
 * 100 TB (membership joins, interaction⋈story): pay the partitioning once
 * at write time, never again per query.
 */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("wh").toString
    val s2 = spark.newSession()
    // external tables (explicit path) — warehouse dir never touched
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    import s2.implicits._
    val li = s2.read.parquet(sf() + "/lineitem.parquet")
    val o = s2.read.parquet(sf() + "/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").saveAsTable("o_b")
    val joined = s2.table("li_b")
      .join(s2.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last // below the agg: join + scans
    assert(!joinSection.contains("Exchange"),
      s"bucketed join must not shuffle; plan was:\n$plan")
    // and it still computes the right thing
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }
}
