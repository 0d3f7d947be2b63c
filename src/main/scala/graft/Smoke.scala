package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's smoke check: default-ish session, entry() rows>0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      // UTC like Verify/Bench: fixture timestamp normalization is only a
      // wall-clock identity under a UTC session.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
