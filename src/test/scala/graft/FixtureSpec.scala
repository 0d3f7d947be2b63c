package graft

import graft.core.Fixtures
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture normalization contract: every driver-generated table loads
  * onto the ONE logical schema the query set was built against,
  * regardless of which physical parquet encoding the current fixture
  * generation used; incompatible drift fails loudly. */
class FixtureSpec extends AnyFunSuite with SparkSpec {

  test("all fixture tables normalize to their expected schemas at every scale factor") {
    for (sfDir <- Seq("sf0.001", "sf0.01", "sf0.1"); t <- Fixtures.expected.keys) {
      val df = Fixtures.load(spark, sf(sfDir), t)
      val want = Fixtures.expected(t)
      val got = df.schema.fields.map(f => f.name -> f.dataType).toMap
      want.foreach { case (n, dt) =>
        withClue(s"$sfDir/$t.$n") { assert(got(n) == dt) }
      }
      // Expected columns lead in declared order (stable positional reads).
      assert(df.schema.fieldNames.take(want.size).toSeq == want.map(_._1))
      // schema-level check only at the larger sfs; one count probe at the
      // smallest keeps the suite fast
      if (sfDir == "sf0.001") assert(df.count() > 0, s"$t is empty")
    }
  }

  test("NTZ timestamp encoding normalizes to TIMESTAMP, value-exact under UTC") {
    import spark.implicits._
    val ntz = Seq((1L, "2024-01-05 06:07:08.123456"), (2L, "2024-01-30 23:59:59.999999"))
      .toDF("event_id", "raw")
      .select(col("event_id"), col("raw").cast(TimestampNTZType).as("ts"),
        lit(7L).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
    val out = Fixtures.normalize(ntz, "events")
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(micros.sameElements(Array(1704434828123456L, 1706659199999999L)))
  }

  test("legacy long-nanos encoding normalizes to TIMESTAMP, µs-truncated") {
    import spark.implicits._
    val nanos = Seq((1L, 1704434828123456789L)).toDF("event_id", "ts")
      .select(col("event_id"), col("ts"),
        lit(7L).as("user_id"), lit("view").as("event_type"),
        lit(0.5).as("value"), lit("{}").as("props"))
    val out = Fixtures.normalize(nanos, "events")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == 1704434828123456L)
  }

  test("integral widening conforms; unknown extra columns survive at the end") {
    import spark.implicits._
    val drifted = Seq((1, "a", 2, 3.0f, "SEG", "extra"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment", "c_new")
    val out = Fixtures.normalize(drifted, "customer")
    assert(out.schema("c_custkey").dataType == LongType)
    assert(out.schema("c_acctbal").dataType == DoubleType)
    assert(out.schema.fieldNames.last == "c_new")
  }

  test("incompatible type drift and missing columns fail loudly") {
    import spark.implicits._
    val badType = Seq((1L, "not-a-ts", 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e1 = intercept[IllegalStateException](Fixtures.normalize(badType, "events"))
    assert(e1.getMessage.contains("incompatible"))
    val dropped = Seq((1L, 7L)).toDF("event_id", "user_id")
    val e2 = intercept[IllegalStateException](Fixtures.normalize(dropped, "events"))
    assert(e2.getMessage.contains("missing"))
  }
}
