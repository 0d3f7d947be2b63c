package graft

import graft.operators.ValidateOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ValidateOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some(10.0), "O"),
    (Some(2L), Some(-1.0), "F"),   // price violation
    (None, Some(5.0), "O"),        // null key
    (Some(2L), None, "X")          // dup key, null price (violation), bad status
  ).toDF("k", "price", "status")

  test("expect: null predicates count as violations; one scan for all checks") {
    val rep = ValidateOps.expect(df, Seq(
      "k_not_null" -> col("k").isNotNull,
      "price_positive" -> (col("price") > 0.0),
      "status_in_domain" -> col("status").isin("O", "F")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("k_not_null") == (1L, false))
    assert(rep("price_positive") == (2L, false), "NULL price must count as a violation")
    assert(rep("status_in_domain") == (1L, false))
    // all row-level checks ride ONE aggregate over one scan
    val plan = ValidateOps.expect(df, Seq("a" -> col("k").isNotNull,
      "b" -> (col("price") > 0))).queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 2, s"one pass expected:\n$plan")
  }

  test("empty tables pass with zero violations; bad check names fail loud") {
    val empty = df.filter(col("k") === -999L)
    val rep = ValidateOps.expect(empty, Seq("k_not_null" -> col("k").isNotNull)).head()
    assert(rep.getLong(1) == 0L && rep.getBoolean(2), "empty table must pass 0/true")
    val u = ValidateOps.uniqueness(empty, Seq("k"), "k_unique").head()
    assert(u.getLong(1) == 0L && u.getBoolean(2))
    intercept[IllegalArgumentException](
      ValidateOps.expect(df, Seq("bad name!" -> col("k").isNotNull)))
    intercept[IllegalArgumentException](   // case-variant duplicates
      ValidateOps.expect(df, Seq("Check" -> col("k").isNotNull,
        "check" -> col("k").isNotNull)))
  }

  test("uniqueness and fkViolations") {
    val u = ValidateOps.uniqueness(df, Seq("k"), "k_unique").head()
    assert(u.getLong(1) == 1L && !u.getBoolean(2), "one duplicated non-null key")
    val parent = Seq(1L).toDF("pk")
    val fk = ValidateOps.fkViolations(df, parent, Seq("k" -> "pk"), "fk").head()
    // k=2 twice without a parent; the null key is NOT a violation
    assert(fk.getLong(1) == 2L && !fk.getBoolean(2))
    val fkOk = ValidateOps.fkViolations(df, Seq(1L, 2L).toDF("pk"),
      Seq("k" -> "pk"), "fk").head()
    assert(fkOk.getLong(1) == 0L && fkOk.getBoolean(2))
  }

  test("diffTables audits two TableSink snapshot tags end to end") {
    import graft.sources.TableSink
    val dir = java.nio.file.Files.createTempDirectory("difftags").toString
    val v1 = Seq((1L, "g", "alpha"), (2L, "g", "beta"), (3L, "g", "gamma"))
      .toDF("id", "grp", "payload").withColumn("__v", lit(1L))
    TableSink.upsert(spark, dir, v1, Seq("id"), "__v")
    TableSink.snapshot(dir, "v1")
    // mutate: change 2, delete 3, add 4
    TableSink.upsert(spark, dir,
      Seq((2L, "g", "BETA2"), (4L, "g", "delta")).toDF("id", "grp", "payload")
        .withColumn("__v", lit(2L)), Seq("id"), "__v")
    TableSink.delete(spark, dir, Seq(Tuple1(3L)).toDF("id"), Seq("id"))
    TableSink.snapshot(dir, "v2")
    val rep = ValidateOps.diffTables(
        TableSink.readSnapshot(spark, dir, "v1"),
        TableSink.readSnapshot(spark, dir, "v2"),
        keys = Seq("id"), compareCols = Seq("payload"), reportCol = "grp")
      .collect()
    assert(rep.length === 1)
    val r = rep(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) === ((1L, 1L, 1L, 1L)),
      s"added/removed/changed/same must be 1/1/1/1: ${r.toSeq}")
  }
}
