package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Verify's failure policy: a broken query must not kill the dump, but
  * must leave a visible _ERROR artifact and be reported — a shrunken
  * result set can never again read as all-green. */
class VerifySpec extends AnyFunSuite with SparkSpec {

  test("per-query failure writes _ERROR, others still dump, failures returned") {
    val out = Files.createTempDirectory("verify-spec").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("id")
    val bad: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("boom: forced failure")
    val failed = Verify.run(spark, sf(), out,
      Map("good_query" -> good, "bad_query" -> bad))
    assert(failed == Seq("bad_query"))
    val marker = Paths.get(s"$out/bad_query/_ERROR")
    assert(Files.exists(marker), "missing _ERROR marker")
    assert(Files.readString(marker).contains("boom"))
    assert(spark.read.parquet(s"$out/good_query").count() == 3)
  }

  test("all-green run returns no failures and writes no markers") {
    val out = Files.createTempDirectory("verify-spec").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(1).toDF("id")
    assert(Verify.run(spark, sf(), out, Map("g" -> good)).isEmpty)
    assert(!Files.exists(Paths.get(s"$out/g/_ERROR")))
  }
}
