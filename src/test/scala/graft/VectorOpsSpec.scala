package graft

import graft.functions.vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite with SparkSpec {

  private def cosineOf(a: Seq[Double], b: Seq[Double]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(vector.cosineSim(col("a"), col("b")).as("c"))
      .collect()(0).getDouble(0)
  }

  test("cosine of identical vectors is 1") {
    assert(math.abs(cosineOf(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    assert(math.abs(cosineOf(Seq(1.0, 0.0), Seq(0.0, 1.0))) < 1e-12)
  }

  test("cosine of zero vector is 0 (guard, reference duplication_service.py:77)") {
    assert(cosineOf(Seq(0.0, 0.0), Seq(1.0, 2.0)) == 0.0)
  }

  test("mixed float/double operands fail at analysis, never read garbage") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0, 2.0))).toDF("f", "d")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(vector.cosineSim(col("f"), col("d"))).collect()
    }
    assert(e.getMessage.contains("same float or double"), e.getMessage)
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(vector.dotProduct(col("d"), col("f"))).collect()
    }
    // non-array input to l2_normalize also fails loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("x").select(vector.l2Normalize(col("x"))).collect()
    }
    // aligned via explicit cast: works
    val ok = df.select(vector.cosineSim(col("f").cast("array<double>"), col("d")))
      .collect()(0).getDouble(0)
    assert(math.abs(ok - 1.0) < 1e-6)
  }

  test("cosine is symmetric and bounded (seeded random vectors)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val a = Seq.fill(8)(rnd.nextDouble() * 20 - 10)
      val b = Seq.fill(8)(rnd.nextDouble() * 20 - 10)
      val ab = cosineOf(a, b); val ba = cosineOf(b, a)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }

  test("l2_normalize yields unit norm") {
    import spark.implicits._
    val out = Seq(Seq(3.0, 4.0)).toDF("v")
      .select(vector.l2Normalize(col("v")).as("n"))
      .collect()(0).getSeq[Double](0)
    assert(math.abs(math.sqrt(out.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(math.abs(out(0) - 0.6) < 1e-12)
  }

  test("VectorMeanFast: element-wise mean, empty-safe") {
    import spark.implicits._
    import graft.functions.VectorMeanFast
    val df = Seq(("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 4.0)), ("b", Seq(5.0, 6.0)),
      ("c", Seq.empty[Double])).toDF("k", "v")
    val got = df.groupBy("k").agg(VectorMeanFast(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(2.0, 3.0))
    assert(got("b") == Seq(5.0, 6.0))
    assert(got("c") == Seq.empty[Double], "empty/ignored inputs yield empty array")
  }

}
