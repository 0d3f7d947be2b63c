package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DeflateSize.deflateSize

/** deflate_size kernel laws: determinism, the repetitive-text signal
  * (the reason the ratio is a quality heuristic), overhead bounds, and
  * null/empty behavior. */
class CompressSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sizeOf(s: String): Int =
    Seq(s).toDF("t").select(deflateSize(col("t"))).collect()(0).getInt(0)

  test("deterministic across evaluations and rows") {
    val df = Seq.fill(64)("the quick brown fox jumps over the lazy dog").toDF("t")
    val sizes = df.select(deflateSize(col("t")).as("s")).distinct().collect()
    assert(sizes.length === 1)
    assert(sizeOf("the quick brown fox jumps over the lazy dog") ===
      sizes(0).getInt(0))
  }

  test("highly repetitive text compresses by a large factor") {
    val rep = "spam " * 1000
    assert(rep.length.toDouble / sizeOf(rep) > 20.0)
  }

  test("repetitive text compresses better than varied text of equal length") {
    val varied = (1 to 200).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")
    val rep = ("repeat me " * 200).take(varied.length)
    assert(sizeOf(rep) < sizeOf(varied))
  }

  test("overhead bound and empty input") {
    assert(sizeOf("") > 0) // header/trailer only
    assert(sizeOf("") <= 16)
    val short = "xyz"
    assert(sizeOf(short) <= short.length + 64)
  }

  test("null propagates (nullIntolerant expression)") {
    val n = Seq[Option[String]](None, Some("a")).toDF("t")
      .select(deflateSize(col("t")).as("s"))
      .filter(col("s").isNull).count()
    assert(n === 1)
  }
}
