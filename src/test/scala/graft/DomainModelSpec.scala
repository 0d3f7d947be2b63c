package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DomainModel

/** Multiclass tagger: separable classes tag perfectly, confidences are
  * softmax probabilities (winner >= 1/k), class indices are stable under
  * input order, and inference carries no MLlib node. */
class DomainModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // three token-disjoint "languages", 40 docs each
  private def corpus = (0 until 120).map { i =>
    val cls = Seq("aa", "bb", "cc")(i % 3)
    (i.toLong, cls, Seq.fill(8)(cls * 3).mkString(s" w$i ", " ", ""))
  }.toDF("id", "cls", "text")

  test("separable classes tag perfectly with probability >= 1/k") {
    val model = DomainModel.train(corpus, "text", "cls", dim = 64)
    assert(model.count() === 3)
    val tagged = DomainModel.tag(corpus, model, "text")
    val rows = tagged.select("cls", "domain_pred", "domain_prob")
      .as[(String, String, Double)].collect()
    assert(rows.forall { case (c, p, _) => c == p },
      s"misses: ${rows.filterNot { case (c, p, _) => c == p }.take(3).toSeq}")
    assert(rows.forall { case (_, _, pr) => pr >= 1.0 / 3 - 1e-9 && pr <= 1.0 + 1e-9 })
  }

  test("class indices are sorted-name deterministic regardless of row order") {
    val m1 = DomainModel.train(corpus, "text", "cls")
    val m2 = DomainModel.train(corpus.orderBy(desc("id")), "text", "cls")
    val idx1 = m1.select("cls", "idx").as[(String, Int)].collect().toMap
    val idx2 = m2.select("cls", "idx").as[(String, Int)].collect().toMap
    assert(idx1 === Map("aa" -> 0, "bb" -> 1, "cc" -> 2))
    assert(idx1 === idx2)
  }

  test("inference plan is pure column algebra — no UDF, no join, no shuffle") {
    val model = DomainModel.train(corpus, "text", "cls")
    val plan = DomainModel.tag(corpus, model, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(!plan.contains("Exchange"), "tagging must be map-only")
    assert(!plan.toLowerCase.contains("join"))
  }

  test("null classes are excluded from training; tagging still covers them") {
    val withNull = corpus.unionByName(
      Seq((999L, null.asInstanceOf[String], "aaaaaa aaaaaa")).toDF("id", "cls", "text"))
    val model = DomainModel.train(withNull, "text", "cls")
    assert(model.count() === 3)
    val got = DomainModel.tag(withNull.where(col("id") === 999L), model, "text")
      .select("domain_pred").as[String].collect()
    assert(got === Array("aa"))
  }
}
