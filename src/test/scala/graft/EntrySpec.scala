package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract smoke: entry() returns rows; every query runs at sf0.001 and
  * every oracle key refers to a declared query. */
class EntrySpec extends AnyFunSuite with SparkSpec {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries execute at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name) { fn(spark, sf()).write.format("noop").mode("overwrite").save() }
    }
  }

  test("oracleSql keys ⊆ queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without query: $unknown")
  }
}
