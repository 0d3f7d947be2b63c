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

  test("EVERY query carries an oracle (no silent rows-only regressions)") {
    // As of round 5 all queries are oracle-checked — model-output queries
    // via invariant oracles. A new query without an oracle entry would
    // silently downgrade the driver's check to rows-only; fail loudly.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }
}
