package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality expectations — the validation report a production ingest
 * runs before letting a batch near training (the "expectations" idiom:
 * declare row-level predicates, get one violation-counted report row
 * per check). Extends the observability family (a11_counts) from plain
 * counts to asserted invariants.
 *
 * Scale shape: ALL row-level checks evaluate in ONE aggregation pass
 * over the table — each check is a conditional-sum aggregate, so the
 * scan happens once, partials combine map-side, and the exchange
 * carries one row per partition regardless of table size. Key
 * uniqueness rides the same pass as `count - countDistinct` (the
 * count-distinct expands to the standard two-phase plan). Referential
 * checks ([[fkViolations]]) are the one shape that genuinely needs a
 * join — a broadcast or shuffled LEFT ANTI against the parent keys.
 */
object ValidateOps {

  /** One report row per row-level expectation: (check, n_violations,
    * pass). NULL predicate values count as violations (an expectation
    * that cannot be evaluated did not hold); an EMPTY table passes every
    * check with 0 violations. Check names must be simple identifiers —
    * they are spliced into the melt expression. */
  def expect(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one expectation")
    checks.foreach { case (n, _) => require(n.matches("[A-Za-z0-9_]+"),
      s"check name must be a simple identifier: '$n'") }
    // case-INSENSITIVE distinctness: Spark's default analyzer resolves
    // column references case-insensitively, so 'Positive'/'positive'
    // would crash the melt with an ambiguous-reference error
    require(checks.map(_._1.toLowerCase).distinct.size == checks.size,
      s"duplicate check names (case-insensitive): ${checks.map(_._1).mkString(", ")}")
    val aggs = checks.map { case (name, pred) =>
      coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)), lit(0L)).as(name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // melt the single row into (check, n_violations, pass) — stack is
    // evaluated on the 1-row aggregate, so the melt costs nothing
    val stackArgs = checks.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    one.select(expr(s"stack(${checks.size}, $stackArgs) AS (check, n_violations)"))
      .select(col("check"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Key-uniqueness report row: duplicates among fully-non-null key
    * tuples = their count − countDistinct (a null key is "unknown", not
    * a duplicate — flag required keys with a not-null expectation). */
  def uniqueness(df: DataFrame, keys: Seq[String], name: String): DataFrame = {
    val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val dups = df.agg(
      (coalesce(sum(when(nonNull, 1L).otherwise(0L)), lit(0L)) -
        countDistinct(keys.head, keys.tail: _*)).as("n_violations"))
    dups.select(lit(name).as("check"), col("n_violations"),
      (col("n_violations") === 0L).as("pass"))
  }

  /** Referential-integrity report row: child rows whose FK tuple has no
    * parent. Null FKs are not violations (SQL semantics: a null FK is
    * "unknown", caught by a not-null expectation when required). */
  def fkViolations(child: DataFrame, parent: DataFrame,
                   fk: Seq[(String, String)], name: String): DataFrame = {
    val childKeys = child.select(fk.map { case (c, _) => col(c) }: _*)
      .filter(fk.map { case (c, _) => col(c).isNotNull }.reduce(_ && _))
    val parentKeys = parent.select(fk.map { case (c, p) => col(p).as(c) }: _*)
    childKeys.join(parentKeys, fk.map(_._1), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }
}
