package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for the two operations where a hot key genuinely breaks
 * a 1000-executor run: shuffle joins and holistic (non-algebraic)
 * aggregations. Algebraic aggregates (sum/count/min/max) do NOT need
 * manual salting — Spark's HashAggregate already combines map-side before
 * the shuffle, and AQE re-splits skewed join partitions when stats catch
 * it; these helpers cover the cases those mechanisms miss (single hot
 * KEY inside one partition after AQE's split granularity, and per-key
 * state like collect_set that partial aggregation cannot shrink).
 *
 * The salt is deterministic (`hash(saltSource) mod salts`, not `rand()`):
 * retried tasks re-produce the same buckets, so speculative execution and
 * stage retries stay exactly-once-equivalent.
 */
object SkewOps {

  private val SaltCol = "__graft_salt"

  /**
   * Skew-safe equi-join: every fact row lands in exactly one of `salts`
   * buckets per key (salted by a fact-side column so buckets are
   * deterministic), while each dim row is replicated to all buckets.
   * Join multiplicities are preserved, so the result equals the unsalted
   * join row-for-row — but a key holding 10% of the fact table now
   * spreads over `salts` reducers instead of melting one.
   *
   * Dim-side cost is `salts`× replication: use for mid-size dims too big
   * to broadcast but far smaller than the fact table (the classic
   * "almost broadcastable" skew trap).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 saltSource: Column, salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // coalesce marks the salt non-nullable: without it the optimizer
    // derives an isnotnull(pmod(hash(...))) filter and evaluates the
    // salt twice per row (hash(null) is defined anyway — the seed)
    val f = fact.withColumn(SaltCol, coalesce(pmod(hash(saltSource), lit(salts)), lit(0)))
    val d = dim.withColumn(SaltCol, explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, f(factKey) === d(dimKey) && f(SaltCol) === d(SaltCol))
      .drop(SaltCol)
  }

  /**
   * Two-phase distinct-set aggregation: phase 1 collects per (key, salt)
   * partial sets — bounding any single task's state to ~1/salts of the
   * hottest key — phase 2 unions the partials. Equals a direct
   * `collect_set` per key; survives a key whose distinct set alone
   * approaches executor memory.
   */
  def saltedDistinctSet(df: DataFrame, key: String, valueCol: String,
                        salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    df.withColumn(SaltCol, pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(col(key), col(SaltCol))
      .agg(collect_set(col(valueCol)).as("partial"))
      .groupBy(col(key))
      // salting by the VALUE makes partials disjoint: flatten is enough,
      // no second distinct pass over the merged array
      .agg(array_sort(flatten(collect_list(col("partial")))).as("values"))
  }
}
