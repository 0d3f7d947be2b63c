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
   * Detected hot keys of `key`: the keys whose observed frequency could
   * reach `hotFrac` of the rows, found with ONE map-side-bounded pass —
   * a [[graft.functions.MisraGriesAgg]] summary at capacity
   * `ceil(2/hotFrac)` plus the row count. The MG bound makes the set
   * conservative in exactly the safe direction: a key with true
   * frequency ≥ hotFrac·n has estimate ≥ hotFrac·n − n/(m+1) ≥
   * (hotFrac/2)·n, so thresholding estimates at hotFrac/2 NEVER misses
   * a genuinely hot key; it may flag keys down to hotFrac/2, and
   * over-salting a warm key costs only its own few extra dim copies.
   * Driver-collects ≤ m entries (m ≈ 2/hotFrac, e.g. 200 at 1%) — the
   * engine's bounded-collect pattern, never the key universe.
   */
  def hotKeys(df: DataFrame, key: String, hotFrac: Double = 0.01): Seq[String] = {
    require(hotFrac > 0.0 && hotFrac <= 1.0, s"hotFrac out of range: $hotFrac")
    val m = math.ceil(2.0 / hotFrac).toInt
    val row = df.agg(
      graft.functions.MisraGriesAgg.misraGries(col(key).cast("string"), m).as("mg"),
      count(lit(1)).as("n")).collect()(0)
    val n = row.getLong(1)
    row.getMap[String, Long](0).collect {
      case (k, est) if est.toDouble >= hotFrac / 2.0 * n => k
    }.toSeq.sorted
  }

  /**
   * Adaptive salted join: salt ONLY the detected hot keys. [[saltedJoin]]
   * pays `salts`× replication of the WHOLE dim side; here the cold keys
   * (all but ~1/hotFrac of the universe) join plain, and only the hot
   * keys' dim rows replicate. The split is a broadcast IN-list (bounded
   * by construction), both arms shuffle on the same key, and the union
   * preserves join multiplicities — row-for-row equal to the unsalted
   * join, which the spec and the DuckDB oracle both pin.
   */
  def adaptiveSaltedJoin(fact: DataFrame, dim: DataFrame,
                         factKey: String, dimKey: String, saltSource: Column,
                         salts: Int = 16, hotFrac: Double = 0.01): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val hot = hotKeys(fact, factKey, hotFrac)
    if (hot.isEmpty) fact.join(dim, fact(factKey) === dim(dimKey))
    else {
      val isHotF = fact(factKey).cast("string").isin(hot: _*)
      val isHotD = dim(dimKey).cast("string").isin(hot: _*)
      val cold = fact.filter(!isHotF).join(dim.filter(!isHotD),
        fact(factKey) === dim(dimKey))
      val hotJ = saltedJoin(fact.filter(isHotF), dim.filter(isHotD),
        factKey, dimKey, saltSource, salts)
      cold.unionByName(hotJ)
    }
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
