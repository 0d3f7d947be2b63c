package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for dataset curation. A training-data pipeline
 * needs samples that are (a) reproducible across runs, engines and
 * retries — `df.sample()` is none of those — and (b) auditable: whether
 * any given row was kept must be re-derivable from the row alone. Both
 * come from hashing a stable key instead of drawing randoms: keep a row
 * iff `md5_lower64(salt || key) mod 1e6` lands under `fraction · 1e6`.
 * Changing the salt draws an independent sample; the same (key, salt)
 * always decides the same way, so incremental re-runs over a growing
 * corpus keep their earlier decisions. Map-only, codegen'd, no RNG
 * state, and reproducible by any engine with md5 (the DuckDB oracle
 * replays the predicate exactly).
 */
object SampleOps {

  private val Buckets = 1000000L

  /** The keep-decision itself: usable as a filter or as an audit column.
    * One md5 digest per row (codegen'd [[graft.functions.Md5Bucket]] —
    * Filter predicates get no subexpression elimination, so the 8-way
    * substring column formulation would digest 8× here). */
  def keep(key: Column, fraction: Column, salt: String): Column =
    graft.functions.sig.md5BucketCol(concat(lit(salt), key.cast("string")), Buckets) <
      floor(fraction * Buckets).cast("long")

  /** Deterministic Bernoulli sample at one fraction. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    df.filter(keep(key, lit(fraction), salt))
  }

  /**
   * Exact-size deterministic sample: the k rows whose salted digest
   * ranks lowest — "give me exactly K documents, reproducibly". Unlike
   * a fraction sample the size is exact; unlike `df.limit(k)` the
   * choice is corpus-order-independent (pure function of (key, salt)).
   * Plans as a TakeOrderedAndProject — per-partition top-k then one
   * k-row merge, never a global sort. Ties (digest collisions) break
   * by key, so the result is total-order deterministic.
   */
  def fixedSizeSample(df: DataFrame, key: Column, k: Int,
                      salt: String = ""): DataFrame = {
    require(k >= 0, s"sample size out of range: $k")
    df.orderBy(
        graft.functions.sig.md5BucketCol(concat(lit(salt), key.cast("string")), Buckets).asc,
        key.asc)
      .limit(k)
  }

  /**
   * Per-group cap (source/domain balancing): keep at most `cap` rows
   * per group, chosen deterministically by the salted digest rank —
   * the quota form of stratified sampling ("no domain contributes more
   * than N documents"). Spark 4's WindowGroupLimit prunes each
   * partition to the top `cap` per group BEFORE the shuffle, so the
   * exchange carries ≤ cap·partitions rows per group, not the group.
   */
  def capPerGroup(df: DataFrame, groupCol: String, key: Column, cap: Int,
                  salt: String = ""): DataFrame = {
    require(cap >= 1, s"cap out of range: $cap")
    df.withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
          .orderBy(
            graft.functions.sig.md5BucketCol(
              concat(lit(salt), key.cast("string")), Buckets).asc,
            key.asc)))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /**
   * Weighted sampling without replacement (Efraimidis–Spirakis
   * exponential-sort / A-ExpJ): keep the k rows per group with the
   * smallest `−ln(u)/w`, where `u` is the row's salted digest mapped
   * into (0,1) — each key is an Exponential(w) draw, and the k smallest
   * draws select items with the exact weighted-without-replacement
   * distribution (Efraimidis & Spirakis 2006). The curation use:
   * quality- or length-weighted document selection under a per-domain
   * quota — [[capPerGroup]] with a bias instead of a uniform draw.
   * Deterministic like every sampler here: u comes from md5(salt‖key),
   * so the draw replays identically across runs, engines, and retries.
   *
   * Non-positive weights are excluded up front — w = 0 means "never
   * sample" in the ES distribution (its exponential draw diverges), and
   * a negative weight is meaningless; both would otherwise hijack the
   * smallest-key rank.
   *
   * Keys are rounded to 9 decimals with digest-then-key tie-break:
   * raw `ln` values differ in final ulps across libm implementations
   * (the SemDeDup ordering lesson), rounded ones replay exactly in the
   * DuckDB oracle. Same WindowGroupLimit shape as [[capPerGroup]]: each
   * partition prunes to its own top-k per group before the exchange.
   */
  def weightedSample(df: DataFrame, groupCol: String, key: Column,
                     weight: Column, k: Int, salt: String = ""): DataFrame = {
    require(k >= 1, s"sample size out of range: $k")
    val u = (graft.functions.sig.md5BucketCol(
      concat(lit(salt), key.cast("string")), Buckets).cast("double") + 0.5) / Buckets
    val ekey = round(-log(u) / weight, 9)
    df.filter(weight > 0)
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
          .orderBy(ekey.asc, key.asc)))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /**
   * Deterministic dataset split (train/val/test): each row's salted
   * digest bucket falls into exactly one contiguous range, so the
   * assignment is DISJOINT AND EXHAUSTIVE by construction, reproducible
   * across runs and engines, and stable under corpus growth (a row's
   * label never changes as other rows arrive — the property random
   * splits lack). The last named split absorbs the tail of the bucket
   * space (rounding slack cannot orphan rows), so the fractions MUST
   * sum to 1: under-allocation would silently inflate the last split —
   * `Seq("sample" -> 0.1)` would label 100% of rows "sample" — which is
   * why the sum is enforced, not footnoted. Map-only CASE chain; one
   * digest per row.
   */
  def assignSplit(key: Column, fractions: Seq[(String, Double)],
                  salt: String = ""): Column = {
    require(fractions.nonEmpty, "need at least one split")
    fractions.foreach { case (n, f) =>
      require(f > 0.0 && f <= 1.0, s"fraction out of range for '$n': $f") }
    require(math.abs(fractions.map(_._2).sum - 1.0) <= 1e-6,
      s"split fractions must sum to 1 (the last split absorbs the bucket-space " +
        s"tail, so a short sum silently inflates it): got ${fractions.map(_._2).sum}")
    val b = graft.functions.sig.md5BucketCol(
      concat(lit(salt), key.cast("string")), Buckets)
    val cums = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    fractions.init.zip(cums.init).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), cum), acc) =>
        when(b < floor(lit(cum) * Buckets).cast("long"), lit(name)).otherwise(acc)
    }
  }

  /**
   * Stratified sample: per-stratum fractions (e.g. downsample the head
   * language, keep the tail) with a default for unlisted strata. The
   * fraction lookup is a codegen'd CASE chain — no join, no shuffle.
   */
  def stratifiedSample(df: DataFrame, strataCol: String, key: Column,
                       fractions: Map[String, Double], default: Double = 0.0,
                       salt: String = ""): DataFrame = {
    (fractions.values.toSeq :+ default).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction out of range: $f"))
    val frac = fractions.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(keep(key, frac, salt))
  }

  /**
   * Mix-to-specification: deterministic acceptance sampling that
   * reshapes the corpus to TARGET domain proportions by downsampling
   * only — the execution stage for externally-derived mixture weights
   * (a DoReMi run, a scaling-law sweep, a product spec), where
   * [[CurationOps.temperatureMixture]] and [[unimaxAlloc]] DERIVE the
   * target from counts, this takes an arbitrary one and hits it. The
   * feasible output size under downsampling is N* = min_d n_d / p_d
   * (the binding domain keeps everything); every domain then accepts
   * p_d · N* / n_d of its docs via the salted-digest draw, so expected
   * output proportions equal the target exactly. Domains absent from
   * the target map are dropped.
   *
   * Scale shape: one tiny per-domain count aggregation; N* and the
   * rates are arithmetic over that n_domains relation; the rates
   * broadcast back and the keep decision is the map-side digest
   * predicate — one corpus pass end to end.
   */
  def mixToTarget(df: DataFrame, domainCol: String, key: Column,
                  targets: Map[String, Double], salt: String = ""): DataFrame = {
    require(targets.nonEmpty, "empty target mixture")
    targets.foreach { case (d, p) =>
      require(p > 0.0 && p <= 1.0, s"target proportion out of range for $d: $p") }
    val pCol = targets.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (k, v)) => when(col("__dom") === k, lit(v)).otherwise(acc)
    }
    val counts = df.groupBy(col(domainCol).as("__dom")).agg(count(lit(1)).as("__n"))
      .withColumn("__p", pCol).where(col("__p").isNotNull)
      .localCheckpoint(true)
    // A target domain with NO corpus rows makes the requested mixture
    // unreachable by downsampling (its proportion would be 0, every
    // other domain's would inflate) — fail loudly instead of silently
    // shipping the wrong mix. k-bounded driver check (domain vocabulary,
    // not corpus).
    val present = counts.select(col("__dom").cast("string"))
      .collect().map(_.getString(0)).toSet
    val missing = targets.keySet -- present
    require(missing.isEmpty,
      s"target domains absent from the corpus (mixture unreachable by " +
        s"downsampling): ${missing.toSeq.sorted.mkString(", ")}")
    val nstar = counts.agg(min(col("__n").cast("double") / col("__p")).as("__nstar"))
    val rates = counts.crossJoin(broadcast(nstar))
      .select(col("__dom"),
        least(lit(1.0), col("__p") * col("__nstar") / col("__n").cast("double"))
          .as("__rate"))
    df.join(broadcast(rates), col(domainCol) === col("__dom"))
      .filter(keep(key, col("__rate"), salt))
      .drop("__dom", "__rate")
  }

  /**
   * Per-domain TOKEN-budget cap — the data-recipe form of
   * [[capPerGroup]] ("each domain contributes at most `budget` TOKENS",
   * not rows — the mixture knob training recipes actually specify):
   * documents are taken in the deterministic salted-digest order and
   * kept while the domain's running token total stays within budget
   * (prefix truncation — the standard greedy fill, not a knapsack; the
   * boundary document that would overflow is dropped along with the
   * tail).
   *
   * Scale shape: the exact per-domain running sum is computed WITHOUT a
   * single-partition-per-domain window (which would funnel a giant
   * domain through one task) — the [[graft.operators.CurationOps
   * .packSequencesGlobal]] broadcast-cumsum idiom applied per domain:
   * the order key's LEADING component is a small digest segment id, so
   * per-(domain, segment) totals (≤ domains × segments rows, tiny)
   * yield broadcast prefix offsets, and the in-segment cumsum windows
   * on (domain, segment) partitions. Null domains are one domain
   * (null-safe join, the [[graft.operators.CurationOps
   * .temperatureMixture]] lesson); null weights cost 0 (sum skips
   * them), except a prefix of ONLY-null weights which has a null
   * cumsum and is dropped — matching the SQL replay exactly.
   */
  def tokenBudgetCap(df: DataFrame, domainCol: String, key: Column,
                     weightCol: String, budget: Long, salt: String = "",
                     segments: Int = 256): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    require(segments >= 1, s"segments must be >= 1: $segments")
    import org.apache.spark.sql.expressions.Window
    val seg = graft.functions.sig.md5BucketCol(
      concat(lit(salt), key.cast("string")), segments.toLong)
    val base = df.withColumn("__seg", seg)
    val offsets = base
      .groupBy(col(domainCol).as("__dom2"), col("__seg").as("__seg2"))
      .agg(sum(col(weightCol)).as("__t"))
      .withColumn("__offset", coalesce(sum(col("__t")).over(
        Window.partitionBy("__dom2").orderBy("__seg2")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__t")
    base.join(broadcast(offsets),
        base(domainCol) <=> offsets("__dom2") && base("__seg") === offsets("__seg2"))
      .withColumn("__cum", col("__offset") +
        sum(col(weightCol)).over(
          Window.partitionBy(col(domainCol), col("__seg")).orderBy(key.asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__cum") <= budget)
      .drop("__dom2", "__seg2", "__seg", "__offset", "__cum")
  }

  /**
   * UniMax language-sampling allocation (Chung et al. 2023, "UniMax:
   * Fairer and More Effective Language Sampling for Large-Scale
   * Multilingual Pretraining"): waterfill a total token `budget` across
   * domains, capping each domain at `maxEpochs` passes over its own
   * `tokensCol` tokens — remaining budget is shared UNIFORMLY among
   * every domain still under its cap, which is the paper's fairness
   * fix for temperature sampling (temperature either starves the tail
   * or epochs-explodes it; UniMax gives the tail equal budget until it
   * exhausts its cap).
   *
   * Closed form — no driver loop, no iteration: sort domains by
   * capacity ascending; at position i the uniform share of the budget
   * remaining after all smaller caps saturate is
   * `level_i = (B − Σ_{j<i} cap_j) / (n − i + 1)`. If `cap_i ≤ level_i`
   * the domain saturates (alloc = cap). Once a position is unsaturated
   * every later one is too (level_{i+1} = ((n−i+1)·level_i − cap_i) /
   * (n−i) < level_i < cap_i ≤ cap_{i+1}), so the final water level ℓ*
   * is the level at the FIRST unsaturated position = max over
   * unsaturated levels, and `alloc = min(cap, ℓ*)` for every domain
   * (ℓ* = ∞ when the budget covers every cap).
   *
   * Scale shape: everything here is windows over the per-domain COUNTS
   * relation — n_domains rows regardless of corpus size (the
   * corpus-sized work is the upstream token count the caller already
   * aggregated). The single-partition window is deliberate and safe at
   * that cardinality.
   *
   * `budget` must be a per-row-constant column of `counts` (a literal,
   * or a cross-joined scalar for data-dependent budgets).
   */
  def unimaxAlloc(counts: DataFrame, domainCol: String, tokensCol: String,
                  budget: Column, maxEpochs: Double): DataFrame = {
    require(maxEpochs > 0.0, s"maxEpochs must be positive: $maxEpochs")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(col("__cap").asc, col(domainCol).asc)
    val all = Window.orderBy(col("__cap").asc, col(domainCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lv = counts
      .withColumn("__cap", col(tokensCol).cast("double") * lit(maxEpochs))
      .withColumn("__i", row_number().over(ord))
      .withColumn("__p", coalesce(
        sum(col("__cap")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__level",
        (budget - col("__p")) / (col("__n") - col("__i") + 1).cast("double"))
    val ell = coalesce(
      max(when(col("__cap") > col("__level"), col("__level"))).over(all),
      lit(Double.PositiveInfinity))
    lv.withColumn("__alloc", least(col("__cap"), ell))
      .select(col(domainCol), col(tokensCol),
        round(col("__cap"), 4).as("capacity"),
        round(col("__alloc"), 4).as("alloc"),
        round(col("__alloc") / col(tokensCol).cast("double"), 6).as("epochs"),
        (col("__cap") <= ell).as("saturated"))
  }

  /**
   * EXACT-size stratified split — the companion to [[assignSplit]]
   * (whose digest rule hits the fractions only in expectation): within
   * every stratum, documents order by the salted digest (id tie-break)
   * and the split boundaries cut at exact cumulative counts —
   * `ceil(f₁·n)` rows to the first split, the next `ceil((f₁+f₂)·n) −
   * ceil(f₁·n)` to the second, and so on — so per-stratum proportions
   * are exact to the row, not just in expectation (what a per-language
   * eval set actually requires: a 2%-of-corpus language still gets its
   * exact 10% val slice). Deterministic and growth-UNSTABLE by nature
   * (adding documents moves the cut points — the price of exactness;
   * [[assignSplit]] is the growth-stable alternative).
   *
   * One rank window per stratum — partitions on the stratum key; at
   * extreme per-stratum cardinality apply the [[tokenBudgetCap]]
   * segment decomposition.
   */
  def stratifiedSplit(df: DataFrame, strataCol: String, key: Column,
                      splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
    val ord = w.orderBy(
      graft.functions.sig.md5BucketCol(concat(lit(salt), key.cast("string")), Buckets),
      key.cast("string"))
    val ranked = df
      .withColumn("__rk", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(w))
    // EXACT-decimal cut points: a double 0.8·n lands a hair above the
    // integer when the true product is integral (0.8·500 =
    // 400.0000000000000222 → ceil 401), and double-vs-decimal engines
    // would cut differently. BigDecimal sums and literals keep
    // ceil(f_cum·n) integer-exact — identically to a decimal-literal
    // SQL replay.
    val cum = splits.scanLeft(java.math.BigDecimal.ZERO) {
      case (acc, (_, f)) => acc.add(new java.math.BigDecimal(f.toString))
    }.tail
    val split = splits.map(_._1).zip(cum).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, (name, c)) =>
        when(col("__rk") <= ceil(lit(c) * col("__n")), lit(name)).otherwise(acc)
      }
    ranked.withColumn("split", split).drop("__rk", "__n")
  }

  /**
   * Deterministic global training shuffle — the last step before
   * writing training shards: an order-independent pseudo-random
   * permutation (salted-digest sort key, id tie-break — a pure function
   * of (key, salt), so re-runs and retries produce the identical
   * permutation, unlike `orderBy(rand())`) with documents dealt
   * round-robin into `shards` equal streams. Output: (shard, pos) —
   * contiguous 0-based positions within each shard, every shard's size
   * within 1 of the others REGARDLESS of key skew (position is assigned
   * on the global permutation rank, not by hashing).
   *
   * Scale shape: the one global sort is range-partitioned by the digest
   * (uniform by construction — no skew, no single partition), and the
   * global rank is the packSequencesGlobal decomposition: an in-
   * partition row_number plus a broadcast cumsum of per-partition
   * counts — one tiny row per partition crosses the driver, never data.
   */
  def globalShuffle(df: DataFrame, key: Column, shards: Int,
                    salt: String = ""): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    val keyed = df
      .withColumn("__d", graft.functions.sig.md5BucketCol(
        concat(lit(salt), key.cast("string")), 1L << 62))
      .withColumn("__k", key.cast("string"))
    rankDeal(keyed, Seq(col("__d"), col("__k")), shards)
      .drop("__d", "__k")
  }

  /**
   * Curriculum data ordering — the training-order scheduler curriculum
   * learning needs at corpus scale (Bengio et al. 2009; data curricula
   * order a run's stream from cleanest to noisiest): a deterministic
   * GLOBAL order sorted by (phase asc, salted digest, key), dealt
   * round-robin into `shards` equal streams. Because position is
   * assigned on the global rank, EVERY shard receives its own
   * phase-ordered stream — each data-parallel worker sees phase 0
   * first, then phase 1, … — while within a phase the digest shuffles
   * order-independently exactly like [[globalShuffle]].
   *
   * Same scale decomposition as the shuffle (one range exchange keyed
   * (phase, digest) — uniform within each phase band by construction —
   * plus the broadcast-cumsum global rank); phases come from the
   * caller (quality terciles, perplexity buckets, any ordinal), stay
   * in the output as `phase`.
   */
  def curriculumOrder(df: DataFrame, phase: Column, key: Column, shards: Int,
                      salt: String = ""): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    // `phase` is an OUTPUT column of this operator; a pre-existing
    // `phase` in the input would be silently overwritten (and worse, the
    // caller's `phase` expression would then compute over the mutated
    // frame). Refuse loudly; the sort key itself rides the __-internal
    // convention like __d/__k.
    require(!df.columns.contains("phase"),
      "curriculumOrder emits a `phase` column; rename the input's " +
        "existing `phase` before ordering")
    val keyed = df
      .withColumn("__phase", phase)
      .withColumn("__d", graft.functions.sig.md5BucketCol(
        concat(lit(salt), key.cast("string")), 1L << 62))
      .withColumn("__k", key.cast("string"))
    rankDeal(keyed, Seq(col("__phase"), col("__d"), col("__k")), shards)
      .withColumn("phase", col("__phase"))
      .drop("__phase", "__d", "__k")
  }

  /** The shared global-order core: range-partition + sort on `sortCols`,
    * global rank via in-partition row_number + a broadcast cumsum of
    * per-partition counts (one tiny row per partition — the
    * packSequencesGlobal decomposition), then a round-robin deal into
    * (shard, pos). */
  private def rankDeal(keyed: DataFrame, sortCols: Seq[Column],
                       shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = keyed.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__part", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged.groupBy(col("__part").as("__p2"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__offset", coalesce(sum(col("__c")).over(
        Window.orderBy("__p2").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__c")
    ranged.join(broadcast(offsets), col("__part") === col("__p2"))
      .withColumn("__rank", col("__offset") +
        row_number().over(Window.partitionBy(col("__part"))
          .orderBy(sortCols: _*)) - 1)
      .withColumn("shard", pmod(col("__rank"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", expr(s"__rank div ${shards}L"))
      .drop("__part", "__p2", "__offset", "__rank")
  }

  /**
   * Epoch expansion — materialize a multi-epoch sampling plan into the
   * actual repeat stream ([[unimaxAlloc]] DERIVES "language l trains
   * for e_l epochs"; this EXECUTES it): every document of domain `d`
   * appears `floor(e_d)` times plus one more with probability
   * `frac(e_d)` via the deterministic salted-digest draw, so the
   * expected token count per domain is exactly `e_d · tokens_d`.
   * Map-only after the broadcast epochs join — floor/draw/explode in
   * one codegen pass, no shuffle, output rows carry a `copy` index so
   * downstream shuffles (packing, splits) can salt on it.
   *
   * `epochs`: one row per domain `(domainCol, epochs)` — tiny by
   * contract (broadcast). Domains absent from it are dropped; epochs
   * may exceed 1 (repeat) or sit below 1 (subsample), uniformly.
   */
  def epochExpand(df: DataFrame, domainCol: String, key: Column,
                  epochs: DataFrame, salt: String = ""): DataFrame = {
    require(epochs.columns.contains(domainCol) && epochs.columns.contains("epochs"),
      s"epochs relation needs ($domainCol, epochs), got ${epochs.columns.toSeq}")
    val joined = df.join(broadcast(epochs), Seq(domainCol))
    val e = col("epochs")
    val copies = floor(e).cast("long") +
      keep(key, e - floor(e), salt).cast("long")
    joined.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__n"))))
      .drop("__n", "epochs")
  }

  /**
   * Per-group quantile outlier trim — the standard "drop documents past
   * the p99 length for their source" cleaning rule, built on the SKETCH
   * path so it scales: per-group thresholds come from
   * `approx_percentile` (fixed-size partial-combinable summaries — one
   * shuffle of sketch bytes, never raw values; the [[graft.SparkEntry]]
   * `x_quantile_sketch` contract idiom) and probe back as a broadcast
   * (one tiny row per group at any scale). Rows with a NULL value or an
   * unseen group pass through — an outlier rule must never invent
   * rejections.
   *
   * ACCURACY CONTRACT: the sketch is rank-EXACT only while a group's row
   * count stays ≤ `accuracy` (Greenwald-Khanna error is 1/accuracy of
   * the rank); past that it is an approximation within that rank band —
   * fine for the cleaning rule, but an exact-replay oracle (DuckDB
   * `quantile_disc`) only matches under the bound. Size `accuracy` to
   * the expected max group count when exactness matters; sketch memory
   * is O(accuracy) values per group partial, so 10^5-10^6 is cheap.
   */
  def quantileTrim(df: DataFrame, groupCol: String, valCol: String,
                   q: Double = 0.99, accuracy: Int = 10000): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q in (0,1): $q")
    val thr = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valCol), lit(q), lit(accuracy)).as("__thr"))
    df.join(broadcast(thr), Seq(groupCol), "left")
      .filter(col(valCol).isNull || col("__thr").isNull || col(valCol) <= col("__thr"))
      .drop("__thr")
  }
}
