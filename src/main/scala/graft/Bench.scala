package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query median over `runs` passes: machine-load spikes hit one
    // pass, not the median — two load-contaminated recordings in a row
    // made earlier rounds' numbers unreadable.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Fixtures.conform's NTZ→TIMESTAMP normalization is a wall-clock
      // identity only under a UTC session (Verify sets it; every fixture
      // consumer must) — on a non-UTC host the benched timestamp queries
      // would otherwise compute shifted values.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: exercise scan, HOF-interpreter and codegen paths so
    // JIT cost lands here, not on whichever timed query runs first.
    Seq("p10_event_score", "x_token_stats", "p16_cosine_pairs").foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    // Optional comma-separated name filter — local iteration aid (the
    // driver never sets it, so its recordings stay full-set).
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .fold(SparkEntry.queries)(SparkEntry.selectQueries)
    val (results, stored, failures) =
      run(spark, sfDir, selected, runs, SparkEntry.phasedQueries)
    def jnum(v: Double) = if (v.isNaN || v.isInfinite) "null" else v.toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val ss = stored.toSeq.sortBy(_._1).map { case (k, (i, sv)) =>
      s"\"$k\":{\"init_s\":${jnum(i)},\"serve_s\":${jnum(sv)}}"
    }.mkString("{", ",", "}")
    val fs = failures.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + "\"" + v.replace("\"", "'") + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"stored":$ss,"failed":$fs,"sf":"$sfDir"}"""
    println(json)
    // The driver's log-tail recording truncates the (long) stdout line;
    // the committed-artifact copy keeps every per-query number readable
    // for round-over-round audits. A name-filtered local run writes to a
    // DISTINCT default path — a subset must never silently overwrite a
    // previously recorded full-suite artifact (explicit BENCH_OUT wins).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) "bench_partial.json"
      else "bench_full.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: $e") }
    spark.stop()
    // A bench with failing queries must look failed to the driver too.
    if (failures.nonEmpty) sys.exit(1)
  }

  /** Inter-query state sweep. The suite shares one JVM across ~115
    * queries × `runs` passes, and the localCheckpoint-heavy queries
    * (`x_admit_incremental`, `pipe_dedup_e2e`, `x_dup_components`,
    * `x_index_refresh`) pin their checkpoint RDD blocks in the block
    * manager until driver GC happens to collect them — which inflated
    * whichever queries ran next alphabetically, drifting their in-suite
    * numbers round over round while isolated medians stayed flat.
    * Unpersisting every persistent RDD and clearing the SQL cache after
    * each timed run (untimed: outside the clock) starts every
    * measurement from an empty block manager. */
  private def sweep(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
  }

  /** Timed passes over `queries`: per-query median of `runs` wall times,
    * plus an explicit failure map — a crashed query is excluded from the
    * timings (never recorded as ~0 s) and reported by name.
    *
    * Stored-family queries ([[SparkEntry.phasedQueries]]) time their
    * store-build (`init`) and probe (`serve`) phases SEPARATELY each
    * pass — their totals are init-dominated, which every round's mover
    * audit had to re-separate from host noise by hand (BASELINE.md
    * r13/r14); the per-query number recorded for them is init + serve,
    * so the headline total stays comparable with earlier rounds, and
    * the split medians come back in the second return slot. */
  def run(spark: SparkSession, sfDir: String,
          queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
          runs: Int,
          // The phased registry to consult for split timings — EXPLICIT
          // opt-in, default empty: a colliding name here replaces the
          // plain function with the phased definition, so a caller
          // timing a CUSTOM variant under a registry name would be
          // silently ignored if the registry were the default. Callers
          // timing the registry's own queries (main, the driver path)
          // pass SparkEntry.phasedQueries alongside SparkEntry.queries —
          // the two are built from the SAME definitions by construction
          // (queries' entry IS fused(phased) for every phased name).
          phasedAll: Map[String, QShared.Phased] = Map.empty)
      : (Seq[(String, Double)], Map[String, (Double, Double)], Map[String, String]) = {
    val phased = phasedAll.filter { case (n, _) => queries.contains(n) }
    val names = queries.keys.toSeq.sorted
    val timings = collection.mutable.Map.empty[String, List[Double]]
    val initT = collection.mutable.Map.empty[String, List[Double]]
    val serveT = collection.mutable.Map.empty[String, List[Double]]
    val failures = collection.mutable.Map.empty[String, String]
    sweep(spark) // warmup queries may have left state too
    for (_ <- 1 to runs; name <- names if !failures.contains(name)) {
      // noop sink forces full evaluation of every output column (a bare
      // count() would let Catalyst prune the computation under test).
      try {
        phased.get(name) match {
          case Some(p) =>
            val (init, serve) = p(spark, sfDir)
            val t0 = System.nanoTime()
            init()
            val t1 = System.nanoTime()
            serve().write.format("noop").mode("overwrite").save()
            val t2 = System.nanoTime()
            initT(name) = ((t1 - t0) / 1e9) :: initT.getOrElse(name, Nil)
            serveT(name) = ((t2 - t1) / 1e9) :: serveT.getOrElse(name, Nil)
            timings(name) = ((t2 - t0) / 1e9) :: timings.getOrElse(name, Nil)
          case None =>
            val t0 = System.nanoTime()
            queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
            timings(name) = ((System.nanoTime() - t0) / 1e9) :: timings.getOrElse(name, Nil)
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          failures(name) = e.toString.takeWhile(_ != '\n').take(200)
          timings.remove(name); initT.remove(name); serveT.remove(name)
      }
      sweep(spark)
    }
    def median(xs: List[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    val stored = initT.keys.map(n => n -> (median(initT(n)), median(serveT(n)))).toMap
    (names.filter(timings.contains).map(n => n -> median(timings(n))), stored, failures.toMap)
  }
}
