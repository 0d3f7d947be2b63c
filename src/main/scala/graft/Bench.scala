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
    val (results, failures) = run(spark, sfDir, selected, runs)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failures.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + "\"" + v.replace("\"", "'") + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
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
    * timings (never recorded as ~0 s) and reported by name. */
  def run(spark: SparkSession, sfDir: String,
          queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
          runs: Int): (Seq[(String, Double)], Map[String, String]) = {
    val names = queries.keys.toSeq.sorted
    val timings = collection.mutable.Map.empty[String, List[Double]]
    val failures = collection.mutable.Map.empty[String, String]
    sweep(spark) // warmup queries may have left state too
    for (_ <- 1 to runs; name <- names if !failures.contains(name)) {
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every output column (a bare
      // count() would let Catalyst prune the computation under test).
      try {
        queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        timings(name) = ((System.nanoTime() - t0) / 1e9) :: timings.getOrElse(name, Nil)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          failures(name) = e.toString.takeWhile(_ != '\n').take(200)
          timings.remove(name)
      }
      sweep(spark)
    }
    def median(xs: List[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    (names.filter(timings.contains).map(n => n -> median(timings(n))), failures.toMap)
  }
}
