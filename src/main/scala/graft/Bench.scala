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
    // Mover auto-audit (the round-6 protocol, mechanized): any query
    // whose in-suite median moved >2× against the previous committed
    // full-suite artifact re-runs ISOLATED (median-of-3, swept block
    // manager, nothing interleaved) in the same JVM — in-suite numbers
    // swing with suite-neighborhood GC pressure, isolated medians are
    // the comparable per-query basis, and recording both lets the
    // load-vs-plan verdict land without a by-hand re-measure.
    val isolated = moverIsolated(spark, sfDir, selected, results.toMap)
    def jnum(v: Double) = if (v.isNaN || v.isInfinite) "null" else v.toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val ss = stored.toSeq.sortBy(_._1).map { case (k, (i, sv)) =>
      s"\"$k\":{\"init_s\":${jnum(i)},\"serve_s\":${jnum(sv)}}"
    }.mkString("{", ",", "}")
    val is = isolated.toSeq.sortBy(_._1).map { case (k, (su, pr, iso)) =>
      s"\"$k\":{\"suite_s\":${jnum(su)},\"prev_s\":${jnum(pr)},\"isolated_s\":${jnum(iso)}}"
    }.mkString("{", ",", "}")
    val fs = failures.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + "\"" + v.replace("\"", "'") + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"stored":$ss,"isolated":$is,"failed":$fs,"sf":"$sfDir"}"""
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

  /** The previous committed full-suite artifact to diff movers against:
    * SPARK_GRAFT_BENCH_BASELINE wins, else the highest-numbered
    * `bench_full_r<N>.json` in the CWD (the per-round committed copy). */
  private def prevArtifact(): Option[java.nio.file.Path] =
    sys.env.get("SPARK_GRAFT_BENCH_BASELINE")
      .map(java.nio.file.Paths.get(_)).filter(java.nio.file.Files.exists(_))
      .orElse {
        val rx = """bench_full_r(\d+)\.json""".r
        Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
          .flatMap(f => f.getName match {
            case rx(n) => Some(n.toInt -> f.toPath)
            case _ => None
          }).sortBy(_._1).lastOption.map(_._2)
      }

  /** The flat `"queries":{…}` object of a bench artifact — a minimal
    * pluck (values are plain numbers, no nesting inside the object). */
  private def prevQueries(p: java.nio.file.Path): Map[String, Double] = {
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt)
      .fold(Map.empty[String, Double]) { m =>
        """"([^"]+)":([-0-9.eE+]+)""".r.findAllMatchIn(m.group(1))
          .map(x => x.group(1) -> x.group(2).toDouble).toMap
      }
  }

  /** Isolated median-of-3 re-measures for every >2× mover vs the
    * previous artifact, capped at the 8 worst (a pathological round must
    * not double the bench); returns name → (suite_s, prev_s, isolated_s). */
  private def moverIsolated(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
      suite: Map[String, Double]): Map[String, (Double, Double, Double)] =
    prevArtifact().map(prevQueries).filter(_.nonEmpty).fold(
        Map.empty[String, (Double, Double, Double)]) { prev =>
      val movers = suite.toSeq
        .flatMap { case (n, s) => prev.get(n).map(p => (n, s, p, s / p)) }
        .filter { case (_, _, _, r) => r > 2.0 || r < 0.5 }
        .sortBy { case (_, _, _, r) => -math.max(r, 1.0 / r) }
      val kept = movers.take(8)
      if (movers.size > kept.size)
        System.err.println(s"[bench] mover audit capped at 8 of ${movers.size}")
      kept.map { case (n, s, p, _) =>
        System.err.println(f"[bench] mover $n: suite $s%.2f vs prev $p%.2f — isolated re-measure")
        val (res, _, _) = run(spark, sfDir, Map(n -> queries(n)), runs = 3,
          SparkEntry.phasedQueries)
        n -> (s, p, res.headOption.map(_._2).getOrElse(Double.NaN))
      }.toMap
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
