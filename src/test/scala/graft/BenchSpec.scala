package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must surface crashed queries explicitly — a
  * regression that makes a query throw must not shrink the total. */
class BenchSpec extends AnyFunSuite with SparkSpec {

  test("poisoned query lands in failures, healthy queries still timed") {
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "ok_query" -> ((s, _) => s.range(100).toDF("n")),
      "poisoned" -> ((_, _) => throw new RuntimeException("boom")))
    val (results, stored, failures) = Bench.run(spark, sf(), qs, runs = 2)
    assert(results.map(_._1) === Seq("ok_query"))
    assert(results.head._2 > 0.0)
    assert(stored.isEmpty, "no stored-family names in this query set")
    assert(failures.keySet === Set("poisoned"))
    assert(failures("poisoned").contains("boom"))
  }

  test("stored-family queries get split init/serve timings that sum to the total") {
    val phasedName = "x_quantile_store" // a SparkEntry.phasedQueries member
    val qs = SparkEntry.selectQueries(phasedName)
    val (results, stored, failures) =
      Bench.run(spark, sf(), qs, runs = 1, SparkEntry.phasedQueries)
    assert(failures.isEmpty, s"failures: $failures")
    assert(results.map(_._1) === Seq(phasedName))
    val (init, serve) = stored(phasedName)
    assert(init > 0.0 && serve > 0.0)
    val total = results.head._2
    assert(math.abs(init + serve - total) < 0.05 * total + 0.01,
      s"split must sum to the recorded total: $init + $serve vs $total")
  }

  test("mover-audit parsing: nested stored object plucks whole; legs parse; 1.5x trigger") {
    val art = """{"metric":"total","value":9.9,"queries":{"a":1.5,"b":2.25},""" +
      """"stored":{"s1":{"init_s":4.0,"serve_s":2.0},"s2":{"init_s":null,"serve_s":1.0}},""" +
      """"isolated":{},"failed":{},"sf":"x"}"""
    val p = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.writeString(p, art)
    assert(Bench.pluckObject(art, "stored").get ===
      """{"s1":{"init_s":4.0,"serve_s":2.0},"s2":{"init_s":null,"serve_s":1.0}}""",
      "balanced-brace pluck must keep the nested entries")
    assert(Bench.prevQueries(p) === Map("a" -> 1.5, "b" -> 2.25))
    val st = Bench.prevStored(p)
    assert(st("s1") === ((4.0, 2.0)))
    assert(st("s2")._1.isNaN && st("s2")._2 === 1.0,
      "a null leg parses to NaN, not a crash")
    // The widened trigger: 1.94x (the round-16 escapee) now trips.
    assert(Bench.moved(21.46, 11.04), "1.94x must trip the 1.5x trigger")
    assert(Bench.moved(1.0, 2.0), "shrink past 1/1.5 trips too")
    assert(!Bench.moved(1.4, 1.0), "inside the band stays quiet")
    assert(!Bench.moved(Double.NaN, 1.0) && !Bench.moved(1.0, Double.NaN),
      "NaN legs never trip")
  }

  test("prevArtifact never resolves this run's own output as the baseline") {
    // prevArtifact lists the PROCESS CWD, so plant two fixture
    // artifacts there (numbered far above any real round): with the
    // highest as selfOut the resolver must fall back to the next one —
    // the round-17 orphan case, where a killed run's surviving JVM
    // wrote the current round's artifact first and the final run
    // compared against itself ("no movers").
    val rp7 = java.nio.file.Paths.get("bench_full_r99998.json")
    val rp8 = java.nio.file.Paths.get("bench_full_r99999.json")
    java.nio.file.Files.writeString(rp7, "{}")
    java.nio.file.Files.writeString(rp8, "{}")
    try {
      assert(Bench.prevArtifact(Some(rp8.toString))
        .map(_.getFileName.toString).contains("bench_full_r99998.json"),
        "selfOut must be excluded; the next-highest artifact wins")
      assert(Bench.prevArtifact(None)
        .map(_.getFileName.toString).contains("bench_full_r99999.json"),
        "without selfOut the highest-numbered artifact is the baseline")
    } finally {
      java.nio.file.Files.deleteIfExists(rp7)
      java.nio.file.Files.deleteIfExists(rp8)
      ()
    }
  }

  test("cumulative guard: sub-bar creep vs min of recent rounds trips; improvements don't") {
    // The r16→r18 shape: each step under 1.5×, cumulative 1.6× — the
    // per-round audit is blind to it, the min-of-recent guard is not.
    val r16 = Map("creep" -> 8.0, "flat" -> 5.0, "faster" -> 9.0)
    val r17 = Map("creep" -> 10.0, "flat" -> 5.2, "faster" -> 8.0)
    val cur = Map("creep" -> 12.9, "flat" -> 5.1, "faster" -> 4.0,
      "new_q" -> 3.0, "nan_q" -> Double.NaN)
    val cm = Bench.cumMoversOf(cur, Seq(r17, r16))
    assert(cm.keySet === Set("creep"), s"got: $cm")
    assert(cm("creep") === ((12.9, 8.0)), "min across rounds is the basis")
    // No recent artifacts → no cum movers (round 1 posture).
    assert(Bench.cumMoversOf(cur, Nil).isEmpty)
  }

  test("prevArtifacts orders newest-first and excludes self") {
    val rp7 = java.nio.file.Paths.get("bench_full_r99998.json")
    val rp8 = java.nio.file.Paths.get("bench_full_r99999.json")
    java.nio.file.Files.writeString(rp7, "{}")
    java.nio.file.Files.writeString(rp8, "{}")
    try {
      val names = Bench.prevArtifacts(Some(rp8.toString))
        .map(_.getFileName.toString)
      assert(names.head === "bench_full_r99998.json")
      assert(!names.contains("bench_full_r99999.json"), "self excluded")
      // The real committed artifacts follow, still newest-first.
      assert(names.tail.headOption.forall(_.startsWith("bench_full_r")))
    } finally {
      java.nio.file.Files.deleteIfExists(rp7)
      java.nio.file.Files.deleteIfExists(rp8)
      ()
    }
  }

  test("median of 3 runs discards a single outlier pass") {
    // Warm the plan path so the cold-start pass is not itself an outlier.
    spark.range(10).toDF("n").write.format("noop").mode("overwrite").save()
    var call = 0
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "q" -> ((s, _) => {
        call += 1
        // Second pass simulates a load spike with a sleep.
        if (call == 2) Thread.sleep(3000)
        s.range(10).toDF("n")
      }))
    val (results, _, _) = Bench.run(spark, sf(), qs, runs = 3)
    assert(results.head._2 < 3.0, s"median should not absorb the outlier: ${results.head._2}")
  }
}
