package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class TemporalOpsSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: inclusive at equal timestamps, latest-before otherwise, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")),   // exactly at a right row → inclusive
      (2L, "u", ts("2024-01-01 10:30:00")),   // between rights → the 10:00 one
      (3L, "u", ts("2024-01-01 09:00:00")),   // before any right → nulls
      (4L, "v", ts("2024-01-01 12:00:00"))    // key with no right rows → nulls
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u", ts("2024-01-01 10:00:00"), 1.0),
      ("u", ts("2024-01-01 11:00:00"), 2.0)
    ).toDF("k", "rt", "rv")
    val got = TemporalOps.asofJoin(left, right, Seq("k"), "t", "rt")
      .orderBy("id").collect()
    assert(got(0).getAs[Double]("rv") == 1.0)       // 10:00 matches 10:00 (>=)
    assert(got(1).getAs[Double]("rv") == 1.0)       // 10:30 carries 10:00 forward
    assert(got(1).getAs[Timestamp]("rt") == ts("2024-01-01 10:00:00"))
    assert(got(2).isNullAt(got(2).fieldIndex("rv"))) // 09:00 precedes all
    assert(got(3).isNullAt(got(3).fieldIndex("rv"))) // unseen key
  }

  test("asofJoin: payload column collisions are rejected loudly") {
    import spark.implicits._
    val l = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val r = Seq(("u", ts("2024-01-01 09:00:00"))).toDF("k", "t")
    val e = intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(l, r, Seq("k"), "t", "t")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asofJoin: one exchange, no join node") {
    import spark.implicits._
    val l = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val r = Seq(("u", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "rt", "rv")
    val plan = TemporalOps.asofJoin(l, r, Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin must not plan a join node:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$plan")
  }

  test("rangeJoin: start inclusive, end exclusive, grid boundaries exact") {
    import spark.implicits._
    // Interval [10:00, 10:30) with bucket width = 30 min: points at the
    // exact start (in), one µs before end (in), exactly at end (out),
    // and on the 10:15 grid-interior (in).
    val points = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")),
      (2L, "u", Timestamp.from(ts("2024-01-01 10:30:00").toInstant.minusNanos(1000))),
      (3L, "u", ts("2024-01-01 10:30:00")),
      (4L, "u", ts("2024-01-01 10:15:00")),
      (5L, "w", ts("2024-01-01 10:15:00"))   // right key-range, wrong key
    ).toDF("pid", "k", "t")
    val iv = Seq(("u", 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
      .toDF("k", "win", "s", "e")
    val got = TemporalOps.rangeJoin(points, iv, Seq("k"), "t", "s", "e",
      bucketMicros = 30L * 60 * 1000000).select("pid").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 4L))
  }

  test("rangeJoin: interval spanning buckets matches each point exactly once") {
    import spark.implicits._
    // Tiny bucket (1 min) → the 30-min interval fans out to 31 cells;
    // every contained point must still appear exactly once.
    val points = (0 until 30).map(m => (m.toLong, "u", ts(f"2024-01-01 10:$m%02d:00")))
      .toDF("pid", "k", "t")
    val iv = Seq(("u", 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
      .toDF("k", "win", "s", "e")
    val got = TemporalOps.rangeJoin(points, iv, Seq("k"), "t", "s", "e",
      bucketMicros = 60L * 1000000).groupBy("pid").count().collect()
    assert(got.length == 30 && got.forall(_.getLong(1) == 1L))
  }

  test("rangeJoin: a pathological interval fails loudly at the fan-out cap") {
    import spark.implicits._
    // One-minute grid, one-YEAR interval → ~526k cells per replica row;
    // the guard must kill the job with the observed fan-out and the fix,
    // not silently explode the sequence.
    val points = Seq((1L, "u", ts("2024-06-01 10:00:00"))).toDF("pid", "k", "t")
    val iv = Seq(("u", 1L, ts("2024-01-01 00:00:00"), ts("2025-01-01 00:00:00")))
      .toDF("k", "win", "s", "e")
    val e = intercept[Exception] {
      TemporalOps.rangeJoin(points, iv, Seq("k"), "t", "s", "e",
        bucketMicros = 60L * 1000000).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("grid cells") && msg.contains("bucketMicros"),
      s"guard must name the fan-out and the fix: $e")
    // A wide-but-capped grid still works when the cap is raised to fit.
    val ok = TemporalOps.rangeJoin(points, iv, Seq("k"), "t", "s", "e",
      bucketMicros = 60L * 1000000, maxCellsPerInterval = 600000)
      .select("pid").as[Long].collect()
    assert(ok.toSeq == Seq(1L))
  }

  test("sessionize: strict gap — exactly-at-gap stays in session, one past breaks") {
    import spark.implicits._
    val gap = 30L * 60 * 1000000
    val ev = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")),
      (2L, "u", ts("2024-01-01 10:30:00")),  // gap == 30 min → same session
      (3L, "u", Timestamp.from(ts("2024-01-01 11:00:00").toInstant.plusNanos(1000))), // 30 min + 1 µs → new
      (4L, "z", ts("2024-01-01 10:00:00"))   // other key starts at 1
    ).toDF("id", "k", "t")
    val got = TemporalOps.sessionize(ev, Seq("k"), "t", gap, tieBreak = Seq(col("id")))
      .orderBy("id").select("session_seq").as[Long].collect()
    assert(got.toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("sessionize equals the O(n²) definition on a replayable sample") {
    import spark.implicits._
    val gap = 10L * 1000000 // 10 s
    val rng = new scala.util.Random(9)
    val rows = (0 until 400).map { i =>
      (i.toLong, s"u${rng.nextInt(5)}", new Timestamp(1700000000000L + rng.nextInt(2000) * 1000L))
    }
    val got = TemporalOps.sessionize(rows.toDF("id", "k", "t"), Seq("k"), "t", gap,
        tieBreak = Seq(col("id")))
      .select("id", "session_seq").as[(Long, Long)].collect().toMap
    // Reference: per key, sort by (t, id), count strict-gap breaks.
    val expected = rows.groupBy(_._2).flatMap { case (_, ks) =>
      val sorted = ks.sortBy(r => (r._3.getTime, r._1))
      var sid = 0L; var prev: Option[Timestamp] = None
      sorted.map { r =>
        if (prev.forall(p => (r._3.getTime - p.getTime) * 1000L > gap)) sid += 1
        prev = Some(r._3); r._1 -> sid
      }
    }
    assert(got == expected)
  }

  test("sessionize: lag and running sum share one exchange and one sort") {
    import spark.implicits._
    val ev = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val plan = TemporalOps.sessionize(ev, Seq("k"), "t", 1000000L, Seq(col("id")))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert("[^a-zA-Z]Sort ".r.findAllIn(plan).length == 1, plan)
  }
}
