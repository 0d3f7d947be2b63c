package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins and sessionization — the three time-series operators the
 * reference's event surface implies (`events(ts, user_id, …)` feeding
 * freshness/recency logic, e.g. recommendation-trainer's decay over event
 * time) but that Spark has no native operator for. Each is built as a
 * composition of one shuffle's worth of exchange + sort, never a
 * cross-product:
 *
 *  - [[asofJoin]]: for every left row, the latest right row at-or-before
 *    its timestamp (per key). ONE hash exchange on the key + one sort —
 *    no join node at all: both sides union into a single time-ordered
 *    stream and a running `last(payload, ignoreNulls)` window carries the
 *    most recent right payload forward onto each left row.
 *  - [[rangeJoin]]: points-to-intervals join on an equi-key plus
 *    `start <= t < end`. Naive Spark resolves this as a cross join with a
 *    post-filter (quadratic per key); here both sides are mapped onto a
 *    fixed time grid — a point lands in exactly ONE bucket, an interval
 *    replicates to the few buckets it overlaps — so the range condition
 *    rides a plain equi-join on (key, bucket) and each qualifying pair is
 *    produced exactly once, no dedup pass.
 *  - [[sessionize]]: gap-based session ids per key (new session when the
 *    gap to the previous event exceeds `gapMicros`) — lag + running sum
 *    over one window spec, so both expressions share a single exchange +
 *    sort.
 *
 * Scale posture (100 TB): all three partition by the join/session key, so
 * parallelism is the key cardinality — millions of users spread evenly.
 * Per-key work is a sequential scan of that key's time-ordered rows,
 * which is inherent to the semantics (order matters), so a single
 * pathological key serializes only its own rows. Salting does NOT apply
 * here (it would break time order); the mitigation for a genuinely
 * monstrous key is range-partitioning by (key, coarse time bucket) with
 * boundary carry-over, which asofJoin's union shape admits naturally —
 * left as the documented escalation, not built, because key-skew in
 * event streams is bounded by per-user activity.
 */
object TemporalOps {

  private val T = "__graft_asof_t"
  private val S = "__graft_asof_side"
  private val P = "__graft_asof_payload"

  /**
   * As-of join: every `left` row gains the payload of the most recent
   * `right` row with the same `keys` and `right(rightTime) <=
   * left(leftTime)` (inclusive), or nulls when no such row exists (left
   * semantics). Payload = every right column except the keys (the right
   * time column rides along, so callers see WHICH row matched).
   *
   * Right column names (beyond the keys) must not collide with left
   * column names — rename before calling (`ts` → `quote_ts`). The right
   * side must be unique per (keys, rightTime): among duplicates the
   * carried row is tie-ambiguous, exactly as it is in any as-of engine —
   * pre-aggregate (`groupBy(keys, time).agg(max …)`) to pin it.
   *
   * Plan: unionByName → Exchange(hash keys) → Sort(keys, t, side) →
   * Window(last ignoreNulls) → Filter(side = left). Right rows sort
   * BEFORE left rows at an equal timestamp (side 0 < 1), which is what
   * makes the match inclusive.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi-key")
    val payload = right.columns.filterNot(keys.contains).toSeq
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"asofJoin right payload columns collide with left: ${clash.mkString(", ")} — rename the right side")
    val r = right
      .select(keys.map(col) ++ Seq(col(rightTime).as(T), struct(payload.map(col): _*).as(P)): _*)
      .withColumn(S, lit(0))
    val l = left.withColumn(T, col(leftTime)).withColumn(S, lit(1))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(T), col(S))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(P, last(col(P), ignoreNulls = true).over(w))
      .where(col(S) === 1)
      .select(left.columns.map(col) ++ payload.map(c => col(s"$P.$c").as(c)): _*)
  }

  /**
   * Interval (range) join: all (point, interval) pairs sharing `keys`
   * with `start <= pointTime < end` — inner semantics; compose a left
   * join back onto the interval side for keep-empty aggregations.
   * Output = every point column + every non-key interval column (names
   * must be disjoint; rename the interval side first).
   *
   * `bucketMicros` is the grid width: each interval fans out to
   * `len/bucketMicros + 1` grid cells, so set it near the TYPICAL
   * interval length (fan-out ≈ 2) — shuffle volume is then
   * O(points + 2·intervals), versus the O(points × intervals-per-key)
   * cross-join Spark would otherwise plan for the inequality predicate.
   *
   * `maxCellsPerInterval` is the fan-out guard: one interval spanning
   * ≫ bucketMicros would otherwise explode its `sequence()` silently
   * into millions of replica rows (a year-long interval on a one-minute
   * grid is ~526k cells — per interval row). The guard fails the job
   * loudly IN-PLAN (codegen `raise_error`, no extra pass) with the
   * observed fan-out and the bucket-size fix, the moment the first
   * offending interval is scanned.
   */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointTime: String, startCol: String, endCol: String,
                bucketMicros: Long, maxCellsPerInterval: Int = 4096): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one equi-key")
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    require(maxCellsPerInterval >= 2,
      s"maxCellsPerInterval must allow the boundary cell: $maxCellsPerInterval")
    val ivPayload = intervals.columns.filterNot(keys.contains).toSeq
    val clash = ivPayload.toSet.intersect(points.columns.toSet)
    require(clash.isEmpty,
      s"rangeJoin interval columns collide with points: ${clash.mkString(", ")} — rename the interval side")
    val B = "__graft_range_bucket"
    // Point → its single grid cell; interval → every cell it overlaps
    // (end is exclusive, but the extra boundary cell the ceil-free
    // sequence can add is harmless — the exact predicate prunes it).
    val p = points.withColumn(B, floor(unix_micros(col(pointTime)) / bucketMicros)).alias("__p")
    val startB = floor(unix_micros(col(startCol)) / bucketMicros)
    val endB = floor(unix_micros(col(endCol)) / bucketMicros)
    val fanOut = endB - startB + lit(1L)
    val guarded = when(fanOut > lit(maxCellsPerInterval.toLong),
        raise_error(concat(
          lit("rangeJoin: an interval spans "), fanOut.cast("string"),
          lit(s" grid cells (cap $maxCellsPerInterval): ["),
          col(startCol).cast("string"), lit(", "), col(endCol).cast("string"),
          lit(s") vs bucketMicros=$bucketMicros — set bucketMicros near the " +
            "typical interval length, or raise maxCellsPerInterval")))
          .cast("array<bigint>"))
      .otherwise(sequence(startB, endB))
    val iv = intervals.withColumn(B, explode(guarded)).alias("__i")
    val cond = (keys.map(k => col(s"__p.$k") === col(s"__i.$k")) ++ Seq(
        col(s"__p.$B") === col(s"__i.$B"),
        col(s"__p.$pointTime") >= col(s"__i.$startCol"),
        col(s"__p.$pointTime") < col(s"__i.$endCol"))).reduce(_ && _)
    p.join(iv, cond)
      .select(points.columns.map(c => col(s"__p.$c")) ++ ivPayload.map(c => col(s"__i.$c")): _*)
  }

  /**
   * Gap-based sessionization: within each `keys` group ordered by
   * (`timeCol`, tieBreak…), a new session starts when the gap to the
   * previous row exceeds `gapMicros` (strictly). Adds `sessionCol` — a
   * per-key session sequence number starting at 1 — to every input row;
   * aggregate downstream for session summaries. Supply a `tieBreak`
   * (e.g. the event id) whenever timestamps can collide, so the running
   * sum is deterministic.
   *
   * The streaming twin is [[graft.streaming.ArticleStream.sessionCounts]]
   * (`session_window(ts, gap)`). One boundary nuance separates them: this
   * sessionizer breaks on strictly-greater-than-gap (an exactly-at-gap
   * event stays in-session), Spark's `session_window` merges on
   * strictly-less (an exactly-at-gap event starts a new one) — pick a gap
   * finer than the timestamp granularity and the assignments coincide on
   * every log (StreamingSpec replays one through both).
   */
  def sessionize(events: DataFrame, keys: Seq[String], timeCol: String,
                 gapMicros: Long, tieBreak: Seq[Column] = Nil,
                 sessionCol: String = "session_seq"): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key")
    require(gapMicros > 0, s"gapMicros must be positive: $gapMicros")
    val BRK = "__graft_sess_brk"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol) +: tieBreak: _*)
    val prev = lag(col(timeCol), 1).over(w)
    events
      .withColumn(BRK, when(prev.isNull ||
        unix_micros(col(timeCol)) - unix_micros(prev) > gapMicros, 1L).otherwise(0L))
      .withColumn(sessionCol,
        sum(col(BRK)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop(BRK)
  }
}
