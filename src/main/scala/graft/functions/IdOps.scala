package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed id generation (SURVEY §2 P17). The reference mints random
 * ids per new story (`services/streaming-pipeline/duplication_service.py:87`,
 * `str(ObjectId())`); Spark's built-in `uuid()` covers that shape
 * ([[ids.uuid4]]). For a 100 TB pipeline the better default is the
 * content-addressed form: re-ingesting the same document yields the same
 * id, so dedup and upsert stay idempotent with no coordination — and the
 * id is reproducible by any engine that can md5 (oracle-checkable).
 */
object ids {

  /** Random UUIDv4 per row — the reference's `ObjectId()` shape.
    * Nondeterministic by design; use [[contentUuid]] when idempotent
    * re-ingestion matters. */
  def uuid4(): Column = expr("uuid()")

  /**
   * Global 1-based sequence in `orderCol` order WITHOUT the
   * single-partition window a naive `row_number() OVER (ORDER BY ...)`
   * collapses to. Range-partition + in-partition sort puts rows in
   * global order; `monotonically_increasing_id` (partition id in the
   * high bits, in-partition position in the low 33) then numbers them
   * with NO window and no second full-data exchange — the sequence is
   * local position + a broadcast per-partition offset (counts cumsum;
   * one tiny row per partition at any scale).
   *
   * The ranged data is `localCheckpoint`ed: both the offsets branch and
   * the output read ONE materialization, so the range partitioner's
   * order-sensitive boundary sampling cannot disagree between them when
   * the upstream row order is nondeterministic (post-shuffle inputs).
   * Costs one eager materialization; blocks live in executor storage.
   * Equals the global row_number when `orderCol` is unique.
   */
  def orderedSeqId(df: DataFrame, orderCol: String, idName: String = "seq_id"): DataFrame = {
    val ranged = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
      .localCheckpoint()
    val withMid = ranged.withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__loc", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
    val offsets = withMid.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(sum(col("__n")).over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    withMid.join(broadcast(offsets), "__pid")
      .withColumn(idName, col("__loc") + col("__offset") + 1)
      .drop("__mid", "__pid", "__loc", "__offset")
  }

  /**
   * RFC 4122 name-based (v3) UUID from the column's md5: version nibble
   * forced to `3`, variant nibble to `8..b`. Pure codegen'd string/math
   * columns over one md5 — embarrassingly parallel, no state, no
   * coordination, stable under retries and re-partitioning.
   */
  def contentUuid(c: Column): Column = {
    val h = md5(c)
    val d = conv(substring(h, 17, 1), 16, 10).cast("int")
    val variant = element_at(lit(Array("8", "9", "a", "b")), pmod(d, lit(4)) + 1)
    concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("3"), substring(h, 14, 3)),
      concat(variant, substring(h, 18, 3)),
      substring(h, 21, 12))
  }
}
