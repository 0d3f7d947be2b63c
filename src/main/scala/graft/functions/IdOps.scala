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
   * RFC 4122 name-based (v3) UUID from the column's md5: version nibble
   * forced to `3`, variant nibble to `8..b`. Pure codegen'd string/.math
   * columns over one md5 — embarrassingly parallel, no state, no
   * coordination, stable under retries and re-partitioning.
   */
  /**
   * Global 1-based sequence in `orderCol` order WITHOUT the
   * single-partition window a naive `row_number() OVER (ORDER BY ...)`
   * collapses to: range-partition on the order column, number rows
   * inside each partition, then add broadcast per-partition offsets
   * (one tiny row per partition, cumulated driver-free by a window over
   * the partition counts). The row numbering is parallel everywhere; the
   * only single-partition step is the offsets cumsum, whose input is one
   * COUNT row per partition — metadata-sized at any scale. Equals the
   * global row_number when `orderCol` is unique.
   */
  def orderedSeqId(df: DataFrame, orderCol: String, idName: String = "seq_id"): DataFrame = {
    val ranged = df.repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(sum(col("__n")).over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    ranged.join(broadcast(offsets), "__pid")
      .withColumn(idName,
        row_number().over(Window.partitionBy("__pid").orderBy(orderCol)).cast("long")
          + col("__offset"))
      .drop("__pid", "__offset")
  }

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
