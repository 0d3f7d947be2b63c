package graft.operators

import graft.functions.zorder
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout maintenance: Z-order clustering for multi-dimensional
 * file pruning. A table laid out by ONE sort column prunes range scans
 * on that column perfectly and on every other column not at all; laid
 * out along the Morton curve of two columns, every file's min/max
 * envelope is tight on BOTH, so statistics-based readers (parquet
 * row-group stats, file-level pruning) skip data for predicates on
 * either dimension — the standard lakehouse OPTIMIZE ZORDER trade
 * (partial pruning on all interleaved dims vs perfect on one). This is
 * a MAINTENANCE operator like [[graft.sources.TableSink.rebucket]]: run
 * it when rewriting a table whose read pattern filters several
 * dimensions at once.
 *
 * Bucketization is EQUI-WIDTH integer math — ((x − min)·2^bits) div
 * span — not equi-depth quantiles: exact, one cheap min/max scan (no
 * quantile sketch whose merge order varies), and bit-for-bit
 * replayable by an independent engine. The trade is balance under
 * heavy value skew; for skewed dimensions bucket the rank output of a
 * windowless transform (e.g. a digest) or fall back to the single-dim
 * sort. Exactness bound: span·2^bits must stay within 2^53 (double-
 * exact integers) — the division below is then provably exact.
 */
object LayoutOps {

  /** Exact equi-width bucket ordinal in [0, 2^bits) for x ∈ [min, max].
    * Integer construction: a − (a mod span) is divisible by span, so
    * the double division is exact — no floating floor hazard. */
  def widthBucket(x: Column, minV: Column, maxV: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val span = maxV - minV + lit(1L)
    val a = (x - minV) * lit(1L << bits)
    ((a - pmod(a, span)) / span).cast("long")
  }

  /** The Morton key of two equi-width-bucketed dimensions, with the
    * min/max stats riding the plan as a broadcast 1-row cross join so
    * the whole computation stays lazy and engine-replayable. Output:
    * input columns + (bucketA, bucketB, zval). */
  def zorderKey(df: DataFrame, dimA: String, dimB: String, bits: Int,
                bucketA: String = "bucket_a", bucketB: String = "bucket_b",
                zCol: String = "zval"): DataFrame = {
    val stats = df.agg(
      min(col(dimA)).as("__mina"), max(col(dimA)).as("__maxa"),
      min(col(dimB)).as("__minb"), max(col(dimB)).as("__maxb"))
    df.crossJoin(broadcast(stats))
      .withColumn(bucketA, widthBucket(col(dimA), col("__mina"), col("__maxa"), bits))
      .withColumn(bucketB, widthBucket(col(dimB), col("__minb"), col("__maxb"), bits))
      .withColumn(zCol, zorder.morton(col(bucketA), col(bucketB), bits))
      .drop("__mina", "__maxa", "__minb", "__maxb")
  }

  /** Rewrite `df` clustered along the Z-curve of (dimA, dimB):
    * range-partition by the Morton key into `numFiles` output slices
    * and sort within each, so every written file covers one contiguous
    * curve segment and its min/max stats are tight on both dimensions.
    * The helper returns the frame ready to `.write` (the layout columns
    * are dropped; re-derive with [[zorderKey]] if needed). */
  def zorderBy(df: DataFrame, dimA: String, dimB: String, bits: Int,
               numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    zorderKey(df, dimA, dimB, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("bucket_a", "bucket_b", "zval")
  }
}
