package graft

import graft.sources.BucketedParts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Counts row evaluations across the (local-mode, one-JVM) executors —
  * the [[BucketedPartsSpec]] one-evaluation pin's probe. */
object EvalTicker {
  val n = new java.util.concurrent.atomic.AtomicLong(0L)
}

/**
 * The shared bucket-store write path: ONE evaluation of the part frame
 * (the round-16 `df.isEmpty` pre-probe ran aggregated part plans twice —
 * for NgramStore/SpanPosStore COUNT parts, the whole map-side window
 * aggregation per init/append), and the empty-frame layout reconciles
 * to a readable plain parquet dir.
 */
class BucketedPartsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("bparts").toString + "/part"

  private val tick = udf { (x: Long) => EvalTicker.n.incrementAndGet(); x }

  /** An AGGREGATED frame in the store-part shape (h1, __b, c), with a
    * per-input-row evaluation counter upstream of the aggregation. */
  private def countedPart(rows: Long) =
    spark.range(rows).select(tick(col("id")).as("h1"))
      .withColumn("__b", BucketedParts.bucketOf(col("h1"), 8))
      .groupBy("h1", "__b").agg(count(lit(1)).as("c"))

  test("writeBucketed evaluates the part frame exactly once") {
    val path = tmp()
    EvalTicker.n.set(0L)
    BucketedParts.writeBucketed(path, countedPart(500L), 8)
    assert(EvalTicker.n.get() === 500L,
      "the aggregated part plan must run once — the pre-fix isEmpty " +
        "probe made this 1000")
    val back = spark.read.parquet(path)
    assert(back.agg(sum("c")).collect()(0).getLong(0) === 500L)
    assert(back.columns.toSet === Set("h1", "__b", "c"),
      "partition column reconciles back as a data column")
  }

  test("path guard: plain local paths only — explicit schemes and remote resolution both refuse") {
    // An EXPLICIT scheme refuses even when it is file:// — the sibling
    // ledger/meta layer is java.nio over the same string, which would
    // read 'file:/x' as a literal relative dir and split the store.
    val e1 = intercept[IllegalArgumentException](
      BucketedParts.writeBucketed("file://" + tmp(), countedPart(10L), 8))
    assert(e1.getMessage.contains("explicit scheme 'file'"))
    // A path RESOLVING to a remote default FS refuses before any write:
    // a local probe of a remote write would read "empty" and the
    // reconcile would overwrite the data just written.
    val e2 = intercept[IllegalArgumentException](
      BucketedParts.writeBucketed("hdfs://localhost:1/nope", countedPart(10L), 8))
    assert(e2.getMessage.contains("hdfs"))
    // The one accepted form — a plain path under a local default FS —
    // round-trips (pinned by every other test in this suite).
    val ok = tmp()
    BucketedParts.writeBucketed(ok, countedPart(100L), 8)
    assert(spark.read.parquet(ok).agg(sum("c")).collect()(0).getLong(0) === 100L)
  }

  test("empty frame writes once and reconciles to a readable plain layout") {
    val path = tmp()
    EvalTicker.n.set(0L)
    BucketedParts.writeBucketed(path, countedPart(300L).filter(col("c") < 0L), 8)
    assert(EvalTicker.n.get() === 300L,
      "the empty case still evaluates the source exactly once (the " +
        "partitioned write); the limit(0) reconcile collapses to an " +
        "empty LocalRelation, not a second pass")
    val back = BucketedParts.readParts(spark, new java.io.File(path).getParent,
      Seq("part"))
    assert(back.count() === 0L)
    assert(back.columns.toSet === Set("h1", "__b", "c"),
      "schema footer present despite zero rows")
  }
}
