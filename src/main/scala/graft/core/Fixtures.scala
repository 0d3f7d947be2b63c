package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Declarative fixture-schema normalization — ONE code path for every
 * driver-generated parquet table, replacing the per-table special-case
 * ladder that accumulated one branch per fixture regeneration.
 *
 * The problem it solves: the driver regenerates `/root/testdata` between
 * rounds and the physical parquet encoding drifts (TIMESTAMP(NANOS) in
 * early fixtures → µs-no-timezone in later ones, which Spark 4 loads as
 * TIMESTAMP_NTZ). Every query in [[graft.SparkEntry]] was built against
 * ONE logical schema; this module states that schema per table and casts
 * any compatible physical encoding onto it at load, failing loudly on a
 * genuinely incompatible type so a fixture shift can never again surface
 * as four queries silently missing from a correctness artifact.
 *
 * Normalizations (all exact, no value change):
 *  - TIMESTAMP_NTZ → TIMESTAMP: identity on the wall-clock under the UTC
 *    session every entry point sets — restores the exact column type the
 *    queries were built against, and what DuckDB's µs oracle sees.
 *  - LONG (legacy `nanosAsLong` read of TIMESTAMP(NANOS)) → TIMESTAMP:
 *    integer-divide to µs, `timestamp_micros` — DuckDB truncates the same
 *    way, so engine and oracle agree to the microsecond.
 *  - integral↔integral / fractional↔fractional widenings: plain cast.
 */
object Fixtures {

  /** The logical schema each query set was built against, per table. */
  val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    // o_orderdate/l_shipdate stay NTZ (naive wall-clock): queries that
    // output them raw (t2_latest_n) must hash-match DuckDB's naive read
    // of the same file; the few temporal computations over them cast
    // explicitly. Only events.ts is promoted to TIMESTAMP — its queries
    // call unix_millis/unix_micros directly, which require LTZ.
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  private def integral(t: DataType) = t match {
    case ByteType | ShortType | IntegerType | LongType => true; case _ => false
  }
  private def fractional(t: DataType) = t match {
    case FloatType | DoubleType => true; case _ => false
  }

  /** Cast one column from its physical fixture type onto the expected
    * logical type, or fail with a message naming table/column/types. */
  private def conform(table: String, name: String,
      actual: DataType, want: DataType): org.apache.spark.sql.Column =
    (actual, want) match {
      case (a, w) if a == w => col(name)
      // µs-no-timezone parquet loads as NTZ; UTC-adjusted loads as LTZ.
      // Under the UTC session both directions are identity wall-clock.
      case (TimestampNTZType, TimestampType) => col(name).cast(TimestampType)
      case (TimestampType, TimestampNTZType) => col(name).cast(TimestampNTZType)
      // TIMESTAMP(NANOS) read via legacy nanosAsLong: truncate to µs,
      // exactly DuckDB's behaviour on the same file.
      case (LongType, TimestampType) => timestamp_micros(expr(s"$name div 1000"))
      case (LongType, TimestampNTZType) =>
        timestamp_micros(expr(s"$name div 1000")).cast(TimestampNTZType)
      case (a, w) if (integral(a) && integral(w)) || (fractional(a) && fractional(w)) =>
        col(name).cast(w)
      case (a, w) => throw new IllegalStateException(
        s"fixture table '$table' column '$name' has incompatible type: " +
          s"got $a, queries expect $w — extend Fixtures.conform only if the " +
          "cast is value-exact")
    }

  /** Normalize a loaded fixture DataFrame onto the expected schema.
    * Expected columns come first (declared order); columns the fixture
    * grew that the schema does not know about are preserved after them. */
  def normalize(df: DataFrame, table: String): DataFrame =
    expected.get(table).fold(df) { cols =>
      val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val missing = cols.collect { case (n, _) if !have.contains(n) => n }
      if (missing.nonEmpty) throw new IllegalStateException(
        s"fixture table '$table' is missing expected column(s): ${missing.mkString(", ")}")
      val known = cols.map(_._1).toSet
      val normalized = cols.map { case (n, dt) => conform(table, n, have(n), dt).as(n) }
      val extras = df.schema.fieldNames.filterNot(known).map(col)
      df.select(normalized ++ extras: _*)
    }

  /** Load `$dir/$table.parquet` and normalize. The legacy nanos conf is
    * set before every read — it only affects TIMESTAMP(NANOS) columns
    * (which Spark 4 otherwise refuses to read at all), a no-op on current
    * fixtures, and it keeps the pre-regeneration encoding loadable. */
  def load(spark: SparkSession, dir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.read.parquet(s"$dir/$table.parquet"), table)
  }
}
