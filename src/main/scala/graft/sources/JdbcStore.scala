package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.{Connection, DriverManager, PreparedStatement}

/**
 * Relational-store surface (reference S8: the Postgres scan / upsert /
 * processed-flag sites in bias_detection_service.py:82-117,190-205 and
 * user_behaviour_service.py). Spark-first shape:
 *
 *  - reads go through `spark.read.jdbc` so filters/projections push into
 *    the database, and large tables read in parallel via
 *    `partitionColumn` range-splitting (each executor opens its own
 *    cursor over a key range — no single-connection bottleneck);
 *  - writes that need MERGE semantics (`ON CONFLICT DO UPDATE`) run as
 *    executor-side batched prepared statements in `foreachPartition` —
 *    Spark's own `write.jdbc` only appends/overwrites. Rows never
 *    collect to the driver; each partition streams its rows through one
 *    connection with `addBatch`/`executeBatch`.
 *
 * Dialect is chosen from the JDBC URL: Postgres uses
 * `INSERT .. ON CONFLICT (k) DO UPDATE SET c = EXCLUDED.c` (the exact
 * reference statement), everything else (incl. Derby, which the tests
 * run embedded) uses ANSI `MERGE INTO .. USING (VALUES ..)`.
 *
 * At 100 TB scale the database is the bottleneck, not Spark: the knobs
 * that matter are `numPartitions` (concurrent writers the DB can take)
 * and `batchSize` (rows per network round-trip), both exposed.
 */
object JdbcStore {

  /** Scan a table with pushed-down filter, optionally range-partitioned
    * for parallel read (reference `SELECT * FROM logs WHERE
    * processed_for_bias = FALSE`). `predicate` lands in the JDBC WHERE
    * clause via Catalyst JDBC pushdown. */
  def readTable(spark: SparkSession, url: String, table: String,
                partitionColumn: Option[(String, Long, Long, Int)] = None,
                props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withProps = props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
    partitionColumn.fold(withProps) { case (c, lo, hi, n) =>
      withProps.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }.load()
  }

  /** Unprocessed-rows scan (bias_detection_service.py:88-96): boolean
    * flag filter, pushed to the database. */
  def readUnprocessed(spark: SparkSession, url: String, table: String,
                      flagCol: String): DataFrame =
    readTable(spark, url, table).filter(!col(flagCol))

  /**
   * MERGE-shape upsert: insert each row of `df`, updating all non-key
   * columns on key conflict (bias_detection_service.py:190-205). Runs on
   * the executors, batched; `numPartitions` caps concurrent connections.
   */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             batchSize: Int = 500, numPartitions: Int = 8): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    val updCols = cols.filterNot(keys.contains)
    require(keys.forall(cols.contains), s"keys $keys must be columns of $df")
    val idx = cols.zipWithIndex.toMap
    // (sql, field order of the ?-placeholders)
    val (sql, order) =
      if (url.startsWith("jdbc:postgresql"))
        // all-key rows have nothing to update — an empty SET list is a
        // syntax error, and presence tables (keys == all columns) are a
        // legitimate shape: conflict means "already present", do nothing
        (if (updCols.isEmpty)
          s"""INSERT INTO $table (${cols.mkString(", ")})
             |VALUES (${cols.map(_ => "?").mkString(", ")})
             |ON CONFLICT (${keys.mkString(", ")}) DO NOTHING""".stripMargin
        else
          s"""INSERT INTO $table (${cols.mkString(", ")})
             |VALUES (${cols.map(_ => "?").mkString(", ")})
             |ON CONFLICT (${keys.mkString(", ")}) DO UPDATE SET
             |${updCols.map(c => s"$c = EXCLUDED.$c").mkString(", ")}""".stripMargin,
          cols)
      else {
        // ANSI MERGE keyed off the one-row dummy table (Derby disallows a
        // VALUES source); parameters are CAST so the ON clause is typed.
        def p(c: String) = s"CAST(? AS ${sqlType(schema(idx(c)).dataType)})"
        val matched =
          if (updCols.isEmpty) "" // empty UPDATE SET is a syntax error
          else s"""|WHEN MATCHED THEN UPDATE SET
                   |  ${updCols.map(c => s"$c = ${p(c)}").mkString(", ")}
                   |""".stripMargin
        (s"""MERGE INTO $table t USING SYSIBM.SYSDUMMY1
            |ON ${keys.map(k => s"t.$k = ${p(k)}").mkString(" AND ")}
            |${matched}WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
            |  VALUES (${cols.map(p).mkString(", ")})""".stripMargin,
          keys ++ updCols ++ cols)
      }
    val fieldOrder = order.map(idx)
    runBatched(df, numPartitions, url, sql, batchSize) { (ps, row) =>
      fieldOrder.zipWithIndex.foreach { case (f, i) =>
        bindField(ps, row, schema, f, i + 1)
      }
    }
  }

  /** Derby/ANSI type name for CAST of a ?-parameter. */
  private def sqlType(dt: DataType): String = dt match {
    case IntegerType    => "INTEGER"
    case LongType       => "BIGINT"
    case DoubleType     => "DOUBLE"
    case FloatType      => "REAL"
    case BooleanType    => "BOOLEAN"
    case StringType     => "VARCHAR(32672)"
    case TimestampType  => "TIMESTAMP"
    case DateType       => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(s"unsupported JDBC type $other")
  }

  /** Set a boolean flag on the rows whose keys appear in `keyRows`
    * (mark_log_as_processed, bias_detection_service.py:104-117) —
    * batched executor-side UPDATEs over the key frame. */
  def markProcessed(keyRows: DataFrame, url: String, table: String,
                    flagCol: String, keys: Seq[String],
                    batchSize: Int = 500, numPartitions: Int = 8): Unit = {
    val keyDf = keyRows.select(keys.map(col): _*)
    val schema = keyDf.schema
    val sql = s"UPDATE $table SET $flagCol = ? WHERE " +
      keys.map(k => s"$k = ?").mkString(" AND ")
    runBatched(keyDf, numPartitions, url, sql, batchSize) { (ps, row) =>
      ps.setBoolean(1, true)
      schema.fields.indices.foreach(i => bindField(ps, row, schema, i, i + 2))
    }
  }

  /** Per-partition connection + prepared-statement batching. One commit
    * per partition: a retried Spark task re-runs the whole batch, which
    * the idempotent MERGE/UPDATE statements absorb. */
  private def runBatched(df: DataFrame, numPartitions: Int, url: String,
                         sql: String, batchSize: Int)
                        (bind: (PreparedStatement, Row) => Unit): Unit = {
    val parts = math.min(numPartitions, math.max(1, df.rdd.getNumPartitions))
    df.coalesce(parts).foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { row =>
            bind(ps, row)
            ps.addBatch()
            n += 1
            if (n % batchSize == 0) ps.executeBatch()
          }
          ps.executeBatch()
          conn.commit()
          ps.close()
        } finally conn.close()
      }
    }
  }

  /** Bind row field `i` to placeholder `p`. */
  private def bindField(ps: PreparedStatement, row: Row, schema: StructType,
                        i: Int, p: Int): Unit = {
    if (row.isNullAt(i)) ps.setNull(p, java.sql.Types.NULL)
    else schema.fields(i).dataType match {
      case IntegerType   => ps.setInt(p, row.getInt(i))
      case LongType      => ps.setLong(p, row.getLong(i))
      case DoubleType    => ps.setDouble(p, row.getDouble(i))
      case FloatType     => ps.setFloat(p, row.getFloat(i))
      case BooleanType   => ps.setBoolean(p, row.getBoolean(i))
      case StringType    => ps.setString(p, row.getString(i))
      case TimestampType => ps.setTimestamp(p, row.getTimestamp(i))
      case DateType      => ps.setDate(p, row.getDate(i))
      case _: DecimalType => ps.setBigDecimal(p, row.getDecimal(i))
      case other => throw new IllegalArgumentException(
        s"JdbcStore cannot bind ${schema.fields(i).name}: $other")
    }
  }
}
