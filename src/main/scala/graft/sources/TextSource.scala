package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Line-oriented text ingestion with a QUARANTINE lane — the format
 * surface a training-data pipeline actually receives (newline-delimited
 * JSON dumps, CSV exports) in front of the engine's parquet-native
 * tables: every input line either parses against the declared schema
 * (→ the good relation) or lands, verbatim, in a reject relation — a
 * malformed line must never poison the run (fail-the-job) OR vanish
 * silently (PERMISSIVE's null-row default).
 *
 * Mechanics: the file is read as raw text and parsed per-row with
 * `from_json` / `from_csv` carrying Spark's corrupt-record column —
 * map-only whole-stage codegen, no driver parsing. (Parsing via
 * `spark.read.json` would also infer-scan the file and its corrupt
 * column carries the filter-without-cache restriction; the
 * text-then-from_json form has neither issue.) The two returned
 * relations are independent scans of the same files — each consumer is
 * a map-only pass; a production ingest materializes `good` through
 * [[TableSink]] and appends `quarantined` to its reject log in the same
 * foreachBatch, so the file is read once per sink, never collected.
 *
 * Reference behavior note: the reference parses feeds in-process and
 * drops failures with a log line (`ingestion_service.py:49-72`); this
 * makes the reject lane a first-class, queryable relation.
 */
object TextSource {

  private val Corrupt = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(Corrupt),
      s"schema already contains $Corrupt")
    schema.add(Corrupt, StringType, nullable = true)
  }

  /** ONE lane-split definition for every reader (batch json, streaming
    * json, csv): the good/quarantine predicates must never drift
    * between forms, or the same line would classify differently in
    * batch vs streaming ingestion. */
  private def splitLanes(lines: DataFrame, parsed: Column, schema: StructType)
      : (DataFrame, DataFrame) = {
    val withR = lines.select(col("value"), parsed.as("r"))
    val good = withR.where(col(s"r.$Corrupt").isNull && col("r").isNotNull)
      .select(schema.fieldNames.map(f => col(s"r.`$f`")).toIndexedSeq: _*)
    val quarantined = withR
      .where(col(s"r.$Corrupt").isNotNull || col("r").isNull)
      .select(col("value").as("raw_line"))
    (good, quarantined)
  }

  private def jsonParsed(schema: StructType): Column =
    from_json(col("value"), withCorrupt(schema),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt))

  /** (good, quarantined) from newline-delimited JSON. `good` has
    * exactly `schema`'s columns; `quarantined` is (raw_line). A line
    * is quarantined if it is not valid JSON OR any declared field
    * fails its type (PERMISSIVE per-field null + corrupt marker). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) =
    splitLanes(spark.read.textFile(path).toDF("value"),
      jsonParsed(schema), schema)

  /** Streaming [[readJsonl]] — the drop-folder ingest shape (files land
    * in a directory, every line flows into exactly one lane, the
    * quarantine is a queryable stream too). Same per-row parse; pair
    * with `Admission.stream` downstream for exactly-once admission of
    * the good lane. */
  def streamJsonl(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) =
    splitLanes(spark.readStream.text(path).toDF("value"),
      jsonParsed(schema), schema)

  /** (good, quarantined) from headerless CSV lines against `schema` —
    * same contract as [[readJsonl]]. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              delimiter: String = ","): (DataFrame, DataFrame) = {
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt,
      "delimiter" -> delimiter)
    splitLanes(spark.read.textFile(path).toDF("value"),
      from_csv(col("value"), withCorrupt(schema), opts), schema)
  }
}
