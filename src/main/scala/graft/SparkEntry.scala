package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QShared._

/**
 * Driver contract: one named query per implemented operator from
 * SURVEY.md §2 (+ the LLM-data-pipeline extensions), each with a DuckDB
 * oracle in [[SparkEntry.oracleSql]] over the same parquet tables.
 *
 * The entries live in per-family group files under `graft/queries/`
 * (each with its oracles side by side — [[QRef]], [[QCuration]],
 * [[QDedup]], [[QVector]], [[QMix]], [[QSketchJoin]]); shared plan
 * helpers in [[QShared]], shared SQL fragments in [[OracleDefs]]. This
 * object is the aggregation the driver (and Bench/Verify/Smoke) calls.
 *
 * Column names and types are aligned between the Spark plans and the
 * oracle SQL; every query ends in a deterministic total order and rounds
 * float-sensitive aggregates so the driver's hash compare is stable.
 */
object SparkEntry {

  /** Flagship (SURVEY §7.2): scored-popularity top-50 over the events stream. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = T(spark, dir, "events")
    ev.withColumn("score", eventsScore(col("event_type")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"), round(sum(col("score")), 4).as("sum_score"))
      .orderBy(desc("cnt"), col("user_id"))
      .limit(50)
  }

  /**
   * Resolve a comma-separated query-name filter against [[queries]] —
   * the ONE definition Bench and Verify share. Whitespace and empty
   * segments are dropped; an empty or all-unknown filter fails loudly
   * (a typo must never read as a fast green run of zero queries).
   */
  def selectQueries(filter: String): Map[String, (SparkSession, String) => DataFrame] = {
    val ns = filter.split(',').map(_.trim).filter(_.nonEmpty).toSet
    require(ns.nonEmpty, s"query-name filter is empty: '$filter'")
    val unknown = ns -- queries.keySet
    require(unknown.isEmpty, s"unknown query names in filter: ${unknown.mkString(", ")}")
    queries.filter { case (n, _) => ns(n) }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QRef.queries ++
    QCuration.queries ++
    QDedup.queries ++
    QVector.queries ++
    QMix.queries ++
    QSketchJoin.queries ++
    QSuffix.queries

  /**
   * The stored-family queries split at their store-build/probe seam
   * ([[QShared.Phased]]): Bench times `init` (the one-time store build
   * production amortizes) and `serve` (the per-batch probe the trend
   * line tracks) separately. Every name here is ALSO a plain [[queries]]
   * entry — the fused init-then-serve composition of the SAME
   * definition — so Verify and the driver see identical semantics.
   */
  private[graft] def phasedQueries: Map[String, QShared.Phased] =
    QCuration.phased ++
    QDedup.phased ++
    QVector.phased ++
    QSketchJoin.phased ++
    QSuffix.phased

  def oracleSql: Map[String, String] = OracleSql.all
}
