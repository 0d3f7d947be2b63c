package graft

/**
 * DuckDB parity SQL for every entry in [[SparkEntry.queries]] (driver runs
 * these over views named after the parquet tables). Column names, types,
 * ordering, and rounding are aligned with the Spark plans.
 */
object OracleSql {

  val all: Map[String, String] =
    QRef.oracles ++
    QCuration.oracles ++
    QDedup.oracles ++
    QVector.oracles ++
    QMix.oracles ++
    QSketchJoin.oracles ++
    QSuffix.oracles
}
