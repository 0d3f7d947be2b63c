package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet table store with MERGE-style upsert (reference S7: the Mongo
 * insert/upsert/update_many/delete call sites — here last-write-wins
 * keyed upserts; S8's `ON CONFLICT DO UPDATE` is the same shape).
 *
 * Mechanics: new batch ∪ current table, keep the newest row per key
 * (batch rows win), write to a fresh generation directory, then flip a
 * pointer file — readers never see a partial write, and a crashed writer
 * leaves the previous generation intact (idempotent re-run = exactly-once
 * table state for streaming foreachBatch, ST2).
 *
 * On a production deployment this maps 1:1 onto Delta/Iceberg MERGE; the
 * generation-pointer scheme keeps the same contract with nothing but a
 * filesystem.
 */
object TableSink {

  private def ptrPath(dir: String) = s"$dir/_CURRENT"

  private def currentGen(spark: SparkSession, dir: String): Option[String] = {
    val p = new java.io.File(ptrPath(dir))
    if (p.exists()) Some(java.nio.file.Files.readString(p.toPath).trim) else None
  }

  /** Read the current table state (empty frame with batch schema if absent). */
  def read(spark: SparkSession, dir: String, like: DataFrame): DataFrame =
    currentGen(spark, dir) match {
      case Some(gen) => spark.read.parquet(s"$dir/$gen")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)
    }

  /**
   * Upsert `batch` into the table keyed by `keys`: batch rows replace
   * same-key rows; `versionCol` breaks ties deterministically (higher
   * wins; batch preferred on equal versions).
   */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
             keys: Seq[String], versionCol: String): Unit = {
    val existing = read(spark, dir, batch)
    val merged = batch.withColumn("__src", lit(1))
      .unionByName(existing.withColumn("__src", lit(0)))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(desc(versionCol), desc("__src"))))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
    val gen = s"gen-${System.currentTimeMillis()}"
    merged.write.mode(SaveMode.Overwrite).parquet(s"$dir/$gen")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(new java.io.File(ptrPath(dir)).toPath, gen)
    gcGenerations(dir, keep = 2)
  }

  /** Drop all but the newest `keep` generation dirs (readers of the
    * current pointer are unaffected; one older gen is kept as rollback). */
  private def gcGenerations(dir: String, keep: Int): Unit = {
    val gens = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .sortBy(_.getName)
    gens.dropRight(keep).foreach { g =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(g)
    }
  }

  /** Keyed delete (reference S7 delete_one / J7 anti-join rewrite). */
  def delete(spark: SparkSession, dir: String, keysToDrop: DataFrame, keys: Seq[String]): Unit = {
    val existing = read(spark, dir, keysToDrop)
    val kept = existing.join(keysToDrop.select(keys.map(col): _*), keys, "left_anti")
    val gen = s"gen-${System.currentTimeMillis()}"
    kept.write.mode(SaveMode.Overwrite).parquet(s"$dir/$gen")
    java.nio.file.Files.writeString(new java.io.File(ptrPath(dir)).toPath, gen)
  }
}
