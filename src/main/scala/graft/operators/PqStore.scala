package graft.operators

import graft.operators.PqOps.Codebook
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PQ codes AT REST — the persisted form of [[PqOps]]'s IVF-PQ
 * (residual-encoded codes in a cell-addressable
 * [[graft.sources.TableSink]], the [[IvfAnn.writeIndex]] layout): a
 * probe opens ONLY the probed cells' parquet FILES, and each row it
 * reads is m code bytes instead of D floats — the two compressions
 * (file pruning × 16:1 bytes) multiply, which is what serves a 100 TB
 * embedding corpus from an index a rack can hold.
 *
 * Lifecycle contracts, aligned with the store family:
 *  - [[write]]: O(corpus), once; centroids and codebook are FITTED
 *    here and stay fixed until a bulk rebuild (the [[IvfAnn]]
 *    fixed-centroids contract — drift erodes recall, never the
 *    correctness of what is probed).
 *  - [[append]]: O(batch) — assign to existing cells, residual-encode
 *    with the FIXED codebook, upsert (only the touched cells' buckets
 *    rewrite). NEW ids only — the [[Bm25Store.append]] disjoint-ids
 *    contract; re-adding an id that may have moved cells needs the
 *    re-home scan [[IvfAnn.appendToIndex]] documents, which this store
 *    intentionally does not duplicate.
 *  - [[remove]]: bucket-pruned copy-on-write delete
 *    ([[graft.sources.TableSink.deleteByIds]]) — one column-pruned
 *    (id, cell) scan locates victims, only their buckets rewrite.
 *  - [[search]]: probed-cell file pruning + reconstruct-in-scan
 *    (= ADC) shortlist; the caller refines the shortlist against float
 *    vectors exactly as in x_ann_ivf_pq — spec-pinned equal to the
 *    in-memory [[IvfAnn.annSearch]] over the same reconstruction.
 *
 * The codebook itself is m·ksub·(D/m) doubles — persist it next to the
 * index with [[writeCodebook]]/[[readCodebook]] (one tiny parquet, the
 * model-store idiom) so a serving process needs only `dir`.
 */
object PqStore {

  /** Residual-encode a cell-assigned corpus under `cb`:
    * (cell, idCol, codes). Map-only. */
  def encodeResiduals(corpusWithCells: DataFrame, cells: DataFrame,
                      idCol: String, vecCol: String, cb: Codebook,
                      dim: Int): DataFrame =
    corpusWithCells
      .join(broadcast(cells), col("cell") === col("cell_id"))
      .select(col("cell"), col(idCol),
        PqOps.encode(zip_with(col(vecCol).cast("array<double>"), col("cell_vec"),
          (x, y) => x - y), cb, dim).as("codes"))

  /** Persist an [[encodeResiduals]] corpus cell-addressably (the
    * [[IvfAnn.writeIndex]] layout + staleness meta). The coded frame is
    * materialized ONCE here — callers pass the lazy encode pipeline,
    * and both the meta's base count and the upsert's write would
    * otherwise re-run the O(corpus) assign+encode. */
  def write(spark: SparkSession, dir: String, coded: DataFrame,
            idCol: String, numBuckets: Int = 64): Unit = {
    val mat = coded.localCheckpoint(true)
    graft.sources.TableSink.upsert(spark, dir,
      mat.withColumn("__cell_s", col("cell").cast("string"))
        .withColumn("__v", lit(0L)),
      Seq(idCol), "__v", numBuckets, layoutCol = Some("__cell_s"),
      meta = Some(s"ivfpq:v1;base=${mat.count()};added=0"))
  }

  /** Persist the codebook as one row per (sub, cid) — tiny, broadcast
    * on read; the model-store idiom. */
  def writeCodebook(spark: SparkSession, dir: String, cb: Codebook): Unit = {
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
    }.toSeq.toDF("sub", "cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_codebook")
  }

  def readCodebook(spark: SparkSession, dir: String): Codebook = {
    val rows = spark.read.parquet(s"$dir/_codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    val m = rows.keys.map(_._1).max + 1
    val ksub = rows.keys.map(_._2).max + 1
    Array.tabulate(m, ksub)((s, c) => rows((s, c)))
  }

  /** O(batch) add of NEW ids under the fixed (cells, cb): only the
    * landed cells' buckets rewrite; staleness `added` advances in the
    * same commit. */
  def append(spark: SparkSession, dir: String, newVectors: DataFrame,
             cells: DataFrame, idCol: String, vecCol: String, cb: Codebook,
             dim: Int, version: Long): Unit = {
    require(graft.sources.TableSink.layoutColOf(dir).isDefined,
      s"no PQ index at '$dir' — write one with PqStore.write first")
    val coded = encodeResiduals(
      IvfAnn.assignCells(newVectors, idCol, vecCol, cells),
      cells, idCol, vecCol, cb, dim)
    val newMeta = graft.sources.TableSink.metaOf(dir).flatMap(parseMeta)
      .map { case (base, added) =>
        s"ivfpq:v1;base=$base;added=${added + newVectors.select(col(idCol)).count()}" }
    graft.sources.TableSink.upsert(spark, dir,
      coded.withColumn("__cell_s", col("cell").cast("string"))
        .withColumn("__v", lit(version)),
      Seq(idCol), "__v", meta = newMeta)
  }

  /** Bucket-pruned takedown; removals advance `added` (a mutation away
    * from the fitted distribution — the [[IvfAnn.removeFromIndex]]
    * accounting argument). */
  def remove(spark: SparkSession, dir: String, ids: DataFrame,
             idCol: String): Unit = {
    require(graft.sources.TableSink.layoutColOf(dir).isDefined,
      s"no PQ index at '$dir' — write one with PqStore.write first")
    graft.sources.TableSink.deleteByIds(spark, dir, ids, idCol,
      metaFor = victims =>
        graft.sources.TableSink.metaOf(dir).flatMap(parseMeta)
          .map { case (base, added) =>
            s"ivfpq:v1;base=$base;added=${added + victims.count()}" })
    ()
  }

  /**
   * Shortlist search over the persisted codes: probe the nprobe nearest
   * cells, open ONLY their buckets' files, reconstruct
   * cell_centroid + codes·codebook INSIDE the scan projection (the ADC
   * value), bounded-heap top-k. Callers refine the shortlist against
   * float vectors (the x_ann_ivf_pq second stage).
   */
  def search(dir: String, queries: DataFrame, cells: DataFrame, cb: Codebook,
             idCol: String, vecCol: String, k: Int, nprobe: Int,
             excludeSelf: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    require(graft.sources.TableSink.tableExists(dir),
      s"no persisted PQ index at '$dir' (no table manifest) — " +
        "write one with PqStore.write first")
    require(graft.sources.TableSink.layoutColOf(dir).isDefined,
      s"table at '$dir' has no layout column — it was not written by " +
        "PqStore.write, so cell probes cannot address its buckets")
    val probed = IvfAnn.probedCellIds(queries, cells, idCol, vecCol, nprobe)
    // Derive the stored id type from the table's own schema (one footer
    // read): a store written with string ids must present string ids in
    // the empty-read fallback too — assuming long here mis-typed the
    // probe for any non-long idCol.
    val idType = graft.sources.TableSink.storedSchemaOf(spark, dir)
      .flatMap(sch => sch.find(_.name == idCol).map(_.dataType))
      .getOrElse(org.apache.spark.sql.types.LongType)
    val like = spark.range(0).select(lit(0L).as("cell"),
      lit(null).cast(idType).as(idCol),
      array().cast("array<tinyint>").as("codes"))
    val corpus = graft.sources.TableSink.readBuckets(spark, dir, like,
        graft.sources.TableSink.bucketIdsFor(spark, dir, probed.map(_.toString)))
      .filter(col("cell").isin(probed: _*))
    val recon = corpus
      .join(broadcast(cells), col("cell") === col("cell_id"))
      .select(col("cell"), col(idCol),
        zip_with(col("cell_vec"), PqOps.reconstruct(col("codes"), cb),
          (a, b) => a + b).as(vecCol))
    IvfAnn.annSearch(queries, recon, cells, idCol, vecCol, k, nprobe, excludeSelf)
  }

  private val MetaRe = """ivfpq:v1;base=(\d+);added=(\d+)""".r
  private def parseMeta(m: String): Option[(Long, Long)] = m match {
    case MetaRe(b, a) => Some((b.toLong, a.toLong))
    case _ => None
  }
}
