package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch.{quantileSketch, quantileSketchMerge, quantileSketchQuery}
import graft.sources.DeltaParts

/**
 * Standing per-group distribution summaries — the persisted form of the
 * [[graft.functions.QuantileSketchAgg]] family, completing the engine's
 * standing-index pattern for the RANK statistic (span inventory = set
 * membership, band index = similarity candidates, [[Bm25Store]] =
 * retrieval, MG rows = frequency, this = quantiles): each ingest batch
 * appends ONE row per group `(g, sketch, n)` — its serialized
 * Greenwald–Khanna summary — in O(batch); reads fold the stored rows
 * with `quantile_sketch_merge` (mergeable-summaries bound, Agarwal et
 * al. 2012), and compaction reads group-count-sized rows, never the
 * corpus. This is how admission-time distribution gates (the
 * `x_outlier_trim` p99 length rule, ppl tercile cuts) keep CURRENT
 * thresholds without rescanning 100 TB per refresh.
 *
 * Ledger mechanics ride [[graft.sources.AdditiveLedger]] (shared with
 * every additive store): a DeltaParts `_PARTS` ledger (atomic publish),
 * batch-named replay-idempotent [[append]] with the
 * compaction-surviving `_absorbed` names-ledger, deferred-GC
 * compaction, and snapshot tags / restore for training reproducibility.
 *
 * Accuracy contract: pass the SAME `accuracy` to init and every
 * append; queried quantiles are rank-exact while a group's TOTAL count
 * stays ≤ accuracy/2 (the `x_outlier_trim` bound — the merged sketch's
 * error is governed by the union size).
 *
 * INSERT-ONLY by design: Greenwald–Khanna summaries are not
 * subtractable, so this store has no delete path (unlike the engine's
 * other standing stores — [[Bm25Store.delete]],
 * [[IvfAnn.removeFromIndex]], [[graft.pipelines.Admission.unadmit]]).
 * Removing documents from the tracked distribution means re-running
 * [[init]] over the surviving corpus on a fresh dir — schedule it like
 * any bulk rebuild.
 */
object StatsStore {

  import graft.sources.AdditiveLedger

  private def sketchesDir(dir: String) = s"$dir/sketches"

  /** One row per group: (g, sketch, n). */
  private def summarize(batch: DataFrame, groupCol: String, valueCol: String,
                        accuracy: Int): DataFrame =
    batch.groupBy(col(groupCol).as("g"))
      .agg(quantileSketch(col(valueCol).cast("double"), accuracy).as("sketch"),
        count(col(valueCol)).as("n"))

  private def writePart(dir: String, name: String, rows: DataFrame,
                        ledger: Boolean = true): Unit = {
    rows.write.mode("overwrite").parquet(s"${sketchesDir(dir)}/$name")
    if (ledger) DeltaParts.add(dir, name)
  }

  /** Initialize from an existing corpus — O(corpus), once. REFUSES a
    * previously-used dir (the [[Bm25Store.init]] run-once contract: a
    * reset parts-list over a surviving `_absorbed` ledger would make a
    * later replayed append silently drop real data). */
  def init(spark: SparkSession, dir: String, corpus: DataFrame,
           groupCol: String, valueCol: String, accuracy: Int = 1 << 20): Unit =
    AdditiveLedger.init(dir, "stats store", "part_00000") { n =>
      writePart(dir, n, summarize(corpus, groupCol, valueCol, accuracy),
        ledger = false)
    }

  /** Append a batch's summaries in O(batch) — the standing parts are
    * never read. Name the part by batch/epoch id for replay-idempotent
    * ingest; idempotent at every crash point INCLUDING a replay after a
    * [[compact]] folded the named part (the `_absorbed` ledger records
    * every name ever absorbed and compaction never touches it).
    * Re-appending the same DOCUMENTS under a fresh name double-counts —
    * same contract as [[Bm25Store.append]]. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             groupCol: String, valueCol: String, accuracy: Int = 1 << 20,
             name: Option[String] = None): Unit =
    AdditiveLedger.mutateNamed(dir, Seq(sketchesDir(dir)), name) { n =>
      writePart(dir, n, summarize(batch, groupCol, valueCol, accuracy))
    }

  /** The folded summary — one row per group over the UNION of every
    * stored batch: (g, sketch, n). With `tag`, assembles the
    * [[snapshot]]-pinned parts instead of the live ledger. */
  def readSummaries(spark: SparkSession, dir: String,
                    tag: Option[String] = None): DataFrame = {
    val names = tag.fold(DeltaParts.list(dir))(t => DeltaParts.listAt(dir, t))
    require(names.nonEmpty, s"no stats store at '$dir' — run init first")
    spark.read.parquet(names.map(p => s"${sketchesDir(dir)}/$p"): _*)
      .groupBy(col("g"))
      .agg(quantileSketchMerge(col("sketch")).as("sketch"), sum(col("n")).as("n"))
  }

  /** Queried thresholds — one tiny row per group `(g, n, qs
    * array<double>)`, ready to broadcast back as an admission gate
    * (the [[SampleOps.quantileTrim]] probe shape, with the corpus
    * rescan replaced by the standing fold). */
  def quantiles(spark: SparkSession, dir: String, qs: Seq[Double],
                tag: Option[String] = None): DataFrame =
    readSummaries(spark, dir, tag)
      .select(col("g"), col("n"),
        quantileSketchQuery(col("sketch"),
          array(qs.map(lit(_)): _*)).as("qs"))

  /** Pin the current summary state under `tag`; [[readSummaries]] /
    * [[quantiles]] with the tag replay it byte-identically across later
    * appends and compactions. */
  def snapshot(dir: String, tag: String): Seq[String] =
    DeltaParts.snapshot(dir, tag)

  def dropSnapshot(dir: String, tag: String): Unit =
    DeltaParts.dropSnapshot(dir, tag)

  /** Roll back to a tag (no data movement). Part names stay write-once
    * across restores — the [[Bm25Store.restore]] monotonicity contract
    * that keeps pending crash replays from double-counting. */
  def restore(dir: String, tag: String): Unit =
    DeltaParts.restore(dir, tag)

  /** Scheduled compaction: fold all live parts into one row per group.
    * Input is (parts × groups) sketch rows — group-count-sized, never
    * the corpus. Superseded parts stay one cycle for in-flight readers;
    * snapshot-pinned parts are never swept. */
  def compact(spark: SparkSession, dir: String): Unit =
    AdditiveLedger.compactWith(dir, Seq(sketchesDir(dir))) { (gen, old) =>
      writePart(dir, gen,
        spark.read.parquet(old.map(p => s"${sketchesDir(dir)}/$p"): _*)
          .groupBy(col("g"))
          .agg(quantileSketchMerge(col("sketch")).as("sketch"),
            sum(col("n")).as("n")),
        ledger = false)
    }
}
