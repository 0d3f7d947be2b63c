package graft.operators

import graft.sources.{AdditiveLedger, DeltaParts}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Standing ∞-gram index — the persisted form of [[InfiniGram.probe]]:
 * the corpus's (n-gram digest, next token) occurrence counts for every
 * width 1..maxN, on the [[graft.sources.AdditiveLedger]] so repeat
 * probes are QUERIES-sized (the in-memory probe re-derives and re-hashes
 * every corpus window per call — maxN rows per corpus token, the one
 * corpus-sized cost this store amortizes across every probe that
 * follows).
 *
 * ONE stored relation carries both probe inputs:
 *
 *   dir/grams/<part>/__b=K/…  (h1, h2, next, c) — `next` NULL for an
 *                              occurrence ending its document
 *   dir/_meta                  maxN=<width>, buckets=<N>
 *
 * A digest's total occurrence count is the sum of its rows' counts
 * over all `next` values (null included), so the occurrence and
 * continuation relations [[InfiniGram.assemble]] consumes both read
 * from one bucket-pruned scan. The Hive-partitioned bucket layout
 * (`__b = pmod(h1, buckets)` — the [[SpanPosStore]] idiom) lets a
 * probe open only the query digests' buckets' FILES (spec-pinned
 * `__b IN (…)` partition filter).
 *
 * Maintenance is the [[LmStore]] additive-count story — the cleanest
 * in the family: [[append]] writes an O(batch) positive part,
 * [[remove]] an O(batch) EXACT negative part (the caller replays the
 * removed documents' original text — the LmStore takedown contract;
 * counts subtract exactly, net-≤0 keys drop at read and compaction),
 * [[compact]] folds to one generation, and snapshot/restore/fsck +
 * [[graft.pipelines.Release]] kind "ngram" complete the store-family
 * lifecycle. All mutations are replay-idempotent by part name at every
 * crash point (the `_absorbed` ledger), single-writer under the dir's
 * [[graft.sources.WriterLease]] (taken inside the ledger).
 *
 * LAW (spec-pinned, NgramStoreSpec): for a store holding exactly the
 * document multiset C (under any append/remove/compact/snapshot/
 * restore history), `NgramStore.probe(store, queries)` ≡
 * `InfiniGram.probe(C, queries)` — exact equality, integer counts.
 * The window kernel is [[InfiniGram.corpusWindows]] itself and the
 * result tail [[InfiniGram.assemble]] itself; the store adds only the
 * ledger fold between them.
 */
object NgramStore {

  private def gramsDir(dir: String) = s"$dir/grams"
  private def roots(dir: String) = Seq(gramsDir(dir))
  private def metaPath(dir: String) = s"$dir/_meta"

  /** The width bound the store was built at (probes run at it — mixing
    * widths would silently under-match, so it is not a probe param). */
  def maxN(dir: String): Int = meta(dir)._1

  def numBuckets(dir: String): Int = meta(dir)._2

  private def meta(dir: String): (Int, Int) = {
    val kv = graft.sources.BucketedParts.readMeta(metaPath(dir), "n-gram store")
    graft.sources.BucketedParts.requireDigestMatch(kv, "n-gram store", dir)
    (kv("maxN").toInt, kv("buckets").toInt)
  }

  private def bucketOf(h1: Column, nb: Int): Column =
    graft.sources.BucketedParts.bucketOf(h1, nb)

  /** The signed count part of one document set: ONE aggregation over
    * the shared window kernel — (h1, h2, next, c·sign, __b), `next`
    * null for document-ending occurrences. Inventory-sized (distinct
    * (gram, next) pairs), never the window rows themselves. */
  private def partOf(docs: DataFrame, textCol: String, maxN: Int, nb: Int,
                     sign: Int): DataFrame =
    InfiniGram.corpusWindows(docs, textCol, maxN)
      .select(col("__h1").as("h1"), col("__h2").as("h2"),
        col("__next").as("next"), bucketOf(col("__h1"), nb).as("__b"))
      .groupBy(col("h1"), col("h2"), col("next"), col("__b"))
      .agg((count(lit(1)) * sign).as("c"))

  private def writeBucketed(path: String, df: DataFrame, nb: Int): Unit =
    graft.sources.BucketedParts.writeBucketed(path, df, nb)

  private def readParts(spark: SparkSession, root: String,
                        names: Seq[String]): DataFrame =
    graft.sources.BucketedParts.readParts(spark, root, names)

  private def liveNames(dir: String, tag: Option[String]): Seq[String] = {
    val names = tag.fold(DeltaParts.list(dir))(t => DeltaParts.listAt(dir, t))
    require(names.nonEmpty, s"no n-gram store at '$dir' — run init first")
    names
  }

  /** O(corpus), once; REFUSES a previously-used dir (the ledger's
    * run-once contract — a reset parts dir under a surviving
    * `_absorbed` would silently no-op replayed appends). */
  def init(spark: SparkSession, dir: String, corpus: DataFrame,
           textCol: String, maxN: Int = 8, numBuckets: Int = 64): Unit = {
    require(maxN >= 1, s"maxN must be >= 1: $maxN")
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    AdditiveLedger.init(dir, "n-gram store", "part_00000",
        extraPaths = Seq(metaPath(dir))) { n =>
      writeBucketed(s"${gramsDir(dir)}/$n",
        partOf(corpus, textCol, maxN, numBuckets, sign = 1), numBuckets)
      // Meta lands LAST inside the callback: a crash before this point
      // leaves neither _PARTS nor _meta, so a retry re-runs clean.
      graft.sources.BucketedParts.writeMeta(metaPath(dir),
        Seq("maxN" -> maxN.toString, "buckets" -> numBuckets.toString,
          graft.sources.BucketedParts.digestStamp))
      ()
    }
  }

  /** Fold new documents in — O(batch), the standing parts are never
    * read; replay-idempotent by `name` at every crash point. */
  def append(spark: SparkSession, dir: String, newDocs: DataFrame,
             textCol: String, name: Option[String] = None): Unit =
    mutate(spark, dir, newDocs, textCol, name, sign = 1)

  /** Takedown: the EXACT negative count part (no rescan, no rebuild).
    * CONTRACT: the caller replays exactly the text of a
    * previously-appended document set — the [[LmStore.remove]] shape;
    * a remove that was never appended drives keys negative, and those
    * drop from reads rather than poisoning them. */
  def remove(spark: SparkSession, dir: String, removedDocs: DataFrame,
             textCol: String, name: Option[String] = None): Unit = {
    liveNames(dir, None)
    mutate(spark, dir, removedDocs, textCol, name, sign = -1)
  }

  private def mutate(spark: SparkSession, dir: String, docs: DataFrame,
                     textCol: String, name: Option[String], sign: Int): Unit = {
    val (mn, nb) = meta(dir)
    AdditiveLedger.mutateNamed(dir, roots(dir), name) { n =>
      writeBucketed(s"${gramsDir(dir)}/$n", partOf(docs, textCol, mn, nb, sign), nb)
      DeltaParts.add(dir, n)
    }
  }

  /** The assembled (h1, h2, next, c > 0, __b) relation; `bucketFilter`
    * prunes the partitioned scans BEFORE assembly — the probe's
    * file-pruning lever. With `tag`, the snapshot-pinned state. */
  def readGrams(spark: SparkSession, dir: String,
                tag: Option[String] = None,
                bucketFilter: Option[Seq[Int]] = None): DataFrame = {
    val names = liveNames(dir, tag)
    val all0 = readParts(spark, gramsDir(dir), names)
    val all = bucketFilter.fold(all0)(bs =>
      all0.filter(graft.sources.BucketedParts.inBuckets(bs)))
    if (names.size == 1) all
    else all.groupBy(col("h1"), col("h2"), col("next"), col("__b"))
      .agg(sum(col("c")).as("c")).filter(col("c") > 0)
  }

  /** Fold the live parts to one generation (exact integer sums, net-≤0
    * keys gone physically); superseded parts stay one cycle for
    * in-flight readers, snapshot-pinned parts never sweep. */
  def compact(spark: SparkSession, dir: String): Unit =
    AdditiveLedger.compactWith(dir, roots(dir)) { (gen, old) =>
      writeBucketed(s"${gramsDir(dir)}/$gen",
        readParts(spark, gramsDir(dir), old)
          .groupBy(col("h1"), col("h2"), col("next"), col("__b"))
          .agg(sum(col("c")).as("c")).filter(col("c") > 0), meta(dir)._2)
    }

  def snapshot(dir: String, tag: String): Seq[String] = DeltaParts.snapshot(dir, tag)
  def dropSnapshot(dir: String, tag: String): Unit = DeltaParts.dropSnapshot(dir, tag)
  def restore(dir: String, tag: String): Unit = DeltaParts.restore(dir, tag)

  /** Storage audit: the grams ledger plus the meta pin. */
  def fsck(spark: SparkSession, dir: String): DataFrame = {
    val metaOk = graft.sources.StoreFs.get.exists(metaPath(dir))
    graft.sources.StoreCheck.deltaParts(spark, dir, roots(dir))
      .unionByName(graft.sources.StoreCheck.row(spark, dir, "meta_resolves",
        metaOk,
        if (metaOk) { val (mn, nb) = meta(dir); s"maxN=$mn buckets=$nb" }
        else s"missing ${metaPath(dir)} — probes cannot resolve maxN"))
  }

  /**
   * The stored probe — answers identically to
   * [[InfiniGram.probe]](C, queries) for the stored document multiset
   * C (the class LAW), queries-sized end to end:
   *
   *  1. query suffix digests (|queries| × maxN rows) and their bucket
   *     list (≤ numBuckets, driver-side);
   *  2. the grams relation read under a `__b IN (…)` partition filter
   *     (file-pruned) and a broadcast semi join on the query digests —
   *     the only corpus-derived data touched is the queries' hits;
   *  3. occurrence totals = sum over `next` (null included),
   *     continuations = the non-null rows — one scan feeds both;
   *  4. [[InfiniGram.assemble]], the shared tail.
   *
   * `broadcastProbes = false` degrades the semi joins to shuffles for
   * a genuinely huge query set (the family escape hatch).
   */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
            qIdCol: String, qTextCol: String,
            tag: Option[String] = None,
            broadcastProbes: Boolean = true): DataFrame = {
    val (mn, nb) = meta(dir)
    val bcast = if (broadcastProbes) (df: DataFrame) => broadcast(df)
                else (df: DataFrame) => df
    val qw = InfiniGram.querySuffixes(queries, qIdCol, qTextCol, mn)
      .localCheckpoint(true)
    val qdig = qw.select(col("__h1"), col("__h2")).distinct()
      .withColumn("__b", bucketOf(col("__h1"), nb))
      .localCheckpoint(true)
    val buckets = qdig.select(col("__b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val hitsRenamed = readGrams(spark, dir, tag, Some(buckets))
      .withColumnRenamed("h1", "__h1").withColumnRenamed("h2", "__h2")
      .join(bcast(qdig.select("__h1", "__h2")), Seq("__h1", "__h2"), "left_semi")
      .localCheckpoint(true)
    val occ = hitsRenamed.groupBy(col("__h1"), col("__h2"))
      .agg(sum(col("c")).as("n_occ"))
    val conts = hitsRenamed.where(col("next").isNotNull)
      .select(col("__h1"), col("__h2"), col("next").as("__next"), col("c").as("__cnt"))
    InfiniGram.assemble(queries, qIdCol, qw, occ, conts)
  }
}
