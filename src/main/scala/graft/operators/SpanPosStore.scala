package graft.operators

import graft.sources.{AdditiveLedger, DeltaParts}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Standing POSITIONAL span store — the suffix-array-style complement of
 * the count-only span inventory ([[SpanDedup.spanDigestIndex]]): one row
 * per k-token window of the corpus, (id, i, h1, h2) with i the 1-based
 * token position and (h1, h2) the 128-bit span digest, plus the
 * additive per-digest occurrence inventory. Counts answer the scrub
 * family's "is this span duplicated?"; POSITIONS are what the
 * variable-length maximal-repeat diagonals ([[SpanDedup.maximalRepeats]]
 * — Lee et al. 2022 ExactSubstr) need, which is why the in-memory
 * incremental form ([[SpanDedup.maximalRepeatsAgainst]]) had to
 * re-derive corpus windows every batch. With this store, an admission
 * batch's maximal-repeat report ([[probeMaximalRepeats]]) costs:
 *
 *  - O(batch) window work (tokenize + hash the BATCH only);
 *  - one scan of the counts relation pruned to the batch digests'
 *    hash buckets (map-only, broadcast semi probe);
 *  - one scan of the window relation pruned to the ELIGIBLE digests'
 *    buckets — eligible = duplicated-under-cap spans touching the
 *    batch, usually a tiny fraction of the batch's digests, so the
 *    Hive-partitioned bucket layout (`__b = pmod(h1, buckets)`)
 *    genuinely file-prunes (spec-pinned: the probe plan carries a
 *    `__b IN (…)` partition filter);
 *  - pair generation and diagonal runs sized by the MATCHES, exactly
 *    as the in-memory form.
 *
 * Corpus TEXT is never read: the representative span re-attaches from
 * the BATCH side — every batch-touching pair has a batch site by
 * construction, and an exact match's text is identical at both sites.
 *
 * Storage shape (the [[graft.sources.AdditiveLedger]] family): three
 * relations under ONE parts ledger —
 *
 *   dir/windows/<part>/__b=K/…   (id, i, h1, h2), bucket-partitioned
 *   dir/counts/<part>/           (h1, h2, n_occ), signed additive
 *   dir/tombs/<part>/            (id) tombstoned docs (delete parts)
 *   dir/_meta                    k=<window width>, buckets=<N>
 *
 * Per-batch [[append]] is O(batch) (a new part + one ledger line —
 * digests are uniform, so a row-keyed upsert would dirty every bucket
 * of a CoW table); [[remove]] is the Lucene-style tombstone + EXACT
 * negative-count part (the caller replays the removed docs' text — the
 * [[LmStore]] takedown contract, at-most-once per absorption);
 * [[compact]] folds tombstones away and restores single-part reads.
 * Window width k is pinned at [[init]] ([[probeMaximalRepeats]] runs at
 * the stored k — mixing widths would be silently wrong, so it is not a
 * probe parameter). Single-writer under the dir's
 * [[graft.sources.WriterLease]]; snapshot/restore/fsck complete the
 * store-family lifecycle ([[graft.pipelines.Release]] kind "spanpos").
 *
 * LAW (spec-pinned, SpanPosStoreSpec): for a store holding exactly the
 * document set C (in any append/remove/compact/restore history),
 * `probeMaximalRepeats(store, batch)` ≡
 * `SpanDedup.maximalRepeatsAgainst(batch, C)` ≡ the global
 * `SpanDedup.maximalRepeats(C ∪ batch)` restricted to batch-touching
 * pairs (doc ids disjoint across C and batch — the standing
 * incremental contract; a tombstoned id cannot be re-appended before a
 * [[compact]], enforced loudly).
 */
object SpanPosStore {

  private def windowsDir(dir: String) = s"$dir/windows"
  private def countsDir(dir: String) = s"$dir/counts"
  private def tombsDir(dir: String) = s"$dir/tombs"
  private def roots(dir: String) =
    Seq(windowsDir(dir), countsDir(dir), tombsDir(dir))
  private def metaPath(dir: String) = s"$dir/_meta"

  /** The window width the store was built at (probes run at this k). */
  def k(dir: String): Int = meta(dir)._1

  /** The digest-bucket fan-out of the window layout. */
  def numBuckets(dir: String): Int = meta(dir)._2

  private def meta(dir: String): (Int, Int) = {
    val kv = graft.sources.BucketedParts.readMeta(metaPath(dir),
      "span position store")
    // The persisted (h1, h2) windows/counts only match probes computed
    // under the SAME digest convention — refuse a cross-convention (or
    // pre-stamp) store loudly instead of silently matching nothing.
    graft.sources.BucketedParts.requireDigestMatch(kv,
      "span position store", dir)
    (kv("k").toInt, kv("buckets").toInt)
  }

  private def bucketOf(h1: Column, nb: Int): Column =
    graft.sources.BucketedParts.bucketOf(h1, nb)

  private def inBuckets(bs: Seq[Int]): Column =
    graft.sources.BucketedParts.inBuckets(bs)

  /** The positional window relation of one document set, bucket column
    * attached: (id, i, h1, h2, __b). Derived by the SAME kernel every
    * in-memory span op uses ([[SpanDedup.digestWindows]]) — the law
    * depends on it. */
  private def windowsOf(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, nb: Int): DataFrame =
    SpanDedup.digestWindows(docs, idCol, textCol, k)
      .select(col("__id").as("id"), col("i"),
        col("__h1").as("h1"), col("__h2").as("h2"),
        bucketOf(col("__h1"), nb).as("__b"))

  /** (h1, h2, n_occ·sign, __b) of a window frame — TOTAL occurrences
    * (the maximal-repeat eligibility currency), not distinct docs;
    * bucket column kept so the counts relation shares the windows'
    * partitioned layout. */
  private def countsOf(win: DataFrame, sign: Int): DataFrame =
    win.groupBy(col("h1"), col("h2"), col("__b"))
      .agg((count(lit(1)) * sign).as("n_occ"))

  private def writeBucketed(path: String, df: DataFrame, nb: Int): Unit =
    graft.sources.BucketedParts.writeBucketed(path, df, nb)

  private def readParts(spark: SparkSession, root: String,
                        names: Seq[String]): DataFrame =
    graft.sources.BucketedParts.readParts(spark, root, names)

  private def liveNames(dir: String, tag: Option[String]): Seq[String] = {
    val names = tag.fold(DeltaParts.list(dir))(t => DeltaParts.listAt(dir, t))
    require(names.nonEmpty,
      s"no span position store at '$dir' — run init first")
    names
  }

  /** O(corpus), once; REFUSES a previously-used dir (the
    * [[graft.sources.AdditiveLedger.init]] run-once contract). The
    * corpus-sized window relation is written FIRST and the counts
    * derive from a read-back of the written files — persisting then
    * re-scanning fixed-width rows beats caching O(corpus tokens) of
    * exploded rows in the block manager (the [[Bm25Store]] parts
    * materialization argument, disk-shaped). */
  def init(spark: SparkSession, dir: String, corpus: DataFrame,
           idCol: String, textCol: String, k: Int,
           numBuckets: Int = 64): Unit = {
    require(k >= 2, s"span width k must be >= 2: $k")
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    AdditiveLedger.init(dir, "span position store", "part_00000",
        extraPaths = Seq(metaPath(dir))) { n =>
      val winPath = s"${windowsDir(dir)}/$n"
      writeBucketed(winPath, windowsOf(corpus, idCol, textCol, k, numBuckets), numBuckets)
      val win = spark.read.parquet(winPath)
      writeBucketed(s"${countsDir(dir)}/$n", countsOf(win, 1), numBuckets)
      win.select(col("id")).limit(0)
        .write.mode("overwrite").parquet(s"${tombsDir(dir)}/$n")
      // Meta lands LAST inside the callback: a crash before this point
      // leaves neither _PARTS nor _meta, so a retry re-runs clean.
      graft.sources.BucketedParts.writeMeta(metaPath(dir),
        Seq("k" -> k.toString, "buckets" -> numBuckets.toString,
          graft.sources.BucketedParts.digestStamp))
      ()
    }
  }

  /** O(batch) fold of NEW docs (disjoint ids — the family contract);
    * replay-idempotent by `name` at every crash point. REFUSES ids a
    * live tombstone holds: the tombstone anti-join would silently kill
    * the re-appended rows at read time — [[compact]] first. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             idCol: String, textCol: String,
             name: Option[String] = None): Unit = {
    val (kk, nb) = meta(dir)
    val tombs = readParts(spark, tombsDir(dir), liveNames(dir, None)).distinct()
    val clash = tombs
      .join(broadcast(batch.select(col(idCol).as("id")).distinct()), Seq("id"),
        "left_semi")
      .limit(5).collect().map(_.get(0))
    require(clash.isEmpty,
      s"span position store at '$dir' holds live tombstones for batch " +
        s"ids ${clash.mkString(", ")} (…) — a re-appended tombstoned id " +
        "would be silently erased by the tombstone anti-join at read " +
        "time; run compact first (it folds tombstones away).")
    AdditiveLedger.mutateNamed(dir, roots(dir), name) { n =>
      val winPath = s"${windowsDir(dir)}/$n"
      writeBucketed(winPath, windowsOf(batch, idCol, textCol, kk, nb), nb)
      val win = spark.read.parquet(winPath)
      writeBucketed(s"${countsDir(dir)}/$n", countsOf(win, 1), nb)
      win.select(col("id")).limit(0)
        .write.mode("overwrite").parquet(s"${tombsDir(dir)}/$n")
      DeltaParts.add(dir, n)
    }
  }

  /** Takedown: tombstone the docs' window rows and write the EXACT
    * negative occurrence part. The caller replays the removed docs'
    * ORIGINAL text (what [[append]] indexed — the [[LmStore.remove]]
    * contract), at most once per absorption; replay-idempotent per
    * `name`. O(batch): the standing relations are never scanned. */
  def remove(spark: SparkSession, dir: String, removedDocs: DataFrame,
             idCol: String, textCol: String,
             name: Option[String] = None): Unit = {
    val (kk, nb) = meta(dir)
    liveNames(dir, None) // loud on an uninitialized store
    AdditiveLedger.mutateNamed(dir, roots(dir), name) { n =>
      val win = windowsOf(removedDocs, idCol, textCol, kk, nb)
        .localCheckpoint(true) // negative counts + empty-window schema
      writeBucketed(s"${windowsDir(dir)}/$n", win.limit(0), nb)
      writeBucketed(s"${countsDir(dir)}/$n", countsOf(win, -1), nb)
      removedDocs.select(col(idCol).as("id")).distinct()
        .write.mode("overwrite").parquet(s"${tombsDir(dir)}/$n")
      DeltaParts.add(dir, n)
    }
  }

  /** The assembled positional relation (id, i, h1, h2, __b), tombstones
    * applied. With `tag`, the snapshot-pinned state. `bucketFilter`
    * prunes the partitioned scan BEFORE assembly — the probe's file
    * pruning lever. */
  def readWindows(spark: SparkSession, dir: String,
                  tag: Option[String] = None,
                  bucketFilter: Option[Seq[Int]] = None): DataFrame = {
    val names = liveNames(dir, tag)
    val wins0 = readParts(spark, windowsDir(dir), names)
    val wins = bucketFilter.fold(wins0)(bs => wins0.filter(inBuckets(bs)))
    val tombs = readParts(spark, tombsDir(dir), names).distinct()
    wins.join(tombs, Seq("id"), "left_anti")
  }

  /** The assembled occurrence inventory (h1, h2, n_occ > 0, __b) —
    * bucket column carried so probes prune before assembly
    * (`bucketFilter`, pushed through the union into each partitioned
    * scan). Exact at every point — delete parts carry negative counts,
    * so no staleness window (unlike the postings df lag
    * [[Bm25Store.delete]] documents). */
  def readCounts(spark: SparkSession, dir: String,
                 tag: Option[String] = None,
                 bucketFilter: Option[Seq[Int]] = None): DataFrame = {
    val names = liveNames(dir, tag)
    val all0 = readParts(spark, countsDir(dir), names)
    val all = bucketFilter.fold(all0)(bs => all0.filter(inBuckets(bs)))
    if (names.size == 1) all
    else all.groupBy(col("h1"), col("h2"), col("__b"))
      .agg(sum(col("n_occ")).as("n_occ")).filter(col("n_occ") > 0)
  }

  /** Scheduled fold: tombstones applied and dropped, counts summed,
    * zeroed digests gone, single-part pushed reads restored. */
  def compact(spark: SparkSession, dir: String): Unit =
    AdditiveLedger.compactWith(dir, roots(dir)) { (gen, old) =>
      val nb = meta(dir)._2
      val tombs = readParts(spark, tombsDir(dir), old).distinct()
        .localCheckpoint(true)
      val win = readParts(spark, windowsDir(dir), old)
        .join(tombs, Seq("id"), "left_anti")
      writeBucketed(s"${windowsDir(dir)}/$gen", win, nb)
      writeBucketed(s"${countsDir(dir)}/$gen",
        readParts(spark, countsDir(dir), old)
          .groupBy(col("h1"), col("h2"), col("__b"))
          .agg(sum(col("n_occ")).as("n_occ")).filter(col("n_occ") > 0), nb)
      tombs.limit(0).write.mode("overwrite").parquet(s"${tombsDir(dir)}/$gen")
    }

  def snapshot(dir: String, tag: String): Seq[String] = DeltaParts.snapshot(dir, tag)
  def dropSnapshot(dir: String, tag: String): Unit = DeltaParts.dropSnapshot(dir, tag)
  def restore(dir: String, tag: String): Unit = DeltaParts.restore(dir, tag)

  /** Storage audit: the three-relation ledger plus the meta pin. */
  def fsck(spark: SparkSession, dir: String): DataFrame = {
    val metaOk = graft.sources.StoreFs.get.exists(metaPath(dir))
    graft.sources.StoreCheck.deltaParts(spark, dir, roots(dir))
      .unionByName(graft.sources.StoreCheck.row(spark, dir, "meta_resolves",
        metaOk,
        if (metaOk) { val (kk, nb) = meta(dir); s"k=$kk buckets=$nb" }
        else s"missing ${metaPath(dir)} — probes cannot resolve k"))
  }

  /**
   * Admission-time maximal repeats against the STORED corpus — answers
   * identically to [[SpanDedup.maximalRepeatsAgainst]](batch, C) for
   * the stored document set C (the class LAW), with the corpus side
   * reduced to store scans:
   *
   *  1. batch windows + per-digest occurrence counts — O(batch);
   *  2. stored occurrences of the BATCH's digests: the counts relation,
   *     semi-probed under a broadcast of the batch digests (map-only;
   *     only digests the batch holds can appear in a batch-touching
   *     pair, so nothing else is ever read);
   *  3. union eligibility 2 ≤ batch + stored ≤ maxOcc — O(batch
   *     digests);
   *  4. stored POSITIONS of the eligible digests: the window relation
   *     read under a `__b IN (eligible buckets)` partition filter
   *     (file-pruned — eligible spans are the duplicated minority) and
   *     a broadcast semi join;
   *  5. the in-memory form's two pair lanes, diagonal gaps-and-islands,
   *     and the representative span sliced from the BATCH side (every
   *     batch-touching run has a batch site; an exact match's text is
   *     identical at both sites) — corpus text is never read.
   *
   * `broadcastProbes = false` runs the digest probes as shuffled joins
   * for a genuinely huge batch (the family escape hatch; the two
   * driver-side bucket lists stay ≤ numBuckets either way).
   */
  def probeMaximalRepeats(spark: SparkSession, dir: String, batch: DataFrame,
                          idCol: String, textCol: String, maxOcc: Int = 64,
                          broadcastProbes: Boolean = true,
                          tag: Option[String] = None): DataFrame = {
    require(maxOcc >= 2, s"maxOcc must be >= 2: $maxOcc")
    val (kk, nb) = meta(dir)
    val bcast = if (broadcastProbes) (df: DataFrame) => broadcast(df)
                else (df: DataFrame) => df
    val bw = windowsOf(batch, idCol, textCol, kk, nb).localCheckpoint(true)
    val bAgg = bw.groupBy(col("h1"), col("h2"), col("__b"))
      .agg(count(lit(1)).as("__bocc")).localCheckpoint(true)
    // Stored counts restricted to the batch's digests; the scan prunes
    // to the batch digests' buckets first (a no-op for a huge batch,
    // genuine for a small one — both driver lists are ≤ numBuckets).
    val batchBuckets = bAgg.select(col("__b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val stored = readCounts(spark, dir, tag, Some(batchBuckets))
      .join(bcast(bAgg.select(col("h1"), col("h2"))), Seq("h1", "h2"),
        "left_semi")
      .select(col("h1"), col("h2"), col("n_occ").as("__socc"))
    val eligible = bAgg.join(stored, Seq("h1", "h2"), "left")
      .select(col("h1"), col("h2"), col("__b"),
        (col("__bocc") + coalesce(col("__socc"), lit(0L))).as("__occ"))
      .filter(col("__occ") >= 2 && col("__occ") <= maxOcc)
      .select(col("h1"), col("h2"), col("__b"))
      .localCheckpoint(true) // bucket-list collect + two semi probes
    val eligBuckets = eligible.select(col("__b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val eligKeys = eligible.select(col("h1"), col("h2"))
    val kb = bw.join(bcast(eligKeys), Seq("h1", "h2"), "left_semi")
    val cw = readWindows(spark, dir, tag, bucketFilter = Some(eligBuckets))
      .join(bcast(eligKeys), Seq("h1", "h2"), "left_semi")
    def aSide(df: DataFrame) = df.select(col("h1").as("__h1"), col("h2").as("__h2"),
      col("id").as("id_a"), col("i").as("__ia"))
    def bSide(df: DataFrame) = df.select(col("h1").as("__h1"), col("h2").as("__h2"),
      col("id").as("id_b"), col("i").as("__ib"))
    // The in-memory form's two lanes verbatim: every batch-touching pair
    // exactly once — right side in the batch (left anything), plus
    // left-batch/right-corpus (disjoint by construction).
    val pairs = aSide(kb.unionByName(cw))
      .join(bSide(kb), Seq("__h1", "__h2"))
      .where(SpanDedup.canonicalOrder)
      .unionByName(aSide(kb)
        .join(bSide(cw), Seq("__h1", "__h2"))
        .where(SpanDedup.canonicalOrder))
    val runs = SpanDedup.diagonalRuns(pairs, kk)
    // Representative text from the BATCH side: id_b ∈ batch → slice doc
    // b at start_b; otherwise (lane 2) id_a is the batch doc.
    val batchIds = batch.select(col(idCol).as("id_b"))
      .distinct().withColumn("__bb", lit(1))
    val sited = runs.join(bcast(batchIds), Seq("id_b"), "left")
      .select(col("id_a"), col("start_a"), col("id_b"), col("start_b"),
        col("len_tokens"),
        when(col("__bb").isNotNull, col("id_b")).otherwise(col("id_a")).as("__sid"),
        when(col("__bb").isNotNull, col("start_b")).otherwise(col("start_a")).as("__si"))
    batch.select(col(idCol).as("__sid"), SpanDedup.toks(col(textCol)).as("__t"))
      .join(bcast(sited), Seq("__sid"))
      .select(col("id_a"), col("start_a"), col("id_b"), col("start_b"),
        col("len_tokens"),
        concat_ws(" ", slice(col("__t"), col("__si"), col("len_tokens"))).as("span"))
  }
}
