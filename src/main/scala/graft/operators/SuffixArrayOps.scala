package graft.operators

import graft.functions.sig
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/**
 * Distributed SUFFIX ARRAY over the token streams of a document corpus —
 * the exact construction of Lee et al. 2022 ("Deduplicating Training
 * Data Makes Language Models Better", the ExactSubstr paper), whose
 * single-node suffix array [[SpanDedup]] deliberately approximates with
 * fixed-k digest windows. The SA closes the two trades that family
 * documents:
 *
 *  - NO occurrence cap. [[SpanDedup.maximalRepeats]] drops digests above
 *    `maxOcc` occurrences because its pair stage is quadratic in a
 *    digest's multiplicity. Suffix-array discovery is LINEAR in
 *    occurrences — a span repeated 10^6 times is 10^6 adjacent rows in
 *    SA order, and the adjacent-LCP scan reports every site's duplicated
 *    length without ever forming a pair fan-out.
 *  - TRUE per-position duplicated length. A position's `dup_len` is the
 *    exact length of the longest substring starting there that occurs
 *    anywhere else in the corpus (classic SA property: equal-prefix
 *    suffixes are CONTIGUOUS in SA order, so the longest match of any
 *    suffix is against one of its two SA neighbors).
 *
 * Construction — prefix doubling at a `depth`-token base. The base
 * depth trades the ONE string-keyed exchange's width (≈ depth ×
 * avg-token bytes per suffix row) against the number of int-keyed
 * doubling rounds (log2(max doc tokens / depth)); 32 buys two rounds
 * on ~100-token docs and 5-8 on web-scale 1-10k-token docs while the
 * base exchange stays ~32× corpus bytes — the default; shrink it when
 * network is the scarce resource, grow it when round latency is:
 *
 *  1. Suffix rows (id, pos, key) are generated map-side, `key` = the
 *     first `depth` tokens space-joined plus ONE trailing sentinel
 *     space. The sentinel makes an exhausted prefix (suffix shorter
 *     than `depth`) compare strictly before any continuation sharing
 *     its tokens — prefix-first, exactly the full-suffix string order.
 *     Token chars all exceed ' ' (the tokenizer splits on whitespace
 *     runs), so joined-string order equals token-sequence order.
 *  2. Base rank: global DENSE rank of `key` via [[denseRank]].
 *  3. Doubling rounds while `w < max doc tokens`: rank_{2w}(p) is the
 *     dense rank of the pair (rank_w(p), rank_w(p+w)), missing
 *     position → 0 (ranks are ≥ 1), so a suffix ending inside the
 *     window sorts before every continuation — the standard sentinel.
 *     Each round is one int-keyed self-join plus one dense rank, with
 *     the rank pass's `localCheckpoint` pinning lineage flat (the BPE
 *     loop's exponential-plan lesson, round 15).
 *  4. Total order `sa_rank` ([[suffixArray]]): a stitched row number
 *     over the final rank frame, which the construction leaves
 *     PHYSICALLY in (final rank, id, pos) order (the [[suffixRanks]]
 *     ORDER INVARIANT) — equal suffixes tie-break deterministically,
 *     matching the oracle's ORDER BY (suffix, id, pos), with no
 *     re-sort exchange.
 *
 * The rank passes are ONE range exchange each, not three: a window
 * over the range partitions would re-exchange the corpus (checkpointed
 * scans advertise no partitioning, so `Window.partitionBy(part_id)`
 * plans a full shuffle + sort), so global ranks come from the
 * range-sorted checkpoint directly — a partition-count-sized sidecar
 * pass (per-partition distinct count, first/last key) collected to the
 * driver, offsets stitched there (a key SPLIT across adjacent
 * partitions was counted once per partition; each spanned boundary
 * subtracts one), and one map-only pass emits offset + local rank.
 * This is the mapPartitions-as-last-resort case the build rules carve
 * out: rank stitching after a range sort is genuinely partition-local
 * imperative logic, and the declarative alternative shuffles the
 * corpus a second (and third) time for nothing.
 *
 * Skew posture: the range keys append UNIQUE tie columns, so a
 * heavily-duplicated key — the very case this cap-free family exists
 * for — splits across adjacent partitions instead of hot-spotting one;
 * the boundary stitch above makes the split invisible to ranks.
 *
 * Adjacent LCP — exact and unbounded, with adjacency coming from the
 * sort itself, not rank-number joins: [[adjacentBySort]] pairs
 * consecutive rows inside each range partition and stitches the
 * partition boundaries from the same driver sidecar (the previous
 * non-empty partition's last row rides into the next partition's
 * first pair). The `depth`-capped keys the rows already carry resolve
 * any LCP < `depth` via [[graft.functions.CommonPrefixLen]] (codegen;
 * token count = spaces in the matched char prefix, the trailing
 * sentinel making "exhausted at a token boundary" count its final
 * token); the SATURATED pairs — lcp == current depth, a result-sized
 * residue — escalate through doubled depths re-sliced from the docs'
 * token arrays until none saturate (≤ log2(max doc len / depth)
 * rounds, joins sized by the still-saturated pairs, not the corpus).
 *
 * Scale posture (100 TB): suffix rows are one per corpus token — the
 * same O(total tokens) row count every shingle-family op already pays —
 * but the SA costs log(max doc tokens) rank+join passes over them
 * where the shingle inventory costs one exchange; rank tables are
 * materialized per round (localCheckpoint = disk-backed blocks). That
 * log-factor is the documented price of exactness-without-caps; the
 * shingle family remains the cheap screen, the SA the exact path.
 * Suffixes never cross document boundaries (the corpus concatenation
 * of the reference paper adds nothing for whole-document admission
 * semantics and would weld unrelated doc tails into phantom repeats).
 *
 * STALENESS/APPEND CONTRACT: every function here derives from the
 * corpus DataFrame it is handed, per call — a corpus that grew since
 * the last run silently re-derives EVERYTHING (correct, but the full
 * O(corpus · log) construction again; ranks are GLOBAL, so no
 * incremental maintenance exists for them — one appended suffix can
 * shift every rank). The STANDING form is [[SaStore]]: it persists
 * the family's serving capability (the longest-match probe) as
 * per-level window POSITIONS rather than ranks, exactly because
 * positions are additive (append/remove O(batch)) where ranks are
 * not.
 *
 * Cross-validation law (spec-pinned, randomized): a token position is
 * covered by `[p, p + dup_len(p))` for some `dup_len(p) >= L` iff it is
 * covered by a duplicated L-token window (occurrence count >= 2,
 * same-doc repeats included) — every L-window inside a longer match is
 * itself duplicated, and a duplicated L-window IS an L-long match whose
 * start's SA neighbor shares >= L tokens. So [[saScrub]] must remove
 * exactly the tokens the [[SpanDedup.spanWindows]] coverage (occ >= 2)
 * removes — the SA construction end-to-end against the oracle-green
 * window kernel.
 */
object SuffixArrayOps {

  /** The corpus-neighbor fill's per-task query-run buffer cap
    * ([[corpusNeighborPairs]]): ~2M KEYLESS rows (rank, id, pos, isq —
    * the fill carries no suffix strings) ≈ tens of MB of buffered Rows
    * per task — far above any admission batch (the fill's contract is
    * a queries-sized side), far below a corpus-scale partition. A
    * deployment that legitimately needs more (one enormous novel-text
    * document is a contiguous run by construction) raises it per
    * session via [[MaxQueryRunConf]] — no API change needed. */
  private[graft] val DefaultMaxQueryRun: Int = 1 << 21

  /** Session-conf override for the run cap — the refusal's documented
    * exit, reachable from every public entry point
    * ([[longestCorpusMatch]], [[dupLengthsAgainst]],
    * [[dupLengthsAgainstAndWithin]], the Admission exact policy)
    * without threading a parameter through them. */
  val MaxQueryRunConf = "spark.graft.sa.maxQueryRun"

  /** Session-conf override for the doubling round's pos-block size
    * ([[suffixRanks]]'s skew guard): a document longer than this many
    * tokens splits across `(doc, block)` window partitions per round
    * instead of serializing one task — see the loop comment. Docs at or
    * under it (the common case) pay nothing. */
  val DoublingBlockConf = "spark.graft.sa.doublingBlock"
  private[graft] val DefaultDoublingBlock = 1 << 16

  /** One row per token-start suffix: (__id, pos, __key) with `pos` the
    * 1-based token position and `__key` the depth-capped prefix plus
    * the trailing sentinel space. Map-side only; the guarded `sequence`
    * is the [[SpanDedup.spanWindows]] short-doc branch (`sequence(1, 0)`
    * auto-steps DOWNWARD). */
  private[operators] def suffixKeys(docs: DataFrame, idCol: String, textCol: String,
                                    depth: Int): DataFrame = {
    val t = SpanDedup.toks(col(textCol))
    val starts = when(size(t) >= 1, sequence(lit(1), size(t)))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol).as("__id"),
        explode(transform(starts, i =>
          struct(i.as("pos"),
            concat(concat_ws(" ", slice(t, i, lit(depth))), lit(" ")).as("key")))).as("__s"))
      .select(col("__id"), col("__s.pos").as("pos"), col("__s.key").as("__key"))
  }

  /** Range-sort by `sortCols` and materialize (localCheckpoint): the one
    * exchange every rank/adjacency pass below shares. */
  private def rangeSorted(df: DataFrame, sortCols: Seq[Column]): DataFrame =
    df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint(true)

  /** Global rank over the range-sorted checkpoint: sidecar pass 1
    * collects per-partition (row count, distinct-key count, first key,
    * last key) — partition-count-sized; driver stitches offsets
    * (`dense`: a key spanning b boundaries was counted b+1 times — each
    * match of one partition's last key to the next's first subtracts
    * one); pass 2 is map-only, appending `out` = offset + local
    * (dense) rank. Key comparison is by the key columns' Catalyst
    * values (strings/longs here). */
  private def stitchedRank(ranged: DataFrame, keyCols: Seq[String],
                           dense: Boolean, out: String): DataFrame =
    stitchedRankCounted(ranged, keyCols, dense, out)._1

  /** [[stitchedRank]] plus the two counts its sidecar already holds:
    * (frame, distinct-key count = the final cum offset, total rows) —
    * free fuel for the prefix-doubling early exit in [[suffixRanks]]. */
  private def stitchedRankCounted(ranged: DataFrame, keyCols: Seq[String],
                                  dense: Boolean, out: String): (DataFrame, Long, Long) = {
    val schema = ranged.schema
    val kIdx = keyCols.map(schema.fieldIndex)
    def keyOf(r: Row): Seq[Any] = kIdx.map(r.get)
    val side = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var dc = 0L
      var fk: Seq[Any] = null; var prev: Seq[Any] = null
      it.foreach { r =>
        val k = keyOf(r); n += 1
        if (prev == null || k != prev) { dc += 1; if (fk == null) fk = k }
        prev = k
      }
      if (n == 0L) Iterator.empty else Iterator((pid, n, dc, fk, prev))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](ranged.rdd.getNumPartitions)
    var cum = 0L
    var prevLk: Seq[Any] = null
    side.foreach { case (pid, n, dc, fk, lk) =>
      val dup = dense && prevLk != null && fk == prevLk
      offsets(pid) = cum - (if (dup) 1L else 0L)
      cum += (if (dense) dc else n) - (if (dup) 1L else 0L)
      prevLk = lk
    }
    val rdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = offsets(pid)
      var local = 0L
      var prev: Seq[Any] = null
      it.map { r =>
        if (dense) {
          val k = keyOf(r)
          if (prev == null || k != prev) local += 1
          prev = k
        } else local += 1
        Row.fromSeq(r.toSeq :+ (off + local))
      }
    }
    (ranged.sparkSession.createDataFrame(rdd,
      StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(out, LongType, nullable = false))),
      cum, side.map(_._2).sum)
  }

  /** 1-based global DENSE rank of `keyCols` (equal keys share a rank);
    * `tieCols` make the range key unique so hot keys split across
    * partitions — the stitch merges them back. */
  private def denseRank(df: DataFrame, keyCols: Seq[String], tieCols: Seq[String],
                        out: String): DataFrame =
    denseRankCounted(df, keyCols, tieCols, out)._1

  /** [[denseRank]] with (distinct-class count, row count) — both read
    * from the stitch sidecar the rank pass runs anyway. */
  private def denseRankCounted(df: DataFrame, keyCols: Seq[String],
                               tieCols: Seq[String],
                               out: String): (DataFrame, Long, Long) =
    stitchedRankCounted(rangeSorted(df, (keyCols ++ tieCols).map(col)),
      keyCols, dense = true, out)

  /** Every consecutive row pair in `sortCols` order: one range
    * exchange, partition-local pairing, boundaries stitched by carrying
    * each non-empty partition's LAST row (from a driver sidecar of
    * ≤ one row per partition) into the next non-empty partition's
    * first pair. Output columns: prev row as `aNames`, current row as
    * `bNames` (positionally renamed from the input schema). */
  private def adjacentBySort(df: DataFrame, sortCols: Seq[Column],
                             aNames: Seq[String], bNames: Seq[String]): DataFrame = {
    val ranged = rangeSorted(df, sortCols)
    val schema = ranged.schema
    val lasts = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var last: Row = null
      it.foreach(r => last = r)
      if (last == null) Iterator.empty else Iterator((pid, last))
    }.collect().sortBy(_._1)
    val preds = new Array[Row](ranged.rdd.getNumPartitions)
    var prevLast: Row = null
    var i = 0
    var li = 0
    while (i < preds.length) {
      preds(i) = prevLast
      if (li < lasts.length && lasts(li)._1 == i) { prevLast = lasts(li)._2; li += 1 }
      i += 1
    }
    val bc = ranged.sparkSession.sparkContext.broadcast(preds)
    val rdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var prev: Row = bc.value(pid)
      it.flatMap { r =>
        val p = prev
        prev = r
        if (p == null) Iterator.empty
        else Iterator(Row.fromSeq(p.toSeq ++ r.toSeq))
      }
    }
    val fields = aNames.zip(schema.fields).map { case (n, f) => f.copy(name = n) } ++
      bNames.zip(schema.fields).map { case (n, f) => f.copy(name = n) }
    ranged.sparkSession.createDataFrame(rdd, StructType(fields))
  }

  /** Dense full-suffix ranks (__id, pos, __r): equal ranks ⟺ equal
    * token suffixes, rank order = suffix order (prefix-first).
    *
    * ORDER INVARIANT (consumers rely on it — [[suffixArray]]'s
    * order-preserving total rank, [[corpusNeighborLcp]]'s sort-free
    * fill): the returned frame's PHYSICAL row order is
    * (__r asc, __id asc, pos asc) on every exit path. Base-only exit:
    * the frame is the (__key, __id, pos) range-sorted checkpoint
    * (key order = suffix order = rank order, ties already (id, pos)).
    * After any doubling round: the frame is a narrow projection over
    * that round's (__r, __r2, __id, pos) range-sorted checkpoint, and
    * the new rank is dense in exactly that order (tie cols included).
    * Narrow projections and the stitch's mapPartitions preserve
    * partition indices and intra-partition order, so the invariant
    * survives to the caller. */
  private[graft] def suffixRanks(docs: DataFrame, idCol: String, textCol: String,
                                 depth: Int): DataFrame = {
    require(depth >= 2, s"base depth must be >= 2: $depth")
    val blockConf = docs.sparkSession.conf.getOption(DoublingBlockConf).map { raw =>
      val n = try raw.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$DoublingBlockConf must be a positive int, got '$raw'")
      }
      require(n > 0, s"$DoublingBlockConf must be a positive int, got '$raw'")
      n
    }.getOrElse(DefaultDoublingBlock)
    val (s0, classes0, rows) = denseRankCounted(
      suffixKeys(docs, idCol, textCol, depth),
      Seq("__key"), Seq("__id", "pos"), "__r")
    var s = s0.select(col("__id"), col("pos"), col("__r"))
    val maxLen = docs.select(max(size(SpanDedup.toks(col(textCol)))))
      .collect().headOption.flatMap(r => Option(r.get(0)))
      .map(_.asInstanceOf[Int]).getOrElse(0)
    var w = depth
    var classes = classes0
    // EARLY EXIT (the classic prefix-doubling stop, read for free from
    // the rank stitch's sidecar): once every suffix holds a DISTINCT
    // rank the order is total and further rounds cannot change it; and
    // once a doubling splits NO class the partition is final even with
    // equal suffixes still sharing ranks (no refinement at 2w ⟹ none
    // at any width — the standard stability induction), which is the
    // exit corpora with exact-duplicate documents take. Natural text
    // therefore pays ~log(longest repeated span) rounds, not
    // log(longest document) — the difference between 2 and 7 rounds on
    // web-scale docs.
    var done = classes == rows
    while (!done && w < maxLen) {
      // rank_w(p+w) is a partition-local window read, not a self-join:
      // positions are contiguous 1..n per doc (suffixKeys emits
      // sequence(1, n)), so a ROW offset of w in (id, pos) order IS a
      // position offset of w. One hash exchange per round where the old
      // (s ⋈ s-shifted) SMJ exchanged the rank relation twice and
      // scanned it twice. Missing position (p+w > n) → lead() null → 0,
      // the standard rank sentinel (ranks are >= 1).
      //
      // SKEW GUARD (r20): `partition by __id` alone puts a document's
      // ENTIRE rank relation in one window task per round — at corpus
      // scale one book-length outlier serializes the round. The window
      // partitions by (__id, pos-block) instead, block size
      // B = max(conf, w): each block's first w rows are DONATED to the
      // previous block (flagged, dropped after the read), so the last
      // native rows of a block still see lead(w) — positions stay
      // contiguous inside the padded partition, and the computed value
      // is exactly the unsalted window's. Docs ≤ B tokens live in block
      // 0 with zero donated copies — the common case pays only the
      // extra grouping column; only outliers split. Late rounds where
      // w outgrows the conf block degrade gracefully (B = w keeps the
      // donation bounded at 2× rows, len/w blocks), and the early exit
      // usually ends the loop before they run.
      val bSize = math.max(blockConf, w).toLong
      val paired = if (bSize >= maxLen) {
        // no doc spans a block — the guard is structurally inert, and
        // the donated-rows union would only re-scan the rank frame; the
        // plain per-doc window is the same partitioning
        val win = Window.partitionBy(col("__id")).orderBy(col("pos"))
        s.select(col("__id"), col("pos"), col("__r"),
          coalesce(lead(col("__r"), w).over(win), lit(0L)).as("__r2"))
      } else {
        val blk = floor((col("pos") - 1) / lit(bSize.toDouble)).cast("long")
        val native = s.select(col("__id"), col("pos"), col("__r"),
          blk.as("__blk"), lit(1).as("__nat"))
        val donated = native.filter(col("__blk") >= 1 &&
            (col("pos") - 1) % lit(bSize) < lit(w.toLong))
          .select(col("__id"), col("pos"), col("__r"),
            (col("__blk") - 1).as("__blk"), lit(0).as("__nat"))
        val win = Window.partitionBy(col("__id"), col("__blk")).orderBy(col("pos"))
        native.unionByName(donated)
          .select(col("__id"), col("pos"), col("__r"), col("__nat"),
            coalesce(lead(col("__r"), w).over(win), lit(0L)).as("__r2"))
          .filter(col("__nat") === 1)
          .select(col("__id"), col("pos"), col("__r"), col("__r2"))
      }
      val (s2, c2, _) = denseRankCounted(paired, Seq("__r", "__r2"),
        Seq("__id", "pos"), "__rn")
      s = s2.select(col("__id"), col("pos"), col("__rn").as("__r"))
      done = c2 == rows || c2 == classes
      classes = c2
      w *= 2
    }
    s
  }

  /**
   * The suffix array: (idCol, pos, sa_rank) — `sa_rank` the 1-based
   * TOTAL rank in (suffix, id, pos) order.
   */
  def suffixArray(docs: DataFrame, idCol: String, textCol: String,
                  depth: Int = 32): DataFrame =
    // No re-sort: suffixRanks' ORDER INVARIANT means the frame is
    // already physically in (__r, __id, pos) order, so the total rank
    // is a plain stitched row number over it — the old totalRank paid a
    // full range exchange (sampling pass + shuffle + sort + checkpoint)
    // to re-establish the order the construction just produced.
    // No extra materialization either: suffixRanks' output is a narrow
    // projection over the last rank pass's checkpoint, so the stitch's
    // two passes replay a cheap map instead of pinning a second
    // corpus-sized copy in the block manager (an eager localCheckpoint
    // here measured as pure overhead — r20 A/B).
    stitchedRank(suffixRanks(docs, idCol, textCol, depth),
      Seq.empty, dense = false, "sa_rank")
      .withColumnRenamed("__id", idCol)
      .drop("__r")

  /** Token-level LCP from a char-level common-prefix length over the
    * sentinel-terminated keys: every shared token contributes exactly
    * one space to the matched char prefix (interior separator, or the
    * sentinel when a side exhausts at that token). */
  private def tokenLcp(key: Column, chars: Column): Column = {
    val pfx = key.substr(lit(1), chars)
    (length(pfx) - length(translate(pfx, " ", ""))).cast("int")
  }

  /**
   * Exact adjacent-suffix LCP in tokens: (id_a, pos_a, id_b, pos_b,
   * lcp) for every consecutive SA pair. Adjacency needs no rank
   * numbers — [[adjacentBySort]] pairs the (rank, id, pos, key) rows in
   * SA order directly; depth-capped keys resolve the bulk; saturated
   * pairs escalate through doubled depths (result-sized re-slice
   * joins) until exact.
   */
  def adjacentLcp(docs: DataFrame, idCol: String, textCol: String,
                  depth: Int = 32): DataFrame = {
    val keyed = suffixRanks(docs, idCol, textCol, depth)
      .join(suffixKeys(docs, idCol, textCol, depth), Seq("__id", "pos"))
      .select(col("__r"), col("__id"), col("pos"), col("__key"))
    val base = adjacentBySort(keyed,
      Seq(col("__r"), col("__id"), col("pos")),
      aNames = Seq("__ra", "id_a", "pos_a", "__ka"),
      bNames = Seq("__rb", "id_b", "pos_b", "__kb"))
    resolveLcp(base, docs, idCol, textCol, depth)
  }

  /** The exact-LCP kernel over (id_a, pos_a, __ka, id_b, pos_b, __kb)
    * pair rows: depth-capped keys resolve the bulk in one codegen map;
    * SATURATED pairs (lcp == current depth — a result-sized residue)
    * escalate through doubled depths re-sliced from the docs' token
    * arrays until exact. Shared by [[adjacentLcp]] and
    * [[longestCorpusMatch]] (whose pair sides span two document sets —
    * `docs` must cover every id either side carries).
    * Termination: lcp is bounded by the shorter remaining suffix, so
    * once d exceeds max doc tokens no pair can read lcp == d. A pair
    * exhausted-equal at exactly the previous depth re-resolves one
    * round late (its recomputed lcp < d) — wasted work bounded by the
    * pair count, never wrong. */
  private def resolveLcp(pairs: DataFrame, docs: DataFrame, idCol: String,
                         textCol: String, depth: Int): DataFrame = {
    val base = pairs
      .withColumn("lcp", tokenLcp(col("__ka"),
        sig.commonPrefixLen(col("__ka"), col("__kb"))))
      .select(col("id_a"), col("pos_a"), col("id_b"), col("pos_b"), col("lcp"))
      .localCheckpoint(true)
    escalateLcp(base.where(col("lcp") < depth),
      base.where(col("lcp") === depth)
        .select(col("id_a"), col("pos_a"), col("id_b"), col("pos_b")),
      docs, idCol, textCol, depth * 2)
  }

  /** Exact LCP for pair rows carrying NO keys — the base round
    * re-slices width-`depth` keys from the docs' token arrays, then
    * escalates exactly like [[resolveLcp]]. Used where the pair set is
    * far SMALLER than the suffix relation (the corpus-neighbor fill:
    * ~3 pairs per query suffix): re-deriving keys for the pairs costs
    * pairs-sized joins, where carrying keys would regenerate the whole
    * suffix-key relation, join it corpus-sized onto the ranks, and drag
    * the strings through the fill's range exchange. */
  private def resolveLcpBySlicing(pairs: DataFrame, docs: DataFrame,
                                  idCol: String, textCol: String,
                                  depth: Int): DataFrame =
    escalateLcp(
      pairs.select(col("id_a"), col("pos_a"), col("id_b"), col("pos_b"),
        lit(0).cast("int").as("lcp")).limit(0),
      pairs.select(col("id_a"), col("pos_a"), col("id_b"), col("pos_b")),
      docs, idCol, textCol, depth)

  /** The shared escalation loop: rekey `pending` at width `d0` from the
    * docs' token arrays, resolve lcp < d, double until no pair
    * saturates; `resolved0` carries any pairs already resolved at
    * widths below d0. */
  private def escalateLcp(resolved0: DataFrame, pending0: DataFrame,
                          docs: DataFrame, idCol: String, textCol: String,
                          d0: Int): DataFrame = {
    val toksDf = docs.select(col(idCol).as("__tid"),
      SpanDedup.toks(col(textCol)).as("__t"))
    var resolved = resolved0
    var pending = pending0
    var d = d0
    while (!pending.isEmpty) {
      val dl = lit(d)
      val rekeyed = pending
        .join(toksDf.select(col("__tid").as("id_a"), col("__t").as("__ta")), Seq("id_a"))
        .join(toksDf.select(col("__tid").as("id_b"), col("__t").as("__tb")), Seq("id_b"))
        .withColumn("__ka",
          concat(concat_ws(" ", slice(col("__ta"), col("pos_a"), dl)), lit(" ")))
        .withColumn("__kb",
          concat(concat_ws(" ", slice(col("__tb"), col("pos_b"), dl)), lit(" ")))
        .withColumn("lcp", tokenLcp(col("__ka"),
          sig.commonPrefixLen(col("__ka"), col("__kb"))))
        .select(col("id_a"), col("pos_a"), col("id_b"), col("pos_b"), col("lcp"))
        .localCheckpoint(true)
      resolved = resolved.unionByName(rekeyed.where(col("lcp") < d))
      pending = rekeyed.where(col("lcp") === d)
        .select(col("id_a"), col("pos_a"), col("id_b"), col("pos_b"))
      d *= 2
    }
    resolved
  }

  /**
   * Per-position duplicated length: (idCol, pos, dup_len) — the exact
   * length of the longest substring starting at `pos` that occurs
   * anywhere else in the corpus (same-doc repeats included, the
   * [[SpanDedup.maximalRepeats]] convention), for positions with
   * dup_len >= `minLen`. max over a suffix's ≤ 2 SA neighbors — the
   * contiguity property makes that the global max.
   */
  def saDupLengths(docs: DataFrame, idCol: String, textCol: String,
                   minLen: Int, depth: Int = 32): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    val p = adjacentLcp(docs, idCol, textCol, depth)
    p.select(col("id_a").as("__id"), col("pos_a").as("pos"), col("lcp"))
      .unionByName(p.select(col("id_b").as("__id"), col("pos_b").as("pos"), col("lcp")))
      .groupBy(col("__id"), col("pos"))
      .agg(max(col("lcp")).as("dup_len"))
      .where(col("dup_len") >= minLen)
      .select(col("__id").as(idCol), col("pos"), col("dup_len"))
  }

  /**
   * SA-based ExactSubstr scrub: remove every token covered by a
   * duplicated run of >= `minLen` tokens — [[SpanDedup.scrubSpans]]
   * semantics at occurrence (not distinct-doc) threshold 2, computed
   * with no occurrence cap and true variable-length extents. Coverage
   * intervals [pos, pos + dup_len) merge per-doc BEFORE exploding
   * (running-max gaps-and-islands, per-doc windows), so the coverage
   * relation is disjoint — exactly n_removed rows, not the k× overlap
   * blowup — and [[SpanDedup.scrubWithCoverage]]'s distinctness
   * contract holds by construction.
   */
  def saScrub(docs: DataFrame, idCol: String, textCol: String,
              minLen: Int, depth: Int = 32): DataFrame =
    scrubFromDupLengths(docs, idCol, textCol,
      saDupLengths(docs, idCol, textCol, minLen, depth))

  /** The scrub tail shared by every dup-length producer ([[saScrub]],
    * [[saScrubAgainst]], [[SaStore.scrub]]): coverage intervals
    * [pos, pos + dup_len) merge per-doc BEFORE exploding
    * (running-max gaps-and-islands), so the coverage relation is
    * disjoint — exactly n_removed rows — and
    * [[SpanDedup.scrubWithCoverage]]'s distinctness contract holds by
    * construction. `dl` = (idCol, pos, dup_len). */
  private[graft] def scrubFromDupLengths(docs: DataFrame, idCol: String,
                                             textCol: String,
                                             dl0: DataFrame): DataFrame = {
    val dl = dl0
      .select(col(idCol), col("pos"), (col("pos") + col("dup_len") - 1).as("__end"))
    val before = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val merged = dl
      .withColumn("__new",
        when(col("pos") > coalesce(max(col("__end")).over(before), lit(-1)), lit(1))
          .otherwise(lit(0)))
      .withColumn("__grp", sum(col("__new")).over(upto))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).as("__s"), max(col("__end")).as("__e"))
    val cover = merged
      .select(col(idCol), explode(sequence(col("__s"), col("__e"))).as("pos"))
      .withColumn("__cov", lit(1))
    SpanDedup.scrubWithCoverage(docs, idCol, textCol, cover)
  }

  /** For every QUERY suffix row (`__isq` == 1), its nearest CORPUS
    * suffix row before AND after in `sortCols` order, as KEYLESS pair
    * rows — corpus side (id_a, pos_a), query side (id_b, pos_b), LCP
    * resolution deferred to [[resolveLcpBySlicing]] (pairs-sized key
    * re-derivation beats carrying suffix-key strings through this
    * fill's range exchange AND the corpus-sized ranks⋈keys join that
    * used to precede it). Partition-local forward/backward fills over
    * the range-sorted checkpoint, boundaries stitched from a
    * per-partition (first-corpus-row, last-corpus-row, last-query-row)
    * driver sidecar. Query rows with no corpus row on a given side emit
    * no pair for that side.
    *
    * `withQueryPairs` ALSO emits every consecutive query-query pair
    * (previous query row as side a) — adjacency among the query rows of
    * the union sort IS adjacency in the query-only SA (a constant id
    * offset preserves the tie order), so these pairs carry the
    * query-internal max-LCP signal ([[saDupLengths]]' adjacent pairs)
    * from the SAME ranked stream, sparing the second SA construction
    * the exact admission scrub used to pay. */
  private[graft] def corpusNeighborPairs(df: DataFrame, sortCols: Seq[Column],
      withQueryPairs: Boolean = false,
      maxQueryRun: Int = 0,
      assumeSorted: Boolean = false,
      // With `pairFlagCol`, only query rows whose flag == 1 join the
      // query-query lane (chain AND emission) — the restriction-of-a-
      // total-order property: adjacency among the flagged rows of the
      // union sort IS adjacency in the flagged-only SA, exactly as the
      // query lane itself restricts the union. The corpus-query lane
      // always covers EVERY query row. None = all query rows flagged
      // (the historical behavior).
      pairFlagCol: Option[String] = None): DataFrame = {
    // 0 (the public entry points' value) resolves the cap from the
    // session conf so the refusal's remedy is actually reachable.
    val maxRun =
      if (maxQueryRun > 0) maxQueryRun
      else df.sparkSession.conf.getOption(MaxQueryRunConf).map { raw =>
        // Parse loudly: a malformed or non-positive conf value must
        // name the key it came from, not surface as a bare
        // NumberFormatException mid-job.
        val n = try raw.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$MaxQueryRunConf must be a positive int, got '$raw'")
        }
        require(n > 0, s"$MaxQueryRunConf must be a positive int, got '$raw'")
        n
      }.getOrElse(DefaultMaxQueryRun)
    // `assumeSorted`: the caller certifies df is ALREADY physically in
    // `sortCols` order (the suffixRanks ORDER INVARIANT — the fill's one
    // in-engine caller feeds it a narrow projection of the final rank
    // checkpoint). Skipping the redundant range re-sort saves the
    // sampling pass + a full corpus-sized exchange per fill; the
    // checkpoint stays (the sidecar + pair passes below read the frame
    // three times).
    val ranged = if (assumeSorted) df.localCheckpoint(true)
                 else rangeSorted(df, sortCols)
    val schema = ranged.schema
    val iId = schema.fieldIndex("__id")
    val iPos = schema.fieldIndex("pos")
    val iQ = schema.fieldIndex("__isq")
    val iF = pairFlagCol.map(schema.fieldIndex)
    def isQ(r: Row): Boolean = r.getInt(iQ) == 1
    def isFlagged(r: Row): Boolean = iF.forall(i => r.getInt(i) == 1)
    val side = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: Row = null
      var last: Row = null
      var lastQ: Row = null
      it.foreach { r =>
        if (!isQ(r)) { if (first == null) first = r; last = r }
        else if (withQueryPairs && isFlagged(r)) lastQ = r
      }
      if (last == null && lastQ == null) Iterator.empty
      else Iterator((pid, first, last, lastQ))
    }.collect().sortBy(_._1)
    val np = ranged.rdd.getNumPartitions
    val prevFor = new Array[Row](np)
    val prevQFor = new Array[Row](np)
    val nextFor = new Array[Row](np)
    var carry: Row = null
    var carryQ: Row = null
    var li = 0
    var i = 0
    while (i < np) {
      prevFor(i) = carry
      prevQFor(i) = carryQ
      if (li < side.length && side(li)._1 == i) {
        if (side(li)._3 != null) carry = side(li)._3
        if (side(li)._4 != null) carryQ = side(li)._4
        li += 1
      }
      i += 1
    }
    carry = null; li = side.length - 1; i = np - 1
    while (i >= 0) {
      nextFor(i) = carry
      if (li >= 0 && side(li)._1 == i) {
        if (side(li)._2 != null) carry = side(li)._2
        li -= 1
      }
      i -= 1
    }
    val bcPrev = ranged.sparkSession.sparkContext.broadcast(prevFor)
    val bcPrevQ = ranged.sparkSession.sparkContext.broadcast(prevQFor)
    val bcNext = ranged.sparkSession.sparkContext.broadcast(nextFor)
    // Streaming pass — the kernel discipline of this file (one-row
    // state, never a buffered partition): predecessor pairs (corpus and
    // query sided) emit inline; successor pairs buffer only the CURRENT
    // RUN of consecutive query rows (queries are sparse among corpus
    // suffixes by construction), flushing against each corpus row, the
    // trailing run against the next-partition sidecar.
    // BOUND: the run buffer is O(longest stretch of query suffixes with
    // no interleaved corpus row). A query doc of entirely novel tokens
    // clusters all its suffixes contiguously, so the worst case is
    // O(largest query doc's token count) — and, for a query SET of
    // mutually-novel docs sorting adjacent, up to one sort partition.
    // Acceptable by the probe's own contract (query batches are small
    // relative to the corpus — the op is queries-sized by design); a
    // corpus-scale "query" side belongs in the batch SA construction,
    // not this fill — and the bound is ENFORCED, not assumed: a run
    // past `maxQueryRun` refuses loudly below.
    val rdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      def pair(c: Row, q: Row): Row = Row(
        c.get(iId), c.get(iPos), q.get(iId), q.get(iPos))
      var lastC: Row = bcPrev.value(pid)
      var lastQ: Row = bcPrevQ.value(pid)
      val run = scala.collection.mutable.ArrayBuffer.empty[Row]
      it.flatMap { r =>
        if (isQ(r)) {
          // ENFORCED bound (not just documented): a run this long means
          // the query side is approaching corpus scale — outside this
          // fill's queries-sized contract — and silently buffering it
          // is the OOM nobody can attribute. Refuse loudly instead,
          // BEFORE appending, so the buffer never actually exceeds the
          // stated cap. (The throw is executor-side, so Spark retries
          // the task spark.task.maxFailures times — each attempt
          // re-buffers up to the cap and refuses again — before the
          // job fails with this message.)
          if (run.length >= maxRun)
            throw new IllegalStateException(
              s"corpus-neighbor fill hit more than $maxRun consecutive " +
                "query suffixes with no interleaved corpus row — the " +
                "query side is approaching corpus scale, which this " +
                "queries-sized fill does not serve; split the query " +
                s"batch (the op's contract) or raise $MaxQueryRunConf " +
                "in the session conf if the executors genuinely have " +
                "the memory (the refusal repeats on each task retry)")
          run += r
          val flagged = withQueryPairs && isFlagged(r)
          val qq = if (flagged && lastQ != null)
            Iterator.single(pair(lastQ, r)) else Iterator.empty
          if (flagged) lastQ = r
          qq ++ (if (lastC != null) Iterator.single(pair(lastC, r))
                 else Iterator.empty)
        } else {
          val flushed = run.toArray.iterator.map(q => pair(r, q))
          run.clear()
          lastC = r
          flushed
        }
      } ++ {
        // Reached only after the input iterator drains (Iterator.++ is
        // by-name): the partition-trailing query run pairs with the
        // first corpus row of a FOLLOWING partition, if any.
        val nc = bcNext.value(pid)
        if (nc == null) Iterator.empty
        else run.iterator.map(q => pair(nc, q))
      }
    }
    import org.apache.spark.sql.types.StructField
    val f = schema.fields
    ranged.sparkSession.createDataFrame(rdd, StructType(Seq(
      StructField("id_a", f(iId).dataType, nullable = false),
      StructField("pos_a", f(iPos).dataType, nullable = false),
      StructField("id_b", f(iId).dataType, nullable = false),
      StructField("pos_b", f(iPos).dataType, nullable = false))))
  }

  /**
   * UNBOUNDED ∞-gram longest match — the suffix-array form of
   * [[InfiniGram.probe]]'s length report (its scaladoc's documented
   * alternative): for each query, the length of the LONGEST query
   * suffix occurring anywhere in the corpus, with no maxN bound — a
   * 100-token verbatim copy reports 100 where the bounded probe
   * saturates at maxN.
   *
   * Construction: the queries join the corpus as pseudo-documents
   * (ids offset into a disjoint range — REQUIRED disjoint, checked
   * loudly) and the union's suffix ranks are computed once. A query
   * suffix qs occurs in the corpus iff a corpus suffix has qs as a
   * PREFIX, and the set of qs-prefixed strings is a contiguous range
   * starting at qs in suffix order — so it suffices to test qs's
   * NEAREST corpus neighbors in SA order (the successor catches
   * proper extensions; the predecessor catches corpus suffixes EQUAL
   * to qs, which tie-break before the query's offset ids):
   * containment ⟺ exact LCP (the shared [[resolveLcp]] kernel) equals
   * the query suffix's full remaining length. match_len = the max
   * remaining length over contained suffix positions; queries with no
   * contained suffix report 0 (the probe is total).
   *
   * Cost: the union SA (the log-round construction) + one
   * range-sorted fill pass + pairwise LCP on 2 rows per QUERY suffix —
   * nothing quadratic, no occurrence cap, no width bound.
   */
  def longestCorpusMatch(corpus: DataFrame, idCol: String, textCol: String,
                         queries: DataFrame, qIdCol: String, qTextCol: String,
                         depth: Int = 32,
                         idOffset: Long = 1000000000L): DataFrame = {
    val (lcp, qdocs) = corpusNeighborLcp(corpus, idCol, textCol,
      queries, qIdCol, qTextCol, depth, idOffset)
    val qlen = qdocs.select(col("__id").as("id_b"),
      size(SpanDedup.toks(col("__text"))).as("__n"))
    val contained = lcp.join(qlen, Seq("id_b"))
      .where(col("lcp") === col("__n") - col("pos_b") + 1)
      .groupBy(col("id_b"))
      .agg(max(col("lcp")).as("match_len"))
    queries.select(col(qIdCol).as("q_id"))
      .join(contained, (col("q_id") + idOffset) === col("id_b"), "left")
      .select(col("q_id"),
        coalesce(col("match_len"), lit(0)).cast("int").as("match_len"))
  }

  /**
   * ATTRIBUTION, in-memory reference form — the corpus SITES of each
   * query's longest match: (q_id, match_len, doc_id, pos), one row per
   * corpus occurrence of the matched span, capped at `maxSites` per
   * query by the deterministic (doc_id, pos) order —
   * [[SaStore.attributeMatches]]' exact shape computed from a corpus
   * DataFrame: [[longestCorpusMatch]] finds the lengths, then ONE
   * corpus window pass at the matched DISTINCT lengths digest-joins
   * the spans (128-bit, the family's standing collision convention —
   * the span strings never ride the exchange). Queries with no match
   * emit no rows. O(corpus tokens × distinct matched lengths) per
   * call — the documented in-memory reference cost; the standing form
   * is the store probe.
   */
  def attributeCorpusMatches(corpus: DataFrame, idCol: String, textCol: String,
                             queries: DataFrame, qIdCol: String, qTextCol: String,
                             maxSites: Int = 10, depth: Int = 32,
                             idOffset: Long = 1000000000L): DataFrame =
    attributeSitesFor(corpus, idCol, textCol, queries, qIdCol, qTextCol,
      longestCorpusMatch(corpus, idCol, textCol,
        queries, qIdCol, qTextCol, depth, idOffset), maxSites)

  /** The site-report tail of [[attributeCorpusMatches]] over
    * PRECOMPUTED (q_id, match_len) lengths — so a caller that already
    * holds them (the attribution-reporting admission funnel reads them
    * off [[dupLengthsAndCorpusMatches]]' shared union SA) skips the
    * second [[longestCorpusMatch]] construction entirely. */
  def attributeSitesFor(corpus: DataFrame, idCol: String, textCol: String,
                        queries: DataFrame, qIdCol: String, qTextCol: String,
                        matches: DataFrame, maxSites: Int = 10): DataFrame = {
    require(maxSites >= 1, s"maxSites must be >= 1: $maxSites")
    val m = matches.filter(col("match_len") >= 1).localCheckpoint(true)
    val ls = m.select(col("match_len")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (ls.isEmpty)
      return m.select(col("q_id"), col("match_len"),
        lit(0L).as("doc_id"), lit(0).as("pos")).limit(0)
    def d1(l: Column, sp: Column) = xxhash64(l, sp)
    def d2(l: Column, sp: Column) = xxhash64(lit(1L), l, sp)
    val qt = queries.select(col(qIdCol).as("q_id"),
      SpanDedup.toks(col(qTextCol)).as("__t"))
    val qs = m.join(qt, Seq("q_id"))
      .select(col("q_id"), col("match_len"),
        concat_ws(" ", slice(col("__t"),
          size(col("__t")) - col("match_len") + 1, col("match_len"))).as("__sp"))
      .select(col("q_id"), col("match_len"),
        d1(col("match_len"), col("__sp")).as("h1"),
        d2(col("match_len"), col("__sp")).as("h2"))
    val t = SpanDedup.toks(col(textCol))
    val lsArr = array(ls.map(l => lit(l)): _*)
    val cw = corpus.select(col(idCol).cast("long").as("doc_id"),
      explode(flatten(transform(lsArr, l => {
        val starts = when(size(t) >= l, sequence(lit(1), size(t) - l + 1))
          .otherwise(array().cast("array<int>"))
        transform(starts, i => {
          val sp = concat_ws(" ", slice(t, i, l))
          struct(i.as("pos"), l.as("L"), d1(l, sp).as("h1"), d2(l, sp).as("h2"))
        })
      }))).as("__w"))
      .select(col("doc_id"), col("__w.pos").as("pos"),
        col("__w.L").as("match_len"), col("__w.h1").as("h1"),
        col("__w.h2").as("h2"))
    val rn = Window.partitionBy(col("q_id")).orderBy(col("doc_id"), col("pos"))
    cw.join(broadcast(qs), Seq("match_len", "h1", "h2"))
      .withColumn("__rn", row_number().over(rn))
      .where(col("__rn") <= maxSites)
      .select(col("q_id"), col("match_len"), col("doc_id"), col("pos"))
  }

  /**
   * Per-position duplicated length of `batch` AGAINST `corpus` — the
   * incremental-admission form of [[saDupLengths]]: (idCol of batch,
   * pos, dup_len) where dup_len is the exact length of the longest
   * substring starting at `pos` in the batch document that occurs
   * ANYWHERE IN THE CORPUS (batch-internal repeats deliberately do not
   * count — the standing corpus is the dedup authority), for positions
   * with dup_len >= `minLen`. Construction: the union SA's
   * nearest-corpus fill ([[corpusNeighborPairs]]) + the exact LCP
   * kernel — a batch position's longest corpus match is its max LCP
   * against its two nearest CORPUS suffixes in SA order (the same
   * contiguity property [[saDupLengths]] uses, restricted to the
   * corpus side). Same per-call cost shape as [[longestCorpusMatch]]
   * (the union SA rebuilds every call) — [[SaStore.probeDupLengths]]
   * is the standing form.
   */
  def dupLengthsAgainst(corpus: DataFrame, idCol: String, textCol: String,
                        batch: DataFrame, bIdCol: String, bTextCol: String,
                        minLen: Int, depth: Int = 32,
                        idOffset: Long = 1000000000L): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1: $minLen")
    val (lcp, _) = corpusNeighborLcp(corpus, idCol, textCol,
      batch, bIdCol, bTextCol, depth, idOffset)
    lcp.groupBy(col("id_b"), col("pos_b"))
      .agg(max(col("lcp")).as("dup_len"))
      .where(col("dup_len") >= minLen)
      .select((col("id_b") - idOffset).as(bIdCol), col("pos_b").as("pos"),
        col("dup_len").cast("int").as("dup_len"))
  }

  /**
   * Per-position duplicated length of `batch` against corpus ∪ (batch
   * minus the position's own suffix) — the exact admission policy's
   * FULL coverage ([[graft.pipelines.Admission]]'s exact scrub:
   * corpus-side AND batch-internal duplication both count) from ONE
   * union SA: ≡ the max-merge of [[dupLengthsAgainst]] and
   * [[saDupLengths]](batch) (spec-pinned), but where that pair builds
   * the union (corpus ∪ batch) SA and then a SECOND batch-only SA, the
   * batch-internal signal here rides the SAME ranked stream — the
   * union sort's query rows keep the batch-only SA's relative order
   * (the constant id offset preserves tie order), so consecutive
   * query-query pairs ARE the batch SA's adjacent pairs
   * ([[corpusNeighborPairs]]' `withQueryPairs` lane). One construction,
   * one fill pass, one LCP kernel run over both pair kinds.
   */
  def dupLengthsAgainstAndWithin(corpus: DataFrame, idCol: String, textCol: String,
                                 batch: DataFrame, bIdCol: String, bTextCol: String,
                                 minLen: Int, depth: Int = 32,
                                 idOffset: Long = 1000000000L): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    val (lcp, _) = corpusNeighborLcp(corpus, idCol, textCol,
      batch, bIdCol, bTextCol, depth, idOffset, withQueryPairs = true)
    // Corpus-query pairs contribute to their query (b) side only (the
    // a side filters out below — corpus positions are not reported);
    // query-query pairs contribute to BOTH sides, exactly as
    // saDupLengths folds its adjacent pairs.
    lcp.select(col("id_a").as("__id"), col("pos_a").as("pos"), col("lcp"))
      .unionByName(lcp.select(col("id_b").as("__id"), col("pos_b").as("pos"),
        col("lcp")))
      .where(col("__id") >= idOffset)
      .groupBy(col("__id"), col("pos"))
      .agg(max(col("lcp")).as("dup_len"))
      .where(col("dup_len") >= minLen)
      .select((col("__id") - idOffset).as(bIdCol), col("pos"),
        col("dup_len").cast("int").as("dup_len"))
  }

  /** ExactSubstr admission scrub of `batch` against `corpus` — remove
    * every batch token covered by a >= `minLen` run occurring anywhere
    * in the corpus; [[saScrub]]'s coverage/merge/reassembly tail over
    * [[dupLengthsAgainst]]. The cap-free, variable-length counterpart
    * of [[SpanDedup.scrubAgainstIndex]]'s fixed-k digest screen. */
  def saScrubAgainst(corpus: DataFrame, idCol: String, textCol: String,
                     batch: DataFrame, bIdCol: String, bTextCol: String,
                     minLen: Int, depth: Int = 32): DataFrame =
    scrubFromDupLengths(batch, bIdCol, bTextCol,
      dupLengthsAgainst(corpus, idCol, textCol, batch, bIdCol, bTextCol,
        minLen, depth))

  /** The shared union-SA nearest-corpus LCP pass: exact LCP pair rows
    * (corpus side a, query side b — `id_b` still OFFSET) plus the
    * offset query pseudo-doc frame. Factored from
    * [[longestCorpusMatch]]; [[dupLengthsAgainst]] consumes the same
    * pairs without the containment filter. */
  private def corpusNeighborLcp(corpus: DataFrame, idCol: String, textCol: String,
                                queries: DataFrame, qIdCol: String, qTextCol: String,
                                depth: Int, idOffset: Long,
                                withQueryPairs: Boolean = false,
                                // Pre-offset query ids whose rows alone join
                                // the query-query lane (None = all of them) —
                                // [[dupLengthsAndCorpusMatches]]' survivor set.
                                pairFlagIds: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    // try_cast, not cast: under ANSI a malformed id would throw an
    // opaque executor CAST_INVALID_INPUT mid-plan; try_cast yields NULL
    // and the count below turns that into THIS operator's loud refusal.
    def idAsLong(c: Column) = c.try_cast("long")
    val bounds = corpus.select(max(idAsLong(col(idCol))),
        count(when(idAsLong(col(idCol)).isNull, 1)))
      .crossJoin(queries.select(min(idAsLong(col(qIdCol))),
        count(when(idAsLong(col(qIdCol)).isNull, 1))))
      .collect().headOption
    val maxCid = bounds.flatMap(r => Option(r.get(0)))
      .map(_.asInstanceOf[Long]).getOrElse(Long.MinValue)
    val minQid = bounds.flatMap(r => Option(r.get(2)))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    // A null or non-numeric id casts to NULL: the max/min bounds above
    // would collapse to their defaults, both disjointness guards would
    // pass, and the union would carry all-null __id keys — silently
    // wrong match lengths. Refuse loudly instead (same aggregate pass).
    val badIds = bounds.map(r => (r.getLong(1), r.getLong(3))).getOrElse((0L, 0L))
    require(badIds._1 == 0L && badIds._2 == 0L,
      s"id columns must be non-null and numeric-castable: ${badIds._1} " +
        s"corpus and ${badIds._2} query ids cast to NULL as long")
    require(maxCid < idOffset,
      s"corpus ids reach $maxCid >= idOffset $idOffset — the pseudo-doc " +
        "id ranges must be disjoint; raise idOffset")
    // BOTH sides of the disjointness contract are loud: a negative
    // query id would map BELOW the offset, silently classifying that
    // query's suffixes as corpus (and possibly colliding with a real
    // corpus id, fanning out the escalation join).
    require(minQid >= 0,
      s"query ids reach $minQid < 0 — offset ids would fall below " +
        s"idOffset $idOffset and be misclassified as corpus")
    val cdocs = corpus.select(col(idCol).cast("long").as("__id"),
      col(textCol).as("__text"))
    val qdocs = queries.select((col(qIdCol).cast("long") + idOffset).as("__id"),
      col(qTextCol).as("__text"))
    val union = cdocs.unionByName(qdocs)
    val ranked = suffixRanks(union, "__id", "__text", depth)
      .withColumn("__isq", (col("__id") >= idOffset).cast("int"))
    // The flag attaches via a BROADCAST left join (flag ids are a
    // queries-sized list): BroadcastHashJoin streams the probe side
    // partition-by-partition, so the ORDER INVARIANT the sort-free
    // fill relies on survives the attach.
    val keyed = pairFlagIds match {
      case None =>
        ranked.select(col("__r"), col("__id"), col("pos"), col("__isq"))
      case Some(f) =>
        val fl = broadcast(f.select(
          (col(f.columns.head).cast("long") + idOffset).as("__id"),
          lit(1).as("__flag")).distinct())
        ranked.join(fl, Seq("__id"), "left")
          .select(col("__r"), col("__id"), col("pos"), col("__isq"),
            coalesce(col("__flag"), lit(0)).as("__flag"))
    }
    val pairs = corpusNeighborPairs(keyed,
      Seq(col("__r"), col("__id"), col("pos")), withQueryPairs,
      // keyed is a narrow projection of suffixRanks' output — already
      // physically in (__r, __id, pos) order (the ORDER INVARIANT).
      assumeSorted = true,
      pairFlagCol = pairFlagIds.map(_ => "__flag"))
    (resolveLcpBySlicing(pairs, union, "__id", "__text", depth), qdocs)
  }

  /**
   * ONE union SA serving BOTH exact-admission reports at once — the
   * per-position duplicated lengths of the SURVIVORS against
   * corpus ∪ survivors ([[dupLengthsAgainstAndWithin]]'s answer for
   * the survivor slice) AND the longest-corpus-match lengths of the
   * WHOLE batch ([[longestCorpusMatch]]'s answer), where the
   * attribution-reporting admission funnel used to build two separate
   * union SAs (one per report) over almost the same rows.
   *
   * Correctness rests on the restriction property the query lane
   * already uses: the suffix order of any row subset is the
   * restriction of the union's suffix order, so (a) a survivor
   * suffix's nearest corpus neighbors are unchanged by the extra
   * rejected-batch rows (the corpus lane tracks corpus rows only),
   * and (b) consecutive FLAGGED query rows (the fill's flag lane,
   * flag = survivor) are exactly the survivor-only SA's adjacent
   * pairs — the same argument that makes the query lane equal the
   * batch-only SA. Both reports read the SAME resolved LCP pair
   * relation, split by lane (a corpus-query pair has id_a < idOffset;
   * a survivor-survivor pair has both sides offset).
   *
   * Returns (dupLengths limited to `survivors` — (bIdCol, pos,
   * dup_len >= minLen), matches over the whole batch — (q_id,
   * match_len >= 0 total)). `survivors` is a one-column frame of
   * batch ids (⊆ batch — the admission funnel's exact-novel set).
   */
  def dupLengthsAndCorpusMatches(corpus: DataFrame, idCol: String, textCol: String,
                                 batch: DataFrame, bIdCol: String, bTextCol: String,
                                 survivors: DataFrame, minLen: Int,
                                 depth: Int = 32,
                                 idOffset: Long = 1000000000L): (DataFrame, DataFrame) = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    val (lcp0, qdocs) = corpusNeighborLcp(corpus, idCol, textCol,
      batch, bIdCol, bTextCol, depth, idOffset, withQueryPairs = true,
      pairFlagIds = Some(survivors))
    val lcp = lcp0.localCheckpoint(true) // consumed by both lanes below
    val cq = lcp.where(col("id_a") < idOffset)
    val ss = lcp.where(col("id_a") >= idOffset)
    // Scrub lane — dupLengthsAgainstAndWithin's fold, restricted to the
    // survivors: corpus-query pairs contribute to their (survivor)
    // query side; survivor-survivor pairs to both sides. The semi join
    // drops the rejected docs' corpus-pair rows (they are not scrubbed;
    // broadcast — the survivor list is batch-sized).
    val svOff = broadcast(survivors.select(
      (col(survivors.columns.head).cast("long") + idOffset).as("__sid")).distinct())
    val dl = cq.join(svOff, col("id_b") === col("__sid"), "left_semi")
      .select(col("id_b").as("__id"), col("pos_b").as("pos"), col("lcp"))
      .unionByName(ss.select(col("id_a").as("__id"), col("pos_a").as("pos"),
        col("lcp")))
      .unionByName(ss.select(col("id_b").as("__id"), col("pos_b").as("pos"),
        col("lcp")))
      .groupBy(col("__id"), col("pos"))
      .agg(max(col("lcp")).as("dup_len"))
      .where(col("dup_len") >= minLen)
      .select((col("__id") - idOffset).as(bIdCol), col("pos"),
        col("dup_len").cast("int").as("dup_len"))
    // Attribution lane — longestCorpusMatch's containment tail over the
    // corpus-query pairs (ALL batch rows; the flag never narrows this
    // lane).
    val qlen = qdocs.select(col("__id").as("id_b"),
      size(SpanDedup.toks(col("__text"))).as("__n"))
    val contained = cq.join(qlen, Seq("id_b"))
      .where(col("lcp") === col("__n") - col("pos_b") + 1)
      .groupBy(col("id_b"))
      .agg(max(col("lcp")).as("match_len"))
    val matches = batch.select(col(bIdCol).as("q_id"))
      .join(contained, (col("q_id") + idOffset) === col("id_b"), "left")
      .select(col("q_id"),
        coalesce(col("match_len"), lit(0)).cast("int").as("match_len"))
    (dl, matches)
  }
}
