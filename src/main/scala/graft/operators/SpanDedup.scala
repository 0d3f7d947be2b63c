package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Exact duplicated-SPAN detection and removal — substring-level dedup in
 * the sense of Lee et al. 2022 ("Deduplicating Training Data Makes
 * Language Models Better"): the unit of deduplication is a k-token span,
 * not the whole document, so boilerplate shared across otherwise-distinct
 * pages (headers, license blocks, templated paragraphs) is found and cut
 * while the unique prose stays. Complements the document-level cascade in
 * [[DedupOps]] (exact hash / MinHash / SimHash all score whole docs and
 * miss partial duplication entirely).
 *
 * The reference paper builds a suffix array over the concatenated corpus;
 * the standard DISTRIBUTED formulation (used by SlimPajama-style
 * pipelines) is the one here: slide a k-token window over every document,
 * group identical windows, and call a span duplicated when it occurs in
 * ≥ `minDocs` distinct documents. Detection is two map-side-combinable
 * aggregations over O(total tokens) window rows; removal re-joins the
 * duplicated-span set against the windows and masks the covered token
 * positions.
 *
 * Scale posture (100 TB): window rows are linear in corpus tokens — the
 * same asymptotics as the tokenize pass every other curation op already
 * pays — and every stage is a hash exchange with partial aggregation
 * (no sort, no cross product). At full scale the group-by key should be
 * a 128-bit digest of the span rather than the span text (shuffle bytes
 * shrink ~k×; re-attach one representative span by `min` afterwards),
 * and the duplicated-span set — which is tiny relative to the corpus —
 * becomes a broadcast/Bloom probe instead of a shuffle join. Both are
 * mechanical swaps on this plan shape; the string key is kept here so
 * the DuckDB oracle replays the grouping exactly.
 */
object SpanDedup {

  /** Tokenization shared with the other text kernels: lower, split on
    * whitespace runs, drop empties (mirrors OracleSql's `words`). */
  private def toks(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => t =!= "")

  /**
   * One row per k-token window: (id, i, span) with i the 1-based start
   * token position and span the space-joined window text. Documents
   * shorter than k tokens produce no rows. The guarded `sequence` matters:
   * Spark's `sequence(1, n)` auto-steps DOWNWARD when n < 1, so the
   * short-doc case must branch to an empty array, not rely on the bounds.
   */
  def spanWindows(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"span width k must be >= 2: $k")
    val t = toks(col(textCol))
    val starts = when(size(t) >= k, sequence(lit(1), size(t) - lit(k - 1)))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol),
        explode(transform(starts, i =>
          struct(i.as("i"), concat_ws(" ", slice(t, i, lit(k))).as("span")))).as("__w"))
      .select(col(idCol), col("__w.i").as("i"), col("__w.span").as("span"))
  }

  /**
   * The duplicated-span inventory: every k-token span occurring in
   * ≥ `minDocs` distinct documents, with its document frequency and
   * total occurrence count. Both aggregates are partial-aggregation
   * friendly (count-distinct over the doc id expands to the standard
   * two-phase plan), so the only full-width shuffle is the span key.
   */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String, k: Int,
                      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    spanWindows(docs, idCol, textCol, k)
      .groupBy(col("span"))
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= minDocs)
  }

  /**
   * Span removal: for each document, drop every token covered by at
   * least one duplicated window (a position may be covered by many
   * overlapping windows — coverage is a distinct (id, pos) set, so
   * overlaps merge for free) and rebuild the remaining text in order.
   * Returns one row per INPUT document: (id, n_tokens, n_removed,
   * clean_text) — empty/short docs pass through with zero counts, so
   * the op is a total function over the corpus.
   */
  def scrubSpans(docs: DataFrame, idCol: String, textCol: String, k: Int,
                 minDocs: Int = 2): DataFrame = {
    val win = spanWindows(docs, idCol, textCol, k)
    val dup = duplicatedSpans(docs, idCol, textCol, k, minDocs).select(col("span"))
    val cover = win.join(dup, "span")
      .select(col(idCol), explode(sequence(col("i"), col("i") + lit(k - 1))).as("pos"))
      .distinct()
      .withColumn("__cov", lit(1))
    val tokPos = docs
      .select(col(idCol), posexplode(toks(col(textCol))).as(Seq("__p", "tok")))
      .select(col(idCol), (col("__p") + 1).as("pos"), col("tok"))
    val agg = tokPos.join(cover, Seq(idCol, "pos"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(col("__cov")).as("n_removed"),
        // collect_list drops the null branch of the `when`, so only kept
        // tokens enter; array_sort orders the (pos, tok) structs by
        // position, restoring document order without a sort exchange.
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__cov").isNull, struct(col("pos"), col("tok"))))),
          x => x.getField("tok"))).as("clean_text"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
