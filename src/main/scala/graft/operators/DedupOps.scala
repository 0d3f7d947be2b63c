package graft.operators

import graft.functions.text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for a training-data pipeline: exact-hash,
 * deterministic keep-first, MinHash/LSH near-dup, and n-gram Jaccard.
 * (Reference analogue: the URL-dedup seen-set, ingestion_service.py:74-77,
 * and `dropDuplicates` on ratings, recommendation-trainer.py:216 —
 * generalized here to content-level dedup at scale.)
 *
 * Algorithms per the published literature: MinHash resemblance sketching
 * (Broder, 1997), banded LSH candidate generation (Leskovec/Rajaraman/
 * Ullman, Mining of Massive Datasets ch. 3), SimHash fingerprints
 * (Charikar, 2002) as deployed for web-scale near-dup detection
 * (Manku et al., WWW 2007).
 */
object DedupOps {

  /**
   * Exact-content duplicate groups: md5 fingerprint → groupBy. At 100 TB
   * the shuffle key is the 32-char digest, never the document body; group
   * sizes are tiny so no skew handling is needed.
   */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), text.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(col("n") > 1)

  /**
   * Deterministic keep-first dedup (D2 made reproducible): keep the row
   * with the smallest tie-break key per dedup key — unlike the reference's
   * arbitrary-row `dropDuplicates`, results are stable across runs.
   */
  def keepFirst(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame =
    df.withColumn("rn",
        row_number().over(Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)))
      .filter(col("rn") === 1)
      .drop("rn")

  /**
   * MinHash signatures per document: k salted-md5 min-hashes over word
   * n-gram shingles. Map-only stage (no shuffle); the signature (k × 32
   * chars) is the only thing downstream stages ever shuffle.
   */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.sig.minhash(col(textCol), shingleN, k).as("sig"))

  /**
   * MinHash-LSH candidate pairs: signatures split into bands; documents
   * sharing any band value become candidates (bucket on the band hash —
   * the classic LSH trick that avoids the O(n²) cross product entirely).
   *
   * Scale design: (1) a `repartition` barrier after signature computation
   * materializes the (tiny) signatures so the expensive text scan runs
   * exactly once — downstream stages shuffle 4×32-char digests, never
   * document bodies; (2) buckets come from ONE groupBy (no self-join, so
   * no second evaluation of the corpus), and pairs are enumerated inside
   * each bucket. Production note: at 100 TB a `size(ids) < cap` guard on
   * pathological buckets (boilerplate shingles) bounds the quadratic
   * enumeration; unbounded here to match the exact-semantics oracle.
   */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, k: Int, bands: Int): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, shingleN, k)
      .repartition(col("doc_id"))
    sigs.select(col("doc_id"), posexplode(text.minhashBands(col("sig"), k, bands)).as(Seq("band", "bv")))
      .groupBy("band", "bv")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /**
   * Exact n-gram Jaccard similarity for candidate pairs (the verify stage
   * after LSH): explode distinct shingles, equi-join, count.
   */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("gid"),
        explode(array_distinct(text.shingles(text.tokens(col(textCol)), shingleN))).as("m"))
    SimilarityOps.jaccardJoin(
      sh.select(col("gid").as("id_a"), col("m")),
      sh.select(col("gid").as("id_b"), col("m")),
      "id_a", "id_b", "m", threshold)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * SimHash (64-bit) per document: each token hashes to 64 bits,
   * bit-weighted majority vote forms the fingerprint. Near-dups differ in
   * few bits (Hamming distance). Backed by the codegen
   * [[graft.functions.SimHash64]] expression — one hash per token; the
   * earlier higher-order-function formulation paid interpreted lambda
   * calls per (token × bit).
   */
  def simhash(textCol: Column): Column = graft.functions.sig.simhash(textCol)
}
