package graft

import graft.functions.{CdcBoundaries, CosineSimilarity, CosineSketch, DotProduct, L2Distance, L2Normalize, Md5Bucket, MinhashSignature, SimHash64, TextStatsExpr, text}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/**
 * Canonical extension entry point: lets any deployment pick up the
 * engine's native expressions via configuration alone —
 *
 *   spark.sql.extensions=graft.GraftExtensions
 *
 * (or `SparkSession.builder().withExtensions(new GraftExtensions)`), with
 * no code changes in the consuming application.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      es => CosineSimilarity(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      es => DotProduct(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("l2_dist"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_dist"),
      es => L2Distance(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2Normalize].getName, "l2_normalize"),
      es => L2Normalize(es.head)))
    // Text-hash / dedup kernels: shape parameters must be literal ints
    // (they size codegen'd loops, not per-row data).
    e.injectFunction((FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      es => MinhashSignature(es.head,
        litInt(es(1), "minhash_signature shingle width"),
        litInt(es(2), "minhash_signature hash count"))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      es => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("cosine_sketch"),
      new ExpressionInfo(classOf[CosineSketch].getName, "cosine_sketch"),
      es => CosineSketch(es.head, litInt(es(1), "cosine_sketch nbits"))))
    e.injectFunction((FunctionIdentifier("cdc_boundaries"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, "cdc_boundaries"),
      es => CdcBoundaries(es.head, litInt(es(1), "cdc_boundaries window"),
        litInt(es(2), "cdc_boundaries mask").toLong)))
    e.injectFunction((FunctionIdentifier("md5_bucket"),
      new ExpressionInfo(classOf[Md5Bucket].getName, "md5_bucket"),
      es => Md5Bucket(es.head, litInt(es(1), "md5_bucket buckets").toLong)))
    e.injectFunction((FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStatsExpr].getName, "text_stats"),
      es => TextStatsExpr(es.head, text.defaultStopwords, text.posWords,
        text.negWords, text.langProfiles)))
    // hash_embedding(text, dim): the deterministic hashing-trick features
    // behind the embedding stand-in AND QualityModel scoring — registered
    // so a SQL user can score a stored quality model with plain SQL.
    e.injectFunction((FunctionIdentifier("hash_embedding"),
      new ExpressionInfo(classOf[graft.functions.HashEmbedding].getName, "hash_embedding"),
      es => graft.functions.HashEmbedding(es.head,
        litInt(es(1), "hash_embedding dim"))))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      es => graft.functions.NfcNormalize(es.head)))
    e.injectFunction((FunctionIdentifier("deflate_size"),
      new ExpressionInfo(classOf[graft.functions.DeflateSize].getName, "deflate_size"),
      es => graft.functions.DeflateSize(es.head)))
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
