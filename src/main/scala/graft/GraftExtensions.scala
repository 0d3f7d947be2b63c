package graft

import graft.functions.{CosineSimilarity, DotProduct, L2Distance, L2Normalize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

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
  }
}
