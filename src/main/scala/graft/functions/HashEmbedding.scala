package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for [[HashEmbedding]] (single pass over tokens). */
object TextKernels extends Serializable {
  /**
   * Deterministic hashing embedding: each whitespace token votes ±1 into
   * one of `dim` buckets (feature hashing / hashing trick, Weinberger et
   * al. 2009), L2-normalized. Bucket and sign derive from the JVM-spec
   * String.hashCode — stable across runs and machines.
   */
  def hashEmbed(s: UTF8String, dim: Int): ArrayData = {
    val acc = new Array[Double](dim)
    // Locale.ROOT + the shared whitespace class (StatsKernels.isWs), no
    // trim — token boundaries identical to every other text kernel.
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    val n = str.length
    var start = 0
    var h = 0
    var inTok = false
    def flush(end: Int): Unit = if (inTok) {
      val b = ((h % dim) + dim) % dim
      acc(b) += (if (((h >> 16) & 1) == 0) 1.0 else -1.0)
      inTok = false
    }
    while (i < n) {
      val c = str.charAt(i)
      if (StatsKernels.isWs(c)) { flush(i); h = 0 }
      else { if (!inTok) { inTok = true; start = i; h = 0 }; h = 31 * h + c }
      i += 1
    }
    flush(n)
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += acc(j) * acc(j); j += 1 }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      j = 0
      while (j < dim) { acc(j) *= inv; j += 1 }
    }
    new GenericArrayData(acc)
  }
}

/**
 * M1 featurization as a codegen expression: one pass over the text, one
 * hash per token, O(tokens + dim) per row — versus the higher-order
 * function formulation's O(tokens × dim) interpreted lambda calls. The
 * embedding column contract is unchanged: array<double>, unit L2 norm.
 */
case class HashEmbedding(child: Expression, dim: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hash_embedding"
  override def nullSafeEval(input: Any): Any =
    TextKernels.hashEmbed(input.asInstanceOf[UTF8String], dim)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.hashEmbed($c, $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object HashEmbed {
  def apply(c: Column, dim: Int = 64): Column =
    Bridge.column(HashEmbedding(Bridge.expression(c), dim))
}
