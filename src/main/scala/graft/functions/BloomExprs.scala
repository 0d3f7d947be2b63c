package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Broadcast-Bloom membership probe as a native codegen expression — the
 * executor-side half of incremental dedup
 * ([[graft.operators.DedupOps.incrementalNewDocs]]). The filter rides a
 * Spark broadcast (built once from the corpus, a few MB for hundreds of
 * millions of keys), NOT the plan, so the expression serializes to a
 * broadcast handle; each row costs a handful of hash probes. Same
 * mechanism Spark's own runtime row-level filtering uses, expressed as a
 * reusable library function instead of an internal rewrite.
 */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  // probe the UTF-8 bytes directly: byte-identical to what the build
  // side put for a string column, without the String allocation and
  // re-encode mightContainString would pay per row
  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter)$ref.value()).mightContainBinary($c.getBytes())")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object bloom {
  def mightContain(c: Column, b: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), b))
}
