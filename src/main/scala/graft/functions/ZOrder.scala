package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Morton (Z-order) bit interleaving — the multi-dimensional data-layout
 * kernel. Sorting a table by the interleaved buckets of two columns
 * gives every written file a TIGHT min/max envelope on BOTH dimensions,
 * so a parquet reader's row-group/file statistics prune range
 * predicates on EITHER column — the layout trick behind lakehouse
 * OPTIMIZE ZORDER maintenance (cf. the classic Morton 1966 curve; the
 * Z-curve preserves locality in all interleaved dimensions at once,
 * where a lexicographic sort serves only its leading column).
 */
object ZOrderKernels extends Serializable {
  /** Interleave the low `bits` bits: a's bit i → z bit 2i, b's bit i →
    * z bit 2i+1. Inputs are bucket ordinals in [0, 2^bits); higher bits
    * are ignored by construction. */
  def morton2(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Codegen Morton interleave over two long bucket columns; `bits` is a
  * plan-time constant (≤ 31 so the result fits a Long with room). */
case class Morton2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint bucket columns, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.morton2(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKernels.morton2($a, $b, $bits)")
  override def prettyName: String = "morton2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level API. */
object zorder {
  def morton(a: Column, b: Column, bits: Int): Column =
    Bridge.column(Morton2(Bridge.expression(a), Bridge.expression(b), bits))
}
