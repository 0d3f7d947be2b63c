package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Element-wise vector mean as a DeclarativeAggregate: the buffer is a pure
 * (array<double> sums, long count) pair updated with expression-level
 * `zip_with`, so it runs inside regular HashAggregate with an UnsafeRow
 * buffer — no per-row object serialization like the `Aggregator`-based
 * [[VectorMean]] (ObjectHashAggregate). Same semantics: null/empty inputs
 * ignored; empty group → empty array.
 *
 * Dimension contract: all vectors in a group must share one length —
 * `zip_with` null-pads a shorter array, so a mixed-length group yields
 * null elements beyond the shortest prefix (the Aggregator variant
 * truncates instead). Both are garbage-in signals; fixed-dim embedding
 * columns never hit it.
 */
case class VectorMeanDecl(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_mean_decl"

  private lazy val sums = AttributeReference("sums", ArrayType(DoubleType), nullable = true)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sums, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, ArrayType(DoubleType)), Literal(0L))

  // Lambdas are built pre-bound (resolved NamedLambdaVariable), because
  // DeclarativeAggregate update/merge expressions are bound directly, not
  // run through the analyzer's lambda-resolution rule.
  private def addArrays(a: Expression, b: Expression): Expression = {
    val x = NamedLambdaVariable("x", DoubleType, nullable = true)
    val y = NamedLambdaVariable("y", DoubleType, nullable = true)
    ZipWith(a, b, LambdaFunction(Add(x, y), Seq(x, y)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(child), GreaterThan(Size(child), Literal(0)))
    Seq(
      If(Not(valid), sums,
        If(IsNull(sums), child, addArrays(sums, child))),
      If(Not(valid), cnt, Add(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(sums.left), sums.right,
      If(IsNull(sums.right), sums.left, addArrays(sums.left, sums.right))),
    Add(cnt.left, cnt.right))

  override lazy val evaluateExpression: Expression = {
    val x = NamedLambdaVariable("x", DoubleType, nullable = true)
    If(IsNull(sums),
      Literal.create(Seq.empty[Double], ArrayType(DoubleType)),
      ArrayTransform(sums, LambdaFunction(Divide(x, Cast(cnt, DoubleType)), Seq(x))))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object VectorMeanFast {
  /** Column API: vector_mean over an array<double> column. */
  def apply(c: Column): Column =
    Bridge.column(VectorMeanDecl(Bridge.expression(c)).toAggregateExpression())
}
