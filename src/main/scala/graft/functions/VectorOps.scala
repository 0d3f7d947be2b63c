package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Vector kernels over `array<float>` / `array<double>` columns, exposed as
 * codegen-friendly Catalyst expressions (no Scala UDF boxing in the hot
 * path — each generated call is a single static-method invocation over
 * Spark's internal ArrayData, so whole-stage codegen spans are preserved).
 *
 * Capability modeled on the reference's vector math: cosine similarity
 * (reference: services/streaming-pipeline/duplication_service.py:14,81),
 * L2 distance (FAISS IndexFlatL2, services/batch-cluster-refinement/
 * batch-cluster-service.py:81), L2 normalization (batch-cluster-service.py:215-218).
 */
object VectorKernels extends Serializable {
  // Float-element kernels (accumulate in double for stability).
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val na = math.sqrt(dotF(a, a)); val nb = math.sqrt(dotF(b, b))
    if (na == 0.0 || nb == 0.0) 0.0 else dotF(a, b) / (na * nb)
  }
  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val na = math.sqrt(dotD(a, a)); val nb = math.sqrt(dotD(b, b))
    if (na == 0.0 || nb == 0.0) 0.0 else dotD(a, b) / (na * nb)
  }
  def l2F(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) { val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble; s += d * d; i += 1 }
    math.sqrt(s)
  }
  def l2D(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  def normF(a: ArrayData): Double = math.sqrt(dotF(a, a))
  def normD(a: ArrayData): Double = math.sqrt(dotD(a, a))
  def l2NormalizeF(a: ArrayData): ArrayData = {
    val n = a.numElements(); val nrm = normF(a)
    val out = new Array[Float](n)
    var i = 0
    if (nrm == 0.0) { while (i < n) { out(i) = a.getFloat(i); i += 1 } }
    else { while (i < n) { out(i) = (a.getFloat(i) / nrm).toFloat; i += 1 } }
    new GenericArrayData(out)
  }
  def l2NormalizeD(a: ArrayData): ArrayData = {
    val n = a.numElements(); val nrm = normD(a)
    val out = new Array[Double](n)
    var i = 0
    if (nrm == 0.0) { while (i < n) { out(i) = a.getDouble(i); i += 1 } }
    else { while (i < n) { out(i) = a.getDouble(i) / nrm; i += 1 } }
    new GenericArrayData(out)
  }
}

/** Base for binary vector→double expressions dispatching on element type.
  * Both children must be arrays of the SAME float/double element type —
  * the kernel reads both operands with one accessor, so a silent
  * float/double mix would reinterpret raw bytes; `checkInputDataTypes`
  * makes that an analysis-time error instead. */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
        if (a == FloatType || a == DoubleType) && a == b =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two arrays with the same float or double " +
            s"element type, got ${l.catalogString} and ${r.catalogString} " +
            "(cast both sides to array<double> to mix precisions)")
    }
  protected def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  /** Name of the static kernel, without the F/D element-type suffix. */
  protected def kernel: String
  private def method: String = kernel + (if (isFloat) "F" else "D")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    kernel match {
      case "cosine" => if (isFloat) VectorKernels.cosineF(x, y) else VectorKernels.cosineD(x, y)
      case "dot"    => if (isFloat) VectorKernels.dotF(x, y) else VectorKernels.dotD(x, y)
      case "l2"     => if (isFloat) VectorKernels.l2F(x, y) else VectorKernels.l2D(x, y)
    }
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.$method($a, $b)")
}

case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "cosine"
  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "dot"
  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class L2Distance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "l2"
  override def prettyName: String = "l2_dist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class L2Normalize(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = child.dataType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> or array<double>, got ${t.catalogString}")
    }
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (isFloat) VectorKernels.l2NormalizeF(x) else VectorKernels.l2NormalizeD(x)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isFloat) "l2NormalizeF" else "l2NormalizeD"
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.$m($a)")
  }
  override def prettyName: String = "l2_normalize"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Column-level API. */
object vector {
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def l2Dist(a: Column, b: Column): Column =
    Bridge.column(L2Distance(Bridge.expression(a), Bridge.expression(b)))
  def l2Normalize(a: Column): Column =
    Bridge.column(L2Normalize(Bridge.expression(a)))

  /** Register SQL names so `spark.sql("... cosine_sim(a,b) ...")` works. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_dist", es => L2Distance(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es.head), "built-in")
  }
}
