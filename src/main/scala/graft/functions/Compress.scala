package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deflate-compressed size of a text column — the compression-ratio
 * quality signal web-corpus pipelines run next to the Gopher rules
 * (Dolma, MassiveWeb/Gopher's repetition family): machine-generated /
 * boilerplate / template text compresses far better than natural prose,
 * so `uncompressed_bytes / deflate_size` is a cheap one-pass
 * repetitiveness score that catches patterns n-gram rules miss (long-
 * range repetition, interleaved templates). zlib level 6 (the zlib
 * default), raw UTF-8 bytes.
 *
 * Codegen'd static kernel inside whole-stage codegen — no UDF object;
 * the Deflater instance is THREAD-LOCAL and reset per row (Deflater
 * allocation is the expensive part — ~µs amortized per row, the same
 * order as the regex kernels). NATIVE-MEMORY CONTRACT: each executor
 * task thread retains ONE zlib-native Deflater (~256 KiB off-heap) for
 * the life of the thread — reuse is the point of the ThreadLocal, and
 * `end()`-per-row would pay the allocation we amortize away. The
 * retention is bounded by the executor's task-thread pool size
 * (32 threads ≈ 8 MiB per executor, invisible to heap accounting but
 * constant), and task threads in Spark's pool are long-lived, so there
 * is no leak-per-task growth. DETERMINISM: zlib output for a fixed
 * (input, level, strategy) is deterministic for a given zlib build; the
 * JDK pins its own zlib, so values are stable across runs and
 * executors of one JVM version. Cross-ENGINE replay is not available
 * (DuckDB exposes no deflate) — downstream checks are Spark-computed
 * invariants, the x_ann_* oracle idiom, and the kernel law tests live
 * in CompressSpec.
 */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_size requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateSize.deflateSize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateSize.deflateSize($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }

  /** Static kernel for codegen: deflate the UTF-8 bytes at level 6,
    * return the compressed byte count (header+trailer included —
    * callers compare ratios, the constant offset cancels). */
  def deflateSize(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** `deflate_size(text)` as a Column. */
  def deflateSize(c: Column): Column =
    Bridge.column(DeflateSize(Bridge.expression(c)))
}
