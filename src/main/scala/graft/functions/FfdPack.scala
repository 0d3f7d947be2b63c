package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * First-fit-decreasing sequence packing — the bin-quality upgrade over
 * the streaming greedy fill (`CurationOps.packSequences` cuts a new
 * sequence whenever the next document overflows, leaving the tail of
 * every bin empty; FFD places each document, longest first, into the
 * FIRST bin it fits — the standard packing for LLM training batches,
 * cf. Krell et al. 2021, "Efficient Sequence Packing without
 * Cross-contamination", which shows near-optimal residual waste for
 * length-histogram workloads).
 *
 * FFD is inherently sequential over its item list, so the contract
 * mirrors [[MmrSelect]]: the expression runs once per SHARD over the
 * collected (id, len) pairs — ids and lengths only, never text — and
 * the caller bounds shard size (the digest-sharded collect is the
 * scale ceiling, sized by `shards`; production packs within bounded
 * micro-shards exactly like this because a corpus-global FFD would
 * serialize the world for marginal waste reduction). Work is
 * O(items × bins) per shard.
 *
 * Semantics (pure integer arithmetic — replays exactly in SQL):
 * process items by (len DESC, id ASC); an item longer than `capacity`
 * is assigned bin −1 (rejected — truncation is the chunker's job,
 * `x_chunk_tokens`); otherwise it lands in the lowest-numbered bin
 * where it fits, opening bin `n+1` when none does.
 *
 * Input: array<struct<id: bigint, len: bigint>>. Output:
 * array<struct<id, len, bin>> (bins numbered from 1 in opening order).
 */
case class FfdPack(child: Expression, capacity: Long)
  extends UnaryExpression with CodegenFallback {

  require(capacity >= 1, s"ffd_pack capacity must be >= 1: $capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(f0, f1)), _)
      if f0.dataType == LongType && f1.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ffd_pack requires array<struct<bigint, bigint>>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("bin", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ffd_pack"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // Null struct elements / null fields are skipped, not NPE'd — an
    // item with no id or no length cannot be packed or rejected.
    val kept = (0 until arr.numElements()).filter { i =>
      !arr.isNullAt(i) && {
        val r = arr.getStruct(i, 2)
        !r.isNullAt(0) && !r.isNullAt(1)
      }
    }
    val n = kept.size
    val ids = new Array[Long](n)
    val lens = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(kept(i), 2)
      ids(i) = r.getLong(0); lens(i) = r.getLong(1)
      i += 1
    }
    val order = (0 until n).sortBy(j => (-lens(j), ids(j)))
    val binLoad = scala.collection.mutable.ArrayBuffer[Long]()
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      val j = order(k)
      val bin =
        if (lens(j) > capacity) -1
        else {
          var b = 0
          while (b < binLoad.length && binLoad(b) + lens(j) > capacity) b += 1
          if (b == binLoad.length) binLoad += lens(j) else binLoad(b) += lens(j)
          b + 1
        }
      out(k) = InternalRow(ids(j), lens(j), bin)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): FfdPack =
    copy(child = newChild)
}

object FfdPack {
  /** `ffd_pack(items, capacity)`: first-fit-decreasing assignment over
    * one shard's collected (id, len) pairs. */
  def ffdPack(items: Column, capacity: Long): Column =
    Bridge.column(FfdPack(Bridge.expression(items), capacity))
}
