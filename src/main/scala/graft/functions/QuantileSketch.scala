package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

import ApproximatePercentile.PercentileDigest

/**
 * Mergeable rank/quantile sketch with a PERSISTABLE state — the rank leg
 * of the engine's standing-summary family (frequency =
 * [[MisraGriesAgg]]/[[MisraGriesMergeAgg]], cardinality = HLL via
 * `approx_count_distinct`, rank = this).
 *
 * Why not plain `percentile_approx`: the built-in computes the same
 * Greenwald–Khanna summary (its buffer IS `PercentileDigest`) but only
 * exposes the queried quantiles — the sketch state dies with the query,
 * so every refresh rescans the corpus. This pair externalizes the state:
 * `quantile_sketch` emits the serialized summary as a binary column a
 * batch can PERSIST, and `quantile_sketch_merge` folds any number of
 * stored summaries into one — Greenwald–Khanna summaries are mergeable
 * (Agarwal et al. 2012, "Mergeable Summaries", PODS: merged error ≤ max
 * of the inputs' errors), so per-batch sketches combine into a corpus
 * summary without ever rereading the corpus. That is the maintenance
 * shape every standing index here follows (span inventory, band index,
 * MG summary, IVF cells): ingest appends an O(batch) row, compaction
 * folds m-bounded state.
 *
 * Accuracy contract (the `x_outlier_trim` one): relative rank error is
 * 1/accuracy, so queried quantiles are RANK-EXACT — identically the
 * "smallest x with cumulative count ≥ ceil(q·n)" value an exact replay
 * computes — while n ≤ accuracy/2 per group, because the worst-case rank
 * slack n/accuracy then stays under one position. Beyond that the values
 * drift within the published ±n/accuracy rank band (still the right
 * 100 TB answer; the oracle contract just switches from exact to band,
 * as `x_quantile_sketch` demonstrates for the built-in). Query semantics
 * match `percentile_approx` exactly — both paths call the same
 * `PercentileDigest.getPercentiles`.
 *
 * The reference has no quantile surface; this generalizes its by-hand
 * stats (drift averages) to distribution-shaped observability.
 */
case class QuantileSketchAgg(
    child: Expression,
    accuracy: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileDigest]
  with UnaryLike[Expression] {

  require(accuracy >= 1, s"quantile_sketch accuracy must be >= 1: $accuracy")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch requires a double column, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0 / accuracy)

  override def update(buf: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: PercentileDigest, b: PercentileDigest): PercentileDigest = {
    a.merge(b); a
  }

  override def eval(buf: PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buf)

  override def serialize(buf: PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

/**
 * Additive compaction of STORED quantile sketches: folds any number of
 * persisted `quantile_sketch` binaries into one summary over the union
 * of their inputs — compaction reads sketch-sized rows, never the
 * corpus. Merged relative rank error stays ≤ the inputs' (mergeable-
 * summaries bound), so the rank-exactness window is governed by the
 * UNION size, same contract as the single-pass form.
 */
case class QuantileSketchMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileDigest]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch_merge requires a binary sketch column, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch_merge"

  // The buffer's own relativeError is irrelevant until something merges
  // into it; merging adopts the union bound per Greenwald–Khanna. Use a
  // conservative default for the empty buffer.
  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0 / ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY)

  override def update(buf: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) {
      val other = ApproximatePercentile.serializer
        .deserialize(v.asInstanceOf[Array[Byte]])
      buf.merge(other)
    }
    buf
  }

  override def merge(a: PercentileDigest, b: PercentileDigest): PercentileDigest = {
    a.merge(b); a
  }

  override def eval(buf: PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buf)

  override def serialize(buf: PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchMergeAgg =
    copy(child = newChild)
}

/**
 * Query a stored sketch: `quantile_sketch_query(sketch, percentages)` →
 * array<double>, the `percentile_approx` answers for each requested
 * quantile (identical code path: `PercentileDigest.getPercentiles`).
 * Runs once per GROUP (sketch rows, not corpus rows) — eval-only is
 * deliberate; this is never on a per-row hot path.
 */
case class QuantileSketchQuery(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch_query requires (binary, array<double>), got " +
          s"(${lt.catalogString}, ${rt.catalogString})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantile_sketch_query"

  override protected def nullSafeEval(sketch: Any, percentages: Any): Any = {
    val digest = ApproximatePercentile.serializer
      .deserialize(sketch.asInstanceOf[Array[Byte]])
    if (digest.quantileSummaries.count == 0L) null
    else {
      val qs = percentages.asInstanceOf[ArrayData].toDoubleArray()
      val res = digest.getPercentiles(qs)
      new GenericArrayData(res.map(_.asInstanceOf[Double]).toArray)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchQuery =
    copy(left = newLeft, right = newRight)
}

object QuantileSketch {
  /** `quantile_sketch(col, accuracy)`: serialized Greenwald–Khanna
    * summary (binary) — persist it; rank-exact while group n ≤
    * accuracy/2. */
  def quantileSketch(c: Column, accuracy: Int): Column =
    Bridge.column(QuantileSketchAgg(Bridge.expression(c), accuracy)
      .toAggregateExpression())

  /** `quantile_sketch_merge(sketch)`: fold stored sketches into one
    * summary over the union — never a corpus rescan. */
  def quantileSketchMerge(c: Column): Column =
    Bridge.column(QuantileSketchMergeAgg(Bridge.expression(c))
      .toAggregateExpression())

  /** `quantile_sketch_query(sketch, qs)`: percentile_approx answers for
    * each quantile in `qs` from a stored sketch. */
  def quantileSketchQuery(sketch: Column, qs: Column): Column =
    Bridge.column(QuantileSketchQuery(Bridge.expression(sketch),
      Bridge.expression(qs)))
}
