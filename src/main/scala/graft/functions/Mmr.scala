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
 * Maximal Marginal Relevance selection (Carbonell & Goldstein 1998) —
 * the standard diversified top-k: greedily pick the candidate
 * maximizing `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`, so each pick is
 * relevant AND far from what is already selected. This is the
 * diversity stage of a retrieve-then-rerank serving stack (x_rerank's
 * third stage) and the dedup-aware sampler of a data pipeline ("take
 * the k best but not five copies of the same page").
 *
 * Scale shape: MMR is inherently sequential in k, but only WITHIN a
 * query's candidate list — the contract here. The expression runs once
 * per GROUP over the ≤ C candidates stage 1 nominated (never the
 * corpus; the corpus-sized work is the stage-1 top-C, which is the
 * bounded-heap kNN / BM25 path). Work is O(C·k·dim) per query,
 * embarrassingly parallel across queries, zero shuffle beyond the
 * stage-1 collect_list. Eval-only is deliberate: one call per query
 * row, not a per-row hot path.
 *
 * Determinism / oracle parity: the greedy's comparisons run in exact
 * INTEGER micro-units — relevance and every pairwise cosine are
 * converted once to nearest-integer millionths, and the MMR score is
 * `λ₁₀·relµ − (10−λ₁₀)·maxSimµ` (λ expressed in tenths), a bit-exact
 * long. Rounding the combined score as a DOUBLE would be engine-
 * dependent: λ-weighted sums of 6-decimal values land on exact
 * decimal-half boundaries at the 7th place ~10% of the time, where
 * Spark's BigDecimal HALF_UP and DuckDB's scaled-double round()
 * disagree. Integer arithmetic removes the boundary entirely; the only
 * remaining cross-engine float contact is the nearest-integer
 * conversion of raw cosines, which sits on a half boundary with
 * probability ~0. Ties break on smaller id.
 *
 * Input: array<struct<id: bigint, rel: double (raw similarity),
 * vec: array<float>>> (field names free; positions fixed). Output:
 * array<struct<neighbor_id, rank, mmr_score>> in selection order,
 * mmr_score = scoreµ / 10^7 (identical division both engines).
 */
case class MmrSelect(child: Expression, k: Int, lambdaTenths: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"mmr_select k must be >= 1: $k")
  require(lambdaTenths >= 0 && lambdaTenths <= 10,
    s"mmr_select lambda tenths in [0,10]: $lambdaTenths")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(f0, f1, f2)), _)
      if f0.dataType == LongType && f1.dataType == DoubleType &&
        f2.dataType == ArrayType(FloatType, containsNull = false) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StructType(Array(f0, f1, f2)), _)
      if f0.dataType == LongType && f1.dataType == DoubleType &&
        f2.dataType == ArrayType(FloatType, containsNull = true) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      "mmr_select requires array<struct<bigint, double, array<float>>>, got " +
        t.catalogString)
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("rank", IntegerType, nullable = false),
    StructField("mmr_score", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mmr_select"

  /** Nearest-integer millionths — the one float→exact conversion. */
  private def micro(x: Double): Long = math.round(x * 1e6)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    // Loud on mismatched dimensions: a truncated dot would return a
    // plausible-but-wrong similarity (and the DuckDB oracle's
    // list_dot_product errors on the same input — silent truncation
    // would break the parity contract, not just the answer).
    require(a.length == b.length,
      s"mmr_select: mismatched vector dimensions ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // Null candidate structs and null vectors are SKIPPED (a null
    // embedding has no similarity to anything — it can neither be
    // selected nor penalize diversity), mirroring how nulls vanish from
    // the upstream collect_list-of-struct anyway when any field is
    // filtered; they must not NPE the whole query.
    val kept = (0 until arr.numElements()).filter { i =>
      !arr.isNullAt(i) && {
        val row = arr.getStruct(i, 3)
        !row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)
      }
    }
    val n = kept.size
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(kept(i), 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      vecs(i) = row.getArray(2).toFloatArray()
      i += 1
    }
    val relU = rels.map(micro)
    val picked = new Array[Boolean](n)
    val maxSimU = Array.fill(n)(Long.MinValue)
    val out = new Array[Any](math.min(k, n))
    var step = 0
    while (step < out.length) {
      var best = -1
      var bestScore = 0L
      i = 0
      while (i < n) {
        if (!picked(i)) {
          val s = if (step == 0) 10L * relU(i)
                  else lambdaTenths * relU(i) - (10L - lambdaTenths) * maxSimU(i)
          if (best < 0 || s > bestScore ||
              (s == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      picked(best) = true
      out(step) = InternalRow(ids(best), step + 1, bestScore.toDouble / 1e7)
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val sv = micro(cos(vecs(j), vecs(best)))
          if (sv > maxSimU(j)) maxSimU(j) = sv
        }
        j += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

object Mmr {
  /** `mmr_select(candidates, k, lambdaTenths)`: diversified top-k over
    * one query's stage-1 candidates; λ in tenths (7 → λ = 0.7) for
    * exact integer selection arithmetic. */
  def mmrSelect(candidates: Column, k: Int, lambdaTenths: Int): Column =
    Bridge.column(MmrSelect(Bridge.expression(candidates), k, lambdaTenths))
}
