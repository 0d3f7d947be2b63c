package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** A (score, id) candidate for bounded top-k aggregation. */
case class Scored(score: Double, id: Long)

/**
 * Bounded top-k-by-score aggregate. The crucial scale property vs the
 * `Window.partitionBy(key).orderBy(desc(score)) rank<=k` formulation: this
 * aggregates PARTIALLY MAP-SIDE — each partition forwards at most k
 * candidates per group into the shuffle, so a kNN join over Q queries ×
 * C corpus rows shuffles O(Q·k·partitions) rows instead of O(Q·C).
 * (Reference operator: FAISS top-50 search, recommendation-trainer.py:89-100.)
 *
 * Ordering: score desc, id asc (deterministic tie-break).
 */
class TopKAgg(k: Int) extends Aggregator[Scored, ArrayBuffer[Scored], Seq[Scored]] {
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  private def trim(b: ArrayBuffer[Scored]): ArrayBuffer[Scored] = {
    if (b.length > k) {
      val kept = b.sorted(ord).take(k)
      b.clear(); b ++= kept
    }
    b
  }

  override def zero: ArrayBuffer[Scored] = new ArrayBuffer[Scored](k + 8)
  override def reduce(b: ArrayBuffer[Scored], a: Scored): ArrayBuffer[Scored] = {
    if (a != null) { b += a; if (b.length >= 2 * k) trim(b) }
    b
  }
  override def merge(x: ArrayBuffer[Scored], y: ArrayBuffer[Scored]): ArrayBuffer[Scored] = {
    x ++= y; trim(x)
  }
  override def finish(b: ArrayBuffer[Scored]): Seq[Scored] = b.sorted(ord).take(k).toSeq
  override def bufferEncoder: Encoder[ArrayBuffer[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopK {
  /** topK(k)(struct-as-Scored column): array<struct<score,id>> sorted desc. */
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[Scored])
    (score, id) => fn(score, id)
  }
}

/** String-keyed variant of [[Scored]]/[[TopKAgg]] (same bounded-heap
  * map-side-partial property; tie-break id asc lexicographically). */
case class ScoredS(score: Double, id: String)

class TopKAggS(k: Int) extends Aggregator[ScoredS, ArrayBuffer[ScoredS], Seq[ScoredS]] {
  private val ord: Ordering[ScoredS] = Ordering.by((s: ScoredS) => (-s.score, s.id))
  private def trim(b: ArrayBuffer[ScoredS]): ArrayBuffer[ScoredS] = {
    if (b.length > k) { val kept = b.sorted(ord).take(k); b.clear(); b ++= kept }
    b
  }
  override def zero: ArrayBuffer[ScoredS] = new ArrayBuffer[ScoredS](k + 8)
  override def reduce(b: ArrayBuffer[ScoredS], a: ScoredS): ArrayBuffer[ScoredS] = {
    if (a != null) { b += a; if (b.length >= 2 * k) trim(b) }
    b
  }
  override def merge(x: ArrayBuffer[ScoredS], y: ArrayBuffer[ScoredS]): ArrayBuffer[ScoredS] = {
    x ++= y; trim(x)
  }
  override def finish(b: ArrayBuffer[ScoredS]): Seq[ScoredS] = b.sorted(ord).take(k).toSeq
  override def bufferEncoder: Encoder[ArrayBuffer[ScoredS]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredS]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKStr {
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggS(k), Encoders.product[ScoredS])
    (score, id) => fn(score, id)
  }
}
