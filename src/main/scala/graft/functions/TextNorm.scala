package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization — the canonicalization step every web
 * corpus needs before ANY hash-based stage (fingerprints, MinHash
 * shingles, span digests, BPE): the same visible text arrives in
 * composed and decomposed forms (é as U+00E9 vs e + U+0301), and
 * without normalization the two hash as DIFFERENT content — exact
 * dedup misses real duplicates, tokenizers learn duplicate units.
 * Canonical composition per Unicode TR15 via `java.text.Normalizer`;
 * already-NFC text (the overwhelming common case — NFC quick-check
 * passes for most web text) round-trips unchanged.
 *
 * Codegen'd static call — one JVM intrinsic per row inside whole-stage
 * codegen, no UDF object. Oracle parity: DuckDB's `nfc_normalize`
 * implements the same TR15 composition, so outputs match byte for
 * byte.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel for codegen: NFC-compose; skip the re-encode when
    * the text is already normalized (the common case). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** `nfc_normalize(text)` as a Column. */
  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
