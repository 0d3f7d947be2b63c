package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding quantization for corpus-scale vector storage: symmetric
 * per-vector int8 scalar quantization (the storage format ANN systems
 * deploy for 4× memory/IO reduction over float32 — e.g. the SQ8 scheme
 * in IVF libraries). At 100 TB of embeddings the quantized table is what
 * ships to the similarity stages; the scale column is all that is needed
 * to dequantize.
 *
 * Everything is built from codegen'd higher-order functions over the
 * array column — no UDF, no shuffle (map-only), and every arithmetic
 * step is chosen to be REPLAYABLE by any engine: the rounding is written
 * as `floor(x/scale + 0.5)` (unambiguous across engines, unlike
 * `round()` whose half-way mode differs), so the quantized codes are
 * oracle-checkable bit-for-bit.
 *
 * Contract: `scale = max|x| / 127` (0.0 for all-zero/empty vectors,
 * which quantize to all-zero codes); codes clamp to [−127, 127]; the
 * reconstruction `q·scale` is within `scale/2` of the input per
 * coordinate (up to fp jitter — the `err_ok` predicate allows 1e-9
 * relative).
 */
object QuantizeOps {

  /** Symmetric per-vector int8 scale: max|x| / 127 (0.0 when empty).
    * Compiled kernel ([[graft.functions.QuantKernels]]) — the former
    * `array_max(transform(..., abs))` ran interpreted per coordinate. */
  def int8Scale(vec: Column): Column =
    coalesce(graft.functions.quant.maxAbs(vec), lit(0.0)) / lit(127.0)

  /** Quantized int8 codes for `vec` under `scale` (from [[int8Scale]]):
    * floor(x/scale + 0.5) clamped to [−127, 127]; zero scale → zero
    * codes (the vector is all-zero by construction of the scale).
    * Compiled kernel, same arithmetic. */
  def quantizeInt8(vec: Column, scale: Column): Column =
    graft.functions.quant.quantizeInt8(vec, scale)

  /** Max per-coordinate reconstruction error of codes `q` under `scale`
    * against the original vector (0.0 when empty). Compiled kernel. */
  def maxAbsError(vec: Column, q: Column, scale: Column): Column =
    coalesce(graft.functions.quant.maxAbsError(vec, q, scale), lit(0.0))

  /** The quantization contract as a predicate: reconstruction within
    * scale/2 per coordinate (1e-9 relative slack for fp jitter). */
  def errOk(vec: Column, q: Column, scale: Column): Column =
    maxAbsError(vec, q, scale) <= scale / lit(2.0) * lit(1.000000001)
}
