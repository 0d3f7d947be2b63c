package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for a training-data pipeline: media payloads
 * ride as opaque `binary` columns next to typed metadata; decode /
 * feature-extraction stages are per-row map operations that never shuffle
 * the payload (only derived features move).
 *
 * The actual codec step is STUBBED (no image/audio libraries in this
 * environment): `decodeStub` derives deterministic fake dimensions from
 * the payload hash. The Spark-side contract — binary column schema,
 * partition-local batch processing, feature schema — is real and tested;
 * swapping the stub for a JNI/ONNX decoder changes only the inner function.
 */
object MultimodalOps {

  /** Payload envelope: (id, media binary, mime) + content hash + size. */
  def withPayloadMeta(df: DataFrame, payload: Column): DataFrame =
    df.withColumn("payload_sha256", sha2(payload, 256))
      .withColumn("payload_bytes", octet_length(payload))

  /**
   * STUB decode: deterministic fake (width, height, channels) derived
   * from the payload bytes — stands in for an image decode. Pure column
   * expressions → whole-stage codegen, embarrassingly parallel.
   */
  def decodeStub(payload: Column): Column = struct(
    (pmod(xxhash64(payload), lit(1920)) + 1).cast("int").as("width"),
    (pmod(xxhash64(md5(payload)), lit(1080)) + 1).cast("int").as("height"),
    lit(3).as("channels"))

  /** Frame-sampling stub: n evenly spaced offsets into the payload. */
  def sampleOffsets(payload: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => (i * octet_length(payload) / n).cast("long"))
}
