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

  /** md5 lower-64 as an unsigned decimal (= DuckDB `md5_number_lower`),
    * shared column formulation: [[graft.functions.sig.md5Lower64Col]]. */
  private def md5Lower64LE(c: Column): Column =
    graft.functions.sig.md5Lower64Col(c)

  /**
   * STUB decode: deterministic fake (width, height, channels) derived
   * from the payload bytes — stands in for an image decode. Pure column
   * expressions → whole-stage codegen, embarrassingly parallel.
   */
  def decodeStub(payload: Column): Column = struct(
    (pmod(md5Lower64LE(payload), lit(1920)) + 1).cast("int").as("width"),
    (pmod(md5Lower64LE(md5(payload)), lit(1080)) + 1).cast("int").as("height"),
    lit(3).as("channels"))

  /** Frame-sampling stub: n evenly spaced offsets into the payload. */
  def sampleOffsets(payload: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => (i * octet_length(payload) / n).cast("long"))

  /** Resize plan: aspect-preserving fit of decoded (width, height) into a
    * boxW×boxH target — the geometry half of an image-resize stage, with
    * the pixel work behind the same stub seam as [[decodeStub]]. `floor`
    * (not round) keeps the arithmetic oracle-portable. */
  def resizeStub(meta: Column, boxW: Int, boxH: Int): Column = {
    val s = least(lit(boxW.toDouble) / meta("width"), lit(boxH.toDouble) / meta("height"))
    struct(
      greatest(lit(1), floor(meta("width") * s)).cast("int").as("out_w"),
      greatest(lit(1), floor(meta("height") * s)).cast("int").as("out_h"),
      round(s, 6).as("scale"))
  }

  /** Extracted feature row of the batch decode stage. */
  case class MediaFeatures(id: Long, width: Int, height: Int, channels: Int,
                           meanByte: Double)

  /**
   * Partition-batched decode: the Scala analogue of `mapInPandas` — each
   * partition's payloads are processed through one (stubbed) codec
   * instance, amortizing per-batch setup the way a vectorized Python UDF
   * amortizes Arrow batches. The iterator-in/iterator-out shape means no
   * partition is ever materialized whole; payload bytes never shuffle.
   *
   * Input: (id long, payload binary). The codec stub derives deterministic
   * dimensions + a real byte statistic; swapping in a JNI/ONNX decoder
   * changes only `decodeOne`.
   */
  def decodeBatches(df: DataFrame): org.apache.spark.sql.Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one "codec" per partition (stub: a reusable digest instance)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => decodeOne(md, id, bytes) }
      }
  }

  /** Same dimension convention as [[decodeStub]]: md5 lower-64 (digest
    * bytes 8..15 little-endian = DuckDB `md5_number_lower`), with
    * `remainderUnsigned` standing in for the oracle's unsigned modulo. */
  private def decodeOne(md: java.security.MessageDigest, id: Long,
                        bytes: Array[Byte]): MediaFeatures = {
    import graft.functions.SigKernels.md5Lower64Bytes
    md.reset()
    val d1 = md.digest(bytes)
    val hex = d1.map(b => f"${b & 0xff}%02x").mkString
    md.reset()
    val d2 = md.digest(hex.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mean = if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    MediaFeatures(id, (java.lang.Long.remainderUnsigned(md5Lower64Bytes(d1), 1920L) + 1).toInt,
      (java.lang.Long.remainderUnsigned(md5Lower64Bytes(d2), 1080L) + 1).toInt, 3, mean)
  }
}
