package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for a training-data pipeline: media payloads
 * ride as opaque `binary` columns next to typed metadata; decode /
 * feature-extraction stages are per-row map operations that never shuffle
 * the payload (only derived features move).
 *
 * IMAGE decode is REAL: [[decodeImages]] runs `javax.imageio.ImageIO`
 * (part of the JDK's `java.desktop` module, headless-safe — no native
 * display needed for PNG/JPEG/BMP/GIF) per partition, recovering true
 * width/height/channels, an exact integer pixel-sum statistic, and a
 * 64-bit perceptual dHash for near-duplicate detection of re-encoded
 * copies. AUDIO decode is REAL for PCM containers: [[decodeAudio]] runs
 * `javax.sound.sampled.AudioSystem` (same JDK module — WAV/AIFF/AU),
 * recovering the declared format, exact frame count, and exact integer
 * sample statistics, container-invariantly (WAV ≡ AIFF of the same
 * samples). Compressed audio (MP3/Opus) and VIDEO codecs are not in
 * the JDK, so those stages keep the documented stub seam
 * ([[decodeStub]], [[decodeBatches]]): deterministic fake dimensions
 * from the payload hash, with the real Spark-side contract — binary
 * column schema, partition-local batch processing, feature schema —
 * tested so a JNI/FFmpeg/ONNX decoder swaps in by changing only the
 * inner function.
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

  /** Resized-image feature row of the REAL resize stage: the decoded
    * input dims, the aspect-fit output dims (= [[resizeStub]]'s
    * geometry, now actually applied to pixels), and the exact pixel sum
    * of the RESIZED image — re-decoded from the re-encoded output, so
    * the row certifies the full decode→scale→encode→decode cycle. */
  case class ResizedImage(id: Long, inW: Int, inH: Int, outW: Int, outH: Int,
                          lumaSum3: Long, ok: Boolean)

  /**
   * REAL image resize, partition-batched: decode ([[javax.imageio]]),
   * aspect-preserving fit into boxW×boxH (the [[resizeStub]] geometry —
   * floor, min scale, ≥ 1px), bilinear `Graphics2D.drawImage` scale,
   * PNG re-encode, and a verification re-decode of the output — all
   * inside the partition; neither input nor output payload shuffles
   * (emit the fixed-size feature row; a production sink would write
   * the resized bytes to object storage from the same task). Input:
   * (id long, payload binary).
   */
  def resizeImages(df: DataFrame, boxW: Int, boxH: Int):
      org.apache.spark.sql.Dataset[ResizedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) => resizeImage(id, bytes, boxW, boxH) }
      }
  }

  /** Single-payload real resize kernel (public for specs). */
  def resizeImage(id: Long, bytes: Array[Byte], boxW: Int, boxH: Int): ResizedImage =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) ResizedImage(id, 0, 0, 0, 0, 0L, ok = false)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val s = math.min(boxW.toDouble / w, boxH.toDouble / h)
        val ow = math.max(1, math.floor(w * s).toInt)
        val oh = math.max(1, math.floor(h * s).toInt)
        val out = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, ow, oh, null); ()
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        val back = decodeImage(id, bos.toByteArray)
        ResizedImage(id, w, h, ow, oh, back.lumaSum3, back.ok)
      }
    } catch {
      case _: Exception => ResizedImage(id, 0, 0, 0, 0, 0L, ok = false)
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

  /**
   * Decoded-image feature row of the REAL codec path: exact dims and
   * color-channel count from the decoder, `lumaSum3` = Σ over pixels of
   * (r+g+b) as an exact integer (so solid/synthetic fixtures replay
   * bit-for-bit in an arithmetic oracle; divide by 3·w·h for the mean
   * luma), and the 64-bit perceptual dHash. `ok=false` rows carry zeros
   * (unreadable / non-image payloads never kill the stage).
   */
  case class DecodedImage(id: Long, width: Int, height: Int, channels: Int,
                          lumaSum3: Long, dhash: Long, ok: Boolean)

  /**
   * REAL image decode, partition-batched: `ImageIO.read` over each
   * payload (one in-memory codec path per partition — `setUseCache
   * (false)` keeps the JDK's temp-file cache off executor disks),
   * iterator-in/iterator-out so no partition materializes whole, and
   * ONLY the fixed-size feature row leaves the stage — payload bytes
   * never shuffle. Input: (id long, payload binary).
   */
  def decodeImages(df: DataFrame): org.apache.spark.sql.Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) => decodeImage(id, bytes) }
      }
  }

  /** Single-payload real decode (the per-row kernel of [[decodeImages]],
    * public for spec-level round-trip checks). */
  def decodeImage(id: Long, bytes: Array[Byte]): DecodedImage =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) DecodedImage(id, 0, 0, 0, 0L, 0L, ok = false)
      else {
        val w = img.getWidth
        val h = img.getHeight
        // 9×8 cell area-sums for dHash + the global pixel sum, one row
        // buffer at a time (no w*h int allocation for large images).
        val cellSum = Array.ofDim[Long](9, 8)
        val cellCnt = Array.ofDim[Long](9, 8)
        val row = new Array[Int](w)
        var lumaSum3 = 0L
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          val cy = math.min(y * 8 / h, 7)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val s = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            lumaSum3 += s
            val cx = math.min(x * 9 / w, 8)
            cellSum(cx)(cy) += s
            cellCnt(cx)(cy) += 1
            x += 1
          }
          y += 1
        }
        DecodedImage(id, w, h, img.getColorModel.getNumColorComponents,
          lumaSum3, dHashOf(cellSum, cellCnt, w, h), ok = true)
      }
    } catch {
      case _: Exception => DecodedImage(id, 0, 0, 0, 0L, 0L, ok = false)
    }

  /** dHash bits from the 9×8 cell grid: bit (x,y) set iff cell (x+1,y)'s
    * mean luma exceeds cell (x,y)'s — compared as exact cross-products
    * (sumA·cntB vs sumB·cntA), no float division, so the hash is
    * bit-deterministic across JVMs. Brightness-shift invariant by
    * construction (a constant offset preserves every comparison), which
    * is what makes it a PERCEPTUAL key: re-encoded / slightly
    * re-levelled copies of one image collide, different images don't.
    * Images smaller than the 9×8 grid hash to 0 (too small to compare). */
  private def dHashOf(cellSum: Array[Array[Long]], cellCnt: Array[Array[Long]],
                      w: Int, h: Int): Long = {
    if (w < 9 || h < 8) return 0L
    var bits = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (cellSum(cx + 1)(cy) * cellCnt(cx)(cy) >
            cellSum(cx)(cy) * cellCnt(cx + 1)(cy))
          bits |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /**
   * Decoded-audio feature row of the REAL audio codec path: the
   * container-declared format (sample rate, channels, bit depth), the
   * exact frame count, and exact integer sample statistics — `absSum` =
   * Σ|sample| and `peak` = max|sample| over every channel sample — so
   * synthetic PCM fixtures replay bit-for-bit in an arithmetic oracle.
   * `ok=false` rows carry zeros (unreadable / non-audio / non-PCM16
   * payloads never kill the stage).
   */
  case class DecodedAudio(id: Long, sampleRate: Int, channels: Int, bits: Int,
                          nFrames: Long, absSum: Long, peak: Int, ok: Boolean)

  /**
   * REAL audio decode, partition-batched: `javax.sound.sampled
   * .AudioSystem` (part of the JDK's `java.desktop` module,
   * headless-safe — WAV/AIFF/AU PCM containers) parses each payload,
   * streaming frames through a fixed buffer — no payload-sized
   * allocation, iterator-in/iterator-out, and only the fixed-size
   * feature row leaves the stage; payload bytes never shuffle. Input:
   * (id long, payload binary). Compressed codecs (MP3/AAC/Opus) are
   * not in the JDK — those payloads come back `ok=false`, the seam a
   * JNI/FFmpeg decoder swaps into by changing only [[decodeWav]].
   */
  def decodeAudio(df: DataFrame): org.apache.spark.sql.Dataset[DecodedAudio] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeWav(id, bytes) })
  }

  /** Single-payload real audio decode (the per-row kernel of
    * [[decodeAudio]], public for spec-level round-trip checks).
    * Handles signed PCM16 in either endianness — the stats are
    * container-invariant (a WAV and an AIFF of the same samples decode
    * to identical rows). */
  def decodeWav(id: Long, bytes: Array[Byte]): DecodedAudio =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16)
          DecodedAudio(id, 0, 0, 0, 0L, 0L, 0, ok = false)
        else {
          val ch = f.getChannels
          val frameSize = f.getFrameSize // = 2 * ch for PCM16
          val big = f.isBigEndian
          val buf = new Array[Byte](frameSize * 1024)
          var nFrames = 0L
          var absSum = 0L
          var peak = 0
          var read = ais.read(buf)
          var carry = 0 // bytes of a split frame carried between reads
          while (read > 0) {
            val avail = carry + read
            val whole = avail - avail % frameSize // complete frames only
            var i = 0
            while (i < whole) {
              val s =
                if (big) (buf(i) << 8) | (buf(i + 1) & 0xff)
                else (buf(i + 1) << 8) | (buf(i) & 0xff)
              val a = math.abs(s)
              absSum += a
              if (a > peak) peak = a
              i += 2
            }
            nFrames += whole / frameSize
            carry = avail - whole
            if (carry > 0) System.arraycopy(buf, whole, buf, 0, carry)
            read = ais.read(buf, carry, buf.length - carry)
          }
          DecodedAudio(id, f.getSampleRate.toInt, ch, 16, nFrames,
            absSum, peak, ok = true)
        }
      } finally ais.close()
    } catch {
      case _: Exception => DecodedAudio(id, 0, 0, 0, 0L, 0L, 0, ok = false)
    }

  /**
   * Sampled-video feature row of the frame-sample stage: container
   * frame count, how many frames the stride SAMPLED (attempted —
   * failures surface via `ok`, never a shrunken count), the first
   * successfully-decoded sampled frame's dims, and the exact pixel-sum
   * statistic over the sampled frames that decoded (the
   * [[DecodedImage.lumaSum3]] convention, so synthetic fixtures replay
   * in an arithmetic oracle).
   */
  case class SampledVideo(id: Long, nFrames: Int, nSampled: Int,
                          width: Int, height: Int, lumaSum3: Long, ok: Boolean)

  /** Frame-index container for keyframe video: magic `GVF1`, int32 BE
    * frame count, int32 BE per-frame lengths, then the concatenated
    * frame payloads (each a self-contained still, e.g. PNG). This is
    * the MJPEG/keyframe-only shape — REAL inter-frame codecs (H.264)
    * are not in the JDK, so the container parse and the per-frame
    * still decode are real and the temporal codec is the documented
    * missing piece. */
  def synthesizeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GVF1")
    out.writeInt(frames.length)
    frames.foreach(f => out.writeInt(f.length))
    frames.foreach(out.write(_))
    bos.toByteArray
  }

  /**
   * Frame-sampling decode, partition-batched: parse the
   * [[synthesizeVideo]] container, seek DIRECTLY to every `stride`-th
   * frame via the length index (unsampled frames' bytes are never
   * touched — the point of frame-sampling a long video), decode each
   * sampled frame with the REAL image codec, and emit one fixed-size
   * feature row per video. Payload bytes never shuffle. Input:
   * (id long, payload binary).
   */
  def sampleVideoFrames(df: DataFrame, stride: Int):
      org.apache.spark.sql.Dataset[SampledVideo] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) => sampleVideo(id, bytes, stride) }
      }
  }

  /** Single-payload frame-sample kernel (public for specs). */
  def sampleVideo(id: Long, bytes: Array[Byte], stride: Int): SampledVideo =
    try {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!java.util.Arrays.equals(magic, "GVF1".getBytes))
        SampledVideo(id, 0, 0, 0, 0, 0L, ok = false)
      else {
        val n = in.readInt()
        // bound the index allocation by what the payload can actually
        // hold (8-byte header + 4 bytes per length): a corrupt count
        // must come back ok=false, not OOM the task (Array.fill of an
        // unvalidated int throws Error, which no catch below sees)
        if (n <= 0 || n > (bytes.length - 8) / 4)
          SampledVideo(id, 0, 0, 0, 0, 0L, ok = false)
        else {
          val lens = Array.fill(n)(in.readInt())
          // frame f spans [offs(f), offs(f) + lens(f)); header then frames
          val offs = lens.scanLeft(4 + 4 + 4 * n)(_ + _)
          var f = 0
          var sampled = 0
          var w = 0; var h = 0
          var luma = 0L
          var allOk = n > 0
          while (f < n) {
            val frame = java.util.Arrays.copyOfRange(bytes, offs(f), offs(f) + lens(f))
            val d = decodeImage(id, frame)
            if (!d.ok) allOk = false
            else {
              // dims from the first SUCCESSFUL decode — a corrupt first
              // sample must not zero them while later frames decoded fine
              if (w == 0 && h == 0) { w = d.width; h = d.height }
              luma += d.lumaSum3
            }
            sampled += 1
            f += stride
          }
          SampledVideo(id, n, sampled, w, h, luma, ok = allOk)
        }
      }
    } catch {
      case _: Exception => SampledVideo(id, 0, 0, 0, 0, 0L, ok = false)
    }

  /**
   * Audio perceptual-fingerprint row: the exact frame count and a
   * 64-bit fingerprint over the decoded PCM — [[DecodedImage]]'s dHash
   * idiom rotated onto the TIME axis. The frame stream is cut into 65
   * equal-duration segments; bit s is set iff segment s+1's mean
   * energy (Σ|sample| over the segment's frames, all channels) exceeds
   * segment s's, compared as exact integer cross-products
   * (eₛ₊₁·cₛ > eₛ·cₛ₊₁ — no float division, bit-deterministic across
   * JVMs). Invariances, by construction: container (WAV ≡ AIFF of the
   * same samples — inherited from the decode), and VOLUME — a constant
   * gain scales every segment energy uniformly and preserves every
   * comparison — so re-published re-levelled copies of one recording
   * collide while different recordings don't; the audio analogue of
   * dHash's brightness-shift invariance. The cross-products are
   * compared in 128 bits ([[prodGt]] — `Math.multiplyHigh`), so the
   * fingerprint is exact at ANY clip length a long can count.
   */
  case class AudioFp(id: Long, nFrames: Long, fp: Long, ok: Boolean)

  /** Audio perceptual fingerprints, partition-batched: the
    * [[decodeAudio]] streaming shape (fixed buffer, payload bytes never
    * shuffle) emitting one [[AudioFp]] per payload. Non-PCM16 payloads
    * and streams whose frame length the container does not declare come
    * back `ok=false` (segment assignment needs the total upfront; every
    * JDK container — WAV/AIFF/AU — declares it). */
  def audioFingerprints(df: DataFrame): org.apache.spark.sql.Dataset[AudioFp] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => audioFingerprint(id, bytes) })
  }

  /** `a·b > c·d` for non-negative longs, compared in 128 bits — a
    * segment's Σ|sample| times another's frame count overflows a signed
    * long from ~7·10⁸ frames of full-scale stereo (≈ 5 h at 44.1 kHz),
    * which would silently flip fingerprint bits on exactly the
    * long-form content a crawl corpus carries. */
  private[graft] def prodGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  /** Single-payload fingerprint kernel (public for specs). */
  def audioFingerprint(id: Long, bytes: Array[Byte]): AudioFp =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val n = ais.getFrameLength
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16 || n <= 0L)
          AudioFp(id, 0L, 0L, ok = false)
        else {
          val frameSize = f.getFrameSize // = 2 * channels for PCM16
          val big = f.isBigEndian
          val e = new Array[Long](65)
          val c = new Array[Long](65)
          val buf = new Array[Byte](frameSize * 1024)
          var frame = 0L
          var carry = 0
          var read = ais.read(buf)
          while (read > 0) {
            val avail = carry + read
            val whole = avail - avail % frameSize // complete frames only
            var off = 0
            while (off < whole) {
              val seg = math.min(frame * 65L / n, 64L).toInt
              var b = off
              var sum = 0L
              while (b < off + frameSize) {
                val s =
                  if (big) (buf(b) << 8) | (buf(b + 1) & 0xff)
                  else (buf(b + 1) << 8) | (buf(b) & 0xff)
                sum += math.abs(s)
                b += 2
              }
              e(seg) += sum
              c(seg) += 1
              frame += 1
              off += frameSize
            }
            carry = avail - whole
            if (carry > 0) System.arraycopy(buf, whole, buf, 0, carry)
            read = ais.read(buf, carry, buf.length - carry)
          }
          var bits = 0L
          var s = 0
          while (s < 64) {
            if (prodGt(e(s + 1), c(s), e(s), c(s + 1))) bits |= 1L << s
            s += 1
          }
          AudioFp(id, frame, bits, ok = true)
        }
      } finally ais.close()
    } catch {
      case _: Exception => AudioFp(id, 0L, 0L, ok = false)
    }

  /**
   * Video perceptual-signature row: the container frame count and the
   * [[DecodedImage]] dHashes of `k` frames sampled at fixed fractional
   * positions (frame ⌊j·n/k⌋ for j < k — position-stable across equal-
   * length re-publishes). Equal signatures ⇒ perceptual re-encode of
   * the same video (each frame's dHash inherits the brightness-shift
   * invariance); at Hamming-tolerance scale the signature bands as
   * (position, hash) keys — the SimHash banding already in
   * [[DedupOps]], applied per sampled frame.
   */
  case class VideoSig(id: Long, nFrames: Int, sig: Seq[Long], ok: Boolean)

  /** Video perceptual signatures, partition-batched: the
    * [[sampleVideoFrames]] shape — length-index seek to ONLY the k
    * sampled frames (unsampled bytes never touched), real per-frame
    * decode, fixed-size row out, payload bytes never shuffle. */
  def videoSignatures(df: DataFrame, k: Int):
      org.apache.spark.sql.Dataset[VideoSig] = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) => videoSignature(id, bytes, k) }
      }
  }

  /** Single-payload signature kernel (public for specs). */
  def videoSignature(id: Long, bytes: Array[Byte], k: Int): VideoSig =
    try {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!java.util.Arrays.equals(magic, "GVF1".getBytes))
        VideoSig(id, 0, Nil, ok = false)
      else {
        val n = in.readInt()
        // same payload-capacity bound as [[sampleVideo]]: a corrupt
        // count must come back ok=false, never an OOM-sized allocation
        if (n <= 0 || n > (bytes.length - 8) / 4) VideoSig(id, 0, Nil, ok = false)
        else {
          val lens = Array.fill(n)(in.readInt())
          val offs = lens.scanLeft(4 + 4 + 4 * n)(_ + _)
          val picks = (0 until k).map(j => (j.toLong * n / k).toInt).distinct
          var allOk = true
          val sig = picks.map { fi =>
            val frame = java.util.Arrays.copyOfRange(
              bytes, offs(fi), offs(fi) + lens(fi))
            val d = decodeImage(id, frame)
            if (!d.ok) allOk = false
            d.dhash
          }
          VideoSig(id, n, sig, ok = allOk)
        }
      }
    } catch {
      case _: Exception => VideoSig(id, 0, Nil, ok = false)
    }

  /**
   * Modality-sniffed perceptual key: ONE 64-bit key per payload, the
   * dispatch the [[MediaStore]] perceptual lane stands on —
   *
   *  - `GVF1` container → [[videoSignature]] (k = 3), the frame
   *    dHashes folded sequentially through [[fmix64]];
   *  - a JDK audio container (WAV/AIFF/AU) → [[audioFingerprint]];
   *  - anything `ImageIO` decodes → the image dHash;
   *  - undecodable / too-small-to-compare content (raw key 0 — the
   *    decoders' no-signal marker; for audio that is a monotone-energy
   *    clip, where "perceptually equal" is meaningless) → key = null.
   *
   * Audio and video raw keys are salted through [[fmix64]] before they
   * share a relation with image dHashes, so a numeric collision across
   * modalities cannot alias two different media kinds (equality within
   * a kind is preserved — the mix is injective per input). `kind` names
   * the decoded modality for observability.
   */
  case class PerceptualKey(id: Long, kind: String, key: java.lang.Long)

  private val AudioKeySalt = 0x9e3779b97f4a7c15L
  private val VideoKeySalt = 0xc2b2ae3d27d4eb4fL

  /** Perceptual keys, partition-batched ([[decodeImages]] shape:
    * payload bytes never shuffle, fixed-size rows out). */
  def perceptualKeys(df: DataFrame):
      org.apache.spark.sql.Dataset[PerceptualKey] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) => perceptualKey(id, bytes) }
      }
  }

  /** Single-payload sniff-and-key kernel (public for specs). */
  def perceptualKey(id: Long, bytes: Array[Byte]): PerceptualKey = {
    def starts(m: String) = bytes.length >= m.length &&
      java.util.Arrays.equals(bytes.take(m.length), m.getBytes)
    if (starts("GVF1")) {
      val v = videoSignature(id, bytes, k = 3)
      val raw = if (!v.ok || v.sig.isEmpty || v.sig.contains(0L)) 0L
        else v.sig.foldLeft(VideoKeySalt)((a, h) => fmix64(a ^ h))
      PerceptualKey(id, "video", if (raw == 0L) null else raw)
    } else {
      val a = audioFingerprint(id, bytes)
      if (a.ok)
        PerceptualKey(id, "audio",
          if (a.fp == 0L) null else fmix64(a.fp ^ AudioKeySalt))
      else {
        val d = decodeImage(id, bytes)
        if (d.ok)
          PerceptualKey(id, "image", if (d.dhash == 0L) null else d.dhash)
        else PerceptualKey(id, "opaque", null)
      }
    }
  }

  /** Deterministic synthetic PCM16 mono clip through the REAL encoder
    * (`AudioSystem.write`) — the fixture side of the audio decode
    * oracle, the [[synthesizePng]] sibling. `aiff = true` writes the
    * big-endian AIFF container instead of little-endian WAV: same
    * samples, byte-different payload — the container-invariance case. */
  def synthesizeWav(sampleRate: Float, samples: Array[Short],
                    aiff: Boolean = false): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, 1, true, aiff) // signed PCM16 mono; AIFF is big-endian
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      if (aiff) { data(2 * i) = (s >> 8).toByte; data(2 * i + 1) = s.toByte }
      else { data(2 * i) = s.toByte; data(2 * i + 1) = (s >> 8).toByte }
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      if (aiff) javax.sound.sampled.AudioFileFormat.Type.AIFF
      else javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /**
   * Deterministic synthetic PNG through the REAL encoder — the fixture
   * side of the oracle-checked decode queries and specs: a w×h
   * `TYPE_INT_RGB` image with `rgbAt(x, y)` packed 0xRRGGBB pixels,
   * encoded with the JDK PNG writer (lossless, so the decode recovers
   * the exact pixel values the oracle's arithmetic predicts).
   */
  def synthesizePng(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgbAt(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The ONE 9×8 grayscale fixture pattern behind the perceptual-dedup
    * oracles (x_mm_phash_dedup, pipe_multimodal_e2e,
    * x_mm_admit_incremental) and their specs: fmix64 pixels keyed by
    * pattern `g`, brightness-shifted by `off` (max shift 10 — `v < 200
    * + 10` never clips, which is what keeps dHash shift-invariance
    * EXACT). Shared because those oracles' cluster arithmetic is valid
    * only while every consumer synthesizes byte-identical fixtures —
    * a drifted copy would pin two different fixtures under one
    * documented contract. */
  def fixturePng(g: Int, off: Int): Array[Byte] =
    synthesizePng(9, 8, (x, y) => {
      val v = (java.lang.Long.remainderUnsigned(
        fmix64(g * 1000003L + x * 1009L + y * 9176L), 200L).toInt + off) & 0xff
      (v << 16) | (v << 8) | v
    })

  /** murmur3 fmix64 — the per-pixel mixer the synthetic-pattern
    * fixtures use so distinct group keys yield distinct pixel patterns
    * (hence distinct dHashes; verified 40/40 in the spec). The oracle
    * never replays the mixer — it predicts CLUSTERS from the group
    * arithmetic, which is the point of a perceptual-hash contract. */
  def fmix64(a0: Long): Long = {
    var a = a0
    a ^= (a >>> 33); a *= 0xff51afd7ed558ccdL; a ^= (a >>> 33)
    a
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
