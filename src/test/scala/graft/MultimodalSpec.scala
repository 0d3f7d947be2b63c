package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec multimodal path: javax.imageio round-trips, exact pixel
  * statistics, and the perceptual dHash contract (invariance under
  * brightness shifts, distinctness across patterns) that backs
  * x_mm_real_decode / x_mm_phash_dedup. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("synthesizePng -> decodeImage round-trips exact dims, channels, pixel sum") {
    val bytes = MultimodalOps.synthesizePng(17, 11, (_, _) => (200 << 16) | (100 << 8) | 50)
    val d = MultimodalOps.decodeImage(7L, bytes)
    assert(d.ok)
    assert(d.width == 17 && d.height == 11 && d.channels == 3)
    assert(d.lumaSum3 == (200L + 100L + 50L) * 17 * 11)
  }

  test("decodeImage survives non-image payloads as ok=false") {
    val d = MultimodalOps.decodeImage(1L, "not a png at all".getBytes)
    assert(!d.ok && d.width == 0 && d.dhash == 0L)
    val e = MultimodalOps.decodeImage(2L, Array.empty[Byte])
    assert(!e.ok)
  }

  test("dHash: brightness-shift invariant, distinct across 40 patterns, byte-distinct per shift") {
    def png(g: Int, off: Int): Array[Byte] =
      MultimodalOps.synthesizePng(9, 8, (x, y) => {
        val v = (java.lang.Long.remainderUnsigned(
          MultimodalOps.fmix64(g * 1000003L + x * 1009L + y * 9176L), 200L).toInt + off) & 0xff
        (v << 16) | (v << 8) | v
      })
    val hashes = (0 until 40).map(g => MultimodalOps.decodeImage(g, png(g, 0)).dhash)
    assert(hashes.distinct.size == 40, "fixture patterns must yield 40 distinct dHashes")
    for (g <- 0 until 40; off <- Seq(5, 10)) {
      val shifted = MultimodalOps.decodeImage(g, png(g, off))
      assert(shifted.dhash == hashes(g), s"dHash must be brightness-invariant (g=$g off=$off)")
      // the shifted re-encode is byte-different (it is a different image)
      assert(!java.util.Arrays.equals(png(g, off), png(g, 0)))
    }
  }

  test("dHash cell area-sums: downsampled 18x16 image hashes like its 9x8 source") {
    // each 9x8 source pixel expands to a 2x2 block -> identical cell
    // means -> identical dHash through the area-sum grid
    def v(x: Int, y: Int): Int =
      java.lang.Long.remainderUnsigned(
        MultimodalOps.fmix64(3 * 1000003L + x * 1009L + y * 9176L), 200L).toInt
    val small = MultimodalOps.synthesizePng(9, 8, (x, y) => { val g = v(x, y); (g << 16) | (g << 8) | g })
    val big = MultimodalOps.synthesizePng(18, 16, (x, y) => { val g = v(x / 2, y / 2); (g << 16) | (g << 8) | g })
    assert(MultimodalOps.decodeImage(0, small).dhash == MultimodalOps.decodeImage(0, big).dhash)
  }

  test("decodeImages: distributed decode, payloads never leave the partition") {
    import spark.implicits._
    val df = spark.range(0, 60).select(col("id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 29).toInt + 8; val h = (id % 13).toInt + 8
        (id, MultimodalOps.synthesizePng(w, h, (_, _) => 0x804020))
      }).toDF("id", "payload")
    val out = MultimodalOps.decodeImages(df).collect().map(d => d.id -> d).toMap
    assert(out.size == 60)
    for (id <- 0L until 60L) {
      val d = out(id)
      assert(d.ok && d.width == (id % 29).toInt + 8 && d.height == (id % 13).toInt + 8)
      assert(d.lumaSum3 == (0x80L + 0x40L + 0x20L) * d.width * d.height)
    }
    // the feature schema is fixed-size: no binary column survives the stage
    assert(!MultimodalOps.decodeImages(df).schema.exists(_.dataType ==
      org.apache.spark.sql.types.BinaryType))
  }

  test("synthesizeWav -> decodeWav round-trips exact format, frames, and sample stats; WAV == AIFF") {
    val samples = Array.tabulate(333)(i => ((i * 97 % 4001) - 2000).toShort)
    val expAbs = samples.foldLeft(0L)((a, s) => a + math.abs(s.toLong))
    val expPeak = samples.map(s => math.abs(s.toInt)).max
    val wav = MultimodalOps.decodeWav(1L,
      MultimodalOps.synthesizeWav(8000f, samples))
    assert(wav.ok && wav.sampleRate == 8000 && wav.channels == 1 && wav.bits == 16)
    assert(wav.nFrames == 333L && wav.absSum == expAbs && wav.peak == expPeak)
    // Container invariance: the big-endian AIFF of the SAME samples is a
    // byte-different payload decoding to an identical feature row.
    val wavBytes = MultimodalOps.synthesizeWav(8000f, samples)
    val aiffBytes = MultimodalOps.synthesizeWav(8000f, samples, aiff = true)
    assert(!java.util.Arrays.equals(wavBytes, aiffBytes))
    val aiff = MultimodalOps.decodeWav(1L, aiffBytes)
    assert(aiff == wav.copy(), s"AIFF must decode to the WAV's stats: $aiff vs $wav")
  }

  test("decodeWav survives non-audio and non-PCM16 payloads as ok=false") {
    assert(!MultimodalOps.decodeWav(1L, "not audio".getBytes).ok)
    assert(!MultimodalOps.decodeWav(2L, Array.empty[Byte]).ok)
    // An image payload is not audio either.
    assert(!MultimodalOps.decodeWav(3L,
      MultimodalOps.synthesizePng(9, 8, (_, _) => 0x112233)).ok)
  }

  test("decodeAudio: distributed decode, fixed-size feature rows only") {
    import spark.implicits._
    val df = spark.range(40).as[Long].map { id =>
      val n = (id % 5).toInt * 30 + 60
      val samples = Array.tabulate(n)(i =>
        (((id * 31 + i.toLong * 97) % 4001) - 2000).toShort)
      (id, MultimodalOps.synthesizeWav(8000f, samples, aiff = id % 2 == 0))
    }.toDF("id", "payload")
    val out = MultimodalOps.decodeAudio(df).collect().map(d => d.id -> d).toMap
    assert(out.size == 40)
    for (id <- 0L until 40L) {
      val n = (id % 5).toInt * 30 + 60
      val d = out(id)
      assert(d.ok && d.nFrames == n.toLong && d.sampleRate == 8000)
      val expAbs = (0 until n).map(i =>
        math.abs((id * 31 + i.toLong * 97) % 4001 - 2000)).sum
      assert(d.absSum == expAbs, s"id $id: ${d.absSum} vs $expAbs")
    }
    assert(!MultimodalOps.decodeAudio(df).schema.exists(_.dataType ==
      org.apache.spark.sql.types.BinaryType))
  }

  test("resizeImage: aspect-fit geometry + exact solid pixel sum through the real scale-encode-decode cycle") {
    val bytes = MultimodalOps.synthesizePng(32, 20, (_, _) => (200 << 16) | (100 << 8) | 50)
    val r = MultimodalOps.resizeImage(1L, bytes, 16, 16)
    assert(r.ok && r.inW == 32 && r.inH == 20)
    // s = min(16/32, 16/20) = 0.5 → 16 × 10
    assert(r.outW == 16 && r.outH == 10, s"$r")
    assert(r.lumaSum3 == (200L + 100 + 50) * 16 * 10)
    // the upscale path (s > 1): 4×8 into 16×16 → s = 2 → 8×16
    val up = MultimodalOps.resizeImage(2L,
      MultimodalOps.synthesizePng(4, 8, (_, _) => 0x010203), 16, 16)
    assert(up.ok && up.outW == 8 && up.outH == 16, s"$up")
    assert(up.lumaSum3 == (1L + 2 + 3) * 8 * 16)
    assert(!MultimodalOps.resizeImage(3L, "junk".getBytes, 16, 16).ok)
  }

  test("sampleVideo: stride seeks via the index — unsampled frames' bytes are NEVER touched") {
    def frame(v: Int) = MultimodalOps.synthesizePng(10, 9, (_, _) => (v << 16) | (v << 8) | v)
    // Frames 1 and 3 are CORRUPT junk: a stride-2 sample (frames 0, 2, 4)
    // must still decode ok — the proof the index seek skips their bytes
    // rather than decoding-and-ignoring them.
    val junk = "this is not a png".getBytes
    val vid = MultimodalOps.synthesizeVideo(Seq(
      frame(10), junk, frame(30), junk, frame(50)))
    val s2 = MultimodalOps.sampleVideo(1L, vid, stride = 2)
    assert(s2.ok && s2.nFrames == 5 && s2.nSampled == 3)
    assert(s2.width == 10 && s2.height == 9)
    assert(s2.lumaSum3 == (10L + 30L + 50L) * 3 * 10 * 9)
    // stride 1 hits the junk → ok=false (decode failures surface, never crash)
    val s1 = MultimodalOps.sampleVideo(1L, vid, stride = 1)
    assert(!s1.ok && s1.nFrames == 5 && s1.nSampled == 5)
    // non-container payloads and empty videos
    assert(!MultimodalOps.sampleVideo(2L, "nope".getBytes, 2).ok)
    assert(!MultimodalOps.sampleVideo(3L, MultimodalOps.synthesizeVideo(Seq.empty), 2).ok)
  }

  test("sampleVideoFrames: distributed frame-sampling, fixed-size feature rows only") {
    import spark.implicits._
    val df = spark.range(30).as[Long].map { id =>
      val nf = (id % 4).toInt + 3
      val frames = (0 until nf).map(f =>
        MultimodalOps.synthesizePng(9, 8, (_, _) => ((f * 20 + 5) << 16)))
      (id, MultimodalOps.synthesizeVideo(frames))
    }.toDF("id", "payload")
    val out = MultimodalOps.sampleVideoFrames(df, stride = 2).collect()
      .map(d => d.id -> d).toMap
    assert(out.size == 30)
    for (id <- 0L until 30L) {
      val nf = (id % 4).toInt + 3
      val d = out(id)
      assert(d.ok && d.nFrames == nf && d.nSampled == (nf + 1) / 2)
      val expLuma = (0 until nf by 2).map(f => (f * 20 + 5).toLong * 9 * 8).sum
      assert(d.lumaSum3 == expLuma, s"id $id: ${d.lumaSum3} vs $expLuma")
    }
    assert(!MultimodalOps.sampleVideoFrames(df, 2).schema.exists(_.dataType ==
      org.apache.spark.sql.types.BinaryType))
  }

  test("audioFingerprint: volume- and container-invariant, distinct across 40 recordings") {
    def samplesOf(g: Int): Array[Short] = Array.tabulate((g % 5) * 13 + 130)(i =>
      (java.lang.Long.remainderUnsigned(
        MultimodalOps.fmix64(g * 1009L + i * 101L), 1601L) - 800L).toShort)
    val base = (0 until 40).map { g =>
      MultimodalOps.audioFingerprint(g,
        MultimodalOps.synthesizeWav(8000f, samplesOf(g)))
    }
    assert(base.forall(_.ok))
    assert(base.map(_.fp).distinct.size == 40,
      "fixture recordings must yield 40 distinct fingerprints")
    for (g <- 0 until 40) {
      val s = samplesOf(g)
      val aiff = MultimodalOps.audioFingerprint(g,
        MultimodalOps.synthesizeWav(8000f, s, aiff = true))
      assert(aiff.ok && aiff.fp == base(g).fp,
        s"fingerprint must be container-invariant (g=$g)")
      val loud = MultimodalOps.audioFingerprint(g,
        MultimodalOps.synthesizeWav(8000f, s.map(x => (x * 2).toShort)))
      assert(loud.ok && loud.fp == base(g).fp,
        s"fingerprint must be volume-invariant (g=$g)")
      assert(base(g).nFrames == s.length.toLong)
    }
  }

  test("audioFingerprint survives non-audio payloads as ok=false") {
    assert(!MultimodalOps.audioFingerprint(1L, "not audio".getBytes).ok)
    assert(!MultimodalOps.audioFingerprint(2L, Array.empty[Byte]).ok)
  }

  test("videoSignature: k-point index seek never touches unsampled frames; shift-invariant, distinct") {
    def png(g: Int, fr: Int, off: Int): Array[Byte] =
      MultimodalOps.synthesizePng(9, 8, (x, y) => {
        val v = (java.lang.Long.remainderUnsigned(
          MultimodalOps.fmix64(g * 1000003L + fr * 8087L + x * 1009L + y * 9176L),
          200L).toInt + off) & 0xff
        (v << 16) | (v << 8) | v
      })
    // 6 frames, k=3 → picks {0, 2, 4}; frames 1, 3, 5 are CORRUPT junk —
    // a clean signature proves the seek skipped their bytes entirely.
    val junk = "this is not a png".getBytes
    def vid(g: Int, off: Int, corrupt: Boolean): Array[Byte] =
      MultimodalOps.synthesizeVideo((0 until 6).map(fr =>
        if (corrupt && fr % 2 == 1) junk else png(g, fr, off)))
    val base = (0 until 40).map(g =>
      MultimodalOps.videoSignature(g, vid(g, 0, corrupt = true), k = 3))
    assert(base.forall(v => v.ok && v.nFrames == 6 && v.sig.size == 3))
    assert(base.map(_.sig).distinct.size == 40,
      "fixture videos must yield 40 distinct signatures")
    for (g <- 0 until 40; off <- Seq(5, 10)) {
      val shifted = MultimodalOps.videoSignature(g, vid(g, off, corrupt = false), k = 3)
      assert(shifted.ok && shifted.sig == base(g).sig,
        s"signature must be brightness-invariant (g=$g off=$off)")
    }
    // non-container and empty payloads surface as ok=false, never crash
    assert(!MultimodalOps.videoSignature(1L, "nope".getBytes, 3).ok)
    assert(!MultimodalOps.videoSignature(2L,
      MultimodalOps.synthesizeVideo(Seq.empty), 3).ok)
    // a corrupt frame count larger than the payload can hold must come
    // back ok=false — NOT attempt the count-sized index allocation
    val bomb = java.nio.ByteBuffer.allocate(12)
      .put("GVF1".getBytes).putInt(Int.MaxValue).putInt(0).array()
    assert(!MultimodalOps.videoSignature(3L, bomb, 3).ok)
    assert(!MultimodalOps.sampleVideo(3L, bomb, 2).ok)
  }

  test("prodGt compares energy cross-products exactly past 64-bit overflow") {
    val e = 5000000000L; val c = 3000000000L // e*c wraps a signed long
    assert(MultimodalOps.prodGt(e + 1, c, e, c))
    assert(!MultimodalOps.prodGt(e, c, e, c), "ties are not greater")
    assert(!MultimodalOps.prodGt(e, c, e + 1, c))
    // the silent trap the 128-bit compare closes: a*b wraps negative
    assert(MultimodalOps.prodGt(Long.MaxValue / 2, 4L, 3L, 2L))
    assert(!MultimodalOps.prodGt(3L, 2L, Long.MaxValue / 2, 4L))
  }

  test("perceptualKey sniffs the modality and salts the keyspaces apart") {
    def gray(g: Int) = MultimodalOps.synthesizePng(9, 8, (x, y) => {
      val v = java.lang.Long.remainderUnsigned(
        MultimodalOps.fmix64(g * 1000003L + x * 1009L + y * 9176L), 200L).toInt
      (v << 16) | (v << 8) | v
    })
    val samples = Array.tabulate(130)(i =>
      (java.lang.Long.remainderUnsigned(
        MultimodalOps.fmix64(1009L + i * 101L), 1601L) - 800L).toShort)
    val i = MultimodalOps.perceptualKey(1L, gray(3))
    assert(i.kind == "image" && i.key != null)
    assert(i.key == MultimodalOps.decodeImage(1L, gray(3)).dhash,
      "image keys stay the raw dHash")
    val a = MultimodalOps.perceptualKey(2L,
      MultimodalOps.synthesizeWav(8000f, samples))
    assert(a.kind == "audio" && a.key != null)
    assert(a.key != MultimodalOps.audioFingerprint(2L,
      MultimodalOps.synthesizeWav(8000f, samples)).fp,
      "audio keys are salted out of the raw-fingerprint space")
    val v = MultimodalOps.perceptualKey(3L,
      MultimodalOps.synthesizeVideo((0 until 6).map(f => gray(10 + f))))
    assert(v.kind == "video" && v.key != null)
    assert(Set(i.key, a.key, v.key).size == 3)
    // no-signal payloads: junk is opaque, a sub-grid image keys to null
    val junk = MultimodalOps.perceptualKey(4L, "not media".getBytes)
    assert(junk.kind == "opaque" && junk.key == null)
    val tiny = MultimodalOps.perceptualKey(5L,
      MultimodalOps.synthesizePng(4, 4, (_, _) => 0x808080))
    assert(tiny.kind == "image" && tiny.key == null)
  }
}
