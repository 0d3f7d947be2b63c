package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernels for the signature expressions. */
object SigKernels extends Serializable {

  private val md5tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val md = md5tl.get(); md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def tokenize(s: UTF8String): Array[String] = {
    // Locale.ROOT lower + split on THE spelled-out whitespace class +
    // drop empties — exactly the column form (lower/trim/split/filter);
    // String.trim is NOT used (it strips all chars <= 0x20, wider than
    // the class, so control-prefixed tokens would diverge from Spark).
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val parts = str.split(text.WhitespaceRun)
    if (parts.length > 0 && parts(0).isEmpty) parts.drop(1) else parts
  }

  /** Content-defined chunk boundaries via a Rabin-Karp rolling hash over
    * Unicode code points: windowHash(i) = Σ cp(i+j)·B^(w−1−j) mod M for
    * each window of w code points; a boundary falls after position i
    * when the window hash masks to zero. The O(n) rolling recurrence
    * here equals the closed-form per-window sum, which is what the SQL
    * oracle evaluates — identical outputs, different cost. Returns the
    * 1-based END positions (in code points) of every chunk, final chunk
    * always closed at n. Shifted/inserted text re-synchronizes on the
    * same content boundaries — the CDC property that makes chunk-level
    * dedup robust where fixed-size blocks are not. */
  val CdcBase = 257L
  val CdcMod = 1048573L // prime < 2^20: products stay < 2^40, no overflow
  def cdcBoundaries(s: UTF8String, window: Int, mask: Long): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return new GenericArrayData(Array.emptyIntArray)
    val cps = new Array[Long](n)
    var ci = 0; var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp.toLong; ci += 1; off += Character.charCount(cp)
    }
    // B^(w-1) mod M for the outgoing code point
    var bw = 1L
    var k = 0
    while (k < window - 1) { bw = (bw * CdcBase) % CdcMod; k += 1 }
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < n) {
      h = if (i < window) (h * CdcBase + cps(i)) % CdcMod
          else ((h - (cps(i - window) * bw) % CdcMod + CdcMod) % CdcMod * CdcBase + cps(i)) % CdcMod
      if (i >= window - 1 && (h & mask) == 0L) ends += (i + 1)
      i += 1
    }
    if (ends.isEmpty || ends.last != n) ends += n
    new GenericArrayData(ends.toArray)
  }

  /**
   * Lower 64 bits of md5(s): digest bytes 8..15 read little-endian — the
   * exact layout DuckDB's `md5_number_lower` uses, so every hash-derived
   * artifact (SimHash fingerprints, LSH hyperplanes) is reproducible by
   * the SQL oracle.
   */
  def md5Lower64(s: String): Long = {
    val md = md5tl.get(); md.reset()
    md5Lower64Bytes(md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** The digest-bytes-8..15 little-endian fold itself — the single
    * definition of the `md5_number_lower` byte layout. */
  def md5Lower64Bytes(d: Array[Byte]): Long = {
    var h = 0L
    var b = 7
    while (b >= 0) { h = (h << 8) | (d(8 + b) & 0xffL); b -= 1 }
    h
  }

  /** Unsigned `md5Lower64(s) mod buckets` — one digest per call; the
    * sampling primitive (DuckDB: `md5_number_lower(s) % buckets`). */
  def md5Bucket(s: UTF8String, buckets: Long): Long =
    java.lang.Long.remainderUnsigned(md5Lower64(s.toString), buckets)

  /**
   * MinHash signature — byte-for-byte identical to the column formulation
   * in [[text.minhashSignature]] (and so to the DuckDB oracle): word
   * n-gram shingles joined by spaces, k salted md5-hex hashes, per-seed
   * lexicographic minimum, nulls when there are fewer than n tokens.
   */
  def minhashSig(s: UTF8String, n: Int, k: Int): ArrayData = {
    val toks = tokenize(s)
    val mins = new Array[UTF8String](k)
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        val shingle = sb.toString
        var seed = 0
        while (seed < k) {
          val h = md5Hex(s"$seed|$shingle")
          if (mins(seed) == null || h.compareTo(mins(seed).toString) < 0)
            mins(seed) = UTF8String.fromString(h)
          seed += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins.asInstanceOf[Array[AnyRef]])
  }

  /** 64-bit SimHash (Charikar, 2002): per-token 64-bit md5-derived hash,
    * ±1 bit votes, majority sign — one pass, O(tokens) hashing. The token
    * hash is [[md5Lower64]] so the fingerprint is oracle-reproducible. */
  def simhash64(s: UTF8String): Long = {
    val toks = tokenize(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = md5Lower64(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /**
   * Signed-random-projection hyperplanes for cosine LSH: component i of
   * plane j is ±1 from bit 0 of md5Lower64("j|i") — deterministic, data-
   * independent, and reproducible in SQL. The (nbits × dim) sign table is
   * memoized per shape; it never ships with the plan.
   */
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]
  def hyperplanes(nbits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nbits.toLong << 32) | dim.toLong, _ =>
      Array.tabulate(nbits, dim)((j, i) =>
        if ((md5Lower64(s"$j|$i") & 1L) == 0L) 1.0 else -1.0))

  /** Cosine sketch: bit j = sign(v · h_j). One pass per plane over the
    * vector; the hot loop is plain double multiply-adds. */
  def cosineSketch(v: ArrayData, nbits: Int): Int = {
    val dim = v.numElements()
    val hp = hyperplanes(nbits, dim)
    var sk = 0
    var j = 0
    while (j < nbits) {
      val h = hp(j)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v.getDouble(i) * h(i); i += 1 }
      if (dot >= 0) sk |= 1 << j
      j += 1
    }
    sk
  }

  /** Longest common prefix of two strings in CODE POINTS — the unit both
    * Spark's `length`/`substring` and DuckDB's `length`/`substr` count,
    * so the SQL replay (monotone prefix-equality fold over
    * `range(1, least(len(a), len(b)) + 1)`) lands on the same number even
    * through surrogate pairs. The UTF-16 cursors stay in sync because the
    * loop only advances past code points already proven equal. */
  def commonPrefixLen(a: UTF8String, b: UTF8String): Int = {
    val sa = a.toString
    val sb = b.toString
    val la = sa.length
    val lb = sb.length
    var i = 0
    var n = 0
    while (i < la && i < lb) {
      val ca = sa.codePointAt(i)
      val cb = sb.codePointAt(i)
      if (ca != cb) return n
      n += 1
      i += Character.charCount(ca)
    }
    n
  }
}

/** Chunk END positions (1-based, code points) from content-defined
  * chunking — see [[SigKernels.cdcBoundaries]]. `window`/`mask` are
  * literals: they shape the codegen'd rolling loop. */
case class CdcBoundaries(child: Expression, window: Int, mask: Long) extends UnaryExpression {
  require(window >= 1, "cdc window must be >= 1")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"
  override def nullSafeEval(input: Any): Any =
    SigKernels.cdcBoundaries(input.asInstanceOf[UTF8String], window, mask)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.cdcBoundaries($c, $window, ${mask}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** One-digest hash bucket for deterministic sampling: unsigned
  * `md5_lower64(input) mod buckets`. A single md5 per row even inside a
  * Filter, where the 8-substring column formulation would re-digest per
  * reference (FilterExec runs no subexpression elimination). */
case class Md5Bucket(child: Expression, buckets: Long) extends UnaryExpression {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bucket"
  override def nullSafeEval(input: Any): Any =
    SigKernels.md5Bucket(input.asInstanceOf[UTF8String], buckets)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.md5Bucket($c, ${buckets}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class MinhashSignature(child: Expression, n: Int, k: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(input: Any): Any =
    SigKernels.minhashSig(input.asInstanceOf[UTF8String], n, k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.minhashSig($c, $n, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    SigKernels.simhash64(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class CosineSketch(child: Expression, nbits: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "cosine_sketch"
  override def nullSafeEval(input: Any): Any =
    SigKernels.cosineSketch(input.asInstanceOf[ArrayData], nbits)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.cosineSketch($c, $nbits)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Code-point LCP of two strings — see [[SigKernels.commonPrefixLen]].
  * The suffix-array family's one comparison kernel: adjacent-suffix LCP
  * over depth-bounded sort keys stays inside whole-stage codegen instead
  * of splitting both strings to arrays. */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "common_prefix_len"
  override def nullSafeEval(a: Any, b: Any): Any =
    SigKernels.commonPrefixLen(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SigKernels.commonPrefixLen($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

object sig {
  def minhash(c: Column, n: Int, k: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(c), n, k))
  def simhash(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
  def cosineSketch(c: Column, nbits: Int): Column =
    Bridge.column(CosineSketch(Bridge.expression(c), nbits))
  def cdcBoundaries(c: Column, window: Int, mask: Long): Column =
    Bridge.column(CdcBoundaries(Bridge.expression(c), window, mask))
  def commonPrefixLen(a: Column, b: Column): Column =
    Bridge.column(CommonPrefixLen(Bridge.expression(a), Bridge.expression(b)))
  def md5BucketCol(c: Column, buckets: Long): Column =
    Bridge.column(Md5Bucket(Bridge.expression(c), buckets))

  /** Column form of [[SigKernels.md5Lower64]] as an unsigned decimal —
    * digest hex pairs 31..17 reversed, base-16→10 — the exact value
    * DuckDB's `md5_number_lower` returns. Pure codegen'd string ops; the
    * repeated `md5(c)` subtrees collapse under codegen CSE in
    * PROJECTIONS only — inside a Filter predicate use [[md5BucketCol]]
    * (one digest) instead. */
  def md5Lower64Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    conv(concat((0 until 8).map(i => substring(md5(c), 31 - 2 * i, 2)): _*), 16, 10)
      .cast("decimal(20,0)")
  }

  /** Register SQL names for the text-hash/dedup kernels on an EXISTING
    * session (the config-time path is [[graft.GraftExtensions]]). Shape
    * parameters must be integer literals — they size codegen'd loops. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.types.IntegerType
    def litInt(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinhashSignature(es.head, litInt(es(1), "minhash_signature shingle width"),
        litInt(es(2), "minhash_signature hash count")), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("cosine_sketch",
      es => CosineSketch(es.head, litInt(es(1), "cosine_sketch nbits")), "built-in")
    reg.createOrReplaceTempFunction("cdc_boundaries",
      es => CdcBoundaries(es.head, litInt(es(1), "cdc_boundaries window"),
        litInt(es(2), "cdc_boundaries mask").toLong), "built-in")
    reg.createOrReplaceTempFunction("md5_bucket",
      es => Md5Bucket(es.head, litInt(es(1), "md5_bucket buckets").toLong), "built-in")
    reg.createOrReplaceTempFunction("text_stats",
      es => TextStatsExpr(es.head, text.defaultStopwords, text.posWords,
        text.negWords, text.langProfiles), "built-in")
    reg.createOrReplaceTempFunction("hash_embedding",
      es => HashEmbedding(es.head, litInt(es(1), "hash_embedding dim")), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize",
      es => NfcNormalize(es.head), "built-in")
    reg.createOrReplaceTempFunction("deflate_size",
      es => DeflateSize(es.head), "built-in")
  }
}
