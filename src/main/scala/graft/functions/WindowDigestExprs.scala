package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.Bridge

/**
 * Compiled window-digest kernels for the n-gram / binary-lifted window
 * families ([[graft.operators.InfiniGram]], [[graft.operators.NgramStore]],
 * [[graft.operators.SaStore]]).
 *
 * WHY A KERNEL (measured, optimization round 19): the former column
 * form generated every window as `xxhash64(w, slice(tokens, i, w))`
 * inside nested `transform`/`flatten` higher-order functions. Catalyst
 * evaluates HOF lambdas INTERPRETED per element, and every window paid
 * a fresh `slice` array allocation plus an O(w) re-hash — timing the
 * ∞-gram probe with ONE query (so the corpus window generation is the
 * whole cost) measured 4.8-5.8 s at sf0.1 out of the probe's ~7 s
 * total. One compiled pass per document computes the same relation
 * with zero slice allocations and one CHAINED hash step per
 * (window, extra token).
 *
 * DIGEST DEFINITION (changed in lockstep on every producing and
 * probing side — and PERSISTED by the span/SA/n-gram store family:
 * [[graft.operators.SpanPosStore]] and [[graft.operators.SaStore]]
 * keep (h1, h2) window rows on disk, [[graft.operators.NgramStore]]
 * its window inventory, and [[graft.operators.SpanDedup.spanDigestIndex]]
 * emits __h1/__h2 as its OUTPUT schema, persisted by the admission
 * funnel's span_index parts — so a store built under one convention
 * silently stops matching probes built under another. Every persisting
 * store stamps [[WindowKernels.DigestConventionId]] into its `_meta`
 * at init and require-matches it at read/probe time; a store predating
 * the current convention must be REBUILT):
 * a window's two 64-bit words are seed-chained xxhash64 over its
 * token strings,
 *
 *   h(t[i..i+w)) = fold(tok => XXH64.hashUnsafeBytes(tok, seed), seed0)
 *
 * with seed0 = 42 (h1) and 42' = XXH64.hashLong(1, 42) (h2) — exactly
 * the element-chaining structure Spark's own `xxhash64(array)` applies,
 * minus the former width prefix. Width needs no explicit prefix: chains
 * of different lengths diverge structurally (XXH64 mixes each element's
 * byte length), so distinct token sequences — including prefixes vs
 * extensions — collide only at the family's standing 128-bit
 * convention, which every consumer already carries and the string-keyed
 * DuckDB oracles re-prove per run. The incremental form is what makes
 * the kernel O(1) per extra width where the array hash was O(w).
 */
object WindowKernels extends Serializable {

  /** The persisted-digest compatibility id ([[graft.sources
    * .BucketedParts.digestStamp]]): bump it whenever the chaining
    * convention below changes, so every digest-persisting store refuses
    * a cross-convention probe loudly instead of silently matching
    * nothing. v2 = the r19 seed-chained form (no width prefix). */
  val DigestConventionId = "xxh64-chain-v2"

  private val Seed1 = 42L
  private val Seed2 = XXH64.hashLong(1L, 42L)

  private def step(tok: UTF8String, seed: Long): Long =
    if (tok == null) XXH64.hashLong(0L, seed) // toks() never emits null; defensive
    else XXH64.hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset, tok.numBytes, seed)

  /** Every (start i, width w ≤ maxN) window of the token array as
    * struct(h1, h2, next-token-or-null) — the [[graft.operators
    * .InfiniGram.corpusWindows]] relation, one chained hash step per
    * (i, w) instead of an O(w) slice+rehash. */
  def ngramWindows(t: ArrayData, maxN: Int): ArrayData = {
    val n = t.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var j = 0
    while (j < n) { toks(j) = t.getUTF8String(j); j += 1 }
    val out = new java.util.ArrayList[Any](n * math.min(maxN, n))
    var i = 0
    while (i < n) {
      var h1 = Seed1
      var h2 = Seed2
      val wMax = math.min(maxN, n - i)
      var w = 1
      while (w <= wMax) {
        val tok = toks(i + w - 1)
        h1 = step(tok, h1)
        h2 = step(tok, h2)
        val next = if (i + w < n) toks(i + w) else null
        out.add(new GenericInternalRow(Array[Any](h1, h2, next)))
        w += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The query side of the ∞-gram probe: the digests of the LAST w
    * tokens for every w ≤ min(maxN, n), as struct(w, h1, h2) — must
    * chain identically to [[ngramWindows]] or every probe silently
    * empties (one definition of `step`/seeds above guarantees it). */
  def suffixDigests(t: ArrayData, maxN: Int): ArrayData = {
    val n = t.numElements()
    val wMax = math.min(maxN, n)
    if (wMax <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](wMax)
    var w = 1
    while (w <= wMax) {
      var h1 = Seed1
      var h2 = Seed2
      var j = n - w
      while (j < n) {
        val tok = t.getUTF8String(j)
        h1 = step(tok, h1)
        h2 = step(tok, h2)
        j += 1
      }
      out(w - 1) = new GenericInternalRow(Array[Any](w, h1, h2))
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Every power-of-two window of every level 0..topA — the
    * [[graft.operators.SaStore]] binary-lifted relation, as
    * struct(i 1-based, a, h1, h2): ONE forward chain per start position
    * emits at each power width, ~2× fewer hash steps than the
    * per-level slice+rehash and no allocations. */
  def powerWindows(t: ArrayData, topA: Int): ArrayData = {
    val n = t.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var j = 0
    while (j < n) { toks(j) = t.getUTF8String(j); j += 1 }
    val maxW = 1 << topA
    val out = new java.util.ArrayList[Any](n * (topA + 1))
    var i = 0
    while (i < n) {
      var h1 = Seed1
      var h2 = Seed2
      val wMax = math.min(maxW, n - i)
      var w = 1
      var a = 0
      var nextPow = 1
      while (w <= wMax) {
        val tok = toks(i + w - 1)
        h1 = step(tok, h1)
        h2 = step(tok, h2)
        if (w == nextPow) {
          out.add(new GenericInternalRow(Array[Any](i + 1, a, h1, h2)))
          a += 1
          nextPow <<= 1
        }
        w += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Every FIXED-width-k window of the token array as
    * struct(i 1-based, h1, h2) — the [[graft.operators.SpanDedup]]
    * shingle relation (digestWindows), chained identically to
    * [[windowDigestPair]](t, i, k). Documents shorter than k produce
    * an empty array (the spanWindows short-doc branch). */
  def fixedWindows(t: ArrayData, k: Int): ArrayData = {
    val n = t.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var j = 0
    while (j < n) { toks(j) = t.getUTF8String(j); j += 1 }
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h1 = Seed1
      var h2 = Seed2
      var p = i
      val end = i + k
      while (p < end) {
        val tok = toks(p)
        h1 = step(tok, h1)
        h2 = step(tok, h2)
        p += 1
      }
      out(i) = new GenericInternalRow(Array[Any](i + 1, h1, h2))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The digest pair of ONE window (pos 1-based, width w) — the probe
    * side of the [[graft.operators.SaStore]] certificate
    * ([[graft.operators.SaStore]].candDigests); chains identically to
    * [[powerWindows]]. Out-of-range windows hash the in-range prefix
    * (callers only probe in-range candidates; never throws). */
  def windowDigestPair(t: ArrayData, pos: Int, w: Int): InternalRow = {
    val n = t.numElements()
    var h1 = Seed1
    var h2 = Seed2
    var j = math.max(0, pos - 1)
    val end = math.min(n, pos - 1 + w)
    while (j < end) {
      val tok = t.getUTF8String(j)
      h1 = step(tok, h1)
      h2 = step(tok, h2)
      j += 1
    }
    new GenericInternalRow(Array[Any](h1, h2))
  }
}

/** [[WindowKernels.ngramWindows]] as a codegen-friendly expression over
  * a token array column. */
case class NgramWindowDigests(child: Expression, maxN: Int) extends UnaryExpression {
  require(maxN >= 1, s"maxN must be >= 1: $maxN")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("next", StringType, nullable = true))), containsNull = false)
  override def prettyName: String = "ngram_window_digests"
  override def nullSafeEval(input: Any): Any =
    WindowKernels.ngramWindows(input.asInstanceOf[ArrayData], maxN)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowKernels.ngramWindows($c, $maxN)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** [[WindowKernels.suffixDigests]] as an expression. */
case class NgramSuffixDigests(child: Expression, maxN: Int) extends UnaryExpression {
  require(maxN >= 1, s"maxN must be >= 1: $maxN")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "ngram_suffix_digests"
  override def nullSafeEval(input: Any): Any =
    WindowKernels.suffixDigests(input.asInstanceOf[ArrayData], maxN)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowKernels.suffixDigests($c, $maxN)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** [[WindowKernels.powerWindows]] as an expression. */
case class PowerWindowDigests(child: Expression, topA: Int) extends UnaryExpression {
  require(topA >= 0, s"topA must be >= 0: $topA")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("a", IntegerType, nullable = false),
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "power_window_digests"
  override def nullSafeEval(input: Any): Any =
    WindowKernels.powerWindows(input.asInstanceOf[ArrayData], topA)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowKernels.powerWindows($c, $topA)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** [[WindowKernels.fixedWindows]] as an expression. */
case class FixedWindowDigests(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1: $k")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "fixed_window_digests"
  override def nullSafeEval(input: Any): Any =
    WindowKernels.fixedWindows(input.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowKernels.fixedWindows($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** [[WindowKernels.windowDigestPair]] as an expression over
  * (token-array, 1-based pos, width). */
case class WindowDigestPair(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false)))
  override def prettyName: String = "window_digest_pair"
  override def nullSafeEval(t: Any, p: Any, w: Any): Any =
    WindowKernels.windowDigestPair(t.asInstanceOf[ArrayData],
      p.asInstanceOf[Int], w.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p, w) =>
      s"graft.functions.WindowKernels.windowDigestPair($t, $p, $w)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): Expression = copy(a, b, c)
}

/** Column wrappers (the [[sig]] idiom). */
object windows {
  def ngramWindows(toks: Column, maxN: Int): Column =
    Bridge.column(NgramWindowDigests(Bridge.expression(toks), maxN))
  def suffixDigests(toks: Column, maxN: Int): Column =
    Bridge.column(NgramSuffixDigests(Bridge.expression(toks), maxN))
  def powerWindows(toks: Column, topA: Int): Column =
    Bridge.column(PowerWindowDigests(Bridge.expression(toks), topA))
  def fixedWindows(toks: Column, k: Int): Column =
    Bridge.column(FixedWindowDigests(Bridge.expression(toks), k))
  def windowDigestPair(toks: Column, pos: Column, w: Column): Column =
    Bridge.column(WindowDigestPair(Bridge.expression(toks),
      Bridge.expression(pos), Bridge.expression(w)))
}
