package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
    val str = s.toString.toLowerCase.trim
    if (str.isEmpty) Array.empty else str.split("\\s+")
  }

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
          val h = md5Hex(seed + "|" + shingle)
          if (mins(seed) == null || h.compareTo(mins(seed).toString) < 0)
            mins(seed) = UTF8String.fromString(h)
          seed += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins.asInstanceOf[Array[AnyRef]])
  }

  /** 64-bit SimHash: per-token 64-bit hash (two 32-bit string hashes),
    * ±1 bit votes, majority sign — one pass, O(tokens·1) hashing. */
  def simhash64(s: UTF8String): Long = {
    val toks = tokenize(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val h1 = t.hashCode
      val h2 = (t + "#").hashCode
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
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

object sig {
  def minhash(c: Column, n: Int, k: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(c), n, k))
  def simhash(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
}
