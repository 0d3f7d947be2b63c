package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object StatsKernels extends Serializable {
  // word-set literals memoized per distinct spec string (one parse per JVM)
  private val setCache = new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[String]]()
  private def wordSet(spec: String): java.util.HashSet[String] =
    setCache.computeIfAbsent(spec, s => {
      val hs = new java.util.HashSet[String]()
      s.split(",").foreach(w => if (w.nonEmpty) hs.add(w))
      hs
    })

  // language profiles memoized per spec "en|the,and,...;de|der,..." — langs
  // kept in code-sorted order so the argmax tie-break (smallest code wins)
  // is a strict-greater update during the scan.
  private val profCache = new java.util.concurrent.ConcurrentHashMap[String, Array[(UTF8String, java.util.HashSet[String])]]()
  private def profiles(spec: String): Array[(UTF8String, java.util.HashSet[String])] =
    profCache.computeIfAbsent(spec, s =>
      s.split(";").filter(_.nonEmpty).map { p =>
        val Array(lang, words) = p.split("\\|", 2)
        (UTF8String.fromString(lang), wordSet(words))
      }.sortBy(_._1.toString))

  private val und = UTF8String.fromString("und")

  /** Membership in THE whitespace class ([[text.WhitespaceRun]]) — the
    * kernel must split exactly where the column form's regex does;
    * `Character.isWhitespace` is wider (\x1C-\x1F, unicode line seps). */
  @inline private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One pass over whitespace tokens:
    * (n_tokens, sum_len, n_stop, n_pos, n_neg, lang_pred). */
  def textStats(s: UTF8String, stopSpec: String, posSpec: String,
                negSpec: String, profSpec: String): InternalRow = {
    val stops = wordSet(stopSpec); val pos = wordSet(posSpec); val neg = wordSet(negSpec)
    val profs = profiles(profSpec)
    val nProf = profs.length
    val profCounts = new Array[Int](nProf)
    // Locale.ROOT: Spark's lower() is locale-independent; the platform
    // default would diverge under e.g. a Turkish JVM locale (I → ı).
    // No trim: String.trim strips ALL chars <= 0x20, wider than the
    // spelled-out whitespace class — edge whitespace simply yields no
    // token, exactly like the column form's trim+split+filter.
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    var n = 0; var sumLen = 0L; var nStop = 0; var nPos = 0; var nNeg = 0
    var i = 0; var start = -1
    val len = str.length
    def flush(end: Int): Unit = if (start >= 0) {
      n += 1; sumLen += (end - start)
      val t = str.substring(start, end)
      if (stops.contains(t)) nStop += 1
      if (pos.contains(t)) nPos += 1
      if (neg.contains(t)) nNeg += 1
      var p = 0
      while (p < nProf) { if (profs(p)._2.contains(t)) profCounts(p) += 1; p += 1 }
      start = -1
    }
    while (i < len) {
      if (isWs(str.charAt(i))) flush(i)
      else if (start < 0) start = i
      i += 1
    }
    flush(len)
    var best = -1; var bestScore = 0
    var p = 0
    while (p < nProf) {
      if (profCounts(p) > bestScore) { best = p; bestScore = profCounts(p) }
      p += 1
    }
    val lang = if (best < 0) und else profs(best)._1
    new GenericInternalRow(Array[Any](n, sumLen, nStop, nPos, nNeg, lang))
  }
}

/**
 * Single-pass token statistics as a codegen expression — the quality /
 * token-stat / sentiment operators all derive from this one struct, so a
 * document is tokenized once per projection (whole-stage codegen's
 * subexpression elimination dedupes repeated references) instead of once
 * per interpreted higher-order-function fold.
 *
 * Semantics match the column formulations in [[text]]: lowercase trim,
 * whitespace split, character lengths, set membership.
 */
case class TextStatsExpr(child: Expression, stopwords: Seq[String],
                         posWords: Seq[String], negWords: Seq[String],
                         langProfiles: Seq[(String, Seq[String])])
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_pos", IntegerType, nullable = false),
    StructField("n_neg", IntegerType, nullable = false),
    StructField("lang_pred", StringType, nullable = false)))
  override def prettyName: String = "text_stats"
  private val stopSpec = stopwords.mkString(",")
  private val posSpec = posWords.mkString(",")
  private val negSpec = negWords.mkString(",")
  private val profSpec = langProfiles.map { case (l, ws) => l + "|" + ws.mkString(",") }.mkString(";")
  override def nullSafeEval(input: Any): Any =
    StatsKernels.textStats(input.asInstanceOf[UTF8String], stopSpec, posSpec, negSpec, profSpec)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopRef = ctx.addReferenceObj("stopSpec", stopSpec)
    val posRef = ctx.addReferenceObj("posSpec", posSpec)
    val negRef = ctx.addReferenceObj("negSpec", negSpec)
    val profRef = ctx.addReferenceObj("profSpec", profSpec)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StatsKernels.textStats($c, $stopRef, $posRef, $negRef, $profRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object textStats {
  def apply(c: Column,
            stop: Seq[String] = text.defaultStopwords,
            pos: Seq[String] = text.posWords,
            neg: Seq[String] = text.negWords,
            profiles: Seq[(String, Seq[String])] = text.langProfiles): Column =
    Bridge.column(TextStatsExpr(Bridge.expression(c), stop, pos, neg, profiles))
}
