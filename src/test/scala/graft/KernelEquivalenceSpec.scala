package graft

import graft.functions.{sig, text, textStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The codegen kernel expressions must stay byte-identical to the column
 * (built-in-function) formulations they replaced — the oracle checks the
 * kernels, these tests pin the equivalence so future kernel edits can't
 * drift silently.
 */
class KernelEquivalenceSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Seq("the", "fast", "slow", "spark", "query", "a", "of", "BIG", "Win", "error")
    val texts = (1 to 30).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } ++ Seq(
      (31L, "ab"), (32L, "one two"),  // fewer tokens than the shingle width
      // whitespace-class edges: tab-leading (trim keeps it — no phantom ""
      // token), vertical tab as separator, \x1C (NOT whitespace here or in
      // the oracle's spelled-out class — stays inside its token).
      (33L, "\tBIG win the fast spark"),
      (34L, "a\u000Bb of the slow query win"),
      (35L, "b\u001Cc d the of a spark query"))
    texts.toDF("id", "text")
  }

  test("MinhashSignature kernel == column formulation") {
    val kernel = docs.select(col("id"), sig.minhash(col("text"), 3, 4).as("s"))
    val column = docs.select(col("id"),
      text.minhashSignature(text.shingles(text.tokens(col("text")), 3), 4).as("s"))
    val k = kernel.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val c = column.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(k == c)
  }

  test("TextStats kernel matches tokenCount/avgWordLen/stopwordRatio/sentiment columns") {
    val st = textStats(col("text"))
    val kernel = docs.select(col("id"),
      st("n_tokens").as("n"),
      when(st("n_tokens") === 0, 0.0)
        .otherwise(st("sum_len").cast("double") / st("n_tokens")).as("awl"),
      when(st("n_tokens") === 0, 0.0)
        .otherwise(st("n_stop").cast("double") / st("n_tokens")).as("sr"),
      when(st("n_tokens") === 0, 0.0)
        .otherwise((st("n_pos") - st("n_neg")).cast("double") / st("n_tokens")).as("sent"))
    val column = docs.select(col("id"),
      text.tokenCount(col("text")).as("n"),
      text.avgWordLen(text.tokens(col("text"))).as("awl"),
      text.stopwordRatio(text.tokens(col("text"))).as("sr"),
      text.sentiment(col("text")).as("sent"))
    val k = kernel.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val c = column.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(k == c)
  }

  test("langId kernel == column formulation (incl. ties and 'und')") {
    import spark.implicits._
    val texts = Seq(
      (1L, "the cat and the dog of a house is a win"),
      (2L, "der hund und die katze ist das tier"),
      (3L, "el perro y los gatos es una casa"),
      (4L, "le chien et la maison est une grande"),
      (5L, "xyzzy plugh qwerty"),                    // no profile hit → und
      (6L, "the der"),                               // en/de tie → smallest code (de)
      (7L, "es is"),                                 // es/en tie
      (8L, " "),
      (9L, "le the el der und la")                   // multi-way scoring
    ).toDF("id", "text")
    val kernel = texts.select(col("id"), text.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val column = texts.select(col("id"), text.langIdColumns(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel == column)
    assert(kernel(5L) == "und" && kernel(8L) == "und")
  }

  test("cdcBoundaries: rolling hash == closed-form window sum; edges; resync") {
    import graft.functions.SigKernels
    import org.apache.spark.unsafe.types.UTF8String
    val w = 8; val mask = 31L
    // Closed-form reference: hash each window independently (what the
    // DuckDB oracle evaluates), no rolling state.
    def closedForm(s: String): Seq[Int] = {
      val cps = s.codePoints().toArray
      val n = cps.length
      if (n == 0) return Seq.empty
      val hits = (w to n).filter { e =>
        val h = (0 until w).map { j =>
          val p = Iterator.iterate(1L)(_ * SigKernels.CdcBase % SigKernels.CdcMod)
            .drop(w - 1 - j).next()
          cps(e - w + j).toLong % SigKernels.CdcMod * p % SigKernels.CdcMod
        }.sum % SigKernels.CdcMod
        (h & mask) == 0L
      }
      if (hits.nonEmpty && hits.last == n) hits else hits :+ n
    }
    def kernel(s: String): Seq[Int] =
      SigKernels.cdcBoundaries(UTF8String.fromString(s), w, mask).toIntArray().toSeq
    val rnd = new scala.util.Random(7)
    val samples = (1 to 40).map(_ => rnd.alphanumeric.take(rnd.nextInt(300)).mkString) ++
      Seq("", "short", "a" * 7, "a" * 8, "über-ünïcode éé text" * 20)
    samples.foreach { s => assert(kernel(s) == closedForm(s), s"mismatch on ${s.take(40)}") }
    // CDC resync: after a prefix edit, boundaries re-align to content —
    // the suffix chunks (relative to end) are eventually identical.
    val base = rnd.alphanumeric.take(500).mkString
    val edited = "INSERTED-PREFIX " + base
    val kb = kernel(base).map(base.length - _)
    val ke = kernel(edited).map(edited.length - _)
    val common = kb.toSet.intersect(ke.toSet)
    assert(common.nonEmpty, "no shared content boundary after prefix edit")
    assert(kb.takeRight(common.size) == ke.takeRight(common.size))
  }

  test("md5Lower64Col column formulation == kernel, across the unsigned range") {
    import spark.implicits._
    val vals = (1 to 200).map(i => s"probe-$i")
    val colled = vals.toDF("s")
      .select(col("s"), sig.md5Lower64Col(col("s")).cast("string").as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vals.foreach { s =>
      val unsigned = java.lang.Long.toUnsignedString(graft.functions.SigKernels.md5Lower64(s))
      assert(colled(s) == unsigned, s"mismatch for $s")
    }
    // ~half the probes should exceed Long.MaxValue (top bit set) — proves
    // the decimal column really carries the unsigned value
    val big = vals.count(s => graft.functions.SigKernels.md5Lower64(s) < 0)
    assert(big > 50, s"only $big high-bit probes")
    // the one-digest bucket expression == decimal formulation mod buckets
    val bucketed = vals.toDF("s")
      .select(col("s"), sig.md5BucketCol(col("s"), 1000000L).as("b"),
        (sig.md5Lower64Col(col("s")) % 1000000L).cast("long").as("d"))
      .collect()
    assert(bucketed.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("HashEmbedding: unit norm, deterministic, token-order invariant in aggregate") {
    val e1 = docs.select(col("id"), graft.functions.HashEmbed(col("text"), 32).as("e"))
    val norms = e1.select(
      sqrt(aggregate(col("e"), lit(0.0), (a, x) => a + x * x)).as("n")).collect().map(_.getDouble(0))
    assert(norms.forall(n => n == 0.0 || math.abs(n - 1.0) < 1e-9))
    val again = docs.select(col("id"), graft.functions.HashEmbed(col("text"), 32).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val first = e1.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == first)
  }
}
