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

  // ── PQ / SQ8 / centroid kernels (optimization round 20) ──────────────
  // The former column formulations, preserved verbatim as the reference.

  private def vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    ((1 to 60).map(i => (i.toLong,
      Array.fill(16)(rnd.nextDouble() * 2 - 1).toSeq)) ++ Seq(
      (61L, Seq.fill(16)(0.0)),            // zero vector (zero scale / norm)
      (62L, Seq(0.25, -0.5, 0.75, -1.0)))  // shorter than dim
    ).toDF("id", "v")
  }

  private def pqRefCodebook: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(5)
    Array.fill(4, 8, 4)(rnd.nextDouble() - 0.5)
  }

  test("PQ encode/reconstruct kernels == HOF column formulations") {
    import graft.operators.PqOps
    val cb = pqRefCodebook
    val cbLit = typedlit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
    def argminCentroid(sv: org.apache.spark.sql.Column, cents: org.apache.spark.sql.Column) = {
      val dists = transform(cents, c => l2sq(sv, c))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    val dsub = 4
    val refEncode = zip_with(
      transform(sequence(lit(0), lit(3)), s => slice(col("v"), s * dsub + 1, lit(dsub))),
      cbLit, (sv, cents) => argminCentroid(sv, cents).cast("tinyint"))
    // full-length vectors only: the HOF form null-poisons short vectors
    // (a never-produced input), the kernel zero-fills — documented
    val full = vecs.filter(size(col("v")) === 16)
    val k = full.select(col("id"), PqOps.encode(col("v"), cb, 16).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val c = full.select(col("id"), refEncode.as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(k == c)
    val refRecon = flatten(zip_with(col("c"), cbLit,
      (cd, cents) => element_at(cents, cd.cast("int") + 1)))
    val coded = full.select(col("id"), col("v"), PqOps.encode(col("v"), cb, 16).as("c"))
    val kr = coded.select(col("id"), PqOps.reconstruct(col("c"), cb).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cr = coded.select(col("id"), refRecon.as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(kr == cr)
    // the fusions: residual encode == encode(zip_with minus); add == zip_with plus
    val cell = typedlit(Seq.fill(16)(0.125))
    val kres = coded.select(col("id"),
        PqOps.encodeResidual(col("v"), cell, cb, 16).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val cres = full.select(col("id"),
        PqOps.encode(zip_with(col("v"), cell, (x, y) => x - y), cb, 16).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(kres == cres)
    val kadd = coded.select(col("id"),
        PqOps.reconstructAdd(col("c"), cell, cb).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cadd = coded.select(col("id"),
        zip_with(cell, PqOps.reconstruct(col("c"), cb), (a, b) => a + b).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(kadd == cadd)
  }

  test("SQ8 quantize/dequantize kernels == HOF column formulations") {
    import graft.operators.QuantizeOps
    val refScale = coalesce(array_max(transform(col("v"), x => abs(x))), lit(0.0)) / lit(127.0)
    val refQuant = transform(col("v"), x =>
      when(col("scale") === 0.0, lit(0))
        .otherwise(greatest(lit(-127.0), least(lit(127.0), floor(x / col("scale") + 0.5)))
          .cast("int")))
    val base = vecs.withColumn("scale", QuantizeOps.int8Scale(col("v")))
    val ks = vecs.select(col("id"), QuantizeOps.int8Scale(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cs = vecs.select(col("id"), refScale.as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ks == cs)
    val kq = base.select(col("id"), QuantizeOps.quantizeInt8(col("v"), col("scale")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val cq = base.select(col("id"), refQuant.as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(kq == cq)
    val quant = base.withColumn("q", QuantizeOps.quantizeInt8(col("v"), col("scale")))
      .withColumn("qt", graft.functions.quant.quantizeTiny(col("v"), col("scale")))
    // tinyint fusion == int codes cast down
    val tk = quant.select(col("id"), col("qt"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val tc = quant.select(col("id"), transform(col("q"), c => c.cast("tinyint")).as("qt"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(tk == tc)
    // dequantize == transform(codes * scale), both code widths
    val dk = quant.select(col("id"), graft.functions.quant.dequantize(col("qt"), col("scale")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val dc = quant.select(col("id"),
        transform(col("qt"), c => c.cast("double") * col("scale")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(dk == dc)
    // maxAbsError == array_max(zip_with(...)) with the 0.0 coalesce
    val ek = quant.select(col("id"), QuantizeOps.maxAbsError(col("v"), col("q"), col("scale")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ec = quant.select(col("id"),
        coalesce(array_max(zip_with(col("v"), col("q"),
          (x, c) => abs(x - c.cast("double") * col("scale")))), lit(0.0)).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ek == ec)
  }

  test("nearest-centroid kernel == crossJoin argmax aggregation (ties to lowest id)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val cents = ((0 until 7).map(c => (c.toLong,
      Array.fill(16)(rnd.nextDouble() * 2 - 1).toSeq)) :+
      // duplicate centroid vector under a HIGHER id: ties must resolve low
      (7L, Seq.fill(16)(0.0))).toDF("cell_id", "cell_vec")
    val dupOfZero = cents.collect().find(_.getLong(0) == 0L).get.getSeq[Double](1)
    val cents2 = cents.unionByName(Seq((8L, dupOfZero)).toDF("cell_id", "cell_vec"))
    val assignedK = graft.operators.IvfAnn.assignCells(vecs, "id", "v", cents2)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val assignedC = graft.operators.SimilarityOps.assignNearestCentroid(
        vecs, cents2, "id", "v", "cell_id", "cell_vec", threshold = -2.0)
      .select(col("item_id"), col("assigned_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assignedK == assignedC)
    // the duplicated centroid (id 8 == id 0) must never win a tie
    assert(!assignedK.values.exists(_ == 8L))
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
