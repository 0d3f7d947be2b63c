package graft

import org.scalatest.funsuite.AnyFunSuite

/** pipe_admission_e2e on a crafted corpus: sf0.01 has no exact dups
  * across the batch/corpus split, so the oracle run never executes the
  * 'duplicate' branch — this fixture exercises all three verdicts and
  * the rejected-beats-duplicate precedence. */
class AdmissionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Curation-passing text: >= 50 distinct alphabetic words (no Gopher
  // repetition), mean word length in [3, 10], stopword hits present.
  private def goodText(seed: Char): String = {
    val filler = (0 until 55).map(i => s"${seed}word" + ('a' + i % 26).toChar + ('a' + i / 26).toChar)
    ("the quick start and most of this is a fine piece" +: filler).mkString(" ")
  }
  private val boiler = "alpha beta gamma delta epsilon zeta eta theta"

  test("all three verdicts and their precedence on a crafted corpus") {
    val g1 = goodText('p')
    val g2 = goodText('q') + " " + boiler
    val junk = "zz"
    val rows = Seq(
      // batch (doc_id % 5 == 0)
      (0L, g1),            // exact copy of corpus 101 → duplicate
      (5L, g2),            // novel, shares the boiler span → admitted, scrubbed
      (10L, junk),         // fails curation → rejected
      (15L, junk),         // fails curation AND duplicates corpus 102 → rejected (precedence)
      // corpus
      (101L, g1),
      (102L, junk),
      (103L, goodText('r') + " " + boiler)
    ).map { case (id, t) => (id, t, "en", "fixture", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("admission").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("pipe_admission_e2e")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out.keySet == Set(0L, 5L, 10L, 15L))
    assert(out(0L)._1 == "duplicate", s"exact corpus copy must be duplicate: ${out(0L)}")
    assert(out(5L)._1 == "admitted" && out(5L)._2 >= 8,
      s"novel doc must admit with the shared boiler span scrubbed: ${out(5L)}")
    assert(out(10L)._1 == "rejected")
    assert(out(15L)._1 == "rejected",
      s"curation rejection must take precedence over duplication: ${out(15L)}")
  }

  test("model-gated funnel: the learned score slots into the same operating point") {
    import org.apache.spark.sql.functions._
    import graft.pipelines.Admission
    import graft.operators.{CurationOps, QualityModel}
    val docs = ((0 until 30).map(i => (i.toLong, goodText(('a' + i % 5).toChar))) ++
      (30 until 45).map(i => (i.toLong, s"zz junk $i"))).toDF("doc_id", "text")
    // weak labels = the Gopher keep rule (the published recipe shape)
    val labeled = CurationOps.gopherStats(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep").cast("int").as("label"))
      .join(docs, "doc_id").localCheckpoint(true)
    val m = QualityModel.train(labeled, "text", "label")
    val r = m.head()
    val w = r.getSeq[Double](0); val b = r.getDouble(1); val dim = r.getInt(2)
    val gated = Admission.curationFunnel(docs, "doc_id", "text",
      Admission.Config(scoreFn = Some(c => QualityModel.scoreCol(c, w, b, dim))))
    // the funnel's admit must equal the manual composition of the SAME
    // stages with the model probability in the quality slot
    val manual = docs
      .withColumn("__p", QualityModel.scoreCol(col("text"), w, b, dim))
      .withColumn("__lang", graft.functions.text.langId(col("text")))
      .join(CurationOps.gopherStats(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep")), "doc_id")
      .withColumn("__pii", CurationOps.piiCounts(col("text")).getField("emails") +
        CurationOps.piiCounts(col("text")).getField("ips"))
      .select(col("doc_id"),
        (col("__lang") =!= "und" && col("__p") >= 0.5 && col("keep") &&
          col("__pii") === 0).as("want"))
    val joined = gated.select(col("doc_id"), col("admit")).join(manual, "doc_id")
    assert(joined.filter(col("admit") =!= col("want")).count() === 0L)
    // and scoreFn is genuinely in the gate, not silently ignored: a
    // constant-0 score must reject EVERYTHING (whatever the other
    // rules say), a constant-1 score must reduce the gate to exactly
    // langid ∧ gopher ∧ pii (quality never binds)
    val allZero = Admission.curationFunnel(docs, "doc_id", "text",
      Admission.Config(scoreFn = Some(_ => lit(0.0))))
    assert(allZero.filter(col("admit")).count() === 0L,
      "a zero score must close the gate for every doc")
    val allOne = Admission.curationFunnel(docs, "doc_id", "text",
      Admission.Config(scoreFn = Some(_ => lit(1.0))))
    val noQuality = docs
      .withColumn("__lang", graft.functions.text.langId(col("text")))
      .join(CurationOps.gopherStats(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep")), "doc_id")
      .withColumn("__pii", CurationOps.piiCounts(col("text")).getField("emails") +
        CurationOps.piiCounts(col("text")).getField("ips"))
      .filter(col("__lang") =!= "und" && col("keep") && col("__pii") === 0)
    assert(allOne.filter(col("admit")).count() === noQuality.count(),
      "a saturating score must leave exactly the structural rules binding")
  }
}
