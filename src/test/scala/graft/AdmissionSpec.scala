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
}
