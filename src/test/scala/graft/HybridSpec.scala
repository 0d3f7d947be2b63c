package graft

import graft.operators.{Bm25, Rrf, SimilarityOps}
import graft.pipelines.Hybrid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Persisted-store hybrid retrieval ([[Hybrid.search]]) must equal the
 * in-memory fusion (the oracle-checked x_hybrid_rrf composition:
 * Bm25.bm25TopK ⊕ knnJoinCosine under Rrf.fuse) at nprobe = nlist, and
 * must read BOTH stores pruned: the query-term in-list pushed into the
 * postings scan, and only the probed cells' bucket files opened on the
 * ANN side.
 */
class HybridSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("text"))
  private lazy val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private lazy val queries = docs.filter(col("doc_id") % 11 === 0)
    .select(col("doc_id").as("qid"),
      graft.functions.text.firstKTokens(col("text"), 5).as("qtext"))
    .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qvec")), "qid")

  private def fused(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  private lazy val storeDir = {
    val dir = java.nio.file.Files.createTempDirectory("hybrid").toString
    Hybrid.init(spark, dir, docs, "doc_id", "text",
      emb, "vec_id", "embedding", nlist = 8)
    dir
  }

  test("persisted search at nprobe = nlist equals the in-memory fusion exactly") {
    val stored = Hybrid.search(spark, storeDir, queries, "qid", "qtext", "qvec",
      k = 10, kPerRun = 20, nprobe = 8, maxDfFrac = 1.0)
    val lex = Bm25.bm25TopK(docs, queries.select("qid", "qtext"),
        "doc_id", "text", "qid", "qtext", k = 20, maxDfFrac = 1.0)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val sem = SimilarityOps.knnJoinCosine(
        emb.join(queries.select(col("qid").as("vec_id")), "vec_id"),
        emb, "vec_id", "embedding", k = 20, excludeSelf = false)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val mem = Rrf.fuse(Seq(lex, sem), k = 10)
    assert(fused(stored) == fused(mem),
      "persisted hybrid must equal the in-memory x_hybrid_rrf fusion")
  }

  test("one plan, both prunes: pushed term in-list on postings, probed-cell file pruning on ANN") {
    // Narrow probe (nprobe = 2 of 8 cells) so the file pruning is visible.
    val one = queries.orderBy("qid").limit(1)
    val out = Hybrid.search(spark, storeDir, one, "qid", "qtext", "qvec",
      k = 5, kPerRun = 5, nprobe = 2, maxDfFrac = 1.0)
    out.collect() // resolve scans
    // Lexical prune: the query-term in-list reaches the postings parquet
    // scan as a pushed predicate.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("In(term"),
      s"query terms must reach the postings scan as a pushed in-list:\n${plan.take(4000)}")
    // Semantic prune: the fused plan opens strictly fewer ANN bucket
    // files than the table has.
    val annFilesRead = out.inputFiles.count(_.contains("/ann/"))
    val like = spark.range(0).select(lit(0L).as("id"))
    val annFilesTotal = graft.sources.TableSink
      .read(spark, s"$storeDir/ann", like).inputFiles.length
    assert(annFilesRead > 0 && annFilesRead < annFilesTotal,
      s"ANN read must be file-pruned: opened $annFilesRead of $annFilesTotal")
    // And the pruned semantic run still answers: k rows for the query.
    assert(out.filter(col("rank") === 1).count() == 1)
  }

  test("snapshot pins the whole retrieval state: search-at-tag replays across appends and compaction") {
    import graft.operators.Bm25Store
    val dir = java.nio.file.Files.createTempDirectory("hybrid_snap").toString
    val oldDocs = docs.filter(col("doc_id") =!= 0L)
    Hybrid.init(spark, dir, oldDocs, "doc_id", "text",
      emb.filter(col("vec_id") =!= 0L), "vec_id", "embedding", nlist = 8)
    def run(tag: Option[String]) = fused(Hybrid.search(spark, dir, queries,
      "qid", "qtext", "qvec", k = 10, kPerRun = 20, nprobe = 8,
      maxDfFrac = 1.0, tag = tag))
    val before = run(None)
    Hybrid.snapshot(spark, dir, "run-7")
    // Mutate every piece the tag pins: BM25 postings (append + compact,
    // so the pinned part leaves the live ledger), the ANN generation.
    Bm25Store.append(spark, s"$dir/bm25",
      docs.filter(col("doc_id") === 0L), "doc_id", "text")
    graft.operators.Bm25Store.compact(spark, s"$dir/bm25")
    Hybrid.appendVectors(spark, dir,
      emb.filter(col("vec_id") === 0L), "vec_id", "embedding", version = 1L)
    assert(run(Some("run-7")) == before,
      "search-at-tag must replay the pre-mutation results byte-identically")
    assert(run(None) != before, "live search must see the appended doc")
    // A replayed snapshot AFTER the stores moved on must refuse loudly —
    // silently re-pointing the ANN pin would make the "pinned" replay
    // include post-tag vectors.
    val e = intercept[IllegalArgumentException](Hybrid.snapshot(spark, dir, "run-7"))
    assert(e.getMessage.contains("refus"), e.getMessage)
    Hybrid.dropSnapshot(spark, dir, "run-7")
    intercept[IllegalArgumentException](run(Some("run-7")))
  }

  test("restore rolls the LIVE state back to a tag: both legs + centroids via the manifest pointer") {
    import graft.operators.Bm25Store
    val dir = java.nio.file.Files.createTempDirectory("hybrid_restore").toString
    val oldDocs = docs.filter(col("doc_id") =!= 0L)
    Hybrid.init(spark, dir, oldDocs, "doc_id", "text",
      emb.filter(col("vec_id") =!= 0L), "vec_id", "embedding", nlist = 8)
    def live() = fused(Hybrid.search(spark, dir, queries,
      "qid", "qtext", "qvec", k = 10, kPerRun = 20, nprobe = 8, maxDfFrac = 1.0))
    val before = live()
    Hybrid.snapshot(spark, dir, "v1")
    // A missing tag refuses BEFORE either leg mutates.
    val e = intercept[IllegalArgumentException](Hybrid.restore(spark, dir, "vX"))
    assert(e.getMessage.contains("half-restorable"), e.getMessage)
    // Mutate both legs, then roll back.
    Bm25Store.append(spark, s"$dir/bm25",
      docs.filter(col("doc_id") === 0L), "doc_id", "text")
    Bm25Store.compact(spark, s"$dir/bm25")
    Hybrid.appendVectors(spark, dir,
      emb.filter(col("vec_id") === 0L), "vec_id", "embedding", version = 1L)
    assert(live() != before, "live search must see the appended doc")
    Hybrid.restore(spark, dir, "v1")
    assert(live() == before,
      "restored live search must equal the pre-mutation results byte-identically")
    // The store stays mutable after time travel: the append re-applies.
    Hybrid.appendVectors(spark, dir,
      emb.filter(col("vec_id") === 0L), "vec_id", "embedding", version = 2L)
    assert(live() != before, "post-restore appends must land")
  }

  test("appendVectors re-homes a re-added id whose updated vector changes cell (no stale duplicate)") {
    import graft.sources.TableSink
    val dir = java.nio.file.Files.createTempDirectory("hybrid_rehome").toString
    Hybrid.init(spark, dir, docs, "doc_id", "text",
      emb, "vec_id", "embedding", nlist = 8)
    val like = spark.range(0).select(lit(0L).as("cell"), lit(0L).as("id"),
      array().cast("array<double>").as("vec"))
    def rowsFor(id: Long) = TableSink.read(spark, s"$dir/ann", like)
      .filter(col("id") === id).select("cell").collect().map(_.getLong(0)).toSeq
    // Pick two ids assigned to different cells.
    val byCell = TableSink.read(spark, s"$dir/ann", like)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1))
    val (idA, cellA) = byCell.head
    val donor = byCell.find(_._2 != cellA)
    assume(donor.isDefined, "fixture must span at least two cells")
    val (idB, cellB) = donor.get
    // Re-add idA with idB's vector: it must land in idB's cell and the
    // old cell's copy must be gone in the same commit.
    val updated = emb.filter(col("vec_id") === idB)
      .select(lit(idA).as("vec_id"), col("embedding"))
    Hybrid.appendVectors(spark, dir, updated, "vec_id", "embedding", version = 1L)
    assert(rowsFor(idA) == Seq(cellB),
      s"re-added id must exist EXACTLY once, in the new cell: ${rowsFor(idA)}")
  }

  test("appendVectors is O(batch): new vectors retrievable, only touched-cell buckets rewritten") {
    val dir = java.nio.file.Files.createTempDirectory("hybrid_app").toString
    Hybrid.init(spark, dir, docs, "doc_id", "text",
      emb.filter(col("vec_id") =!= 0L), "vec_id", "embedding", nlist = 8)
    Hybrid.appendVectors(spark, dir,
      emb.filter(col("vec_id") === 0L), "vec_id", "embedding", version = 1L)
    val q = queries.filter(col("qid") === 0L)
    assume(q.count() == 1, "fixture must carry vec 0 as a query")
    val sem = Hybrid.semanticRun(spark, dir, q, "qid", "qvec", k = 1, nprobe = 8)
      .collect()
    assert(sem.head.getLong(1) == 0L,
      s"appended vector must be its own nearest neighbor: ${sem.toSeq}")
  }

  test("removeDocuments: a taken-down doc never surfaces; post-compact search equals fusion over survivors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hybrid_rm").toString
    Hybrid.init(spark, dir, docs, "doc_id", "text",
      emb, "vec_id", "embedding", nlist = 8)
    // take down the %7 slice (plus an absent id — a no-op)
    val victims = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
      .unionByName(Seq(987654321L).toDF("doc_id"))
    Hybrid.removeDocuments(spark, dir, victims, "doc_id", Some("rm1"))
    val afterRm = Hybrid.search(spark, dir, queries, "qid", "qtext", "qvec",
      k = 10, kPerRun = 20, nprobe = 8, maxDfFrac = 1.0)
    assert(afterRm.filter(col("doc_id") % 7 === 0).count() === 0L,
      "a removed document must never surface from either run")
    // after the scheduled lexical compact (df exact again), the search
    // must equal the in-memory fusion over the SURVIVORS
    graft.operators.Bm25Store.compact(spark, s"$dir/bm25")
    val docs2 = docs.filter(col("doc_id") % 7 =!= 0)
    val emb2 = emb.filter(col("vec_id") % 7 =!= 0)
    val stored = Hybrid.search(spark, dir, queries, "qid", "qtext", "qvec",
      k = 10, kPerRun = 20, nprobe = 8, maxDfFrac = 1.0)
    val lex = Bm25.bm25TopK(docs2, queries.select("qid", "qtext"),
        "doc_id", "text", "qid", "qtext", k = 20, maxDfFrac = 1.0)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val sem = SimilarityOps.knnJoinCosine(
        emb.join(queries.select(col("qid").as("vec_id")), "vec_id"),
        emb2, "vec_id", "embedding", k = 20, excludeSelf = false)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    assert(fused(stored) == fused(Rrf.fuse(Seq(lex, sem), k = 10)),
      "post-compact search must equal the in-memory fusion over the survivors")
  }
}
