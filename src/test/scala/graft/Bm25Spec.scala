package graft

import graft.operators.Bm25
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark shuffle join hash partition"),
    (2L, "spark spark spark broadcast join"),
    (3L, "window aggregate partial merge sort"),
    (4L, "the the the the the the the the spark"), // stopword-heavy, long
    (5L, "join")                                   // short doc, high tf weight
  ).toDF("doc_id", "text")
  private def queries = Seq((100L, "spark join")).toDF("qid", "qtext")

  private def asRows(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq

  test("ranking: tf saturates, length normalizes, every scored doc matches a query term") {
    val out = asRows(Bm25.bm25TopK(docs, queries, "doc_id", "text", "qid", "qtext",
      k = 10, maxDfFrac = 1.0).orderBy("rank"))
    val ids = out.map(_._2)
    assert(ids.toSet == Set(1L, 2L, 3L, 4L, 5L) - 3L,
      "only docs containing 'spark' or 'join' may score")
    // Doc 5 ("join") is a one-token doc: maximal length normalization on
    // a matched term → it must outrank doc 4 (one 'spark' in 9 tokens).
    assert(ids.indexOf(5L) < ids.indexOf(4L))
    // Ranks are 1..n with scores non-increasing.
    assert(out.map(_._4) == (1 to out.length))
    assert(out.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3))
  }

  test("maxDfFrac prunes ubiquitous terms from the index side") {
    // 'spark' is in 3/5 docs (0.6); at maxDfFrac = 0.5 only 'join' (0.4
    // after doc 5, 3/5... ) — use a term present in all docs instead.
    val d2 = docs.withColumn("text",
      org.apache.spark.sql.functions.concat(col("text"),
        org.apache.spark.sql.functions.lit(" common")))
    val out = asRows(Bm25.bm25TopK(d2, Seq((1L, "common")).toDF("qid", "qtext"),
      "doc_id", "text", "qid", "qtext", k = 10, maxDfFrac = 0.5))
    assert(out.isEmpty, s"a df/N = 1.0 term must be pruned at maxDfFrac = 0.5: $out")
  }

  test("stored index: pruneTermScan pushes the query-term in-list into the parquet scan, same results") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    Bm25.index(docs, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val pruned = Bm25.searchIndex(stored, queries, "qid", "qtext", k = 10,
      maxDfFrac = 1.0, pruneTermScan = true)
    val full = Bm25.searchIndex(stored, queries, "qid", "qtext", k = 10,
      maxDfFrac = 1.0)
    assert(asRows(pruned) == asRows(full))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("In(term, [join,spark]") || plan.contains("In(term, [spark,join]"),
      s"query terms must reach the scan as a pushed in-list:\n$plan")
  }

  test("Bm25Store: init+append == monolithic index over the union; compact invariant") {
    import graft.operators.Bm25Store
    val a = docs.filter(col("doc_id") <= 3L)
    val b = docs.filter(col("doc_id") > 3L)
      // empty-text dilutes avgdl (size 0 counts); NULL text must NOT —
      // avg(size(t)) skips nulls, and n_docs still counts the row for idf
      .unionByName(Seq((6L, ""), (7L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val all = a.unionByName(b)
    val dir = java.nio.file.Files.createTempDirectory("bm25_store").toString
    Bm25Store.init(spark, dir, a, "doc_id", "text")
    Bm25Store.append(spark, dir, b, "doc_id", "text")

    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val want = rows(Bm25.index(all, "doc_id", "text"))
    assert(rows(Bm25Store.readIndex(spark, dir)) == want,
      "assembled store must equal the monolithic index over the union")

    // search runs unchanged on the assembled relation
    def hits(idx: DataFrame) = asRows(
      Bm25.searchIndex(idx, queries, "qid", "qtext", k = 10, maxDfFrac = 1.0))
    val direct = hits(Bm25.index(all, "doc_id", "text"))
    assert(hits(Bm25Store.readIndex(spark, dir)) == direct)

    // replay-idempotent append: re-writing the same named part changes nothing
    Bm25Store.append(spark, dir, b, "doc_id", "text", name = Some("part_00001"))
    assert(rows(Bm25Store.readIndex(spark, dir)) == want, "replayed append must be a no-op")

    // compaction is a pure layout change; search still equal, one part left
    Bm25Store.compact(spark, dir)
    assert(rows(Bm25Store.readIndex(spark, dir)) == want)
    assert(hits(Bm25Store.readIndex(spark, dir)) == direct)
    assert(graft.sources.DeltaParts.list(dir).size == 1)

    // pushed term in-list still prunes the compacted store's postings scan
    val pruned = Bm25.searchIndex(Bm25Store.readIndex(spark, dir), queries,
      "qid", "qtext", k = 10, maxDfFrac = 1.0, pruneTermScan = true)
    assert(asRows(pruned) == direct)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("In(term, [join,spark]") || plan.contains("In(term, [spark,join]"),
      s"query terms must reach the stored postings scan:\n$plan")

    // a post-compaction default-named append must NOT reuse an orphan
    // part name still on disk for stale readers (deferred GC)
    val c = Seq((8L, "spark merge join window")).toDF("doc_id", "text")
    Bm25Store.append(spark, dir, c, "doc_id", "text")
    val afterName = graft.sources.DeltaParts.list(dir).filterNot(_.startsWith("part_c"))
    assert(afterName == Seq("part_00002"),
      s"default name must skip the on-disk orphans part_00000/part_00001: $afterName")
    assert(rows(Bm25Store.readIndex(spark, dir)) ==
      rows(Bm25.index(all.unionByName(c), "doc_id", "text")))
  }

  test("Bm25Store: append(b)→compact→append(b) replay ≡ single append (absorbed ledger survives compaction)") {
    import graft.operators.Bm25Store
    val a = docs.filter(col("doc_id") <= 3L)
    val b = docs.filter(col("doc_id") > 3L)
    val dir = java.nio.file.Files.createTempDirectory("bm25_replay").toString
    Bm25Store.init(spark, dir, a, "doc_id", "text")
    Bm25Store.append(spark, dir, b, "doc_id", "text", name = Some("part_b7"))
    Bm25Store.compact(spark, dir)
    // The live ledger no longer names part_b7 — only the _absorbed record
    // does. A replayed epoch re-running the named append must be a no-op,
    // not a postings/df/stats double-count.
    Bm25Store.append(spark, dir, b, "doc_id", "text", name = Some("part_b7"))
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val want = rows(Bm25.index(a.unionByName(b), "doc_id", "text"))
    assert(rows(Bm25Store.readIndex(spark, dir)) == want,
      "post-compaction replay of an absorbed append must not double-count")
    assert(graft.sources.DeltaParts.list(dir).size == 1,
      "the replayed name must not re-enter the live ledger")
    // And an UNNAMED append must never rewind onto an absorbed name, even
    // after compactions sweep the numeric orphan dirs.
    val c = Seq((8L, "spark merge join window")).toDF("doc_id", "text")
    Bm25Store.append(spark, dir, c, "doc_id", "text")
    assert(rows(Bm25Store.readIndex(spark, dir)) ==
      rows(Bm25.index(a.unionByName(b).unionByName(c), "doc_id", "text")))
  }

  test("Bm25Store.delete: tombstoned docs never serve, stats exact at once, df exact after compact") {
    import graft.operators.Bm25Store
    val all = docs.unionByName(
      Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val dir = java.nio.file.Files.createTempDirectory("bm25_del").toString
    Bm25Store.init(spark, dir, all, "doc_id", "text")
    // delete doc 2 (three 'spark' + 'broadcast join') and the null-text
    // doc 7; also pass an absent id — must decrement nothing
    Bm25Store.delete(spark, dir, Seq(2L, 7L, 999L).toDF("doc_id"),
      "doc_id", name = Some("del_1"))
    val survivors = all.filter(!col("doc_id").isin(2L, 7L))
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val want = rows(Bm25.index(survivors, "doc_id", "text"))

    // (a) deleted docs never appear; (b) n_docs/avgdl already exact —
    // only df may differ pre-compaction (the documented Lucene lag)
    val pre = Bm25Store.readIndex(spark, dir)
    assert(pre.filter(col("doc_id").isin(2L, 7L)).count() == 0L,
      "tombstoned docs must never assemble")
    val preNoDf = rows(pre.drop("df"))
    assert(preNoDf == rows(Bm25.index(survivors, "doc_id", "text").drop("df")),
      "postings/stats must be exact immediately after the delete")
    // the stale-df lag is real and visible pre-compaction for 'spark'
    // (doc 2 carried it): stale df = 3, live df = 2
    val staleDf = pre.filter(col("term") === "spark")
      .select("df").distinct().collect().map(_.getLong(0)).toSet
    assert(staleDf == Set(3L), s"pre-compaction df counts the deleted doc: $staleDf")

    // double-delete replay and re-delete: no further decrement
    Bm25Store.delete(spark, dir, Seq(2L).toDF("doc_id"), "doc_id", name = Some("del_1"))
    Bm25Store.delete(spark, dir, Seq(2L).toDF("doc_id"), "doc_id", name = Some("del_2"))
    assert(rows(Bm25Store.readIndex(spark, dir).drop("df")) == rows(
      Bm25.index(survivors, "doc_id", "text").drop("df")),
      "replayed and repeated deletes must not decrement twice")

    // (c) compaction physically removes rows, rebuilds df — full equality
    Bm25Store.compact(spark, dir)
    assert(rows(Bm25Store.readIndex(spark, dir)) == want,
      "post-compaction index must equal the monolithic index over the survivors")
    assert(graft.sources.DeltaParts.list(dir).size == 1)
    // search parity end to end
    assert(asRows(Bm25.searchIndex(Bm25Store.readIndex(spark, dir), queries,
        "qid", "qtext", k = 10, maxDfFrac = 1.0)) ==
      asRows(Bm25.searchIndex(Bm25.index(survivors, "doc_id", "text"), queries,
        "qid", "qtext", k = 10, maxDfFrac = 1.0)))
  }

  test("Bm25Store: snapshot tag → mutate (append+compact cycles) → read-at-tag byte-identical; sweep keeps pinned parts") {
    import graft.operators.Bm25Store
    import graft.sources.DeltaParts
    val a = docs.filter(col("doc_id") <= 3L)
    val dir = java.nio.file.Files.createTempDirectory("bm25_snap").toString
    Bm25Store.init(spark, dir, a, "doc_id", "text")
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val pinnedState = rows(Bm25Store.readIndex(spark, dir))
    assert(Bm25Store.snapshot(dir, "run-x") == Seq("part_00000"))
    // Two full append+compact cycles: the second compact's sweep removes
    // the first cycle's unpinned orphans — the pinned part must survive.
    Bm25Store.append(spark, dir, docs.filter(col("doc_id") === 4L), "doc_id", "text")
    Bm25Store.compact(spark, dir)
    Bm25Store.append(spark, dir, docs.filter(col("doc_id") === 5L), "doc_id", "text")
    Bm25Store.compact(spark, dir)
    assert(rows(Bm25Store.readIndex(spark, dir, tag = Some("run-x"))) == pinnedState,
      "read-at-tag must replay the pinned index byte-identically across sweeps")
    assert(rows(Bm25Store.readIndex(spark, dir)) ==
      rows(Bm25.index(docs, "doc_id", "text")), "live reads stay current")
    // Re-pointing an existing tag at different parts must refuse loudly.
    val e = intercept[IllegalArgumentException](DeltaParts.snapshot(dir, "run-x"))
    assert(e.getMessage.contains("refusing"))
    // Restore: live ledger rolls back to the tag, no data movement.
    Bm25Store.restore(dir, "run-x")
    assert(rows(Bm25Store.readIndex(spark, dir)) == pinnedState,
      "restored live reads must equal the pinned state")
    // Names are write-once across restores: a post-tag absorbed name is
    // (correctly) still a no-op; a FRESH name re-admits the content.
    Bm25Store.append(spark, dir, docs.filter(col("doc_id") === 4L), "doc_id", "text")
    assert(rows(Bm25Store.readIndex(spark, dir)) ==
      rows(Bm25.index(docs.filter(col("doc_id") <= 4L), "doc_id", "text")),
      "a fresh-named append after restore must re-admit")
    // Released tag: the part is no longer pinned (sweepable next cycle).
    Bm25Store.dropSnapshot(dir, "run-x")
    assert(DeltaParts.pinned(dir).isEmpty)
  }

  test("Bm25Store.init refuses a previously-used store dir") {
    import graft.operators.Bm25Store
    val dir = java.nio.file.Files.createTempDirectory("bm25_reinit").toString
    Bm25Store.init(spark, dir, docs, "doc_id", "text")
    val e = intercept[IllegalStateException](
      Bm25Store.init(spark, dir, docs, "doc_id", "text"))
    assert(e.getMessage.contains("already initialized"))
  }

  test("rrf fusion: consensus beats single-run rank, ranks re-number densely") {
    import graft.operators.Rrf
    val run1 = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3)).toDF("query_id", "doc_id", "rank")
    val run2 = Seq((1L, 30L, 1), (1L, 20L, 2), (1L, 40L, 3)).toDF("query_id", "doc_id", "rank")
    val out = asRows(Rrf.fuse(Seq(run1, run2), k = 10).orderBy("rank"))
    // doc 30: 1/63 + 1/61 ≈ .032266 > doc 20: 2/62 ≈ .032258 — a rank-1
    // plus a rank-3 outweighs two rank-2s; singletons follow by rank.
    assert(out.map(_._2) == Seq(30L, 20L, 10L, 40L), s"fusion order wrong: $out")
    assert(out.map(_._4) == Seq(1, 2, 3, 4))
  }

  test("broadcast and shuffled query modes agree; top-k never plans a window rank") {
    val bc = Bm25.bm25TopK(docs, queries, "doc_id", "text", "qid", "qtext",
      k = 3, maxDfFrac = 1.0)
    val sh = Bm25.searchIndex(Bm25.index(docs, "doc_id", "text"), queries,
      "qid", "qtext", k = 3, maxDfFrac = 1.0, broadcastQueries = false)
    assert(asRows(bc) == asRows(sh))
    val plan = bc.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"top-k must use the bounded heap, not a window rank:\n$plan")
  }

  test("rerankCosine: exact cosine order within nominated candidates only, top-k capped, ties on id") {
    val run = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 13L))
      .toDF("query_id", "doc_id")
    val vecs = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.6f, 0.8f)),
      (12L, Array(0.0f, 1.0f)), (13L, Array(0.0f, -1.0f)),
      (14L, Array(1.0f, 0.0f))) // present in the table, never nominated
      .toDF("vec_id", "embedding")
    val qv = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Rerank
      .rerankCosine(run, vecs, "vec_id", "embedding", qv, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // q1 vs [1,0]: 10 -> 1.0, 11 -> 0.6, 12 -> 0.0 — k=2 keeps 10, 11.
    // q2 vs [1,0]: 10 -> 0.0, 13 -> 0.0 — exact tie, doc-id ascending.
    assert(got == Set((1L, 10L, 1), (1L, 11L, 2), (2L, 10L, 1), (2L, 13L, 2)))
  }

  test("rerankCosine: second stage never touches vectors outside the run (candidates broadcast)") {
    val run = Seq((1L, 10L)).toDF("query_id", "doc_id")
    val vecs = Seq((10L, Array(1.0f)), (14L, Array(1.0f))).toDF("vec_id", "embedding")
    val qv = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
    val df = graft.operators.Rerank
      .rerankCosine(run, vecs, "vec_id", "embedding", qv, "vec_id", "embedding", k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"run and query vectors must broadcast into the vector scan:\n$plan")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
  }
}
