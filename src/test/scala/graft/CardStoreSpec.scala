package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CardStore

/** Standing data card: the incremental-equality law (init + N batch
  * folds ≡ the one-pass global card, EXACT including the cross-batch
  * distinct-fingerprint count), replay idempotence at the crash windows
  * (named replay; fingerprints-inserted-but-part-lost), compaction
  * invariance, snapshot-tag time travel, and the run-once init guard. */
class CardStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("cardstore").toString

  // quality stand-in: deterministic per-text, 6-decimal-safe
  private val quality: Column => Column =
    t => round(length(t).cast("double") / 100.0, 6)

  /** Synthetic corpus with REAL cross-batch duplication: groups are
    * 30-doc blocks (2 sources × 2 langs over 120 ids), the batch split
    * is id%4, and every 5th doc repeats a pattern keyed id%10 — so each
    * group holds duplicates that land in DIFFERENT batches (ids 0, 10,
    * 20 share a text across batches 0 and 2). */
  private def corpus(n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("doc_id"),
      concat(lit("s"), pmod(floor(col("id") / 60).cast("long"), lit(2))).as("source"),
      concat(lit("l"), pmod(floor(col("id") / 30).cast("long"), lit(2))).as("lang"),
      when(pmod(col("id"), lit(5)) === 0,
          concat(lit("shared text pattern number "), pmod(col("id"), lit(10))))
        .otherwise(concat(lit("unique document body "), col("id"),
          lit(" with some words"))).as("text"))
      .withColumn("n_chars", length(col("text")).cast("int"))

  /** The one-pass global card (the x_data_card computation, minus the
    * HLL column whose band the store asserts itself). */
  private def globalCard(docs: DataFrame): Set[(String, String, Long, Long, Long, Double, Long, Double, Double)] =
    docs.select(col("source"), col("lang"), col("n_chars").cast("long").as("n_chars"),
        graft.functions.text.tokenCount(col("text")).cast("long").as("nt"),
        round(round(quality(col("text")), 6) * lit(1000000.0), 0).cast("long").as("qu"),
        md5(lower(trim(col("text")))).as("fp"))
      .groupBy("source", "lang").agg(
        count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
        sum("n_chars").as("sum_chars"),
        (sum("qu").cast("double") / (count(lit(1)) * lit(1000000L)).cast("double")).as("avg_quality"),
        countDistinct("fp").as("n_unique"),
        percentile_approx(col("n_chars").cast("double"), lit(0.5), lit(1 << 20)).as("p50"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        col("sum_chars"), col("avg_quality"), col("n_unique"),
        round(lit(1.0) - col("n_unique").cast("double") / col("n_docs"), 6).as("dup_rate"),
        round(col("p50"), 2).as("p50_chars"))
      .as[(String, String, Long, Long, Long, Double, Long, Double, Double)]
      .collect().toSet

  private def storedCard(dir: String, tag: Option[String] = None) =
    CardStore.card(spark, dir, tag)
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        col("sum_chars"), col("avg_quality"), col("n_unique"),
        col("dup_rate"), col("p50_chars"))
      .as[(String, String, Long, Long, Long, Double, Long, Double, Double)]
      .collect().toSet

  private def build(dir: String, docs: DataFrame, batches: Int): Unit = {
    CardStore.init(spark, dir, docs.filter(pmod(col("doc_id"), lit(batches)) === 0),
      "source", "lang", "text", "n_chars", quality)
    (1 until batches).foreach(i =>
      CardStore.append(spark, dir, docs.filter(pmod(col("doc_id"), lit(batches)) === i),
        "source", "lang", "text", "n_chars", quality, name = Some(s"part_b$i")))
  }

  test("init + batch folds equal the one-pass global card, exactly") {
    val dir = freshDir()
    val docs = corpus(120).localCheckpoint(true)
    build(dir, docs, 4)
    assert(storedCard(dir) === globalCard(docs))
    // the distinct band holds too (every group's HLL within ±max(10%,10))
    assert(CardStore.card(spark, dir).filter(!col("distinct_ok")).count() == 0)
  }

  test("cross-batch duplicates never recount: n_unique strictly below n_docs") {
    val dir = freshDir()
    val docs = corpus(120).localCheckpoint(true)
    build(dir, docs, 4)
    val rows = CardStore.card(spark, dir)
      .select("n_docs", "n_unique").as[(Long, Long)].collect()
    assert(rows.forall { case (nd, nu) => nu < nd },
      s"the fixture plants cross-batch dups in every group: $rows")
  }

  test("named replays are no-ops, at both crash windows") {
    val dir = freshDir()
    val docs = corpus(80).localCheckpoint(true)
    build(dir, docs, 4)
    val want = storedCard(dir)
    // completed-mutation replay (absorbed short-circuit)
    CardStore.append(spark, dir, docs.filter(pmod(col("doc_id"), lit(4)) === 2),
      "source", "lang", "text", "n_chars", quality, name = Some("part_b2"))
    assert(storedCard(dir) === want, "absorbed replay")
    // the fingerprints-inserted-but-part-lost window: a NEW batch whose
    // fingerprint upsert lands but whose stats part does not — simulated
    // by inserting the attribution rows by hand, then running append.
    val nextBatch = corpus(100).filter(col("doc_id") >= 80).localCheckpoint(true)
    val fps = nextBatch.select(col("source"), col("lang"),
        md5(lower(trim(col("text")))).as("__fp")).distinct()
      .withColumn("__fb", lit("part_b9")).withColumn("__v", lit(0L))
    graft.sources.TableSink.upsert(spark, s"$dir/fps",
      // only genuinely-novel keys, as append would insert them
      fps.join(graft.sources.TableSink.read(spark, s"$dir/fps", fps)
        .select("source", "lang", "__fp"),
        Seq("source", "lang", "__fp"), "left_anti"),
      Seq("source", "lang", "__fp"), "__v")
    CardStore.append(spark, dir, nextBatch,
      "source", "lang", "text", "n_chars", quality, name = Some("part_b9"))
    assert(storedCard(dir) === globalCard(corpus(100).localCheckpoint(true)),
      "replay after the fingerprint upsert still writes the exact part")
  }

  test("compaction and snapshots: fold invisible, tags time-travel") {
    val dir = freshDir()
    val docs = corpus(120).localCheckpoint(true)
    CardStore.init(spark, dir, docs.filter(pmod(col("doc_id"), lit(4)) === 0),
      "source", "lang", "text", "n_chars", quality)
    CardStore.append(spark, dir, docs.filter(pmod(col("doc_id"), lit(4)) === 1),
      "source", "lang", "text", "n_chars", quality, name = Some("part_b1"))
    CardStore.snapshot(dir, "v1")
    val atTag = storedCard(dir)
    CardStore.append(spark, dir, docs.filter(pmod(col("doc_id"), lit(4)) === 2),
      "source", "lang", "text", "n_chars", quality, name = Some("part_b2"))
    val before = storedCard(dir)
    CardStore.compact(spark, dir)
    assert(storedCard(dir) === before, "compaction fold is invisible")
    assert(storedCard(dir, Some("v1")) === atTag, "tag replays pre-append state")
    CardStore.restore(dir, "v1")
    assert(storedCard(dir) === atTag, "restore rolls the live card back")
  }

  test("init is run-once; append refuses an absent store") {
    val dir = freshDir()
    val docs = corpus(40).localCheckpoint(true)
    intercept[IllegalArgumentException](
      CardStore.append(spark, dir, docs, "source", "lang", "text", "n_chars", quality))
    CardStore.init(spark, dir, docs, "source", "lang", "text", "n_chars", quality)
    val e = intercept[IllegalStateException](
      CardStore.init(spark, dir, docs, "source", "lang", "text", "n_chars", quality))
    assert(e.getMessage.contains("already initialized"))
  }
}
