package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/**
 * Co-located joins via bucketing: both sides bucketed by the join key →
 * the join plans with ZERO shuffle exchanges (only scans + the join).
 * This is the storage-layout lever for the repeated big-big joins at
 * 100 TB (membership joins, interaction⋈story): pay the partitioning once
 * at write time, never again per query.
 */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("wh").toString
    val s2 = spark.newSession()
    // external tables (explicit path) — warehouse dir never touched
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    import s2.implicits._
    val li = s2.read.parquet(sf() + "/lineitem.parquet")
    val o = s2.read.parquet(sf() + "/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").saveAsTable("o_b")
    val joined = s2.table("li_b")
      .join(s2.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last // below the agg: join + scans
    assert(!joinSection.contains("Exchange"),
      s"bucketed join must not shuffle; plan was:\n$plan")
    // and it still computes the right thing
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("cell-sticky layout: ST4 candidate prefilter becomes file-level pruning") {
    import spark.implicits._
    import graft.sources.TableSink
    import graft.streaming.{Incoming, OnlineClustering}
    val dir = Files.createTempDirectory("cells").toString
    val threshold = 0.9
    // 40 stories around the circle, laid out by their creation-time cell.
    val stories = (0 until 40).map { k =>
      val a = 2 * math.Pi * k / 40.0
      (f"s-$k%02d", Seq(math.cos(a) * 3.0, math.sin(a) * 3.0), (k % 4) + 1L)
    }.toDF("story_id", "centroid", "n")
      .withColumn("cell0", OnlineClustering.cellKey(col("centroid"), threshold, 2))
    TableSink.upsert(spark, dir, stories.withColumn("__v", lit(0L)),
      Seq("story_id"), "__v", numBuckets = 16, layoutCol = Some("cell0"))
    val like = spark.range(0).select(lit("").as("story_id"))
    val full = TableSink.read(spark, dir, like)
    // Batch clustered near angle 0 → a small cell neighborhood. Radius 2
    // covers sticky cells under the ±1-drift re-homing invariant; this
    // fresh table has current == sticky, the strongest no-change check.
    val batch = Seq(Incoming("a1", Array(1.0, 0.02)), Incoming("a2", Array(0.99, 0.05)))
    val cells = OnlineClustering.candidateCells(batch, threshold, 2, radius = 2)
      .map(_.mkString(","))
    val current = OnlineClustering.candidateCells(batch, threshold, 2)
      .map(_.mkString(",")).toSeq
    val ids = TableSink.bucketIdsFor(spark, dir, cells.toSeq)
    assert(ids.nonEmpty && ids.size < 16, s"candidate buckets must be a strict subset: $ids")
    val prunedScan = TableSink.readBuckets(spark, dir, like, ids)
    // No semantic change: the same current-cell predicate over the pruned
    // scan returns exactly the stories the full-scan prefilter returns.
    def prefilter(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("cell0").isin(current: _*))
        .select("story_id").collect().map(_.getString(0)).toSet
    val viaPruned = prefilter(prunedScan)
    val viaFull = prefilter(full)
    assert(viaPruned == viaFull && viaPruned.nonEmpty,
      s"pruned read must not change the candidate set: $viaPruned vs $viaFull")
    // Plan evidence: the pruned scan opens strictly fewer parquet files.
    val allFiles = full.inputFiles.length
    val prunedFiles = prunedScan.inputFiles.length
    assert(prunedFiles < allFiles,
      s"file pruning must be real: $prunedFiles of $allFiles files")
    // And the layout survives upserts: a delta touching one cell dirties
    // only that cell's bucket (the manifest pins layoutCol).
    val delta = Seq(("s-00", Seq(1.0, 0.0), 9L)).toDF("story_id", "centroid", "n")
      .withColumn("cell0", OnlineClustering.cellKey(col("centroid"), threshold, 2))
      .withColumn("__v", lit(1L))
    TableSink.upsert(spark, dir, delta, Seq("story_id"), "__v")
    val after = prefilter(TableSink.readBuckets(spark, dir, like,
      TableSink.bucketIdsFor(spark, dir, cells.toSeq)))
    assert(after == viaFull, "layout-pinned upsert keeps value-addressability")
    // Re-homing (the migration contract): a story whose centroid drifts
    // out of its sticky cell's ±1 band moves buckets via an explicit
    // delete-with-old-value + upsert-with-new — value-addressed readers
    // then find it under the NEW cell and never under the old.
    val s07old = full.filter(col("story_id") === "s-07")
      .select("story_id", "cell0").collect()(0)
    val oldCell = s07old.getString(1)
    val moved = Seq(("s-07", Seq(1.0, 0.0), 42L)).toDF("story_id", "centroid", "n")
      .withColumn("cell0", OnlineClustering.cellKey(col("centroid"), threshold, 2))
      .withColumn("__v", lit(2L))
    val newCell = moved.select("cell0").collect()(0).getString(0)
    assert(newCell != oldCell, "fixture must actually migrate cells")
    TableSink.delete(spark, dir,
      Seq(("s-07", oldCell)).toDF("story_id", "cell0"), Seq("story_id"))
    TableSink.upsert(spark, dir, moved, Seq("story_id"), "__v")
    def inCell(cell: String) = TableSink.readBuckets(spark, dir, like,
        TableSink.bucketIdsFor(spark, dir, Seq(cell)))
      .filter(col("cell0") === cell && col("story_id") === "s-07").count()
    assert(inCell(newCell) == 1L, "re-homed story is addressable by its new cell")
    assert(inCell(oldCell) == 0L, "and gone from the old cell's bucket")
    assert(TableSink.read(spark, dir, like)
      .filter(col("story_id") === "s-07").count() == 1L, "exactly one copy")

    // A non-string layout column would break read-side hash parity
    // silently — the sink refuses it loudly instead.
    val bad = Seq(("k1", 7L)).toDF("story_id", "cell_num").withColumn("__v", lit(0L))
    val err = intercept[IllegalArgumentException] {
      TableSink.upsert(spark, Files.createTempDirectory("badlayout").toString,
        bad, Seq("story_id"), "__v", layoutCol = Some("cell_num"))
    }
    assert(err.getMessage.contains("must be STRING"))
  }

  test("rebucket: pinned bucket count migrates atomically; readers stay correct across the flip") {
    import spark.implicits._
    import graft.sources.TableSink
    val dir = Files.createTempDirectory("rebkt").toString
    val rows = (1 to 200).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    TableSink.upsert(spark, dir, rows.withColumn("__v", lit(1L)),
      Seq("k"), "__v", numBuckets = 4)
    assert(TableSink.numBucketsOf(dir).contains(4))
    val like = spark.range(0).select(lit("").as("k"), lit(0L).as("v"))
    // A reader resolved BEFORE the flip (old manifest's files).
    val oldReader = TableSink.read(spark, dir, like)
    val want = rows.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    TableSink.rebucket(spark, dir, Seq("k"), newBuckets = 16)
    assert(TableSink.numBucketsOf(dir).contains(16), "new count must be pinned")
    def content(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // The pre-flip reader survives (KeepGenerations + grace contract)
    // and the post-flip read sees identical content.
    assert(content(oldReader) == want, "pre-flip reader must stay readable")
    assert(content(TableSink.read(spark, dir, like)) == want)
    // Point reads hash against the NEW pinned count — pruned and correct.
    val hit = TableSink.readBuckets(spark, dir, like,
      TableSink.keyBucketIdsFor(dir, Seq("k7").toDF("k")))
    assert(hit.filter(col("k") === "k7").count() == 1)
    assert(hit.inputFiles.length < TableSink.read(spark, dir, like).inputFiles.length,
      "post-flip point read must open a strict subset of files")
    // Upserts after the flip land in the new bucket function.
    TableSink.upsert(spark, dir,
      Seq(("k7", 777L)).toDF("k", "v").withColumn("__v", lit(2L)), Seq("k"), "__v")
    assert(content(TableSink.read(spark, dir, like))("k7") == 777L)
    // A layout-bucketed table keeps its layout column and meta across
    // the migration (re-home contract unbroken).
    val ldir = Files.createTempDirectory("rebktl").toString
    TableSink.upsert(spark, ldir,
      (1 to 50).map(i => (s"id$i", s"c${i % 5}")).toDF("id", "cell")
        .withColumn("__v", lit(1L)),
      Seq("id"), "__v", numBuckets = 4, layoutCol = Some("cell"),
      meta = Some("grid:v1"))
    TableSink.rebucket(spark, ldir, Seq("id"), newBuckets = 8)
    assert(TableSink.layoutColOf(ldir).contains("cell") &&
      TableSink.metaOf(ldir).contains("grid:v1") &&
      TableSink.numBucketsOf(ldir).contains(8),
      "rebucket must preserve layout column and meta while re-pinning the count")
    val cellHit = TableSink.readBuckets(spark, ldir,
      spark.range(0).select(lit("").as("id"), lit("").as("cell")),
      TableSink.bucketIdsFor(spark, ldir, Seq("c3")))
    assert(cellHit.filter(col("cell") === "c3").count() == 10,
      "value-addressed reads must resolve under the new count")
  }

  test("manifest meta, in-commit re-home, and atomic overwrite re-grid") {
    import spark.implicits._
    import graft.sources.TableSink
    val dir = Files.createTempDirectory("meta").toString
    def row(id: String, cell: String, v: Long) =
      Seq((id, cell, v)).toDF("id", "cell", "__v")
    TableSink.upsert(spark, dir,
      Seq(("k1", "A", 0L), ("k2", "B", 0L)).toDF("id", "cell", "__v"),
      Seq("id"), "__v", numBuckets = 8, layoutCol = Some("cell"))
    assert(TableSink.metaOf(dir).isEmpty, "no meta until a writer sets one")
    // overwrite publishes meta atomically with the data...
    val t0 = TableSink.read(spark, dir, row("", "", 0L))
    TableSink.overwrite(spark, dir, t0, Seq("id"), numBuckets = 8,
      layoutCol = Some("cell"), meta = Some("basis-v1"))
    assert(TableSink.metaOf(dir).contains("basis-v1"))
    // ...and plain upserts carry it forward unchanged.
    TableSink.upsert(spark, dir, row("k3", "C", 1L), Seq("id"), "__v")
    assert(TableSink.metaOf(dir).contains("basis-v1"), "upsert must carry meta forward")
    assert(TableSink.numBucketsOf(dir).contains(8))
    // In-commit re-home: ONE upsert moves k1 from cell A to D — the old
    // copy's bucket is rewritten away in the same manifest flip, so no
    // crash window can duplicate or lose the row (the old two-commit
    // delete-then-upsert migration had both windows).
    TableSink.upsert(spark, dir,
      Seq(("k1", "D", 2L, "A")).toDF("id", "cell", "__v", "__old"),
      Seq("id"), "__v", rehomeFromCol = Some("__old"))
    val like = row("", "", 0L)
    def inCell(c: String) = TableSink.readBuckets(spark, dir, like,
        TableSink.bucketIdsFor(spark, dir, Seq(c)))
      .filter(col("cell") === c && col("id") === "k1").count()
    assert(inCell("D") == 1L && inCell("A") == 0L,
      "re-homed row addressable under the new cell only")
    assert(TableSink.read(spark, dir, like).filter(col("id") === "k1").count() == 1L)
    // The stored schema never grows the transport column.
    assert(!TableSink.read(spark, dir, like).columns.contains("__old"))
    // Re-homing is only meaningful on layout tables — refuse elsewhere.
    val plain = Files.createTempDirectory("plain").toString
    val err2 = intercept[IllegalArgumentException] {
      TableSink.upsert(spark, plain,
        Seq(("k1", "D", 0L, "A")).toDF("id", "cell", "__v", "__old"),
        Seq("id"), "__v", rehomeFromCol = Some("__old"))
    }
    assert(err2.getMessage.contains("layout-bucketed"))
    // Overwrite re-grids every row (layout VALUES may change wholesale —
    // the one operation allowed to) and flips meta in the same commit.
    val regrid = TableSink.read(spark, dir, like)
      .withColumn("cell", concat(lit("g2-"), col("cell")))
    TableSink.overwrite(spark, dir, regrid, Seq("id"), numBuckets = 8,
      layoutCol = Some("cell"), meta = Some("basis-v2"))
    assert(TableSink.metaOf(dir).contains("basis-v2"))
    val all = TableSink.read(spark, dir, like)
    assert(all.count() == 3 && all.filter(col("cell").startsWith("g2-")).count() == 3,
      "overwrite must re-address every row")
    def addressable(c: String, id: String) = TableSink.readBuckets(spark, dir, like,
        TableSink.bucketIdsFor(spark, dir, Seq(c)))
      .filter(col("cell") === c && col("id") === id).count() == 1L
    assert(addressable("g2-D", "k1") && addressable("g2-B", "k2") && addressable("g2-C", "k3"),
      "every row addressable under its new cell after the re-grid")
  }

  test("randomized re-home stress: table state tracks the model across arbitrary migrations") {
    import spark.implicits._
    import graft.sources.TableSink
    val dir = Files.createTempDirectory("rehome").toString
    val rng = new scala.util.Random(42)
    val cells = (0 until 6).map(i => s"c$i")
    // model: key -> (cell, version)
    var model = (0 until 12).map(i => s"k$i" -> (cells(rng.nextInt(6)), 0L)).toMap
    TableSink.upsert(spark, dir,
      model.toSeq.map { case (k, (c, v)) => (k, c, v) }.toDF("id", "cell", "__v"),
      Seq("id"), "__v", numBuckets = 8, layoutCol = Some("cell"))
    for (step <- 1 to 10) {
      // each batch: a few keys get new versions, some migrating cells
      val touched = rng.shuffle(model.keys.toSeq).take(1 + rng.nextInt(5))
      val batch = touched.map { k =>
        val (oldCell, _) = model(k)
        val newCell = cells(rng.nextInt(6))
        model += k -> (newCell, step.toLong)
        (k, newCell, step.toLong, if (newCell != oldCell) oldCell else null)
      }
      TableSink.upsert(spark, dir,
        batch.toDF("id", "cell", "__v", "__old"),
        Seq("id"), "__v", rehomeFromCol = Some("__old"))
      // full-state equality with the model...
      val like = Seq(("", "", 0L)).toDF("id", "cell", "__v").limit(0)
      val got = TableSink.read(spark, dir, like)
        .select("id", "cell", "__v").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(got == model, s"step $step: table diverged from model")
      // ...and every key is value-addressable under exactly its model cell
      val byCell = model.groupBy(_._2._1).view.mapValues(_.keySet).toMap
      byCell.foreach { case (c, keys) =>
        val inBucket = TableSink.readBuckets(spark, dir, like,
            TableSink.bucketIdsFor(spark, dir, Seq(c)))
          .filter(col("cell") === c).select("id").collect().map(_.getString(0)).toSet
        assert(inBucket == keys, s"step $step cell $c: $inBucket != $keys")
      }
    }
  }
}
