package graft

import graft.operators.SemDedup
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Cluster-0 members at 0°/10°/20° from the centroid, eps between
  // cos(10°) ≈ 0.985 and cos(20°) ≈ 0.940 — built to separate the
  // paper's upper-triangular drop test from a greedy chain.
  private def deg(a: Double) = Seq(math.cos(math.toRadians(a)), math.sin(math.toRadians(a)))
  private lazy val vecs = Seq(
    (1L, deg(0)),   // csim 1.000 — ordered LAST within cluster 0
    (2L, deg(10)),  // csim 0.985
    (3L, deg(20)),  // csim 0.940 — ordered FIRST (keep-low-centroid-sim)
    (4L, Seq(0.0, 1.0)) // cluster 1, singleton
  ).toDF("id", "v")
  private lazy val cents = Seq(
    (0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))
  ).toDF("cid", "cv")

  test("drop test is upper-triangular (earlier neighbor counts even when itself dropped), not a greedy chain") {
    val out = SemDedup.semDedup(vecs, cents, "id", "v", "cid", "cv", eps = 0.97)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(3L) == (0L, true),  "edge example (lowest centroid sim) must be kept")
    assert(out(2L) == (0L, false), "10° is within eps of earlier 20°")
    // Greedy-vs-triangular discriminator: 0° is within eps of 10° (which
    // was itself dropped) but NOT of the kept 20°. The paper thresholds
    // the upper-triangular similarity matrix, so 0° still drops.
    assert(out(1L) == (0L, false), "0° must drop against the earlier-but-dropped 10°")
    assert(out(4L) == (1L, true),  "singleton cluster is kept")
  }

  test("assignment and kept flags match on real embeddings; kept set non-trivial") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val cents = e.groupBy("label")
      .agg(graft.functions.VectorMeanFast(
        org.apache.spark.sql.functions.col("embedding").cast("array<double>")).as("cent"))
    val out = SemDedup.semDedup(e, cents, "vec_id", "embedding", "label", "cent", eps = 0.3)
    val n = out.count()
    val kept = out.filter("kept").count()
    assert(n == e.count(), "one verdict row per input vector")
    assert(kept > 0 && kept < n, s"eps=0.3 must drop some but not all: $kept/$n")
  }

  test("incremental ≡ batch semDedup on an empty corpus; corpus members drop batch dups regardless of their own verdict") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    // Law 1: empty corpus → exactly the batch semantics.
    assert(
      verdicts(SemDedup.incremental(vecs, empty, cents, "id", "v", "cid", "cv", eps = 0.97)) ==
      verdicts(SemDedup.semDedup(vecs, cents, "id", "v", "cid", "cv", eps = 0.97)))
    // Law 2: a corpus member is earlier than every batch member even when
    // the corpus run itself DROPPED it (the paper's earlier-set). Corpus =
    // {20°, 10°}: 10° drops against 20° in the corpus run; a batch {0°}
    // is within eps of 10° only — it must still drop.
    val corpus = Seq((3L, deg(20)), (2L, deg(10))).toDF("id", "v")
    val batch = Seq((1L, deg(0))).toDF("id", "v")
    val inc = verdicts(SemDedup.incremental(batch, corpus, cents, "id", "v", "cid", "cv", eps = 0.97))
    assert(inc == Map(1L -> ((0L, false))),
      s"batch 0° must drop against the corpus' dropped-but-earlier 10°: $inc")
  }

  test("incremental fold ≡ arrival-ordered global semantics on random corpora") {
    // Reference: a driver-side brute force of the arrival-ordered fold —
    // member b (batch k) drops iff ∃ same-cluster a with cos ≥ eps where
    // a is in an earlier batch, or in batch k and paper-earlier.
    val rnd = new scala.util.Random(42)
    def randVec() = Seq.fill(4)(rnd.nextDouble() * 2 - 1)
    val all = (0L until 60L).map(i => (i, randVec()))
    val batches = all.grouped(20).toSeq // three arrival batches
    val cs = Seq((0, randVec()), (1, randVec()), (2, randVec())).toDF("cid", "cv")
    val centArr = cs.collect().map(r => (r.getInt(0).toLong, r.getSeq[Double](1).toArray))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val eps = 0.8
    case class M(id: Long, batch: Int, cl: Long, ord: Double, v: Seq[Double])
    val members = batches.zipWithIndex.flatMap { case (b, k) =>
      b.map { case (id, v) =>
        val sims = centArr.map { case (cid, cv) => (cos(v, cv.toSeq), -cid) }
        val best = sims.max
        M(id, k, -best._2, math.rint(best._1 * 1e6) / 1e6, v)
      }
    }
    val expect = members.map { b =>
      val dropped = members.exists(a => a.cl == b.cl && a.id != b.id &&
        (a.batch < b.batch ||
          (a.batch == b.batch && (a.ord < b.ord || (a.ord == b.ord && a.id < b.id)))) &&
        cos(a.v, b.v) >= eps)
      b.id -> !dropped
    }.toMap
    // Engine: apply incremental per batch, corpus grown by ALL members.
    var corpus = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val got = scala.collection.mutable.Map.empty[Long, Boolean]
    batches.foreach { b =>
      val bdf = b.toDF("id", "v")
      SemDedup.incremental(bdf, corpus, cs, "id", "v", "cid", "cv", eps)
        .collect().foreach(r => got(r.getLong(0)) = r.getBoolean(3))
      corpus = corpus.unionByName(bdf)
    }
    assert(got.toMap == expect,
      s"diff=${expect.toSet.diff(got.toSet).take(5)} | ${got.toSet.diff(expect.toSet).take(5)}")
  }

  test("incremental plan: corpus side is cluster-pruned by a broadcast semi-join; no cross product") {
    val corpus = Seq((3L, deg(20)), (4L, Seq(0.0, 1.0))).toDF("id", "v")
    val batch = Seq((1L, deg(0))).toDF("id", "v")
    val plan = SemDedup.incremental(batch, corpus, cents, "id", "v", "cid", "cv", eps = 0.97)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unkeyed cross product:\n$plan")
    assert(plan.contains("LeftSemi"), s"corpus must prune on the batch's clusters:\n$plan")
  }

  test("SemDedupStore: probe ≡ incremental over the full stored corpus; bucket-pruned read; absorb grows O(batch)") {
    import graft.operators.SemDedupStore
    import graft.sources.TableSink
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val corpus = e.filter("vec_id % 5 <> 0")
    val b1 = e.filter("vec_id % 5 = 0 and vec_id % 10 <> 0")
    val b2 = e.filter("vec_id % 10 = 0")
    val dir = java.nio.file.Files.createTempDirectory("semstore").toString
    SemDedupStore.init(spark, dir, corpus, "vec_id", "embedding", nlist = 8)
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    // Law: probe off the bucket-pruned store read ≡ incremental over the
    // full corpus under the SAME fitted centroids.
    val cells = SemDedupStore.readCentroids(spark, dir)
    val eps = 0.3
    val got1 = verdicts(SemDedupStore.probe(spark, dir, b1, "vec_id", "embedding", eps))
    val want1 = verdicts(SemDedup.incremental(b1, corpus, cells,
      "vec_id", "embedding", "cell_id", "cell_vec", eps))
    assert(got1 == want1, "stored probe must equal the in-memory incremental law")
    assert(got1.values.exists(_._2) , "some batch vectors survive at eps=0.3")
    // File pruning: a single-vector probe opens fewer member files than
    // the store has.
    val one = b1.limit(1)
    val emptyVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val oneClusters = SemDedup.incremental(one, emptyVecs, cells,
        "vec_id", "embedding", "cell_id", "cell_vec", eps)
      .select("cluster_id").collect().map(_.getLong(0))
    val like = spark.range(0).select(
      org.apache.spark.sql.functions.lit(0L).as("cluster_id"),
      org.apache.spark.sql.functions.lit(0L).as("id"),
      org.apache.spark.sql.functions.array().cast("array<double>").as("v"))
    val pruned = TableSink.readBuckets(spark, s"$dir/members", like,
      TableSink.bucketIdsFor(spark, s"$dir/members", oneClusters.map(_.toString)))
    val total = TableSink.read(spark, s"$dir/members", like)
    assert(pruned.inputFiles.length > 0 &&
      pruned.inputFiles.length < total.inputFiles.length,
      s"probe read must be file-pruned: ${pruned.inputFiles.length} of ${total.inputFiles.length}")
    // Absorb b1, then probe b2: must equal incremental over corpus ∪ b1.
    SemDedupStore.absorb(spark, dir, b1, "vec_id", "embedding", version = 1L)
    val got2 = verdicts(SemDedupStore.probe(spark, dir, b2, "vec_id", "embedding", eps))
    val want2 = verdicts(SemDedup.incremental(b2, corpus.unionByName(b1), cells,
      "vec_id", "embedding", "cell_id", "cell_vec", eps))
    assert(got2 == want2, "post-absorb probe must see the grown corpus")
    // Run-once init guard.
    val err = intercept[IllegalStateException](
      SemDedupStore.init(spark, dir, corpus, "vec_id", "embedding", nlist = 8))
    assert(err.getMessage.contains("already initialized"))

    // Remove b1 again (plus an absent id — a no-op): probes must answer
    // exactly as before the absorption, the IvfAnn.removeFromIndex law
    // applied to the semantic store.
    SemDedupStore.remove(spark, dir,
      b1.select("vec_id").unionByName(Seq(987654L).toDF("vec_id")), "vec_id")
    val got3 = verdicts(SemDedupStore.probe(spark, dir, b2, "vec_id", "embedding", eps))
    assert(got3 == verdicts(SemDedup.incremental(b2, corpus, cells,
      "vec_id", "embedding", "cell_id", "cell_vec", eps)),
      "post-remove probe must answer as if b1 was never absorbed")
    assert(TableSink.read(spark, s"$dir/members", like)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.lit(5L)) === 0).count() == 0L,
      "b1 member rows physically gone")
  }

  test("plan: pairwise stage is a cluster-key equi-join, never an unkeyed cross product") {
    val plan = SemDedup.semDedup(vecs, cents, "id", "v", "cid", "cv", eps = 0.97)
      .queryExecution.executedPlan.toString
    // Assignment is centroid literals folded into a projection — no join
    // node of any kind may exist except the cluster-keyed member-pair
    // join and the verdict join, and neither may be a cross product.
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unkeyed cross product:\n$plan")
    assert(plan.contains("cluster_id"), s"pairwise join must key on cluster_id:\n$plan")
  }
}
