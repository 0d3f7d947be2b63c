package graft

import graft.operators.{DedupOps, Recommend, SimilarityOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorSpec extends AnyFunSuite with SparkSpec {

  test("drift: zero historical mean guards to 0 (reference recommendation-trainer.py:55)") {
    import spark.implicits._
    val df = Seq(0.0, 0.0, 0.0).toDF("v")
    val got = Recommend.drift(df, col("v"), lit(true)).collect()(0).getDouble(0)
    assert(got == 0.0)
  }

  test("drift: |recent-hist|/hist") {
    import spark.implicits._
    // hist mean = 2.0 over (1,2,3); recent mean = 3.0 → drift 0.5
    val df = Seq((1.0, false), (2.0, false), (3.0, true)).toDF("v", "r")
    val got = Recommend.drift(df, col("v"), col("r")).collect()(0).getDouble(0)
    assert(math.abs(got - 0.5) < 1e-12)
  }

  test("minMaxNorm: zero range guards to 0 (reference recommendation-trainer.py:141)") {
    import spark.implicits._
    val df = Seq(("u", 5.0), ("u", 5.0)).toDF("k", "v")
    val got = Recommend.minMaxNorm(df, "k", "v", "n").select("n").collect().map(_.getDouble(0))
    assert(got.forall(_ == 0.0))
  }

  test("eventScore: unknown event types score 0 (reference recommendation-trainer.py:42)") {
    import spark.implicits._
    val got = Seq("like", "nonsense").toDF("e")
      .select(Recommend.score(col("e"))).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(1.0, 0.0))
  }

  test("jaccardJoin: known overlap") {
    import spark.implicits._
    // A={1,2,3}, B={2,3,4} → |∩|=2, |∪|=4, jaccard 0.5
    val l = Seq(("A", 1), ("A", 2), ("A", 3)).toDF("id_a", "m")
    val r = Seq(("B", 2), ("B", 3), ("B", 4)).toDF("id_b", "m")
    val got = SimilarityOps.jaccardJoin(l, r, "id_a", "id_b", "m", 0.4).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Double]("jaccard") == 0.5)
  }

  test("jaccardJoin: below threshold drops pair (empty-union edge handled upstream)") {
    import spark.implicits._
    val l = Seq(("A", 1)).toDF("id_a", "m")
    val r = Seq(("B", 2)).toDF("id_b", "m")
    // no shared member → no pair at all (join-based |∩| never emits 0 rows)
    assert(SimilarityOps.jaccardJoin(l, r, "id_a", "id_b", "m", 0.0).isEmpty)
  }

  test("keepFirst is deterministic: smallest order key survives") {
    import spark.implicits._
    val df = Seq(("u", "click", 3L), ("u", "click", 1L), ("u", "click", 2L)).toDF("u", "e", "seq")
    val got = DedupOps.keepFirst(df, Seq("u", "e"), Seq(col("seq"))).collect()
    assert(got.length == 1 && got(0).getLong(2) == 1L)
  }

  test("knnJoinCosine: self excluded, k respected, rank ordered") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.knnJoinCosine(vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(3L, 1L))
  }

  test("hardNegatives: same-label vectors never nominated, hardest (most similar) negatives first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 1),   // anchor, label 1
      (1L, Seq(0.99f, 0.1f), 1),  // near-identical but SAME label — excluded
      (2L, Seq(0.9f, 0.2f), 2),   // hard negative (closest different-label)
      (3L, Seq(0.0f, 1.0f), 2),   // easy negative
      (4L, Seq(0.5f, 0.5f), 3)    // middling negative
    ).toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.hardNegatives(
        vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", "label", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("negative_id"), r.getAs[Int]("rank")))
    assert(got.toSeq == Seq((2L, 1), (4L, 2)),
      s"expected the two most similar different-label vectors, got ${got.toSeq}")
  }

  test("hardNegatives: the anchor side carries the broadcast hint, not the corpus") {
    import spark.implicits._
    val vecs = Seq((0L, Seq(1.0f), 1), (1L, Seq(1.0f), 2)).toDF("vec_id", "embedding", "label")
    val df = SimilarityOps.hardNegatives(vecs.filter(col("vec_id") === 0), vecs,
      "vec_id", "embedding", "label", k = 1)
    val hinted = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
        h.child.output.map(_.name)
    }.flatten
    assert(hinted.contains("anchor_id") && !hinted.contains("negative_id"),
      s"broadcast hint on wrong side: $hinted")
  }

  test("knnJoinCosine broadcastQueries=false: corpus broadcast, profiles stream, same result") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val profiles = (0L until 200L).map(i => (i, Seq.fill(4)(rnd.nextDouble()))).toDF("vec_id", "embedding")
    val corpus = (1000L until 1010L).map(i => (i, Seq.fill(4)(rnd.nextDouble()))).toDF("vec_id", "embedding")
    val streamed = SimilarityOps.knnJoinCosine(profiles, corpus, "vec_id", "embedding", 3,
      broadcastQueries = false)
    // The broadcast hint must sit on the corpus relation (neighbor_id/cv),
    // never on the unbounded query/profiles side.
    val hinted = streamed.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
        h.child.output.map(_.name)
    }.flatten
    assert(hinted.contains("neighbor_id") && !hinted.contains("query_id"),
      s"broadcast hint on wrong side: $hinted")
    val viaBroadcastQ = SimilarityOps.knnJoinCosine(profiles, corpus, "vec_id", "embedding", 3)
    assert(streamed.orderBy("query_id", "rank").collect().toSeq ===
      viaBroadcastQ.orderBy("query_id", "rank").collect().toSeq)
  }

  test("assignNearestCentroid: below threshold → -1") {
    import spark.implicits._
    val items = Seq((10L, Seq(1.0, 0.0)), (11L, Seq(-1.0, 0.0))).toDF("id", "v")
    val cents = Seq((7L, Seq(1.0, 0.0))).toDF("cid", "cv")
    val got = SimilarityOps.assignNearestCentroid(items, cents, "id", "v", "cid", "cv", 0.5)
      .orderBy("item_id").collect()
    assert(got(0).getAs[Long]("assigned_id") == 7L)
    assert(got(1).getAs[Long]("assigned_id") == -1L)
  }

  test("exact dup groups finds planted duplicate") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val got = DedupOps.exactDupGroups(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    assert(got(0).getSeq[Long](got(0).fieldIndex("ids")).toList == List(1L, 2L))
  }

  test("lsh candidate pairs finds near-identical docs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, base), (2L, base + " tail"), (3L, "completely different words here nothing shared at all ok"))
      .toDF("doc_id", "text")
    val got = DedupOps.lshCandidatePairs(docs, "doc_id", "text", 3, 4, 4).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("P17 id generation: v4 shape, v3 determinism and RFC format") {
    import spark.implicits._
    val df = Seq("alpha", "beta", "alpha").toDF("t")
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-([34])[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    val v4 = df.select(graft.functions.ids.uuid4().as("u")).collect().map(_.getString(0))
    assert(v4.distinct.length == 3 && v4.forall(_.matches(uuidRe)))
    val v3 = df.select(graft.functions.ids.contentUuid(col("t")).as("u"))
      .collect().map(_.getString(0))
    assert(v3.forall(_.matches(uuidRe)) && v3.forall(_.charAt(14) == '3'))
    assert(v3(0) == v3(2) && v3(0) != v3(1)) // content-addressed: same in, same id
  }

  test("bloom-prefiltered incremental dedup == plain anti-join, even at high fpp") {
    import spark.implicits._
    val corpus = ((1 to 300).map(i => (i.toLong, s"corpus doc $i")) :+ (301L, "shared text"))
      .toDF("id", "text")
    val incoming = Seq((1001L, "shared text"), (1002L, "brand new doc"),
      (1003L, "corpus doc 7"), (1004L, "another new one")).toDF("id", "text")
    // undersized filter (expectedItems=8) forces false positives through
    // the verification join; the output must stay exact regardless
    val got = graft.operators.DedupOps
      .incrementalNewDocs(incoming, corpus, "text", expectedItems = 8, fpp = 0.3)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1002L, 1004L))
    // null text rows are kept, exactly like the plain anti-join
    val withNull = incoming.unionByName(Seq((1005L, null.asInstanceOf[String])).toDF("id", "text"))
    val gotNull = graft.operators.DedupOps
      .incrementalNewDocs(withNull, corpus, "text", expectedItems = 8, fpp = 0.3)
      .select("id").as[Long].collect().sorted
    assert(gotNull.toSeq == Seq(1002L, 1004L, 1005L))
  }

  test("deterministic sampling: reproducible, salt-independent draws, sane rates") {
    import spark.implicits._
    val df = (1 to 4000).map(i => (i.toLong, if (i % 4 == 0) "tail" else "head")).toDF("id", "s")
    val a = graft.operators.SampleOps.deterministicSample(df, col("id"), 0.3, "x")
      .collect().map(_.getLong(0)).toSet
    val b = graft.operators.SampleOps.deterministicSample(df, col("id"), 0.3, "x")
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // same salt → same sample
    val c = graft.operators.SampleOps.deterministicSample(df, col("id"), 0.3, "y")
      .collect().map(_.getLong(0)).toSet
    assert(a != c) // different salt → different draw
    assert(math.abs(a.size / 4000.0 - 0.3) < 0.05, s"rate ${a.size / 4000.0}")
    // growing corpus keeps earlier decisions: sample of a prefix is a subset
    val prefix = graft.operators.SampleOps.deterministicSample(
      df.filter($"id" <= 2000), col("id"), 0.3, "x").collect().map(_.getLong(0)).toSet
    assert(prefix == a.filter(_ <= 2000L))
    val strat = graft.operators.SampleOps.stratifiedSample(df, "s", col("id"),
      Map("head" -> 0.1), default = 0.9, salt = "x")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val headRate = strat.count(_._2 == "head") / 3000.0
    val tailRate = strat.count(_._2 == "tail") / 1000.0
    assert(math.abs(headRate - 0.1) < 0.04 && math.abs(tailRate - 0.9) < 0.04,
      s"head $headRate tail $tailRate")
  }

  test("quantileTrim: per-group p-threshold, nulls and unseen groups pass through") {
    import spark.implicits._
    // group a: 1..100 (p90 threshold = 90 → keeps 90); group b: all-equal
    // values (threshold = the value → keeps everything)
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++ (1 to 20).map(_ => ("b", 7L)))
      .toDF("g", "v")
    val t = graft.operators.SampleOps.quantileTrim(df, "g", "v", q = 0.9)
    val byG = t.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("a") == 90L, s"p90 of 1..100 must keep 90: $byG")
    assert(byG("b") == 20L, "an all-ties group keeps everything")
    // null values never reject
    val withNull = df.unionByName(Seq(("a", null.asInstanceOf[java.lang.Long]))
      .toDF("g", "v"))
    assert(graft.operators.SampleOps.quantileTrim(withNull, "g", "v", 0.9)
      .filter(col("v").isNull).count() == 1)
    // thresholds probe back as a broadcast, not a shuffle join
    val plan = t.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"threshold join must broadcast:\n$plan")
  }

  test("fixedSizeSample and capPerGroup: exact sizes, order-independent, stable draws") {
    import spark.implicits._
    val df = (1 to 4000).map(i => (i.toLong, if (i % 4 == 0) "tail" else "head")).toDF("id", "s")
    val fs = graft.operators.SampleOps.fixedSizeSample(df, col("id"), 100, "x")
      .collect().map(_.getLong(0)).toSet
    assert(fs.size == 100, "exactly k rows")
    // corpus-order independence: a shuffled input draws the same set
    val fs2 = graft.operators.SampleOps.fixedSizeSample(
        df.orderBy(rand(7)), col("id"), 100, "x")
      .collect().map(_.getLong(0)).toSet
    assert(fs2 == fs, "selection is a pure function of (key, salt), not row order")
    // the digest-rank prefix nests: a smaller k is a subset of a larger
    val fs50 = graft.operators.SampleOps.fixedSizeSample(df, col("id"), 50, "x")
      .collect().map(_.getLong(0)).toSet
    assert(fs50.subsetOf(fs))
    val capped = graft.operators.SampleOps.capPerGroup(df, "s", col("id"), 30, "x")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(capped.count(_._2 == "head") == 30 && capped.count(_._2 == "tail") == 30,
      "both groups hit the cap exactly (both exceed it)")
    // a group under the cap passes through whole
    val small = graft.operators.SampleOps.capPerGroup(
        df.filter($"id" <= 10), "s", col("id"), 30, "x").count()
    assert(small == 10)
  }

  test("tokenBudgetCap: segment-decomposed cumsum ≡ naive per-domain window; budgets hold; prefixes nest") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(9)
    val df = (1 to 3000).map(i => (i.toLong, s"d${i % 7}",
        (1 + rnd.nextInt(40)).toLong))
      .toDF("id", "dom", "nt")
    def kept(budget: Long) = graft.operators.SampleOps
      .tokenBudgetCap(df, "dom", col("id"), "nt", budget, salt = "t|")
      .collect().map(_.getLong(0)).toSet
    val got = kept(900L)
    // Naive reference: one window per domain over the same global order.
    val seg = graft.functions.sig.md5BucketCol(concat(lit("t|"), col("id").cast("string")), 256L)
    val want = df.withColumn("__s", seg)
      .withColumn("__c", sum(col("nt")).over(
        Window.partitionBy("dom").orderBy(col("__s"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__c") <= 900L)
      .collect().map(_.getLong(0)).toSet
    assert(got == want, s"decomposed ≡ naive: miss=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // Per-domain token totals respect the budget.
    val sums = graft.operators.SampleOps
      .tokenBudgetCap(df, "dom", col("id"), "nt", 900L, salt = "t|")
      .groupBy("dom").agg(sum("nt").as("t")).collect().map(_.getLong(1))
    assert(sums.nonEmpty && sums.forall(_ <= 900L), s"budget violated: ${sums.toSeq}")
    // Prefix truncation nests: a smaller budget keeps a subset.
    assert(kept(300L).subsetOf(got))
    // Null domain is a real domain (null-safe join): its rows survive.
    val withNull = df.unionByName(Seq((9001L, null.asInstanceOf[String], 5L))
      .toDF("id", "dom", "nt"))
    assert(graft.operators.SampleOps
      .tokenBudgetCap(withNull, "dom", col("id"), "nt", 900L, salt = "t|")
      .filter(col("dom").isNull).count() == 1)
  }

  test("weightedSample: exact sizes, determinism, weight bias, non-positive exclusion") {
    import spark.implicits._
    val df = (1 to 4000).map(i =>
      (i.toLong, if (i % 4 == 0) "tail" else "head", (i % 7 + 1).toDouble)).toDF("id", "s", "w")
    val ws = graft.operators.SampleOps.weightedSample(df, "s", col("id"), col("w"), 25, "x")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ws.count(_._2 == "head") == 25 && ws.count(_._2 == "tail") == 25,
      "exactly k per group when groups exceed k")
    // pure function of (key, weight, salt): shuffled input draws the same set
    val ws2 = graft.operators.SampleOps.weightedSample(
        df.orderBy(rand(7)), "s", col("id"), col("w"), 25, "x")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ws2.toSet == ws.toSet)
    // zero/negative weights can never be drawn
    val wz = df.withColumn("w", when($"id" <= 2000, lit(0.0) - 1.0).otherwise($"w"))
    val drawn = graft.operators.SampleOps.weightedSample(wz, "s", col("id"), col("w"), 25, "x")
      .collect().map(_.getLong(0))
    assert(drawn.forall(_ > 2000L))
    // ES distribution smoke: two items, w=9 vs w=1, k=1 per draw — the
    // heavy item must win ~90% of draws. 400 independent draws ride ONE
    // job: each draw is a group, and the draw id folded into the key
    // gives each group an independent digest.
    val draws = (1 to 400).flatMap(i => Seq((s"d$i", "a", 9.0), (s"d$i", "b", 1.0)))
      .toDF("draw", "id", "w")
    val winners = graft.operators.SampleOps.weightedSample(
        draws, "draw", concat(col("draw"), lit("|"), col("id")), col("w"), 1, "es|")
      .collect().map(_.getString(1))
    val rate = winners.count(_ == "a") / 400.0
    assert(rate > 0.8 && rate < 0.975, s"P(heavy wins) = $rate, expected ~0.9")
  }

  test("assignSplit: disjoint-exhaustive labels, growth-stable, sane proportions") {
    import spark.implicits._
    val df = (1 to 5000).map(_.toLong).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = df.select(col("id"),
      graft.operators.SampleOps.assignSplit(col("id"), splits, "s").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labeled.size == 5000, "every row gets exactly one label")
    val counts = labeled.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.03 &&
      math.abs(counts("val") / 5000.0 - 0.1) < 0.02 &&
      math.abs(counts("test") / 5000.0 - 0.1) < 0.02, s"proportions: $counts")
    // growth stability: labels of a prefix are unchanged inside a larger corpus
    val prefix = df.filter($"id" <= 2000).select(col("id"),
      graft.operators.SampleOps.assignSplit(col("id"), splits, "s").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(prefix.forall { case (k, v) => labeled(k) == v })
    intercept[IllegalArgumentException] {
      graft.operators.SampleOps.assignSplit(col("id"), Seq("a" -> 0.7, "b" -> 0.4))
    }
    // under-allocation is as wrong as over-allocation: Seq("sample" -> 0.1)
    // would label 100% of rows "sample" (the last split absorbs the tail)
    intercept[IllegalArgumentException] {
      graft.operators.SampleOps.assignSplit(col("id"), Seq("sample" -> 0.1))
    }
  }

  test("cdcChunkDups finds a shared paragraph at different byte offsets") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val shared = rnd.alphanumeric.take(400).mkString
    val docs = Seq(
      (1L, "unique-lead-in of doc one. " + shared),
      (2L, "a totally different and much longer preamble here! " + shared),
      (3L, rnd.alphanumeric.take(300).mkString) // no overlap
    ).toDF("doc_id", "text")
    val got = graft.operators.DedupOps.cdcChunkDups(docs, "doc_id", "text").collect()
    assert(got.nonEmpty, "no shared chunks found despite identical 400-char suffix")
    val pairs = got.map(_.getString(2)) // "doc:pos,doc:pos"
    assert(pairs.forall(s => s.contains("1:") && s.contains("2:") && !s.contains("3:")))
  }

  test("orderedSeqId == global row_number, with no single-partition exchange") {
    import spark.implicits._
    val df = scala.util.Random.shuffle((1 to 500).toList).toDF("k").repartition(7)
    val got = graft.functions.ids.orderedSeqId(df, "k")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == (1 to 500).map(k => k -> k.toLong).toMap)
    // no per-row window at all: numbering is monotonically_increasing_id
    // decomposition + a broadcast offsets join; the only windowed/global
    // step is the cumsum over per-partition COUNTS (metadata-sized)
    val plan = graft.functions.ids.orderedSeqId(df, "k").queryExecution.executedPlan.toString
    assert(!plan.contains("Window [row_number"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("salted join == plain join on a skewed key (multiplicities preserved)") {
    import spark.implicits._
    // 'hot' carries 200 of 203 fact rows; dim has duplicate keys too so
    // join multiplicities (not just membership) must survive salting.
    val fact = ((1 to 200).map(i => ("hot", i)) ++ Seq(("a", 1), ("a", 2), ("b", 3)))
      .toDF("k", "v")
    val dim = Seq(("hot", "H1"), ("hot", "H2"), ("a", "A"), ("c", "C")).toDF("dk", "name")
    val salted = graft.operators.SkewOps.saltedJoin(fact, dim, "k", "dk", col("v"), salts = 4)
      .select("k", "v", "name").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val plain = fact.join(dim, $"k" === $"dk")
      .select("k", "v", "name").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(salted.sorted.toSeq == plain.sorted.toSeq)
    assert(salted.length == 402) // hot: 200*2, a: 2*1, b/c unmatched
  }

  test("adaptive salted join: sketch-detected hot set, equals plain join") {
    import spark.implicits._
    // 'hot' is 200/223 of the fact (~90%); the 20 cold keys are ~0.45%
    // each — at hotFrac=0.5 the MG bound makes the split deterministic.
    val fact = ((1 to 200).map(i => ("hot", i)) ++ (1 to 20).map(i => (s"c$i", i))
      ++ Seq(("a", 1), ("a", 2), ("b", 3))).toDF("k", "v")
    val hot = graft.operators.SkewOps.hotKeys(fact, "k", hotFrac = 0.5)
    assert(hot == Seq("hot"), s"exactly the hot key must flag: $hot")
    val dim = (Seq(("hot", "H1"), ("hot", "H2"), ("a", "A"), ("c", "C"))
      ++ (1 to 20).map(i => (s"c$i", s"C$i"))).toDF("dk", "name")
    val adaptive = graft.operators.SkewOps.adaptiveSaltedJoin(
        fact, dim, "k", "dk", col("v"), salts = 4, hotFrac = 0.5)
      .select("k", "v", "name").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val plain = fact.join(dim, $"k" === $"dk")
      .select("k", "v", "name").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(adaptive.sorted.toSeq == plain.sorted.toSeq)
    assert(adaptive.count(_._1 == "hot") == 400 && adaptive.count(_._1 != "hot") == 22,
      "both arms contributed rows")
    // no detected hot keys → the plain-join fast path, still equal
    val coldOnly = fact.filter($"k" =!= "hot")
    val fastPath = graft.operators.SkewOps.adaptiveSaltedJoin(
        coldOnly, dim, "k", "dk", col("v"), salts = 4, hotFrac = 0.5)
      .select("k", "v", "name").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val plainCold = coldOnly.join(dim, $"k" === $"dk")
      .select("k", "v", "name").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(fastPath.sorted.toSeq == plainCold.sorted.toSeq)
  }

  test("salted distinct-set == collect_set per key") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("hot", i % 7)) ++ Seq(("cold", 42))).toDF("k", "v")
    val salted = graft.operators.SkewOps.saltedDistinctSet(df, "k", "v", salts = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    assert(salted("hot") == (0 until 7).toList && salted("cold") == List(42))
  }

  test("popularity: ordered, limited, deterministic ties") {
    import spark.implicits._
    val df = Seq("a", "a", "b", "b", "c").map(Tuple1(_)).toDF("item")
    val got = Recommend.popularity(df, "item", 2).collect().map(_.getString(0))
    assert(got.toSeq == Seq("a", "b"))
  }

  test("ClusterRefine.refine: empty input refines to an empty frame, not an MLlib failure") {
    import spark.implicits._
    val empty = Seq.empty[(String, Seq[Double])].toDF("link", "embedding")
    val got = graft.operators.ClusterRefine.refine(empty, "link", "embedding")
    assert(got.columns.toSeq == Seq("link", "cluster"))
    assert(got.count() == 0)
  }
}
