package graft

import graft.pipelines.NewsPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class PipelineSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def articleFixtures = {
    import spark.implicits._
    Seq(
      ("l1", "alpha", "the quick brown fox jumps over the lazy dog", ts("2024-01-01 10:00:00")),
      ("l2", "alpha", "the quick brown fox jumps over the lazy cat", ts("2024-01-01 11:00:00")),
      ("l1", "alpha", "duplicate link later arrival", ts("2024-01-01 12:00:00")), // D1 dup
      ("l3", "beta", "completely different topic about spark engines", ts("2024-01-01 13:00:00")),
      (null, "x", "no link row must be dropped", ts("2024-01-01 14:00:00")),     // P2
      ("l4", "y", "   ", ts("2024-01-01 15:00:00")),                             // P3 empty text
    ).toDF("link", "title", "txt", "ingestion_time")
  }

  test("ingestAndCluster: filters, dedup, featurize, story build") {
    val (articles, stories) = NewsPipeline.ingestAndCluster(
      articleFixtures, spark.emptyDataFrame)
    val a = articles.collect()
    assert(a.length == 3, "null-link, empty-text and duplicate-link rows dropped")
    // embeddings unit-norm
    val norms = articles.select(
      sqrt(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x * x))).collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
    val s = stories.collect()
    assert(s.length == 3, "every article opens its own story on a cold start")
    assert(stories.columns.toSet == Set("story_id", "centroid", "entities", "members", "n_members"))
  }

  test("hybridRecommend: set-oriented end-to-end, top-N respected, scores normalized") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val users = (1 to 8).map(i => s"u$i")
    val storyIds = (1 to 12).map(i => s"st$i")
    val interactions = (for { u <- users; _ <- 1 to 12 } yield {
      val st = storyIds(rnd.nextInt(storyIds.length))
      val ev = Seq("like", "share", "click", "read")(rnd.nextInt(4))
      (u, st, ev, ts("2024-01-15 10:00:00"))
    }).toDF("user_id", "story_id", "event_type", "event_time")
    val stories = storyIds.map { st =>
      (st, Seq.fill(8)(rnd.nextDouble() * 2 - 1), ts("2024-01-20 00:00:00"))
    }.toDF("story_id", "centroid", "last_updated")
    val recs = NewsPipeline.hybridRecommend(interactions, stories,
      lit("2024-01-21 00:00:00").cast("timestamp"), topN = 5, candK = 10)
    val byUser = recs.collect().groupBy(_.getString(0))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rows) =>
      assert(rows.length <= 5, s"user $u got ${rows.length} > topN recs")
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to rows.length), s"ranks must be dense for $u")
      // P12 is x/(max−min) per the reference formula — not clamped to [0,1];
      // the contract is score monotone-decreasing in rank.
      val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"scores must be non-increasing in rank for $u")
    }
  }

  test("hybridRecommend: a user id colliding with a story id keeps that story") {
    import spark.implicits._
    // User id "42" collides with story id "42" — different id domains, so
    // the content-kNN arm must NOT self-exclude the pair (the regression
    // was excludeSelf=true filtering query_id =!= neighbor_id across
    // domains and silently dropping story "42" from user "42").
    val interactions = Seq(
      ("42", "seed", "like", ts("2024-01-15 10:00:00")))
      .toDF("user_id", "story_id", "event_type", "event_time")
    val stories = Seq(
      ("seed", Seq(1.0, 0.0), ts("2024-01-20 00:00:00")),
      ("42", Seq(0.99, 0.1), ts("2024-01-20 00:00:00")), // nearest to the profile
      ("far", Seq(0.0, 1.0), ts("2024-01-20 00:00:00")))
      .toDF("story_id", "centroid", "last_updated")
    val recs = NewsPipeline.hybridRecommend(interactions, stories,
      lit("2024-01-21 00:00:00").cast("timestamp"), topN = 3, candK = 3)
    val mine = recs.filter(col("user_id") === "42").collect().map(_.getString(1)).toSet
    assert(mine.contains("42"),
      "story '42' must stay in the candidates of user '42' despite the id-value collision")
  }

  test("recommendAll: warm users get hybrid recs, cold users get popularity") {
    import spark.implicits._
    val interactions = Seq(
      ("w1", "s1", "like", ts("2024-01-15 10:00:00")),
      ("w1", "s2", "click", ts("2024-01-15 10:00:00")),
      ("w2", "s2", "like", ts("2024-01-15 10:00:00")),
      ("w2", "s1", "share", ts("2024-01-15 10:00:00")))
      .toDF("user_id", "story_id", "event_type", "event_time")
    val stories = Seq(
      ("s1", Seq(1.0, 0.0), ts("2024-01-20 00:00:00")),
      ("s2", Seq(0.9, 0.1), ts("2024-01-20 00:00:00")),
      ("s3", Seq(0.0, 1.0), ts("2024-01-20 00:00:00")))
      .toDF("story_id", "centroid", "last_updated")
    val allUsers = Seq("w1", "w2", "cold1").toDF("user_id")
    val got = graft.pipelines.NewsPipeline.recommendAll(
        interactions, stories, allUsers, lit("2024-01-21 00:00:00").cast("timestamp"),
        topN = 2, candK = 5)
      .collect().groupBy(_.getString(0))
    assert(got.keySet == Set("w1", "w2", "cold1"))
    assert(got("cold1").forall(_.getAs[String]("src") == "popularity"))
    assert(got("w1").forall(_.getAs[String]("src") == "hybrid"))
    assert(got("cold1").map(_.getString(1)).toSet.subsetOf(Set("s1", "s2")),
      "fallback serves the globally popular stories")
  }

  test("recommendAll → persisted recs table → stored serving lookup, end to end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("servee2e").toString
    val interactions = Seq(
      ("w1", "s1", "like", ts("2024-01-15 10:00:00")),
      ("w1", "s2", "click", ts("2024-01-15 10:00:00")),
      ("w2", "s2", "like", ts("2024-01-15 10:00:00")),
      ("w2", "s1", "share", ts("2024-01-15 10:00:00")))
      .toDF("user_id", "story_id", "event_type", "event_time")
    val stories = Seq(
      ("s1", Seq(1.0, 0.0), ts("2024-01-20 00:00:00")),
      ("s2", Seq(0.9, 0.1), ts("2024-01-20 00:00:00")),
      ("s3", Seq(0.0, 1.0), ts("2024-01-20 00:00:00")))
      .toDF("story_id", "centroid", "last_updated")
    val allUsers = Seq("w1", "w2", "cold1").toDF("user_id")
    val recs = graft.pipelines.NewsPipeline.recommendAll(
      interactions, stories, allUsers, lit("2024-01-21 00:00:00").cast("timestamp"),
      topN = 2, candK = 5)
    // §3.2 batch output lands in the canonical user-laid-out table; the
    // §3.3 read path serves from it bucket-pruned — the complete
    // train→store→serve loop of the reference, storage included.
    graft.serve.Serve.writeRecommendations(spark, dir,
      recs.select("user_id", "story_id", "score"), version = 1L)
    val serveStories = stories.select(col("story_id"),
      lit("sum").as("summary"), col("last_updated"))
    def served(u: String) = graft.serve.Serve
      .recommendationsForStored(spark, dir, serveStories, u)
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]))).toSeq
    val inMemory = recs.collect().groupBy(_.getString(0))
    // warm user: the stored path serves exactly the pipeline's rows for
    // that user, score-ordered
    val w1 = served("w1")
    assert(w1.map(_._1).toSet ==
      inMemory("w1").map(_.getString(1)).toSet && w1.nonEmpty,
      s"stored serving must return the pipeline's recs: $w1")
    assert(w1 == w1.sortBy { case (id, s) => (-s.get, id) }, s"score-ordered: $w1")
    // a re-run of the batch (same version) converges, not duplicates
    graft.serve.Serve.writeRecommendations(spark, dir,
      recs.select("user_id", "story_id", "score"), version = 1L)
    assert(served("w1") == w1, "idempotent batch re-publish (ST2)")
    // unknown user falls back to latest stories
    assert(served("nobody").map(_._1).nonEmpty)
  }

  test("popularityFallback: every cold user gets the same global top-N") {
    import spark.implicits._
    val interactions = Seq(
      ("u1", "s1"), ("u1", "s1"), ("u2", "s1"), ("u2", "s2"), ("u3", "s2"), ("u1", "s3"))
      .toDF("user_id", "story_id")
    val cold = Seq("c1", "c2").toDF("user_id")
    val got = NewsPipeline.popularityFallback(interactions, cold, 2).collect()
    assert(got.length == 4) // 2 users × top-2
    assert(got.map(_.getString(1)).toSet == Set("s1", "s2"))
  }

  test("refreshStories: matched clusters keep their old story id, new clusters mint ids") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def near(base: Array[Double]) = base.map(_ + rnd.nextGaussian() * 0.01).toSeq
    val c1 = Array(1.0, 0.0, 0.0, 0.0); val c2 = Array(0.0, 1.0, 0.0, 0.0)
    val articles = (
      (1 to 6).map(i => (s"a$i", near(c1))) ++ (1 to 6).map(i => (s"b$i", near(c2)))
    ).toDF("link", "embedding")
    // old story "keep-me" holds most of cluster-1's members
    val oldStories = Seq(("keep-me", (1 to 5).map(i => s"a$i"))).toDF("story_id", "members")
    val (assignment, stories) = graft.pipelines.NewsPipeline.refreshStories(
      articles, oldStories, jaccardThreshold = 0.5, numClusters = 2, minClusterSize = 2)
    val byLink = assignment.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byLink("a1") == "keep-me", "overlapping cluster keeps stable story id")
    assert((1 to 6).map(i => byLink(s"a$i")).toSet.size == 1, "cluster a stays together")
    assert(byLink("b1").startsWith("story-c"), "unmatched cluster mints a fresh id")
    assert(stories.count() == 2)
  }

  test("summarize: only stale stories, member text in deterministic order") {
    import spark.implicits._
    val stories = Seq(
      ("stA", Seq("l1", "l2"), ts("2024-01-02 00:00:00"), null.asInstanceOf[Timestamp]),
      ("stB", Seq("l3"), ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")), // fresh
      ("stC", Seq("l3"), ts("2024-01-04 00:00:00"), ts("2024-01-03 00:00:00")), // stale
    ).toDF("story_id", "members", "last_updated", "last_summarized")
    val articles = Seq(("l1", "first part."), ("l2", "second part."), ("l3", "solo."))
      .toDF("link", "txt")
    val got = NewsPipeline.summarize(stories, articles).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.keySet == Set("stA", "stC"), "only never-summarized or stale stories")
    assert(got("stA").contains("first part."))
  }
}
