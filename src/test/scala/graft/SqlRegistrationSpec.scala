package graft

import graft.functions.vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom expressions are reachable from SQL after registration. */
class SqlRegistrationSpec extends AnyFunSuite with SparkSpec {

  test("cosine_sim / l2_dist / l2_normalize usable in spark.sql") {
    vector.register(spark)
    import spark.implicits._
    Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 1.0), Seq(1.0, 1.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val rows = spark.sql(
      """SELECT round(cosine_sim(a, b), 6) c, round(l2_dist(a, b), 6) d,
        |       l2_normalize(a) n, round(dot_product(a, b), 6) p
        |FROM vecs""".stripMargin).collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).getDouble(0) == 1.0)
    assert(math.abs(rows(0).getDouble(1) - math.sqrt(2)) < 1e-6)
    assert(rows(1).getSeq[Double](2).map(x => math.abs(x - 1 / math.sqrt(2)) < 1e-12).forall(identity))
    assert(rows(1).getDouble(3) == 2.0)
  }

  test("GraftExtensions injects functions via withExtensions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // same metastore-less JVM: the extension registers into this session
    val r = s2.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) c").collect()
    assert(r(0).getDouble(0) == 1.0)
  }

  test("sig.register exposes nfc_normalize and deflate_size to SQL") {
    graft.functions.sig.register(spark)
    // decomposed e + U+0301 composes to U+00E9
    val t = spark.sql(
      "SELECT nfc_normalize('é') n, deflate_size('abcabcabc') z").collect()
    assert(t(0).getString(0) == "é")
    assert(t(0).getInt(1) > 0)
  }

  test("sig.register exposes the text-hash kernels to SQL") {
    graft.functions.sig.register(spark)
    val s2 = spark
    val r = s2.sql(
      """SELECT simhash64('alpha beta gamma') sh,
        |       minhash_signature('alpha beta gamma delta', 3, 4) mh,
        |       cosine_sketch(array(1.0D, -0.5D), 8) sk,
        |       cdc_boundaries('abcdefghij', 8, 31) cb,
        |       md5_bucket('probe', 1000000) mb,
        |       hash_embedding('spark join hash', 16) he,
        |       text_stats('the quick fox').n_tokens nt""".stripMargin).collect()
    // values are pinned elsewhere (KernelEquivalenceSpec + oracle); here
    // we only need SQL reachability and sane shapes.
    assert(r(0).getAs[Long]("sh") != 0L)
    assert(r(0).getAs[scala.collection.Seq[String]]("mh").length == 4)
    assert(r(0).getAs[scala.collection.Seq[Int]]("cb").last == 10)
    assert(r(0).getAs[Long]("mb") >= 0L && r(0).getAs[Long]("mb") < 1000000L)
    val he = r(0).getAs[scala.collection.Seq[Double]]("he")
    assert(he.length == 16 && math.abs(he.map(x => x * x).sum - 1.0) < 1e-9)
    assert(r(0).getAs[Int]("nt") == 3)
    // shape params must be literals, loudly
    val e = intercept[Exception] {
      s2.sql("SELECT cosine_sketch(array(1.0D), CAST(rand() * 8 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("typed Dataset round-trip for the entity model") {
    import graft.core._
    import java.sql.Timestamp
    val spark0 = spark
    import spark0.implicits._
    val s = Story("s1", Seq("l1"), Seq(0.1f), Seq("e"), Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-02 00:00:00"), None, None)
    val ds = spark.createDataset(Seq(s))(Schema.storyEnc)
    assert(ds.filter(col("storyId") === "s1").as[Story](Schema.storyEnc).head() == s)
  }
}
