// Dump .explain("formatted") for named queries - evidence artifacts for
// optimization rounds. Run via spark-shell against compiled classes:
//   PLAN_QUERIES=x_a,x_b PLAN_OUT_DIR=plans/r20 PLAN_SUFFIX=_before.txt \
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/plan_dump.scala
val names = sys.env("PLAN_QUERIES").split(",").map(_.trim).filter(_.nonEmpty)
val outDir = sys.env.getOrElse("PLAN_OUT_DIR", "plans/r20")
val suffix = sys.env.getOrElse("PLAN_SUFFIX", "_before.txt")
val sf = sys.env.getOrElse("PLAN_SF", "/root/testdata/sf0.1")
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
names.foreach { n =>
  try {
    val df = graft.SparkEntry.queries(n)(spark, sf)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/$n$suffix"), txt)
    println(s"[plan] wrote $outDir/$n$suffix (${txt.length} chars)")
  } catch { case e: Throwable =>
    println(s"[plan] $n FAILED: $e")
  }
}
sys.exit(0)
