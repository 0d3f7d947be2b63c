package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure policy: one broken query must not kill the dump (the other
  * results still matter), but it must never be SILENT either — a missing
  * output directory reads as "query not present" downstream, which lets a
  * shrunken set masquerade as all-green. Every per-query failure writes a
  * visible `$outDir/$name/_ERROR` marker with the message, the run prints
  * a final `failed: [...]` summary, and the process exits nonzero. */
object Verify {

  /** Run each query, writing `$outDir/$name` parquet or an `_ERROR`
    * marker. Returns the names that failed (deterministic order). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      selected: Map[String, (SparkSession, String) => DataFrame]): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val failed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    // Queries are independent — run a few concurrently so cluster slots
    // stay busy while any one query sits in its sequential stages (the
    // Spark scheduler interleaves the jobs; results are per-query dirs).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val tasks = selected.toSeq.map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            failed.add(name)
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
            val dir = Paths.get(s"$outDir/$name")
            Files.createDirectories(dir)
            Files.writeString(dir.resolve("_ERROR"),
              s"$name failed: ${Option(e.getMessage).getOrElse(e.getClass.getName)}\n")
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    failed.toArray(Array.empty[String]).toSeq.sorted
  }

  def main(args: Array[String]): Unit = {
    // Optional third arg: comma-separated query names — a local iteration
    // aid (the driver always runs the full set with two args).
    val (sfDir, outDir, only) = args match {
      case Array(s, o)        => (s, o, None)
      case Array(s, o, names) => (s, o, Some(names))
      case _ =>
        System.err.println("usage: graft.Verify <sfDir> <outDir> [query1,query2,...]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = only.fold(SparkEntry.queries)(SparkEntry.selectQueries)
    val failed = run(spark, sfDir, outDir, selected)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Dump oracles only for the queries actually run: a filtered local
    // run must not advertise results it never produced.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[verify] failed: ${failed.mkString("[", ", ", "]")}")
      sys.exit(1)
    }
  }
}
