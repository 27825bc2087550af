package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query-name filter (local iteration;
    // the driver always passes exactly two args → full dump).
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // Queries are independent and a SparkSession schedules concurrent
    // actions safely — run a few at a time (each writes its own dir).
    // Per-query wall time is dominated by job-scheduling latency at
    // this scale, so 4-way concurrency ~3x-es the whole dump.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // Dirs THIS run actually wrote — the coverage self-check diffs
    // against this, not a raw outDir listing, so stale dirs left by a
    // previous run can't mask a query the current dump dropped.
    val written = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val futures = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          written.add(name)
        }
        catch { case e: Throwable =>
          // A missing output dir would silently drop the query from the
          // downstream DuckDB compare (how the round-10 q68 regression
          // escaped the correctness record). Write an explicit marker
          // file into the query's dir instead: DuckDB's parquet read of
          // the dir then fails, so the query surfaces as a failing
          // `err` entry rather than an omitted one.
          failed.add(name)
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          val d = new java.io.File(s"$outDir/$name")
          d.mkdirs()
          val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}"
          Files.writeString(Paths.get(s"$outDir/$name/ERROR.json"),
            "{\"error\": " + jstr(msg) + "}")
          written.add(name)
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // Coverage self-check: every declared query must have an output dir
    // (result parquet or ERROR marker) written BY THIS RUN — a gap here
    // means the dump itself lost a query, which must never pass silently.
    val expected = SparkEntry.queries.keySet
      .filter(n => only.forall(_.contains(n)))
    val emitted = written.toArray(Array.empty[String]).toSet
    val missing = expected.diff(emitted)
    if (missing.nonEmpty) {
      System.err.println(s"[verify] MISSING OUTPUT for: ${missing.toSeq.sorted.mkString(",")}")
      missing.foreach { n =>
        new java.io.File(s"$outDir/$n").mkdirs()
        Files.writeString(Paths.get(s"$outDir/$n/ERROR.json"),
          "{\"error\": \"verify emitted no output for this query\"}")
      }
    }
    if (!failed.isEmpty)
      System.err.println(s"[verify] ${failed.size} queries FAILED: " +
        failed.toArray.mkString(","))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
