package graft



/** Repeat-timing main: runs each named query 3×, separating one-time
  * cost (codegen/JIT/scan-footer) from steady-state per-query cost —
  * the local feedback loop for Bench work.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries
    val spark = Sessions.local(cpus.toInt)
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $n%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
