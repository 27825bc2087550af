package graft



/** Plan-review main: prints formatted physical plans of selected
  * queries so scan pushdown / broadcast / codegen spans can be
  * inspected (the "explain and iterate" loop).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries
    val spark = Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_WARM=1: materialize the ingest artifacts
    // first, so plans show what the WARM bench actually executes
    // (InMemoryTableScan of the prebuilt indexes) instead of the
    // ingest-time build subtrees.
    if (sys.env.get("SPARK_GRAFT_EXPLAIN_WARM").contains("1"))
      SparkEntry.prepareArtifacts(spark, sfDir)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
