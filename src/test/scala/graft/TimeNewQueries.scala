package graft

/** Ad-hoc wall-clock probe for gate queries outside the bench set —
  * run with `sbt "Test/runMain graft.TimeNewQueries [sfDir]"`. Caught
  * q87's exponential expression tree (30 s for 11 rows) in round 7. */
object TimeNewQueries {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (q <- Seq("q85_tag_merge", "q86_doc_category", "q87_entity_quality",
        "q88_hybrid_graph", "q89_incremental_bm25", "q90_llm_response",
        "q91_md_sections", "q92_status_events")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"$q%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
  }
}
