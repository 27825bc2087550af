package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards for the round's new gate queries: the taxonomy
  * merge and section extraction must stay narrow (no join, no
  * corpus-wide exchange beyond the section groupBy's per-doc hash). */
class NewQueryPlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("q85 tag merge plans as a pure narrow projection: no exchange, no join") {
    val plan = SparkEntry.queries("q85_tag_merge")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q91 sections shuffles at most twice (doc-keyed window + agg), never globally") {
    val plan = SparkEntry.queries("q91_md_sections")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }
}
