package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards for round 14's two distributed frames (the rest
  * of the round's gates are per-row maps over the documents scan —
  * no shuffle to lock). */
class R14PlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q161 indexing status: ONE equi-join keyed on source_key, " +
    "no window, no global exchange") {
    val plan = planOf("q161_indexing_status")
    // small side broadcasts at this SF; at scale AQE picks the side —
    // the lock is on the JOIN SHAPE, not the strategy
    assert(plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q160 evaluate-dump: exactly one prefix-keyed window exchange") {
    val plan = planOf("q160_evaluate_dump")
    // the collision-id window partitions by the encoded prefix; the
    // yaml/prefix derivation itself is a per-row map
    assert(plan.contains("Window"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("the row-tier gates stay narrow: no exchange at all") {
    for (q <- Seq("q158_provider_requests",
      "q163_gemini_engine", "q164_openai_engine", "q165_tracking_setup",
      "q166_table_setup", "q167_setup_metadata", "q168_target_ids",
      "q169_value_decode")) {
      val plan = planOf(q)
      assert(!plan.contains("Exchange"), s"$q should be narrow:\n$plan")
      assert(!plan.contains("Join"), s"$q should be join-free:\n$plan")
    }
  }

  test("q159 duration gate: the 53-case table BROADCASTS onto the " +
    "scan — no shuffle") {
    val plan = planOf("q159_duration_parse")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q162 schema build: a flatMap over the scan, nothing wider") {
    val plan = planOf("q162_schema_build")
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
