package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatusEvents

/** SSE status-event contract (api/sse.py:52-165). */
class StatusEventsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("status to event-type mapping covers the five arms") {
    val got = Seq("processing", "complete", "failed", "pending_review",
      "chunking", "anything-else")
      .toDF("s")
      .select(col("s"), StatusEvents.eventType(col("s")).as("e"))
      .as[(String, String)].collect().toMap
    assert(got("processing") === "processing_started")
    assert(got("complete") === "processing_complete")
    assert(got("failed") === "processing_failed")
    assert(got("pending_review") === "review_required")
    assert(got("chunking") === "status_update")
    assert(got("anything-else") === "status_update")
  }

  test("changes: new ids emit, moved statuses emit, unchanged suppress") {
    val prev = Seq((1L, "processing"), (2L, "processing"), (4L, "complete"))
      .toDF("id", "status")
    val cur = Seq(
      (1L, "processing"), // unchanged: suppressed
      (2L, "complete"),   // moved: emits
      (3L, "failed"))     // first sighting: emits
      .toDF("id", "status")
    // id 4 vanished from cur: emits nothing (current-snapshot iteration)
    val got = StatusEvents.changes(cur, prev, "id", "status")
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "complete", 3L -> "failed"))
  }

  test("changes: null statuses behave like Python values, not SQL unknowns") {
    val prev = Seq((1L, Some("processing")), (2L, None), (3L, None))
      .toDF("id", "status")
    val cur = Seq(
      (1L, None),               // value -> null: emits (None != "processing")
      (2L, Some("processing")), // null -> value: emits
      (3L, None))               // null -> null: suppressed (None == None)
      .toDF("id", "status")
    val got = StatusEvents.changes(cur, prev, "id", "status")
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(1L -> None, 2L -> Some("processing")))
  }

  test("frame renders the data:-prefixed json envelope; nulls serialize like json.dumps") {
    val f = Seq((7L, "failed")).toDF("id", "status")
      .select(StatusEvents.frame(
        StatusEvents.eventType(col("status")),
        struct(col("id"), col("status"))).as("f"))
      .as[String].head()
    assert(f ===
      """data: {"type":"processing_failed","document":{"id":7,"status":"failed"}}""" + "\n\n")
    // a null document field stays in the payload as JSON null
    val g = Seq((8L, Option.empty[String])).toDF("id", "title")
      .select(StatusEvents.frame(lit("status_update"),
        struct(col("id"), col("title"))).as("f"))
      .as[String].head()
    assert(g ===
      """data: {"type":"status_update","document":{"id":8,"title":null}}""" + "\n\n")
  }
}
