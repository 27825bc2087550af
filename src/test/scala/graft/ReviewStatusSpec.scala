package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ReviewStatus, StateMachine}

/** Review-status report (documents_review.py:154-200): gates derived
  * from the state machine's transition map, counts, review_info. */
class ReviewStatusSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("gates derive from StateMachine.allowed = the reference's sets") {
    // the reference hard-codes these (documents_review.py:181-184);
    // deriving them from the transition map must land on the same sets
    assert(ReviewStatus.ApproveFrom === Set("pending_review"))
    assert(ReviewStatus.RejectFrom === Set("pending_review"))
    assert(ReviewStatus.ReprocessFrom === Set("rejected", "failed"))
  }

  private def docsOf(rows: (String, String)*) =
    rows.toSeq.toDF("document_id", "status")
      .withColumn("reviewed_at", lit(null).cast("string"))
      .withColumn("review_action", lit(null).cast("string"))
      .withColumn("metadata", map().cast("map<string,string>"))

  test("every state maps to its gate triple") {
    val docs = docsOf(StateMachine.states.map(s => (s"d-$s", s)): _*)
    val empty = Seq.empty[String].toDF("document_id")
    val noEnts = Seq.empty[(String, Boolean)].toDF("document_id", "is_verified")
    val got = ReviewStatus.statusReport(docs, empty, noEnts)
      .select("status", "can_approve", "can_reject", "can_reprocess")
      .as[(String, Boolean, Boolean, Boolean)].collect()
      .map { case (s, a, r, p) => s -> ((a, r, p)) }.toMap
    val exp = Map(
      "discovered" -> (false, false, false),
      "processing" -> (false, false, false),
      "pending_review" -> (true, true, false),
      "approved" -> (false, false, false),
      "published" -> (false, false, false),
      "rejected" -> (false, false, true),
      "failed" -> (false, false, true))
    assert(got === exp)
  }

  test("counts: absent docs zero; null is_verified counts unverified") {
    val docs = docsOf("d1" -> "pending_review", "d2" -> "approved")
    val chunks = Seq("d1", "d1", "d1").toDF("document_id")
    val entities = Seq(
      ("d1", Some(true)), ("d1", Some(false)), ("d1", None), ("d1", Some(true)))
      .toDF("document_id", "is_verified")
    val got = ReviewStatus.statusReport(docs, chunks, entities)
      .select("document_id", "chunks_count", "entities_total",
        "entities_verified", "entities_unverified")
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (d, c, t, v, u) => d -> ((c, t, v, u)) }.toMap
    assert(got("d1") === ((3L, 4L, 2L, 2L)))
    assert(got("d2") === ((0L, 0L, 0L, 0L)))
  }

  test("review_info fields: rejection_reason reads the metadata key") {
    val docs = Seq(("d1", "rejected", "T9", "rejected",
        Map("rejection_reason" -> "too short", "x" -> "1")),
      ("d2", "approved", "T3", "approved", Map.empty[String, String]))
      .toDF("document_id", "status", "reviewed_at", "review_action",
        "metadata")
    val empty = Seq.empty[String].toDF("document_id")
    val noEnts = Seq.empty[(String, Boolean)].toDF("document_id", "is_verified")
    val got = ReviewStatus.statusReport(docs, empty, noEnts)
      .select("document_id", "reviewed_at", "review_action",
        "rejection_reason")
      .as[(String, String, String, Option[String])].collect()
      .map { case (d, at, act, rr) => d -> ((at, act, rr)) }.toMap
    assert(got("d1") === (("T9", "rejected", Some("too short"))))
    assert(got("d2") === (("T3", "approved", None)))
  }
}
