package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DocumentCuration, Publish, ReviewStatus,
  StateMachine}
import graft.sinks.ParquetConnector

/** End-to-end review-workflow integration: one fixture corpus driven
  * through the full reference trip — process admission
  * (documents.py:1009-1077) → pipeline completion → approve/reject
  * (documents_review.py:19-145) → publish (document_tasks.py:1587-1737)
  * → review-status report (documents_review.py:154-200) — asserting
  * the final document/chunk/point/audit census after the whole chain.
  * Every component is individually gated (q128, q64, q111, PublishSpec);
  * this spec pins their COMPOSITION: the statuses each stage hands the
  * next, the metadata stamps the reject endpoint layers onto what
  * admission left behind, and the store contents after publish.
  */
class ReviewWorkflowSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("full trip: admit → pending_review → approve/reject → publish → report") {
    // -- corpus: two fresh docs, one mid-processing, one already waiting
    var docs = Seq(
      ("dA", "discovered", Map("src" -> "notion")),
      ("dB", "discovered", Map.empty[String, String]),
      ("dC", "processing", Map.empty[String, String]),
      ("dD", "pending_review", Map.empty[String, String]))
      .toDF("document_id", "status", "metadata")
      .withColumn("approved_at", lit(null).cast("string"))
      .withColumn("reviewed_at", lit(null).cast("string"))
      .withColumn("review_action", lit(null).cast("string"))
    val chunks = Seq(
      ("a1", "dA", "alpha one", Some(Seq(1.0f, 0.0f))),
      ("a2", "dA", "alpha two", None), // missing vector: publish backfills
      ("a3", "dA", "alpha three", Some(Seq(0.0f, 1.0f))),
      ("b1", "dB", "beta one", Some(Seq(1.0f, 1.0f))),
      ("b2", "dB", "beta two", Some(Seq(0.5f, 0.5f))),
      ("d1", "dD", "delta one", Some(Seq(0.0f, 0.0f))))
      .toDF("chunk_id", "document_id", "chunk_text", "embedding")
    val mentions = Seq(
      ("dA", Some(true)), ("dA", None), ("dB", Some(false)))
      .toDF("document_id", "is_verified")
    val rels = Seq(("dA", "r1")).toDF("document_id", "rel_id")

    // -- 1. admission: dA/dB admit, dC is mid-processing (busy even
    //       under force), dX is the 404
    val admission = DocumentCuration.processAdmission(
      docs.select(col("document_id"), col("status")), chunks, mentions,
      rels,
      Seq(("dA", false), ("dB", false), ("dC", true), ("dX", false))
        .toDF("document_id", "force_reprocess"))
      .select("document_id", "arm", "new_status")
      .as[(String, String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(admission("dA") === (("queued", Some("processing"))))
    assert(admission("dB") === (("queued", Some("processing"))))
    assert(admission("dC") === (("busy", Some("processing"))))
    assert(admission("dX") === (("not_found", None)))
    docs = docs.withColumn("status",
      when(col("document_id").isin("dA", "dB"), lit("processing"))
        .otherwise(col("status")))

    // -- 2. the pipeline finishes: processing → pending_review
    val done = StateMachine.applyTransitions(
      docs.select(col("document_id").as("id"), col("status")),
      Seq(("dA", "pending_review"), ("dB", "pending_review"))
        .toDF("id", "to_status"))
    docs = docs.drop("status").join(
      done.updated.withColumnRenamed("id", "document_id"),
      Seq("document_id"))

    // -- 3. review: approve dA, reject dB; the stray approve of the
    //       still-processing dC is the endpoint's 400
    val review = StateMachine.applyTransitions(
      docs.select(col("document_id").as("id"), col("status")),
      Seq(("dA", "approved"), ("dB", "rejected"), ("dC", "approved"))
        .toDF("id", "to_status"))
    val refused = review.rejectedRequests
      .select("id", "from_status", "to_status", "reason")
      .as[(String, String, String, String)].collect().toSeq
    assert(refused ===
      Seq(("dC", "processing", "approved", "transition not allowed")))
    docs = docs.drop("status").join(
      review.updated.withColumnRenamed("id", "document_id"),
      Seq("document_id"))
    // the endpoints' write-backs: approve stamps approved_at only;
    // reject stamps reviewed_at and layers rejection metadata over
    // whatever the document already carried (documents_review.py:116-128)
    docs = docs
      .withColumn("approved_at",
        when(col("document_id") === "dA", lit("TA"))
          .otherwise(col("approved_at")))
      .withColumn("reviewed_at",
        when(col("document_id") === "dB", lit("TR"))
          .otherwise(col("reviewed_at")))
      .withColumn("metadata",
        when(col("document_id") === "dB", map_concat(col("metadata"),
          map(lit("rejection_reason"), lit("too short"),
            lit("rejected_at"), lit("TR"))))
          .otherwise(col("metadata")))

    // -- 4. publish the approved document's chunks to the vector store
    val target = java.nio.file.Files
      .createTempDirectory("review-trip").toString + "/points"
    CountingEmbedder.calls.set(0)
    val result = Publish.publishApproved(spark,
      chunks.where(col("document_id") === "dA"),
      "chunk_id", "chunk_text", "embedding",
      () => CountingEmbedder(2),
      vectorStore = Some((ParquetConnector, target)),
      graphEntities = None, graphRelationships = None)
    assert(result ===
      Publish.PublishResult("published", 3L, 0L, 0L, 1L, 1L, None))
    assert(CountingEmbedder.calls.get() === 1) // only a2 embedded
    val points = ParquetConnector.read(spark, target).get
    assert(points.count() === 3)
    assert(points.where(col("embedding").isNull).count() === 0)

    // -- 5. the reviewer's report over the final state
    val report = ReviewStatus.statusReport(docs, chunks, mentions)
      .select("document_id", "status", "can_approve", "can_reject",
        "can_reprocess", "chunks_count", "entities_total",
        "entities_verified", "reviewed_at", "rejection_reason")
      .as[(String, String, Boolean, Boolean, Boolean, Long, Long, Long,
        Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(report("dA") === (("dA", "approved", false, false, false,
      3L, 2L, 1L, None, None)))
    assert(report("dB") === (("dB", "rejected", false, false, true,
      2L, 1L, 0L, Some("TR"), Some("too short"))))
    assert(report("dC") === (("dC", "processing", false, false, false,
      0L, 0L, 0L, None, None)))
    assert(report("dD") === (("dD", "pending_review", true, true, false,
      1L, 0L, 0L, None, None)))

    // -- 6. the audit trail holds exactly the four applied transitions
    val audit = done.auditLog.unionByName(review.auditLog)
      .select("id", "from_status", "to_status")
      .as[(String, String, String)].collect().toSeq.sorted
    assert(audit === Seq(
      ("dA", "pending_review", "approved"),
      ("dA", "processing", "pending_review"),
      ("dB", "pending_review", "rejected"),
      ("dB", "processing", "pending_review")))
  }
}
