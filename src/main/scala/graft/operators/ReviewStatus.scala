package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reviewer's main read endpoint — the per-document review-status
  * report (documents_review.py:154-200): action gates, chunk/entity
  * counts, and the review bookkeeping fields.
  *
  * The gates are DERIVED from [[StateMachine.allowed]] so the report
  * and the transition guard can never drift: `can_approve` /
  * `can_reject` hold exactly when the corresponding edge leaves the
  * current status, and `can_reprocess` when a processing re-entry
  * edge does. The reference hard-codes the same sets
  * (documents_review.py:181-184: approve/reject from
  * `pending_review`, reprocess from `rejected`/`failed`).
  *
  * Spark shape: both count sides aggregate FIRST (map-side combine on
  * document_id), then left-join onto the document frame — one shuffle
  * per side keyed on the join key, no fan-out join. The report is a
  * projection; nothing here collects.
  */
object ReviewStatus {

  private def sources(to: String): Set[String] =
    StateMachine.allowed.filter(_._2 == to).map(_._1).toSet

  /** Statuses an approve may leave from: {pending_review}. */
  val ApproveFrom: Set[String] = sources("approved")

  /** Statuses a reject may leave from: {pending_review}. */
  val RejectFrom: Set[String] = sources("rejected")

  /** Statuses a reprocess may leave from: {rejected, failed}. The
    * discovered→processing edge is initial ingestion, not a
    * reprocess, so it is excluded (the reference's explicit list,
    * documents_review.py:184). */
  val ReprocessFrom: Set[String] = sources("processing") - "discovered"

  def canApprove(status: Column): Column = status.isin(ApproveFrom.toSeq: _*)
  def canReject(status: Column): Column = status.isin(RejectFrom.toSeq: _*)
  def canReprocess(status: Column): Column =
    status.isin(ReprocessFrom.toSeq: _*)

  /** The review-status report, one row per document.
    *
    * @param documents (docId, status, reviewed_at, review_action,
    *                  metadata map — rejection_reason lives under the
    *                  metadata key, where the reject endpoint writes
    *                  it, documents_review.py:118-122)
    * @param chunks    (docId) one row per chunk
    * @param entities  (docId, is_verified) one row per entity; a NULL
    *                  is_verified counts unverified (`if
    *                  e.get("is_verified")` truthiness, :173)
    */
  def statusReport(documents: DataFrame, chunks: DataFrame,
      entities: DataFrame, docIdCol: String = "document_id"): DataFrame = {
    val chunkCounts = chunks.groupBy(col(docIdCol))
      .agg(count(lit(1)).as("chunks_count"))
    val entityCounts = entities.groupBy(col(docIdCol))
      .agg(count(lit(1)).as("entities_total"),
        sum(when(coalesce(col("is_verified"), lit(false)), 1L).otherwise(0L))
          .as("entities_verified"))
    documents
      .join(chunkCounts, Seq(docIdCol), "left")
      .join(entityCounts, Seq(docIdCol), "left")
      .select(col(docIdCol), col("status"),
        canApprove(col("status")).as("can_approve"),
        canReject(col("status")).as("can_reject"),
        canReprocess(col("status")).as("can_reprocess"),
        coalesce(col("chunks_count"), lit(0L)).as("chunks_count"),
        coalesce(col("entities_total"), lit(0L)).as("entities_total"),
        coalesce(col("entities_verified"), lit(0L)).as("entities_verified"),
        (coalesce(col("entities_total"), lit(0L)) -
          coalesce(col("entities_verified"), lit(0L)))
          .as("entities_unverified"),
        col("reviewed_at"), col("review_action"),
        element_at(col("metadata"), "rejection_reason")
          .as("rejection_reason"))
  }
}
