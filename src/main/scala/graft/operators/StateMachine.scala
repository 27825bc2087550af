package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Document state machine (document_state.py:11-54, state_manager.py:
  * 139-213): 7 states, an allowed-transition map, guarded bulk
  * transitions, and an append-only audit log.
  *
  * Spark shape: transitions are a MERGE guarded by a CASE-WHEN
  * validity check (broadcast join against the transition table);
  * invalid requests are returned, not applied — the review-UI
  * semantics of the reference. The audit log is an append-only
  * DataFrame (Delta append at cluster scale).
  */
object StateMachine {

  val states: Seq[String] = Seq(
    "discovered", "processing", "pending_review", "approved",
    "published", "rejected", "failed")

  /** Allowed (from, to) transitions (document_state.py:22-33 shape —
    * the curation surface's working subset; the exact reference maps
    * are [[simpleAllowed]] and [[appAllowed]] below). */
  val allowed: Seq[(String, String)] = Seq(
    "discovered" -> "processing",
    "processing" -> "pending_review",
    "processing" -> "failed",
    "pending_review" -> "approved",
    "pending_review" -> "rejected",
    "approved" -> "published",
    "rejected" -> "processing",
    "failed" -> "processing")

  /** The state-manager model's states, declaration order
    * (document_state.py:13-19): `ingested` is the terminal. */
  val simpleStates: Seq[String] = Seq(
    "discovered", "processing", "pending_review", "approved",
    "ingested", "failed", "rejected")

  /** document_state.py:25-32 VERBATIM — the map state_manager.py and
    * state_manager_simple.py validate against (`can_transition_to`).
    * Note pending_review→failed exists, reprocessing re-enters via
    * failed→{discovered,processing} and rejected→discovered, and
    * ingested has no exits. */
  val simpleAllowed: Seq[(String, String)] = Seq(
    "discovered" -> "processing", "discovered" -> "failed",
    "processing" -> "pending_review", "processing" -> "failed",
    "pending_review" -> "approved", "pending_review" -> "rejected",
    "pending_review" -> "failed",
    "approved" -> "ingested", "approved" -> "failed",
    // ingested: terminal, no exits
    "failed" -> "discovered", "failed" -> "processing",
    "rejected" -> "discovered")

  /** The app model's states (document.py:8-21) with the publishing
    * tier and the deleted terminal. */
  val appStates: Seq[String] = Seq(
    "discovered", "processing", "pending_review", "approved",
    "rejected", "ingested", "failed", "deleted",
    "publishing", "published", "publish_failed")

  /** document.py:26-39 VERBATIM — the app's richer map: review can
    * bounce back to processing, approved fans to
    * publishing/ingested/failed, ingested and published allow
    * reprocessing, publish_failed can retry. */
  val appAllowed: Seq[(String, String)] = Seq(
    "discovered" -> "processing", "discovered" -> "failed",
    "processing" -> "pending_review", "processing" -> "failed",
    "pending_review" -> "approved", "pending_review" -> "rejected",
    "pending_review" -> "processing",
    "approved" -> "publishing", "approved" -> "ingested",
    "approved" -> "failed",
    "rejected" -> "processing", "rejected" -> "discovered",
    "ingested" -> "processing",
    "failed" -> "processing", "failed" -> "discovered",
    "publishing" -> "published", "publishing" -> "publish_failed",
    "published" -> "processing",
    "publish_failed" -> "approved", "publish_failed" -> "publishing")

  final case class TransitionResult(updated: DataFrame, rejectedRequests: DataFrame,
      auditLog: DataFrame)

  /** Apply requested transitions to current states.
    *
    * @param current  (id, status)
    * @param requests (id, to_status) — at most one request per id
    * @return updated states, rejected requests (with reason), and the
    *         audit rows for applied transitions
    */
  def applyTransitions(current: DataFrame, requests: DataFrame,
      idCol: String = "id",
      allowedMap: Seq[(String, String)] = allowed): TransitionResult = {
    val spark = current.sparkSession
    val allowedDf = broadcast(
      spark.createDataFrame(allowedMap).toDF("_from", "_to"))
    val joined = current.join(requests, Seq(idCol), "left")
      .join(allowedDf,
        col("status") === col("_from") && col("to_status") === col("_to"),
        "left")
      .withColumn("_valid", col("_to").isNotNull)
    val updated = joined
      .withColumn("status",
        when(col("_valid"), col("to_status")).otherwise(col("status")))
      .select(col(idCol), col("status"))
    val rejected = joined
      .where(col("to_status").isNotNull && !col("_valid"))
      .select(col(idCol), col("status").as("from_status"), col("to_status"),
        lit("transition not allowed").as("reason"))
    val audit = joined
      .where(col("_valid"))
      .select(col(idCol), col("status").as("from_status"),
        col("to_status"), current_timestamp().as("at"))
    TransitionResult(updated, rejected, audit)
  }
}
