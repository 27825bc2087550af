package graft.operators

/** Faithful row-level twin of the Supabase-backed document state
  * manager (app/services/state_manager.py:25-377) over an in-memory
  * store — the persistence client is the injectable seam (here a
  * plain table map; a real deployment points the same logic at
  * Postgres/Supabase), the clock is injectable for determinism.
  *
  * LIVE ERRORS carried:
  *  - `transition()` on an UNKNOWN document calls
  *    `create_state(document_id)` whose default `metadata=None` hits
  *    `metadata.get("filename", ...)` → AttributeError — a missing
  *    document can never be auto-created (:87-113, :145-148);
  *    `create_state` called without metadata fails the same way.
  *  - add_transition's retry_count increment (document_state.py:
  *    :118-120) tests `current_state == FAILED` AFTER current_state
  *    was already reassigned to to_state, so it can never fire —
  *    retry_count stays at its stored value forever.
  *  - `get_state` rebuilds error_count as 0 every call ("not in
  *    current schema"), so the FAILED arm's metadata write records
  *    error_count = 1 on every failure, never accumulating.
  *
  * The transition map is [[StateMachine.simpleAllowed]] (the
  * document_state.py map, wave-1 parity-pinned);
  * [[StateMachine.applyTransitions]] stays the batch DataFrame face.
  * Parity: ReferenceParity2Spec against the reference binary run
  * over a faked supabase client.
  */
object StateManagerRow {

  val Discovered = "discovered"
  val Processing = "processing"
  val PendingReview = "pending_review"
  val Approved = "approved"
  val Ingested = "ingested"
  val Failed = "failed"
  val Rejected = "rejected"

  /** document_state.py declaration order (statistics iterate it). */
  val States: Seq[String] = StateMachine.simpleStates

  val ErrorStates: Set[String] = Set(Failed, Rejected)
  val ActionStates: Seq[String] = Seq(PendingReview, Failed, Rejected)

  private val allowed: Set[(String, String)] =
    StateMachine.simpleAllowed.toSet

  final case class DocRow(id: String, name: String, sourceType: String,
      fileType: String, var status: String, var retryCount: Int,
      var metadata: Map[String, String], createdAt: String,
      var updatedAt: String, version: Int, tags: Vector[String])

  final case class TransRow(documentId: String, fromState: String,
      toState: String, userId: Option[String], reason: Option[String],
      metadata: Map[String, String], createdAt: String)

  /** Error outcomes mirror the reference's exception classes. */
  sealed trait Err { def message: String }
  final case class AttributeError(message: String) extends Err
  final case class ValueErr(message: String) extends Err
  final case class StateValidationError(message: String) extends Err

  final class Store(clock: () => String) {
    val docs = scala.collection.mutable.LinkedHashMap.empty[String, DocRow]
    val transitions = scala.collection.mutable.ArrayBuffer.empty[TransRow]

    /** create_state (:87-138): metadata-less calls are the
      * AttributeError arm; an existing id returns untouched. */
    def createState(id: String, initialState: String = Discovered,
        metadata: Option[Map[String, String]] = None): Either[Err, Unit] =
      if (docs.contains(id)) Right(())
      else metadata match {
        case None =>
          Left(AttributeError("'NoneType' object has no attribute 'get'"))
        case Some(meta) =>
          val now = clock()
          docs(id) = DocRow(id,
            meta.getOrElse("filename", s"document_${id.take(8)}"),
            meta.getOrElse("source_type", "upload"),
            meta.getOrElse("file_type", "unknown"),
            initialState, 0, meta, now, now, 1, Vector.empty)
          Right(())
      }

    /** transition (:139-213). */
    def transition(id: String, toState: String,
        userId: Option[String] = None, reason: Option[String] = None,
        metadata: Option[Map[String, String]] = None): Either[Err, Unit] =
      docs.get(id) match {
        case None =>
          // the auto-create arm crashes on its None metadata
          Left(AttributeError("'NoneType' object has no attribute 'get'"))
        case Some(doc) =>
          if (!allowed.contains(doc.status -> toState))
            Left(StateValidationError(
              s"Cannot transition from ${doc.status} to $toState"))
          else {
            val ts = clock()
            val fromState = doc.status
            doc.status = toState
            doc.updatedAt = ts
            // retry_count: the dead increment never fires; the stored
            // value is rewritten unchanged
            if (toState == Failed)
              doc.metadata = doc.metadata + ("error_count" -> "1")
            transitions += TransRow(id, fromState, toState, userId,
              reason, metadata.getOrElse(Map.empty), ts)
            Right(())
          }
      }

    /** reset_failed_document (:288-315): error states (failed,
      * rejected) reset to discovered with the reset metadata. */
    def resetFailedDocument(id: String,
        reason: String = "Manual retry"): Either[Err, Unit] =
      docs.get(id) match {
        case None => Left(ValueErr(s"Document $id not found"))
        case Some(doc) if !ErrorStates.contains(doc.status) =>
          Left(StateValidationError(
            s"Document is not in error state (current: ${doc.status})"))
        case Some(doc) =>
          transition(id, Discovered, None, Some(reason),
            Some(Map("reset" -> "True",
              "previous_state" -> doc.status)))
      }

    /** bulk_transition (:315-341): continues past failures. */
    def bulkTransition(ids: Seq[String], toState: String,
        userId: Option[String] = None, reason: Option[String] = None)
        : Vector[(String, Either[Err, Unit])] =
      ids.toVector.map(id => id -> transition(id, toState, userId, reason))

    /** get_documents_by_state (:214-237): ids in store order. */
    def documentsByState(state: String, limit: Int = 100): Vector[String] =
      docs.values.filter(_.status == state).take(limit).map(_.id).toVector

    /** get_documents_requiring_action (:238-267). */
    def documentsRequiringAction(limit: Int = 100): Vector[String] =
      docs.values.filter(d => ActionStates.contains(d.status))
        .take(limit).map(_.id).toVector

    /** get_state_statistics (:268-287): every state, declaration
      * order. */
    def stateStatistics(): Seq[(String, Int)] =
      States.map(s => s -> docs.values.count(_.status == s))

    /** get_processing_duration (document_state.py:131-150): ingested
      * docs only; first →processing to last →ingested, from the
      * transition history's ISO timestamps. */
    def processingDuration(id: String): Option[Double] =
      docs.get(id).filter(_.status == Ingested).flatMap { _ =>
        val hist = transitions.filter(_.documentId == id)
        val start = hist.find(_.toState == Processing).map(_.createdAt)
        val end = hist.reverse.find(_.toState == Ingested).map(_.createdAt)
        for (s <- start; e <- end) yield
          (java.time.LocalDateTime.parse(e).toEpochSecond(
            java.time.ZoneOffset.UTC) -
            java.time.LocalDateTime.parse(s).toEpochSecond(
              java.time.ZoneOffset.UTC)).toDouble
      }

    /** get_processing_metrics (:342-375). */
    def processingMetrics(): Map[String, Any] = {
      val stats = stateStatistics()
      val total = stats.map(_._2).sum
      val completed = documentsByState(Ingested, 1000)
      val times = completed.flatMap(processingDuration)
      Map(
        "state_counts" -> stats.toMap,
        "total_documents" -> total,
        "success_rate" ->
          stats.toMap.getOrElse(Ingested, 0).toDouble / math.max(total, 1),
        "failure_rate" ->
          stats.toMap.getOrElse(Failed, 0).toDouble / math.max(total, 1),
        "average_processing_time" ->
          (if (times.nonEmpty) times.sum / times.length else 0.0),
        "documents_pending_review" ->
          stats.toMap.getOrElse(PendingReview, 0),
        "documents_failed" -> stats.toMap.getOrElse(Failed, 0))
    }
  }
}
