package graft.operators

/** The app pydantic models' mutation ladders (app/models/document.py:
  * 107-157, entity.py:64-123, chunk.py:49-77) as faithful row
  * functions — the per-state side effects behind `transition_to`
  * (validated against [[StateMachine.appAllowed]], the same 11-state
  * map), the first-edit original snapshots, and the to_supabase_dict
  * shape laws. Pinned by the wave-10 reference-run fixtures
  * (model_rows.json / ModelRowsSpec). The frame-level faces
  * ([[StateMachine.applyTransitions]], [[Review.applyEdits]],
  * [[EntityCrud.updateMentions]]) stay the batch path; these rows are
  * the model-object contract. */
object ModelRows {

  /** A Document's transition-relevant fields; `*_AtSet` model the
    * reference's timestamp writes (values are wall-clock there). */
  final case class DocRow(status: String,
      processingError: Option[String] = None, retryCount: Int = 0,
      publishAttempts: Int = 0, lastPublishError: Option[String] = None,
      processedAtSet: Boolean = false, approvedAtSet: Boolean = false,
      publishedAtSet: Boolean = false)

  /** document.py:110's f-string renders the ENUM member
    * (`DocumentState.DISCOVERED`), not the wire value. */
  def invalidTransition(fromValue: String, toValue: String): String = {
    def m(v: String) =
      "DocumentState." + v.toUpperCase(java.util.Locale.ROOT)
    s"Invalid transition from ${m(fromValue)} to ${m(toValue)}"
  }

  /** transition_to (document.py:107-132): validity per the app's
    * 11-state map, then the elif side-effect ladder — FAILED+error
    * records the error AND bumps retry_count (no error → neither),
    * PROCESSING clears the error, INGESTED/APPROVED/PUBLISHED stamp
    * their timestamps, PUBLISHING bumps publish_attempts,
    * PUBLISHED also clears last_publish_error,
    * PUBLISH_FAILED+error records it. */
  def transitionTo(doc: DocRow, newState: String,
      error: Option[String]): Either[String, DocRow] = {
    val ok = StateMachine.appAllowed.contains(doc.status -> newState)
    // `new_state == FAILED and error` (:115) is Python TRUTHINESS —
    // an EMPTY error string records nothing and bumps nothing, same
    // for the publish_failed arm (:129)
    val err = error.filter(_.nonEmpty)
    if (!ok) Left(invalidTransition(doc.status, newState))
    else Right {
      val d = doc.copy(status = newState)
      newState match {
        case "failed" if err.isDefined =>
          d.copy(processingError = err, retryCount = d.retryCount + 1)
        case "processing" => d.copy(processingError = None)
        case "ingested" => d.copy(processedAtSet = true)
        case "approved" => d.copy(approvedAtSet = true)
        case "publishing" =>
          d.copy(publishAttempts = d.publishAttempts + 1)
        case "published" =>
          d.copy(publishedAtSet = true, lastPublishError = None)
        case "publish_failed" if err.isDefined =>
          d.copy(lastPublishError = err)
        case _ => d
      }
    }
  }

  /** An Entity's edit/verify fields. Note `edit` targets the LEGACY
    * entity_name field — `name` is untouched (entity.py:71-77). */
  final case class EntityRow(name: String,
      entityName: Option[String] = None,
      originalName: Option[String] = None, isEdited: Boolean = false,
      isVerified: Boolean = false, verifiedBy: Option[String] = None,
      verifiedAtSet: Boolean = false)

  /** entity.py:71-77: the FIRST edit snapshots entity_name into
    * original_name; later edits never overwrite it. */
  def entityEdit(e: EntityRow, newName: String): EntityRow =
    e.copy(
      originalName = if (e.isEdited) e.originalName else e.entityName,
      entityName = Some(newName), isEdited = true)

  /** entity.py:64-69. */
  def entityVerify(e: EntityRow, by: String): EntityRow =
    e.copy(isVerified = true, verifiedBy = Some(by),
      verifiedAtSet = true)

  final case class ChunkRow(chunkText: String,
      originalText: Option[String] = None, isEdited: Boolean = false,
      editedBy: Option[String] = None,
      embeddingId: Option[String] = None)

  /** chunk.py:49-59: first-edit original_text snapshot, edited_by
    * recorded, and the embedding_id CLEARED (the text changed, the
    * vector is stale) — on every edit. */
  def chunkEdit(c: ChunkRow, newText: String, by: String): ChunkRow =
    c.copy(
      originalText = if (c.isEdited) c.originalText else
        Some(c.chunkText),
      chunkText = newText, isEdited = true, editedBy = Some(by),
      embeddingId = None)

  /** chunk.py:69-71's `if not data.get('chunk_size')` is a TRUTHY
    * check: an explicit 0 (or absent) defaults to len(chunk_text) —
    * CODE POINTS, as Python len counts them (a non-BMP char is 1). */
  def chunkSize(explicit: Option[Int], chunkText: String): Int =
    explicit.filter(_ != 0).getOrElse(
      chunkText.codePointCount(0, chunkText.length))

  /** The to_supabase_dict base key sets for default-constructed
    * models (exclude_none drops the optionals; enums coerce to their
    * wire values; *_at timestamps render ISO strings). */
  val documentDictBaseKeys: Seq[String] = Seq("content", "created_at",
    "doc_metadata", "id", "metadata", "name", "publish_attempts",
    "retry_count", "source_type", "status", "tags", "updated_at",
    "version")
  val chunkDictBaseKeys: Seq[String] = Seq("chunk_index", "chunk_size",
    "chunk_text", "chunking_strategy", "created_at", "document_id",
    "id", "is_edited", "metadata", "updated_at")
  val entityDictBaseKeys: Seq[String] = Seq("created_at", "id",
    "is_edited", "is_verified", "metadata", "name", "type",
    "updated_at")
  val relationshipDictBaseKeys: Seq[String] = Seq("created_at", "id",
    "is_verified", "metadata", "relationship_type", "source_entity_id",
    "target_entity_id")
}
