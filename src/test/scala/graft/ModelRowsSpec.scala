package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ModelRows
import graft.operators.ModelRows.{ChunkRow, DocRow, EntityRow}

/** Wave-10 parity against the reference BINARY:
  * tools/gen_parity_fixtures10.py runs the REAL app pydantic models
  * (document/entity/chunk) under pydantic 2.x; this spec replays the
  * recorded walks through operators/ModelRows.scala. */
class ModelRowsSpec extends AnyFunSuite {

  implicit val fmts: Formats = DefaultFormats

  private lazy val fx: JValue =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/refparity/model_rows.json"),
      "UTF-8").mkString)

  private def snap(d: DocRow): Map[String, Any] = Map(
    "status" -> d.status,
    "processing_error" -> d.processingError.orNull,
    "retry_count" -> d.retryCount,
    "publish_attempts" -> d.publishAttempts,
    "last_publish_error" -> d.lastPublishError.orNull,
    "processed_at_set" -> d.processedAtSet,
    "approved_at_set" -> d.approvedAtSet,
    "published_at_set" -> d.publishedAtSet)

  private def recorded(c: JValue): Map[String, Any] = Map(
    "status" -> (c \ "status").extract[String],
    "processing_error" -> (c \ "processing_error")
      .extractOpt[String].orNull,
    "retry_count" -> (c \ "retry_count").extract[Int],
    "publish_attempts" -> (c \ "publish_attempts").extract[Int],
    "last_publish_error" -> (c \ "last_publish_error")
      .extractOpt[String].orNull,
    "processed_at_set" -> (c \ "processed_at_set").extract[Boolean],
    "approved_at_set" -> (c \ "approved_at_set").extract[Boolean],
    "published_at_set" -> (c \ "published_at_set").extract[Boolean])

  /** The generator's walk: (step name, target state, error). */
  private val walkSteps: Seq[(String, String, Option[String])] = Seq(
    ("to_processing", "processing", None),
    ("to_failed_with_error", "failed", Some("boom")),
    ("retry_processing_clears_error", "processing", None),
    ("to_pending_review", "pending_review", None),
    ("to_approved", "approved", None),
    ("to_publishing", "publishing", None),
    ("to_publish_failed_with_error", "publish_failed",
      Some("store down")),
    ("back_to_publishing", "publishing", None),
    ("to_published_clears_publish_error", "published", None),
    ("reprocess_from_published", "processing", None))

  test("the transition side-effect walk matches the reference run " +
      "step for step") {
    val rec = (fx \ "transition_walk").extract[List[JValue]]
    var d = DocRow("discovered")
    assert(snap(d) === recorded(rec.head))
    walkSteps.zip(rec.tail).foreach { case ((step, state, err), want) =>
      assert((want \ "step").extract[String] === step)
      d = ModelRows.transitionTo(d, state, err)
        .fold(e => fail(s"$step: $e"), identity)
      assert(snap(d) === recorded(want), step)
    }
  }

  test("FAILED without an error touches neither the error nor " +
      "retry_count; the INGESTED arm stamps processed_at") {
    var d = DocRow("discovered")
    d = ModelRows.transitionTo(d, "processing", None).toOption.get
    d = ModelRows.transitionTo(d, "failed", None).toOption.get
    assert(snap(d) === recorded(fx \ "failed_without_error"))
    // `and error` truthiness: an EMPTY error string records nothing
    var de = DocRow("discovered")
    de = ModelRows.transitionTo(de, "processing", None).toOption.get
    de = ModelRows.transitionTo(de, "failed", Some("")).toOption.get
    assert(snap(de) === recorded(fx \ "failed_empty_error"))
    var d3 = DocRow("discovered")
    for (s <- Seq("processing", "pending_review", "approved",
        "ingested"))
      d3 = ModelRows.transitionTo(d3, s, None).toOption.get
    assert(snap(d3) === recorded(fx \ "ingested_arm"))
  }

  test("invalid transitions carry the enum-repr error string") {
    (fx \ "invalid_transitions").extract[List[JValue]].foreach { c =>
      val from = (c \ "from").extract[String]
      val to = (c \ "to").extract[String]
      assert(ModelRows.transitionTo(DocRow(from), to, None) ===
        Left((c \ "error").extract[String]), s"$from->$to")
    }
  }

  test("entity edit targets the legacy entity_name with a first-edit " +
      "original snapshot; verify stamps the reviewer") {
    val rec = (fx \ "entity_steps").extract[List[JValue]]
    var e = EntityRow(name = "X", entityName = Some("XLegacy"))
    e = ModelRows.entityEdit(e, "Y")
    assert(e.name === (rec(0) \ "name").extract[String])
    assert(e.entityName === (rec(0) \ "entity_name").extractOpt[String])
    assert(e.originalName ===
      (rec(0) \ "original_name").extractOpt[String])
    assert(e.isEdited === (rec(0) \ "is_edited").extract[Boolean])
    e = ModelRows.entityEdit(e, "Z")
    assert(e.entityName === (rec(1) \ "entity_name").extractOpt[String])
    assert(e.originalName ===
      (rec(1) \ "original_name").extractOpt[String])
    e = ModelRows.entityVerify(e, "alice")
    assert(e.isVerified === (rec(2) \ "is_verified").extract[Boolean])
    assert(e.verifiedBy === (rec(2) \ "verified_by").extractOpt[String])
    assert(e.verifiedAtSet ===
      (rec(2) \ "verified_at_set").extract[Boolean])
  }

  test("chunk edit snapshots the first original, records the editor, " +
      "and clears the embedding on every edit") {
    val rec = (fx \ "chunk_steps").extract[List[JValue]]
    var c = ChunkRow(chunkText = "hello world",
      embeddingId = Some("emb1"))
    c = ModelRows.chunkEdit(c, "new text", "bob")
    assert(c.chunkText === (rec(0) \ "chunk_text").extract[String])
    assert(c.originalText ===
      (rec(0) \ "original_text").extractOpt[String])
    assert(c.editedBy === (rec(0) \ "edited_by").extractOpt[String])
    assert(c.embeddingId === (rec(0) \ "embedding_id")
      .extractOpt[String])
    // re-embedding then re-editing clears it again, original kept
    c = c.copy(embeddingId = Some("emb2"))
    c = ModelRows.chunkEdit(c, "newer", "carol")
    assert(c.chunkText === (rec(1) \ "chunk_text").extract[String])
    assert(c.originalText ===
      (rec(1) \ "original_text").extractOpt[String])
    assert(c.editedBy === (rec(1) \ "edited_by").extractOpt[String])
    assert(c.embeddingId === None)
  }

  test("to_supabase_dict shapes: base key sets, enum coercion, the " +
      "truthy chunk_size default") {
    assert((fx \ "document_dict" \ "keys").extract[List[String]] ===
      ModelRows.documentDictBaseKeys.toList)
    assert((fx \ "document_dict" \ "status").extract[String] ===
      "discovered")
    assert((fx \ "document_dict" \ "source_type").extract[String] ===
      "notion")
    assert((fx \ "document_dict" \ "created_at_is_str")
      .extract[Boolean])
    assert((fx \ "chunk_dict" \ "keys").extract[List[String]] ===
      ModelRows.chunkDictBaseKeys.toList)
    assert((fx \ "chunk_dict" \ "chunk_size").extract[Int] ===
      ModelRows.chunkSize(None, "hello"))
    assert((fx \ "chunk_dict_explicit_size").extract[Int] ===
      ModelRows.chunkSize(Some(3), "hello"))
    // the falsy arm: explicit 0 still defaults to len
    assert((fx \ "chunk_dict_zero_size").extract[Int] ===
      ModelRows.chunkSize(Some(0), "hello"))
    // len() counts CODE POINTS: two astral emoji = 2, not 4
    assert((fx \ "chunk_dict_astral_size").extract[Int] ===
      ModelRows.chunkSize(None, "😀😀"))
    assert((fx \ "entity_dict_keys").extract[List[String]] ===
      ModelRows.entityDictBaseKeys.toList)
    assert((fx \ "relationship_dict_keys").extract[List[String]] ===
      ModelRows.relationshipDictBaseKeys.toList)
  }
}
