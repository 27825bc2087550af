package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The document-curation tier: the single-document mutations and the
  * detail-fetch enrichment of app/api/documents.py — update
  * (documents.py:812-885), soft/hard delete (:680-722), and the
  * GET /{id} entity enrichment (:335-455).
  *
  * update_document's quirks, ported exactly:
  *   - an incoming metadata dict first has its SPECIAL keys popped to
  *     top-level columns (author, mime_type, security_level,
  *     access_level — documents.py:838-846), and only the remainder
  *     merges over the existing metadata;
  *   - direct payload fields then overwrite, so a payload author beats
  *     a metadata-popped author (the Python dict-assignment order);
  *   - title maps to name only when the payload has no name of its own
  *     (:857-858);
  *   - any security_level update cascades access_level through the
  *     5-level ladder with DEFAULT 1 for unknown names (:861-869),
  *     clobbering even an explicitly-supplied access_level;
  *   - updated_at always stamps.
  * Narrowing: the reference's `exclude_unset` lets a payload set a
  * field to literal null; the Option surface here models only
  * set-vs-unset (a None is unset, never a null write).
  *
  * Scale posture: every mutation is a narrow projection (the updates
  * map is driver-side scalar logic — only the metadata merge is
  * column work); hard delete filters the three tables by the same
  * predicate with no join; enrichEntities is one hash join keyed on
  * canonical_entity_id (broadcast when the canonical roster is small).
  */
object DocumentCuration {

  /** documents.py:862-868 — and .get(level, 1): unknown names map to 1. */
  val securityMapping: Map[String, Int] =
    Map("public" -> 1, "client" -> 2, "partner" -> 3,
      "employee" -> 4, "management" -> 5)

  /** PUT /{id} payload (DocumentUpdateRequest), None = unset. */
  final case class DocUpdate(
      title: Option[String] = None, name: Option[String] = None,
      author: Option[String] = None, mimeType: Option[String] = None,
      status: Option[String] = None, securityLevel: Option[String] = None,
      accessLevel: Option[Int] = None,
      metadata: Option[Map[String, String]] = None)

  private val emptyMap: Column = map().cast("map<string,string>")

  /** PUT /{id} (documents.py:812-885). `docs` needs (id, name, author,
    * mime_type, status, security_level, access_level,
    * metadata: map<string,string>, updated_at). */
  def updateDocument(docs: DataFrame, documentId: String, u: DocUpdate,
      now: String): DataFrame = {
    val hit = col("id") === lit(documentId)
    // the Python updates dict, replayed in assignment order;
    // insertion order never matters (distinct keys), overwrite does
    val updates = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    u.metadata.foreach { m =>
      m.get("author").foreach(v => updates("author") = lit(v))
      m.get("mime_type").foreach(v => updates("mime_type") = lit(v))
      m.get("security_level").foreach(v => updates("security_level") = lit(v))
      m.get("access_level").foreach(v => updates("access_level") = lit(v).cast("int"))
      val remaining = m -- specialMetaKeys
      // {**existing, **new}: new keys overwrite
      updates("metadata") =
        if (remaining.isEmpty) coalesce(col("metadata"), emptyMap)
        else map_concat(
          map_filter(coalesce(col("metadata"), emptyMap),
            (k, _) => !k.isInCollection(remaining.keys.toSeq)),
          map(remaining.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
    }
    u.title.foreach(v => updates("title") = lit(v))
    u.name.foreach(v => updates("name") = lit(v))
    u.author.foreach(v => updates("author") = lit(v))
    u.mimeType.foreach(v => updates("mime_type") = lit(v))
    u.status.foreach(v => updates("status") = lit(v))
    u.securityLevel.foreach(v => updates("security_level") = lit(v))
    u.accessLevel.foreach(v => updates("access_level") = lit(v))
    if (u.title.isDefined && !updates.contains("name"))
      updates("name") = lit(u.title.get)
    // cascade: any security_level write recomputes access_level —
    // the level string is always a driver-side literal here (popped
    // or direct), so the ladder lookup is too
    val secLit: Option[String] =
      u.securityLevel.orElse(u.metadata.flatMap(_.get("security_level")))
    if (updates.contains("security_level"))
      updates("access_level") = lit(securityMapping.getOrElse(secLit.get, 1))
    updates("updated_at") = lit(now)
    // the reference writes a title column too (:854); keep it only
    // when the caller's frame models one — title always maps to name
    if (!docs.columns.contains("title")) updates.remove("title")
    updates.foldLeft(docs) { case (df, (f, v)) =>
      df.withColumn(f, when(hit, v).otherwise(col(f)))
    }
  }

  private val specialMetaKeys =
    Seq("author", "mime_type", "security_level", "access_level")

  /** The 5-level ladder as a column expression — .get(level, 1). */
  private def secLadder(level: Column): Column =
    securityMapping.foldLeft(lit(1)) { case (acc, (k, v)) =>
      when(level === k, lit(v)).otherwise(acc)
    }

  /** PUT /{id}/metadata (documents.py:887-902) + the metadata-only
    * arms of update_document (:812-885), batched over a (document_id,
    * new_metadata, merge) request frame.
    *
    * The route is a thin delegate to update_document with payload
    * `{"metadata": metadata}` — a PLAIN DICT, and update_document
    * calls `update_data.dict(exclude_unset=True)` (:833) AFTER its
    * 404 check. A dict has no .dict, so the live route raises
    * AttributeError into the blanket handler: EVERY existing document
    * answers 500 ("'dict' object has no attribute 'dict'") and only
    * the 404 arm is reachable. `route_arm`/`route_detail` model that
    * live outcome faithfully (the DocProcessorChunker TypeError
    * convention: the bug is the behavior).
    *
    * The remaining columns model the metadata arms the delegate was
    * AIMING at — which ARE reachable today through PUT /{id} with a
    * pydantic payload carrying only `metadata` (the same
    * update_document code path, minus the crash):
    *   - the route's `merge` query param is DEAD — accepted,
    *     documented ("Merge with existing metadata (vs replace)") and
    *     never passed on, so merge=false still merges;
    *   - the special keys popped out of the metadata dict (author,
    *     mime_type, security_level, access_level —
    *     documents.py:838-846) are the only column writes, the
    *     remainder merges over the existing map, and a popped
    *     security_level cascades access_level through the ladder
    *     (unknown names → 1), clobbering even an access_level popped
    *     from the same dict (:861-869).
    * Arms: 'not_found' (the 404) | 'updated' (stamps updated_at and
    * renders update_document's success message).
    * Key-presence semantics: Python pops on `in` (presence), not
    * truthiness — map_contains_key mirrors that exactly.
    *
    * Scale: requests are curation-sized — the doc lookup is a
    * broadcast semi-join reduction of `docs` to the requested ids,
    * then a broadcast left join back to the preserved request side;
    * the merge itself is per-row map work, no shuffle. */
  def updateMetadataBatch(docs: DataFrame, requests: DataFrame,
      now: String): DataFrame = {
    val reqIds = broadcast(requests.select(col("document_id")))
    val docSub = docs.select(col("document_id"), col("author"),
        col("mime_type"), col("security_level"), col("access_level"),
        col("metadata"))
      .join(reqIds, Seq("document_id"), "left_semi")
      .withColumn("_doc_ok", lit(true))
    val nm = coalesce(col("new_metadata"), emptyMap)
    val hasKey = (k: String) => map_contains_key(nm, k)
    val remaining = map_filter(nm,
      (k, _) => !k.isInCollection(specialMetaKeys))
    val merged = map_concat(
      map_filter(coalesce(col("metadata"), emptyMap),
        (k, _) => !map_contains_key(remaining, k)),
      remaining)
    val found = col("_doc_ok").isNotNull
    requests.select(col("document_id"), col("new_metadata"), col("merge"))
      .join(broadcast(docSub), Seq("document_id"), "left")
      .select(col("document_id"), col("merge"),
        when(!found, lit("not_found")).otherwise(lit("updated")).as("arm"),
        when(found, when(hasKey("author"), element_at(nm, "author"))
          .otherwise(col("author"))).as("author"),
        when(found, when(hasKey("mime_type"), element_at(nm, "mime_type"))
          .otherwise(col("mime_type"))).as("mime_type"),
        when(found, when(hasKey("security_level"),
            element_at(nm, "security_level"))
          .otherwise(col("security_level"))).as("security_level"),
        when(found,
          when(hasKey("security_level"),
            secLadder(element_at(nm, "security_level")))
          .when(hasKey("access_level"),
            element_at(nm, "access_level").cast("int"))
          .otherwise(col("access_level"))).as("access_level"),
        when(found, merged).as("metadata"),
        when(found, lit(now)).as("updated_at"),
        when(found, concat(lit("Document "), col("document_id"),
          lit(" updated successfully"))).as("message"),
        // the LIVE route outcome: the plain-dict delegate crashes on
        // .dict() after the 404 check, so found docs 500, never update
        when(!found, lit("not_found")).otherwise(lit("error_500"))
          .as("route_arm"),
        when(!found, concat(lit("Document "), col("document_id"),
            lit(" not found")))
          .otherwise(lit("'dict' object has no attribute 'dict'"))
          .as("route_detail"))
  }

  /** DELETE /{id} soft arm (documents.py:707-717): status=rejected
    * (DocumentState.REJECTED — DELETED trips a constraint), stamp
    * updated_at, keep everything else. */
  def softDelete(docs: DataFrame, documentId: String, now: String): DataFrame = {
    val hit = col("id") === lit(documentId)
    docs
      .withColumn("status", when(hit, lit("rejected")).otherwise(col("status")))
      .withColumn("updated_at", when(hit, lit(now)).otherwise(col("updated_at")))
  }

  /** DELETE /{id}?hard_delete=true (documents.py:698-706): cascade —
    * chunks and mentions first, then the document row. */
  def hardDelete(docs: DataFrame, chunks: DataFrame, mentions: DataFrame,
      documentId: String): (DataFrame, DataFrame, DataFrame) = (
    docs.where(col("id") =!= lit(documentId)),
    chunks.where(col("document_id") =!= lit(documentId)),
    mentions.where(col("document_id") =!= lit(documentId)))

  /** GET /{id} entity enrichment (documents.py:399-448): every mention
    * LEFT-joins its canonical entity; the response's precedence chains
    * are Python `or` (falsy = null OR empty string):
    *   - entity_name: mention.entity_name or mention.name
    *   - entity_type: canonical.type if truthy, else
    *     mention.entity_type or mention.type
    *   - confidence_score: confidence_score, else legacy confidence,
    *     else 1.0. NARROWING: the reference's
    *     entity.get('confidence_score', entity.get('confidence', 1.0))
    *     (documents.py:443) falls back only on a MISSING dict key, so
    *     a supabase row carrying an explicit null passes None through;
    *     a columnar frame can't distinguish null-key from absent-key,
    *     so coalesce treats null as absent (same narrowing as
    *     DocUpdate's exclude_unset note)
    *   - attributes hoist into metadata only when truthy and the key
    *     is absent (:421-424)
    *   - canonical_entity_id: only when truthy; the canonical_*
    *     columns ride the join hit.
    *
    * `mentions` needs (id, entity_name, name, entity_type, type,
    * confidence_score, confidence, metadata: map, attributes,
    * canonical_entity_id); `canonicals` needs (id, name, type,
    * metadata: map). */
  def enrichEntities(mentions: DataFrame, canonicals: DataFrame): DataFrame = {
    def truthy(c: Column): Column = c.isNotNull && c =!= ""
    val canon = canonicals.select(
      col("id").as("_cid"), col("name").as("canonical_name"),
      col("type").as("_ctype"), col("metadata").as("canonical_metadata"))
    val cid = when(truthy(col("canonical_entity_id")),
      col("canonical_entity_id"))
    val attrs = when(truthy(col("attributes")), col("attributes"))
      .otherwise(element_at(coalesce(col("metadata"), emptyMap),
        "attributes"))
    val hoisted = when(truthy(attrs) &&
        !map_contains_key(coalesce(col("metadata"), emptyMap), "attributes"),
      map_concat(coalesce(col("metadata"), emptyMap),
        map(lit("attributes"), attrs)))
      .otherwise(coalesce(col("metadata"), emptyMap))
    mentions
      .join(canon, cid === col("_cid"), "left")
      .select(
        col("id"),
        when(truthy(col("entity_name")), col("entity_name"))
          .otherwise(col("name")).as("entity_name"),
        when(truthy(col("_ctype")), col("_ctype"))
          .otherwise(when(truthy(col("entity_type")), col("entity_type"))
            .otherwise(col("type"))).as("entity_type"),
        coalesce(col("confidence_score"), col("confidence"), lit(1.0))
          .as("confidence_score"),
        hoisted.as("metadata"),
        cid.as("canonical_entity_id"),
        col("canonical_name"),
        // raw joined value: the truthy filter is only for the
        // entity_type precedence, canonical_type reports as stored
        col("_ctype").as("canonical_type"),
        col("canonical_metadata"))
  }

  /** POST /{id}/process admission (documents.py:1009-1077), batched
    * over a request frame of (document_id, force_reprocess): each
    * request lands in one arm —
    *   - 'not_found' (the 404) when the document doesn't exist;
    *   - 'busy' (the 400) when force_reprocess=true but the document
    *     is mid-processing — force skips the state gate EXCEPT for
    *     'processing';
    *   - 'bad_state' (the 400) when force_reprocess=false and the
    *     status is outside {discovered, failed} — the normal path's
    *     only admissible states;
    *   - 'queued': admitted — the document flips to 'processing', and
    *     when forced the existing chunks / entity mentions / canonical
    *     relationships are cascade-deleted first (the counts surface
    *     as columns; zero when not forced).
    *
    * Scale: the three cleanup counts are one aggregation each over
    * frames pre-filtered by a broadcast semi-join on the curation-
    * sized request set; nothing large shuffles. */
  def processAdmission(docs: DataFrame, chunks: DataFrame,
      mentions: DataFrame, relationships: DataFrame,
      requests: DataFrame): DataFrame = {
    val req = requests.select(col("document_id"), col("force_reprocess"))
    val reqIds = broadcast(req.select(col("document_id")))
    def docCount(df: DataFrame, name: String): DataFrame =
      df.join(reqIds, Seq("document_id"), "left_semi")
        .groupBy(col("document_id")).agg(count(lit(1)).as(name))
    // requests must be the preserved side, and a preserved side can't
    // be the broadcast build — so semi-reduce the big docs frame to
    // the requested ids (broadcast semi-join) and broadcast THAT
    // bounded result as the right side of every left join.
    val docSub = docs.select(col("document_id"), col("status"))
      .join(reqIds, Seq("document_id"), "left_semi")
    val j = req
      .join(broadcast(docSub), Seq("document_id"), "left")
      .join(broadcast(docCount(chunks, "n_chunks")),
        Seq("document_id"), "left")
      .join(broadcast(docCount(mentions, "n_mentions")),
        Seq("document_id"), "left")
      .join(broadcast(docCount(relationships, "n_relationships")),
        Seq("document_id"), "left")
    val admitted = (col("force_reprocess") && col("status") =!= "processing") ||
      (!col("force_reprocess") && col("status").isin("discovered", "failed"))
    j.select(col("document_id"), col("force_reprocess"),
      when(col("status").isNull, lit("not_found"))
        .when(col("force_reprocess") && col("status") === "processing",
          lit("busy"))
        .when(!col("force_reprocess") &&
          !col("status").isin("discovered", "failed"), lit("bad_state"))
        .otherwise(lit("queued")).as("arm"),
      when(col("status").isNotNull && admitted, lit("processing"))
        .otherwise(col("status")).as("new_status"),
      when(col("status").isNotNull && admitted && col("force_reprocess"),
        coalesce(col("n_chunks"), lit(0L))).otherwise(lit(0L))
        .as("chunks_deleted"),
      when(col("status").isNotNull && admitted && col("force_reprocess"),
        coalesce(col("n_mentions"), lit(0L))).otherwise(lit(0L))
        .as("mentions_deleted"),
      when(col("status").isNotNull && admitted && col("force_reprocess"),
        coalesce(col("n_relationships"), lit(0L))).otherwise(lit(0L))
        .as("relationships_deleted"))
  }

  /** POST /{id}/extract-metadata admission (documents.py:905-955),
    * batched: 'not_found' (404) when the document is missing,
    * 'no_content' (400) when its content is Python-falsy (null or
    * empty), else 'queued' with the reference's started message. */
  def extractMetadataAdmission(docs: DataFrame,
      requests: DataFrame): DataFrame = {
    val reqIds = broadcast(requests.select(col("document_id")))
    val docSub = docs.select(col("document_id"), col("content"))
      .join(reqIds, Seq("document_id"), "left_semi")
      .withColumn("_doc_ok", lit(true))
    requests.select(col("document_id"))
      .join(broadcast(docSub), Seq("document_id"), "left")
      .select(col("document_id"),
        when(col("_doc_ok").isNull, lit("not_found"))
          .when(col("content").isNull || length(col("content")) === 0,
            lit("no_content"))
          .otherwise(lit("queued")).as("arm"),
        when(col("_doc_ok").isNotNull && col("content").isNotNull &&
          length(col("content")) > 0,
          concat(lit("Metadata extraction started for document "),
            col("document_id"))).as("message"))
  }
}
