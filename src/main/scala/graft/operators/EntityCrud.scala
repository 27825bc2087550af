package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The entity CRUD + listing tier: the canonical-entity read endpoints
  * and the per-document mention mutations of `app/api/entities.py`
  * (list :47-123, dual-arm get :124-187, create :188-253, update
  * :254-337, delete :338-373, by-document :645-677), as distributed
  * batch transforms.
  *
  * The reference serves one document / one entity per HTTP call; each
  * batch form here is defined as "the endpoint applied to every key at
  * once" and reduces to the reference's single-call case exactly.
  *
  * Faithful quirks preserved:
  *   - `min_quality` filters only when > 0 (entities.py:89-90): at the
  *     default 0.0 the predicate is skipped entirely, so entities with
  *     NULL quality_score survive the default listing but vanish from
  *     any filtered one;
  *   - the document filter collects canonical ids from mentions with a
  *     non-null canonical_entity_id (:66-74) — documents whose
  *     mentions are all un-canonicalized list nothing;
  *   - create's duplicate check is exact (document_id, entity_name,
  *     entity_type) equality (:199-206) — same name with different
  *     case creates a second entity;
  *   - update merges metadata only when merge_metadata AND the
  *     existing metadata is Python-truthy (:287-291): an empty or null
  *     existing map takes the replace path (same result, but the arm
  *     matters for the edit history which is appended AFTER the merge);
  *   - every successful mutation flips the parent document to
  *     pending_review (:231-235, :312-318, :358-363).
  *
  * Scale: listings are one groupBy(document_id, canonical_id) plus an
  * equi-join to the canonical frame — both shuffle on the id they
  * already carry. Mutation request frames are curation-sized (human
  * review actions) and broadcast; the big mention frame is semi-joined
  * down before any wide join.
  */
object EntityCrud {

  /** GET /entities/?document_id=... (entities.py:47-123) and its
    * by-document twin (:645-677), batched over every document: each
    * document's canonical entities (via its canonicalized mentions),
    * optional type filter, the min_quality>0 quirk, and
    * `mentions_in_document` counts (:110-117).
    *
    * `offset`/`limit` reproduce `.range(offset, offset+limit-1)`
    * per document; the reference's row order is unspecified, so the
    * batch form fixes ascending canonical id (documented deviation —
    * the oracle uses the same order). */
  def listCanonical(canonical: DataFrame, mentions: DataFrame,
      entityType: Option[String] = None, minQuality: Double = 0.0,
      limit: Int = 100, offset: Int = 0): DataFrame = {
    val counts = mentions
      .where(col("canonical_entity_id").isNotNull)
      .groupBy(col("document_id"), col("canonical_entity_id").as("id"))
      .agg(count(lit(1)).as("mentions_in_document"))
    val joined = counts.join(canonical, Seq("id"))
    val typed = entityType.fold(joined)(t => joined.where(col("type") === t))
    val scored =
      if (minQuality > 0) typed.where(col("quality_score") >= minQuality)
      else typed
    val w = Window.partitionBy(col("document_id")).orderBy(col("id"))
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") > offset && col("_rn") <= offset + limit)
      .select(col("document_id"), col("id"), col("name"), col("type"),
        col("quality_score"), col("is_validated"),
        col("mentions_in_document"))
  }

  /** GET /entities/{id} (entities.py:124-187): the id is tried as a
    * DOCUMENT id first — if any mention carries it as document_id with
    * a non-null canonical_entity_id, the response is that document's
    * canonical entities ('document' arm, one row per entity); only
    * otherwise is it treated as a canonical entity id ('entity' arm,
    * one row with its cross-document mention count). Ids matching
    * neither return no rows (the reference's empty list). A requested
    * id that is BOTH a document id and an entity id resolves as a
    * document — the reference's lookup-order quirk. */
  def resolveEntityOrDocument(requests: DataFrame, canonical: DataFrame,
      mentions: DataFrame): DataFrame = {
    val req = broadcast(requests.select(col("request_id")))
    val canonMentions = mentions.where(col("canonical_entity_id").isNotNull)
    // the (request, canonical-id) pair set is the shared subtree: the
    // document arm joins it to the canonical frame, while the doc-hit
    // marker needs only its request ids — deriving the marker BEFORE
    // the canonical join keeps the big mention scan a single reusable
    // exchange instead of re-running the wider join for both branches
    val docPairs = canonMentions
      .join(req, col("document_id") === col("request_id"), "inner")
      .select(col("request_id"), col("canonical_entity_id").as("id"))
      .distinct()
    val docArm = docPairs
      .join(canonical, Seq("id"))
      .select(col("request_id"), lit("document").as("arm"), col("id"),
        col("name"), col("type"), col("quality_score"), col("is_validated"),
        lit(null).cast("long").as("n_mentions"))
    val docHits = docPairs.select(col("request_id")).distinct()
    val entityReq = req.join(broadcast(docHits), Seq("request_id"),
      "left_anti")
    val mentionCounts = canonMentions
      .join(broadcast(entityReq),
        col("canonical_entity_id") === col("request_id"), "inner")
      .groupBy(col("canonical_entity_id"))
      .agg(count(lit(1)).as("n_mentions"))
    val entityArm = canonical
      .join(broadcast(entityReq), col("id") === col("request_id"), "inner")
      .join(mentionCounts.withColumnRenamed("canonical_entity_id", "id"),
        Seq("id"), "left")
      .select(col("request_id"), lit("entity").as("arm"), col("id"),
        col("name"), col("type"), col("quality_score"), col("is_validated"),
        coalesce(col("n_mentions"), lit(0L)).as("n_mentions"))
    docArm.unionByName(entityArm)
  }

  /** POST /entities/ (entities.py:188-253), batched: each request
    * lands in one arm — 'no_document' (the 404), 'duplicate' (the 400
    * on exact document+name+type match), or 'created' (with
    * manually_created set when the request was manual, and the parent
    * document flipped to pending_review). */
  def createMentions(docs: DataFrame, existing: DataFrame,
      requests: DataFrame): DataFrame = {
    val req = requests.select(col("request_id"), col("document_id"),
      col("entity_name"), col("entity_type"), col("confidence"),
      col("manual"))
    // both big sides reduce to the curation-sized request set first
    val docHit = docs.select(col("document_id")).distinct()
      .join(broadcast(req.select(col("document_id")).distinct()),
        Seq("document_id"), "left_semi")
      .withColumn("_doc_ok", lit(true))
    val dupHit = existing
      .select(col("document_id"), col("entity_name"), col("entity_type"))
      .join(broadcast(req.select(col("document_id"), col("entity_name"),
        col("entity_type")).distinct()),
        Seq("document_id", "entity_name", "entity_type"), "left_semi")
      .distinct()
      .withColumn("_dup", lit(true))
    // intra-batch duplicates: applying the endpoint call-by-call, the
    // FIRST identical (doc, name, type) request creates and every
    // later one is the duplicate 400 — order fixed as ascending
    // request_id
    val order = Window
      .partitionBy(col("document_id"), col("entity_name"),
        col("entity_type"))
      .orderBy(col("request_id"))
    req.join(broadcast(docHit), Seq("document_id"), "left")
      .join(broadcast(dupHit),
        Seq("document_id", "entity_name", "entity_type"), "left")
      .withColumn("_nth", row_number().over(order))
      .select(col("request_id"), col("document_id"),
        when(col("_doc_ok").isNull, lit("no_document"))
          .when(col("_dup").isNotNull || col("_nth") > 1,
            lit("duplicate"))
          .otherwise(lit("created")).as("arm"),
        col("entity_name"), col("entity_type"), col("confidence"),
        when(col("_doc_ok").isNotNull && col("_dup").isNull &&
          col("_nth") === 1 && col("manual"), lit(true))
          .as("manually_created"),
        when(col("_doc_ok").isNotNull && col("_dup").isNull &&
          col("_nth") === 1, lit("pending_review")).as("doc_status"))
  }

  /** PUT /entities/{id} (entities.py:254-337), batched: requested
    * fields overwrite only when present (None leaves the stored value
    * — the reference's `if request.x is not None` ladder), metadata
    * merges new-wins over the existing map only when merge_metadata
    * AND the existing map is truthy, and the edit history's `original`
    * snapshot (old name/type/confidence) surfaces as columns. Every
    * touched mention's document flips to pending_review (rides along
    * as doc_status on every row of that document). */
  def updateMentions(mentions: DataFrame, updates: DataFrame): DataFrame = {
    // collapse duplicate entity_ids BEFORE the join — two updates for
    // one mention must not multiply its row. Maps aren't orderable, so
    // the deterministic pick orders on the scalar fields plus the
    // metadata rendered to a sorted k=v string (the reference's
    // call-by-call usage is one update per entity anyway).
    val mdKey = array_join(transform(
      array_sort(map_keys(coalesce(col("new_metadata"),
        map().cast("map<string,string>")))),
      k => concat(k, lit("="), element_at(col("new_metadata"), k))), ",")
    val pick = Window.partitionBy(col("entity_id")).orderBy(
      struct(col("new_name"), col("new_type"), col("new_confidence"),
        col("merge_metadata"), mdKey.as("_mdk")).desc)
    val up = broadcast(updates.select(col("entity_id"), col("new_name"),
      col("new_type"), col("new_confidence"), col("new_metadata"),
      col("merge_metadata"))
      .withColumn("_rn", row_number().over(pick))
      .where(col("_rn") === 1).drop("_rn")
      .withColumn("_edit", lit(true)))
    val j = mentions.join(up, Seq("entity_id"), "left")
    val touched = Window.partitionBy(col("document_id"))
    val merged = when(col("new_metadata").isNull, col("metadata"))
      .when(col("merge_metadata") && col("metadata").isNotNull &&
        size(col("metadata")) > 0,
        map_concat(map_filter(col("metadata"),
          (k, _) => !array_contains(map_keys(col("new_metadata")), k)),
          col("new_metadata")))
      .otherwise(col("new_metadata"))
    j.withColumn("_doc_touched",
        max(when(col("_edit"), 1).otherwise(0)).over(touched))
      .select(col("entity_id"), col("document_id"),
        when(col("_edit") && col("new_name").isNotNull, col("new_name"))
          .otherwise(col("entity_name")).as("entity_name"),
        when(col("_edit") && col("new_type").isNotNull, col("new_type"))
          .otherwise(col("entity_type")).as("entity_type"),
        when(col("_edit") && col("new_confidence").isNotNull,
          col("new_confidence")).otherwise(col("confidence"))
          .as("confidence"),
        when(col("_edit"), merged).otherwise(col("metadata")).as("metadata"),
        when(col("_edit"), col("entity_name")).as("old_name"),
        when(col("_edit"), col("entity_type")).as("old_type"),
        when(col("_edit"), col("confidence")).as("old_confidence"),
        when(col("_edit"), lit(true)).as("manually_edited"),
        when(col("_doc_touched") === 1, lit("pending_review"))
          .as("doc_status"))
  }

  /** DELETE /entities/{id} (entities.py:338-373), batched: deleted
    * mentions drop out and every touched document flips to
    * pending_review on its surviving rows. */
  def deleteMentions(mentions: DataFrame, deletes: DataFrame): DataFrame = {
    val del = broadcast(deletes.select(col("entity_id"),
      lit(true).as("_del")))
    val touched = Window.partitionBy(col("document_id"))
    mentions.join(del, Seq("entity_id"), "left")
      .withColumn("_doc_touched",
        max(when(col("_del"), 1).otherwise(0)).over(touched))
      .where(col("_del").isNull)
      .select(col("entity_id"), col("document_id"), col("entity_name"),
        col("entity_type"), col("confidence"),
        when(col("_doc_touched") === 1, lit("pending_review"))
          .as("doc_status"))
  }

  /** GET /entities/documents/{id}/entities (entities.py:583-645): the
    * per-document entity report — total count and the by-type census
    * (the reference's entities_by_type keys with their group sizes),
    * after the optional type filter. Unlike the listing, min_confidence
    * is accepted by the route but never applied (:587-597 reads it and
    * drops it — faithful). */
  def documentEntityReport(canonical: DataFrame, mentions: DataFrame,
      entityType: Option[String] = None): DataFrame = {
    val ids = mentions.where(col("canonical_entity_id").isNotNull)
      .select(col("document_id"), col("canonical_entity_id").as("id"))
      .distinct()
    val joined = ids.join(canonical, Seq("id"))
    val typed = entityType.fold(joined)(t => joined.where(col("type") === t))
    typed.groupBy(col("document_id"), col("type"))
      .agg(count(lit(1)).as("n_of_type"))
      .withColumn("total_entities",
        sum(col("n_of_type")).over(Window.partitionBy(col("document_id"))))
      .select(col("document_id"), col("type"), col("n_of_type"),
        col("total_entities"))
  }
}
