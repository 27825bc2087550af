package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical-entity metric refresh
  * (reference app/services/supabase_service.py:830-972
  * `refresh_canonical_entity_metrics`).
  *
  * Recomputes mention/document/relationship counts and the quality
  * score for a *requested* set of canonical entities, and folds the
  * derived fields into each entity's metadata. The reference runs one
  * table update per id; here the whole refresh is a single frame
  * rewrite whose update side is bounded by the request size (an API
  * call's id list), so it broadcasts against an arbitrarily large
  * `canonical_entities` table.
  *
  * Reference semantics reproduced exactly:
  *
  *  - the id list is truthiness-filtered and de-duplicated
  *    (`sorted({cid for cid in canonical_ids if cid})`, :837);
  *  - mentions aggregate per canonical id: row count, the set of
  *    truthy `str(document_id)` values, and the numeric-confidence
  *    sum/sample-count (:880-904) — a NULL confidence is skipped
  *    exactly like the reference's `isinstance` check;
  *  - relationship rows are fetched once by source id and once by
  *    target id and *concatenated* (:923), then every endpoint of
  *    every copy that is in the requested set gains a count (:931-937)
  *    — so a relationship between two requested entities counts twice
  *    per endpoint and a requested self-loop counts four times; the
  *    truthy `metadata.document_id` joins the relationship-document
  *    set on the same multiplicity;
  *  - `quality_score` is the clamped mention-confidence average; with
  *    zero numeric samples it falls back to the entity's existing
  *    `metadata.quality_score` and then to 0.5 (:945-949, :963) — a
  *    non-numeric stored value falls to 0.5 here where the reference
  *    would raise out of the whole refresh;
  *  - metadata gains `document_ids` / `relationship_document_ids`
  *    only when non-empty (:954-957; sorted, rendered comma-joined in
  *    this frame's map<string,string> idiom), always gains
  *    `last_refreshed_at` (:958), and gains `description` only for
  *    ids in the description-update map (:959-960);
  *  - requested ids with no `canonical_entities` row update nothing
  *    (the reference's `.eq(id)` hits zero rows), and non-requested
  *    rows pass through bit-identical — including a NULL metadata,
  *    which is only coalesced to `{}` on the updated arm (:841-847).
  */
object CanonicalMetrics {

  private val emptyMap: Column = map().cast("map<string,string>")

  /** Python `meta[k] = v`: drop any existing key, then concat. */
  private def setKey(m: Column, k: String, v: Column): Column =
    map_concat(map_filter(m, (key, _) => key =!= lit(k)), map(lit(k), v))

  /** `if x:` on a string column. */
  private def truthy(c: Column): Column = c.isNotNull && c =!= ""

  /** Refresh metrics for the requested ids.
    *
    * @param entities      canonical_entities frame: `id`,
    *                      `mention_count`, `document_count`,
    *                      `relationship_count`, `quality_score`,
    *                      `metadata: map<string,string>`
    * @param mentions      entity_mentions frame: `canonical_entity_id`,
    *                      `document_id`, `confidence`
    * @param relationships canonical_relationships frame:
    *                      `source_entity_id`, `target_entity_id`,
    *                      `metadata: map<string,string>` (the
    *                      reference keeps the owning document id under
    *                      the `document_id` key, :927-929)
    * @param ids           requested canonical ids (first column used)
    * @param descriptionUpdates (id, description) pairs — the
    *                      reference's `description_updates` dict
    * @param stamp         `last_refreshed_at` value (the reference
    *                      stamps `datetime.utcnow().isoformat()`;
    *                      a parameter so results stay deterministic)
    */
  def refresh(entities: DataFrame, mentions: DataFrame,
              relationships: DataFrame, ids: DataFrame,
              descriptionUpdates: DataFrame, stamp: String): DataFrame = {
    val req = broadcast(
      ids.select(col(ids.columns.head).as("_cid"))
        .where(truthy(col("_cid"))).distinct())

    // Mentions aggregation (:880-904). collect_set drops the nulls the
    // truthiness guard produces; sort_array gives the reference's
    // sorted() order.
    val mAgg = mentions
      .join(req, mentions("canonical_entity_id") === req("_cid"), "leftsemi")
      .groupBy(col("canonical_entity_id").as("_mid"))
      .agg(
        count(lit(1)).as("_mention_count"),
        sort_array(collect_set(
          when(truthy(col("document_id").cast("string")),
            col("document_id").cast("string")))).as("_docs"),
        sum(col("confidence").cast("double")).as("_conf_total"),
        count(col("confidence")).as("_conf_samples"))

    // Relationship aggregation (:906-937): the two query arms are
    // concatenated, so a row whose source AND target are both
    // requested is processed twice; each copy then credits every
    // requested endpoint.
    val relCols = relationships.select(
      col("source_entity_id").as("_src"), col("target_entity_id").as("_tgt"),
      element_at(coalesce(col("metadata"), emptyMap), "document_id")
        .as("_rdoc"))
    val copies = relCols.join(req, col("_src") === col("_cid"), "leftsemi")
      .unionByName(
        relCols.join(req, col("_tgt") === col("_cid"), "leftsemi"))
    val rAgg = copies
      .select(explode(array(col("_src"), col("_tgt"))).as("_ep"), col("_rdoc"))
      .join(req, col("_ep") === col("_cid"), "leftsemi")
      .groupBy(col("_ep"))
      .agg(
        count(lit(1)).as("_rel_count"),
        sort_array(collect_set(when(truthy(col("_rdoc")), col("_rdoc"))))
          .as("_rel_docs"))

    // Key *presence* (not value truthiness) gates the description
    // write (`if cid in description_updates`, :959) — _did is the
    // presence marker so a None-valued update still lands.
    val desc = descriptionUpdates.select(
      col(descriptionUpdates.columns.head).as("_did"),
      col(descriptionUpdates.columns(1)).as("_desc"))

    // One assembled update row per requested id — bounded by the
    // request, so it broadcasts against the entities table.
    // req is the row-preserving side of these left joins, so the
    // build-side hint must ride the aggregates (all bounded by the
    // request size).
    val updates = broadcast(req
      .join(broadcast(mAgg), col("_cid") === col("_mid"), "left")
      .join(broadcast(rAgg), col("_cid") === col("_ep"), "left")
      .join(broadcast(desc), col("_cid") === col("_did"), "left")
      .select(
        col("_cid"),
        coalesce(col("_mention_count"), lit(0L)).as("_u_mentions"),
        coalesce(col("_docs"), array().cast("array<string>")).as("_u_docs"),
        col("_conf_total"),
        coalesce(col("_conf_samples"), lit(0L)).as("_u_samples"),
        coalesce(col("_rel_count"), lit(0L)).as("_u_rels"),
        coalesce(col("_rel_docs"), array().cast("array<string>"))
          .as("_u_rel_docs"),
        col("_did"), col("_desc")))

    val hit = col("_cid").isNotNull
    // avg falls back to the stored quality_score, then 0.5 (:945-949).
    val fallback = coalesce(
      element_at(coalesce(entities("metadata"), emptyMap), "quality_score")
        .cast("double"),
      lit(0.5))
    val avg = when(col("_u_samples") > 0,
      col("_conf_total") / col("_u_samples")).otherwise(fallback)
    val clamped = greatest(lit(0.0), least(avg, lit(1.0)))

    val meta0 = coalesce(entities("metadata"), emptyMap)
    val meta1 = when(size(col("_u_docs")) > 0,
      setKey(meta0, "document_ids", array_join(col("_u_docs"), ",")))
      .otherwise(meta0)
    val meta2 = when(size(col("_u_rel_docs")) > 0,
      setKey(meta1, "relationship_document_ids",
        array_join(col("_u_rel_docs"), ","))).otherwise(meta1)
    val meta3 = setKey(meta2, "last_refreshed_at", lit(stamp))
    val meta4 = when(col("_did").isNotNull,
      setKey(meta3, "description", col("_desc"))).otherwise(meta3)

    val passthrough = entities.columns.filterNot(Set(
      "mention_count", "document_count", "relationship_count",
      "quality_score", "metadata").contains)
    entities.join(updates, entities("id") === updates("_cid"), "left")
      .select(
        passthrough.map(entities(_)) ++ Seq(
          when(hit, col("_u_mentions"))
            .otherwise(entities("mention_count")).as("mention_count"),
          when(hit, size(col("_u_docs")).cast("long"))
            .otherwise(entities("document_count")).as("document_count"),
          when(hit, col("_u_rels"))
            .otherwise(entities("relationship_count"))
            .as("relationship_count"),
          when(hit, clamped)
            .otherwise(entities("quality_score")).as("quality_score"),
          when(hit, meta4).otherwise(entities("metadata")).as("metadata")): _*)
  }
}
