package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.LlmResponse

/** The reference's root-level maintenance scripts — the user-run batch
  * jobs an operator fires against an accumulated store — re-expressed
  * as Spark batch operators over the same frames:
  *
  *   - [[cleanupDuplicateRelationships]] —
  *     cleanup_duplicate_relationships.py:40-100
  *   - [[migrateRelationshipTypes]] — migrate_relationship_types.py:23-92
  *   - [[resetStuckDocuments]] — reset_stuck_documents.py:24-46
  *   - [[backfillCanonicalIds]] — backfill_canonical_ids.py:23-112
  *     (+ the upsert map it calls, supabase_service.py:467-556)
  *
  * Scale: these are exactly Spark-shaped — each is one windowed
  * aggregation or a few key-equi-joins over the store-sized frame, no
  * driver-side loops (the reference scripts iterate rows client-side;
  * at 100 TB the window/join forms below are the only viable shape).
  */
object Maintenance {

  /** Duplicate-relationship cleanup census
    * (cleanup_duplicate_relationships.py:40-100).
    *
    * Groups by (source_entity_id, target_entity_id,
    * relationship_type) and ranks each group by the script's
    * keep-priority ladder (:60-76), highest first:
    *   1. manually-created — is_verified OR metadata.manual OR a
    *      missing/blank metadata.document_id (":66 No document_id
    *      likely means manual"); Python-falsy on the stored values,
    *      so null and '' both count as missing;
    *   2. created_at, most recent first (ISO strings — lexicographic
    *      order IS time order; a missing created_at sorts as ''
    *      (:68), i.e. last);
    *   3. confidence_score, highest first (missing → 0, :69).
    * Rank 1 in a multi-row group keeps, the rest delete; singleton
    * groups are never examined by the script (`untouched`).
    *
    * Deterministic deviation: Python's stable sort breaks full ties
    * by fetch order, which no engine can reproduce — ties here break
    * by ascending id (pinned, so reruns keep the same row).
    *
    * Input columns: id, source_entity_id, target_entity_id,
    * relationship_type, is_verified (bool), meta_manual (bool),
    * meta_document_id, created_at (ISO string), confidence_score.
    * Output: one row per relationship with is_manual, group_size,
    * keep_rank, action ∈ keep|delete|untouched.
    *
    * One shuffle on the (source, target, type) key; the ladder is a
    * single window pass — at 100 TB this is the plan (the script's
    * client-side defaultdict cannot be). */
  def cleanupDuplicateRelationships(rels: DataFrame): DataFrame = {
    val isManual = coalesce(col("is_verified"), lit(false)) ||
      coalesce(col("meta_manual"), lit(false)) ||
      col("meta_document_id").isNull || col("meta_document_id") === ""
    val grp = Window.partitionBy(
      col("source_entity_id"), col("target_entity_id"),
      col("relationship_type"))
    val ladder = grp.orderBy(
      col("is_manual").desc,
      coalesce(col("created_at"), lit("")).desc,
      coalesce(col("confidence_score"), lit(0.0)).desc,
      col("id").asc)
    rels
      .withColumn("is_manual", isManual)
      .withColumn("group_size", count(lit(1)).over(grp))
      .withColumn("keep_rank", row_number().over(ladder))
      .withColumn("action",
        when(col("group_size") === 1, lit("untouched"))
          .when(col("keep_rank") === 1, lit("keep"))
          .otherwise(lit("delete")))
      .select(col("id"), col("source_entity_id"), col("target_entity_id"),
        col("relationship_type"), col("is_manual"), col("group_size"),
        col("keep_rank"), col("action"))
  }

  /** The script's closing log lines (:95-100, :127-131) as one
    * summary row: total fetched, groups with duplicates, rows to
    * delete, and the post-delete count. */
  def cleanupSummary(census: DataFrame): DataFrame =
    census.agg(
      count(lit(1)).as("total"),
      count_distinct(when(col("action") =!= "untouched",
        struct(col("source_entity_id"), col("target_entity_id"),
          col("relationship_type")))).as("groups_with_duplicates"),
      sum(when(col("action") === "delete", 1L).otherwise(0L))
        .as("to_delete"),
      sum(when(col("action") =!= "delete", 1L).otherwise(0L))
        .as("final_count"))

  /** Relationship-type vocabulary migration
    * (migrate_relationship_types.py:23-92): every stored type runs
    * through [[RelationshipTypes.canonicalize]]; rows already at
    * their canonical form count `already_canonical` (:52-55), the
    * rest update to the canonical type (`migrated`). A missing
    * type reads as '' (:47) — non-canonical, so it migrates to
    * RELATES_TO.
    *
    * Input: id, relationship_type. Output: id, from_type (the ''
    * read the script compares against), to_type, action. Pure per-row
    * projection — no shuffle at any scale. */
  def migrateRelationshipTypes(rels: DataFrame): DataFrame = {
    val from = coalesce(col("relationship_type"), lit(""))
    val to = RelationshipTypes.canonicalize(col("relationship_type"))
    rels.select(col("id"), from.as("from_type"), to.as("to_type"),
      when(from === to, lit("already_canonical"))
        .otherwise(lit("migrated")).as("action"))
  }

  /** The migration report's non-standard-type histogram
    * (migrate_relationship_types.py:88-92), most frequent first —
    * Python's stable sort keeps first-seen order inside a count tie
    * (fetch order, unreproducible); ties here break by from_type
    * (pinned deterministic deviation). */
  def migrateSummary(census: DataFrame): DataFrame =
    census.where(col("action") === "migrated")
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("from_type"))

  /** Stuck-document reset (reset_stuck_documents.py:24-46): documents
    * sitting in `processing` reset to `discovered`. The listing's
    * display title is the script's dict.get fallback chain
    * (`title` → `name` → 'Untitled', :31) — the stored documents
    * schema has no title column (document.py:62-79), so a null
    * `title` input models the absent key and the chain lands on
    * `name`.
    *
    * Input: id, status, title, name. Output: the stuck rows only,
    * with display_title and the applied transition. Filter pushes to
    * the scan (status = 'processing'); no shuffle. */
  def resetStuckDocuments(docs: DataFrame): DataFrame =
    docs.where(col("status") === "processing")
      .select(col("id"),
        coalesce(col("title"), col("name"), lit("Untitled"))
          .as("display_title"),
        col("status").as("old_status"),
        lit("discovered").as("new_status"))

  /** Canonical-id backfill (backfill_canonical_ids.py:23-112) over
    * the unassigned mentions, plus the deterministic core of the
    * upsert map it resolves against
    * (supabase_service.upsert_canonical_entities_map:467-556).
    *
    * Per unassigned mention (canonical_entity_id IS NULL):
    *   - name = text stripped (Python unicode strip); blank →
    *     skipped entirely (:47-48) — `skipped_blank`;
    *   - normalized type = upper(strip(type)), with Python-falsy
    *     (null, '') → CONCEPT (:51); a whitespace-only type is
    *     truthy and strips to '' — the script then looks the group
    *     up under ('name', '') while the map was keyed under
    *     CONCEPT (the upsert re-defaults falsy types, :476), so
    *     those mentions NEVER resolve (:92-96's warning arm) —
    *     `unmatched`;
    *   - groups key on (lower(name), normalized type); the group's
    *     display name is the first fetched (:52-57) — modeled as the
    *     min-mention-id row (deterministic deviation, fetch order);
    *   - resolution ladder (upsert :479-500): a validated canonical
    *     with the same exact-case name (any type) wins; else the
    *     exact (name, TYPE) row; else the exact (name, lowercased
    *     type) row (get_canonical_entity's casing ladder :387-413,
    *     `limit 1` pinned to min id); else a new canonical is minted
    *     — surrogate id `ce:<lower name>:<TYPE>` standing in for the
    *     store's uuid;
    *   - every grouped mention then resolves through the map's own
    *     base keys (:522-526 writes both casings, so the :87-90
    *     upper-or-lower lookup always hits) — `assigned`.
    *
    * Deviations (documented): Spark's collect_set drops null raw
    * types from the alias set (a null type normalizes to CONCEPT and
    * carries no alias value); cross-group alias-key overwrites in the
    * reference map are fetch-order-dependent and unmodeled — each
    * group resolves through its own base keys.
    *
    * Inputs — mentions: mention_id, text, mtype,
    * canonical_entity_id; canonicals: id, name, ctype, is_validated.
    * Output: one row per unassigned mention — mention_id,
    * entity_name, entity_type, canonical_id, created (minted this
    * run), action ∈ assigned|skipped_blank|unmatched.
    *
    * Scale: groups are vocabulary-sized; three broadcast-able joins
    * against the canonical store (name-keyed — co-partitioned shuffle
    * joins at 100 TB) and one group→mention equi-join back. */
  def backfillCanonicalIds(mentions: DataFrame,
      canonicals: DataFrame): DataFrame = {
    val unassigned = mentions.where(col("canonical_entity_id").isNull)
      .select(col("mention_id"), col("text"), col("mtype"))
    val named = unassigned
      .withColumn("_name", trim(col("text"), LlmResponse.ws))
      .withColumn("_norm",
        when(col("mtype").isNull || col("mtype") === "", lit("CONCEPT"))
          .otherwise(upper(trim(col("mtype"), LlmResponse.ws))))
    val blank = named.where(col("_name") === "")
      .select(col("mention_id"),
        col("_name").as("entity_name"), col("_norm").as("entity_type"),
        lit(null).cast("string").as("canonical_id"),
        lit(false).as("created"), lit("skipped_blank").as("action"))
    val grouped = named.where(col("_name") =!= "")
      .select(lower(col("_name")).as("_key_name"), col("_norm"),
        col("_name"), col("mention_id"))
      .groupBy(col("_key_name"), col("_norm"))
      .agg(min_by(col("_name"), col("mention_id")).as("_disp"))
    // upsert ladder — the three store probes, each reduced to one
    // deterministic row per name(-type) key (`limit 1` → min id)
    val validated = canonicals.where(col("is_validated"))
      .groupBy(col("name")).agg(min(col("id")).as("_vid"))
      .select(col("name").as("_disp"), col("_vid"))
    val exact = canonicals.groupBy(col("name"), col("ctype"))
      .agg(min(col("id")).as("_eid"))
    val exactU = exact.select(col("name").as("_disp"),
      col("ctype").as("_utype"), col("_eid").as("_uid"))
    val exactL = exact.select(col("name").as("_disp"),
      col("ctype").as("_lkey"), col("_eid").as("_lid"))
    // the upsert re-defaults a falsy normalized type to CONCEPT
    // (supabase_service.py:476) — the map keys under THIS type while
    // the backfill looks up under the pre-default one
    val resolved = grouped
      .withColumn("_utype",
        when(col("_norm") === "", lit("CONCEPT")).otherwise(col("_norm")))
      .withColumn("_lkey", lower(col("_utype")))
      .join(validated, Seq("_disp"), "left")
      .join(exactU, Seq("_disp", "_utype"), "left")
      .join(exactL, Seq("_disp", "_lkey"), "left")
      .withColumn("_cid",
        coalesce(col("_vid"), col("_uid"), col("_lid"),
          concat(lit("ce:"), col("_key_name"), lit(":"), col("_utype"))))
      .withColumn("_created",
        col("_vid").isNull && col("_uid").isNull && col("_lid").isNull)
    named.where(col("_name") =!= "")
      .withColumn("_key_name", lower(col("_name")))
      .join(resolved.select(col("_key_name"), col("_norm"), col("_cid"),
        col("_created")), Seq("_key_name", "_norm"))
      .select(col("mention_id"), col("_name").as("entity_name"),
        col("_norm").as("entity_type"),
        // the '' normalized type misses the CONCEPT-keyed map —
        // backfill_canonical_ids.py:87-96's unresolved arm
        when(col("_norm") === "", lit(null).cast("string"))
          .otherwise(col("_cid")).as("canonical_id"),
        when(col("_norm") === "", lit(false)).otherwise(col("_created"))
          .as("created"),
        when(col("_norm") === "", lit("unmatched"))
          .otherwise(lit("assigned")).as("action"))
      .unionByName(blank)
  }

  /** fix_entity_types.py's 27-entry wrong→prescribed mapping
    * (:12-50), keyed lowercase because the script compares
    * `current_type.lower() == incorrect.lower()` (:100-103). */
  val entityTypeFixMap: Map[String, String] = Map(
    "issuetype" -> "problem", "issue" -> "problem", "error" -> "problem",
    "symptom" -> "problem", "defect" -> "problem", "failure" -> "problem",
    "hardwareconnection" -> "component", "connection" -> "component",
    "connector" -> "component", "hardware" -> "component",
    "cleaningagent" -> "chemical", "cleaner" -> "chemical",
    "substance" -> "chemical", "solvent" -> "chemical",
    "method" -> "procedure", "process" -> "procedure",
    "technique" -> "procedure", "step" -> "procedure",
    "equipment" -> "tool", "instrument" -> "tool", "device" -> "tool",
    "supply" -> "material", "consumable" -> "material",
    "resource" -> "material",
    "status" -> "condition", "quality" -> "condition",
    "degradation" -> "condition")

  /** fix_entity_types.py's 20-entry prescribed vocabulary (:53-60) —
    * NOT the extractor's taxonomy (operators/Entities.scala models
    * that one); this script carries its own copy. */
  val prescribedEntityTypes: Seq[String] = Seq(
    "person", "organization", "location", "date", "product",
    "component", "technology", "chemical", "procedure",
    "specification", "system", "measurement", "problem",
    "condition", "state", "tool", "material", "concept",
    "event", "other")

  /** Entity-type fix batch (fix_entity_types.py:63-150).
    *
    * Per mention row the script reads
    * `(entity_type or type or '').strip()` — Python-or, so a null or
    * EMPTY entity_type falls through to `type`, while a
    * whitespace-only one is truthy, is taken, and strips to ''
    * (:73-75). Then:
    *   - truthy + lower not prescribed → the case-insensitive
    *     [[entityTypeFixMap]] arm, unknown → 'other' (:96-107);
    *   - lower prescribed → lowercase if the case differs (:121-134),
    *     else untouched (`already_valid`);
    *   - falsy → 'other' (:136-147).
    * Every non-`already_valid` arm counts `fixed` — even when the
    * record has NEITHER type column, because the `fixed += 1` sits
    * outside the `if update_data:` guard (:117, :134, :147); the
    * write lands only on the columns the record actually has
    * (`wrote_*`).
    *
    * Input: id, entity_type, type, has_entity_type, has_type (the
    * two flags model dict-key presence — a stored row missing the
    * column entirely vs holding NULL reads the same but writes
    * differently). Output: per-row census — id, current_type (the
    * stripped read), new_type, action ∈ mapped | defaulted_unknown |
    * case_normalized | already_valid | defaulted_missing,
    * wrote_entity_type, wrote_type.
    *
    * Pure per-row projection against two broadcast-literal maps — no
    * shuffle at any scale (the script is a full-table client-side
    * loop with one UPDATE per fixed row; at 100 TB this projection
    * plus one PK-merge write is the only viable shape). */
  def fixEntityTypes(mentions: DataFrame): DataFrame = {
    def truthy(c: org.apache.spark.sql.Column) = c.isNotNull && c =!= ""
    val raw = when(truthy(col("entity_type")), col("entity_type"))
      .when(truthy(col("type")), col("type")).otherwise(lit(""))
    val cur = trim(raw, LlmResponse.ws)
    val low = lower(cur)
    val mapped = element_at(typedLit(entityTypeFixMap), low)
    val prescribed = low.isin(prescribedEntityTypes: _*)
    val action =
      when(cur =!= "" && !prescribed,
        when(mapped.isNotNull, lit("mapped"))
          .otherwise(lit("defaulted_unknown")))
      .when(prescribed && cur =!= low, lit("case_normalized"))
      .when(prescribed, lit("already_valid"))
      .otherwise(lit("defaulted_missing"))
    val newType =
      when(cur =!= "" && !prescribed, coalesce(mapped, lit("other")))
      .when(prescribed, low)
      .otherwise(lit("other"))
    val writes = action =!= "already_valid"
    mentions.select(col("id"), cur.as("current_type"),
      newType.as("new_type"), action.as("action"),
      (writes && coalesce(col("has_entity_type"), lit(false)))
        .as("wrote_entity_type"),
      (writes && coalesce(col("has_type"), lit(false))).as("wrote_type"))
  }

  /** The script's closing report (:150-160): total / fixed /
    * already_valid, where `fixed` is every acted-on row regardless of
    * whether a column existed to write. */
  def fixEntityTypesSummary(census: DataFrame): DataFrame =
    census.agg(count(lit(1)).as("total"),
      sum(when(col("action") =!= "already_valid", 1L).otherwise(0L))
        .as("fixed"),
      sum(when(col("action") === "already_valid", 1L).otherwise(0L))
        .as("already_valid"))

  /** The report's type-distribution lines (:157-160): counts keyed by
    * the TRUTHY stripped reads (:78-80 counts before fixing; falsy
    * reads — including whitespace-only strips — never count). */
  def entityTypeDistribution(census: DataFrame): DataFrame =
    census.where(col("current_type") =!= "")
      .groupBy(col("current_type")).agg(count(lit(1)).as("n"))
}
