package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The relationship-curation tier: the mutations of
  * app/api/relationships.py over a `canonical_relationships` frame —
  * create (relationships.py:49-92), partial update (:101-160), delete
  * (:168-190), bulk approve (:200-226) and bulk reject (:234-257).
  *
  * Semantics ported exactly, including the quirks:
  *   - create NEVER stores document_id as a column — a truthy
  *     document_id lands in metadata.document_context so manual
  *     relationships survive document reprocessing
  *     (relationships.py:55-61); metadata additionally gains
  *     manual=true and created_via=api, and a null confidence takes
  *     the request-model default 1.0.
  *   - update is field-by-field partial: approved=true sets
  *     is_verified AND stamps verified_at; approved=false clears
  *     is_verified but leaves verified_at untouched
  *     (relationships.py:122-126). A metadata update REPLACES the
  *     whole map (:128-129), unlike the bulk ops, which MERGE one key.
  *   - bulk approve merges review_rationale into the existing
  *     metadata only when the rationale is truthy (non-empty);
  *     bulk reject always sets proposal_rejected=true, merges a
  *     truthy rationale, and clears is_verified — but never touches
  *     verified_at.
  *
  * Metadata is modelled as `map<string,string>` (the reference's JSON
  * dict); a merge is map_filter-out-then-concat, so re-approving
  * overwrites the key exactly as Python dict assignment does.
  *
  * Scale posture: every mutation is a narrow projection over the
  * relationships frame; the bulk ops take the id roster as a FRAME
  * and broadcast it (the reference loops one DB UPDATE per id —
  * engine-side that is a broadcast hash LEFT join, never a shuffle of
  * the corpus-sized relationship table), and create is a union with
  * the curation-sized request frame. Nothing here repartitions.
  */
object RelationshipCuration {

  private val emptyMap: Column = map().cast("map<string,string>")

  /** Python `meta[k] = v` on a possibly-absent dict: drop any
    * existing key, then concat — overwrite, never duplicate. */
  private def setKey(m: Column, k: String, v: Column): Column =
    map_concat(
      map_filter(coalesce(m, emptyMap), (key, _) => key =!= lit(k)),
      map(lit(k), v))

  /** POST / (relationships.py:49-92): append the curation-sized
    * `requests` frame (id, document_id, source_entity_id,
    * target_entity_id, relationship_type, confidence_score, metadata)
    * as pre-verified manual relationships. `now` is the caller's
    * utcnow isoformat — a parameter so results stay deterministic. */
  def create(rels: DataFrame, requests: DataFrame, now: String): DataFrame = {
    // Python truthiness on document_id: null AND "" both skip the
    // document_context key — and a caller-supplied document_context
    // then SURVIVES (relationships.py:59-61 only assigns the key
    // inside the truthy branch; manual/created_via are unconditional)
    val docIdTruthy = col("document_id").isNotNull && col("document_id") =!= ""
    val withStamps = setKey(setKey(coalesce(col("metadata"), emptyMap),
      "manual", lit("true")), "created_via", lit("api"))
    val stamped = when(docIdTruthy,
      setKey(withStamps, "document_context", col("document_id")))
      .otherwise(withStamps)
    val rows = requests.select(
      col("id"),
      col("source_entity_id"), col("target_entity_id"),
      col("relationship_type"),
      coalesce(col("confidence_score"), lit(1.0)).as("confidence_score"),
      lit(true).as("is_verified"),
      lit(now).as("verified_at"),
      stamped.as("metadata"),
      lit(now).as("created_at"))
    rels.unionByName(rows)
  }

  /** PUT /{id} (relationships.py:101-160): partial update — None
    * fields skip; approved=true stamps verified_at, approved=false
    * does not; a metadata value replaces the whole map. */
  def update(rels: DataFrame, relationshipId: String,
      relationshipType: Option[String] = None,
      sourceEntityId: Option[String] = None,
      targetEntityId: Option[String] = None,
      confidenceScore: Option[Double] = None,
      approved: Option[Boolean] = None,
      metadata: Option[Map[String, String]] = None,
      now: String = ""): DataFrame = {
    val hit = col("id") === lit(relationshipId)
    def set(df: DataFrame, c: String, v: Column): DataFrame =
      df.withColumn(c, when(hit, v).otherwise(col(c)))
    var out = rels
    relationshipType.foreach(v => out = set(out, "relationship_type", lit(v)))
    sourceEntityId.foreach(v => out = set(out, "source_entity_id", lit(v)))
    targetEntityId.foreach(v => out = set(out, "target_entity_id", lit(v)))
    confidenceScore.foreach(v => out = set(out, "confidence_score", lit(v)))
    approved.foreach { a =>
      out = set(out, "is_verified", lit(a))
      if (a) out = set(out, "verified_at", lit(now))
    }
    metadata.foreach { m =>
      val entries = m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      val asMap = if (entries.isEmpty) emptyMap else map(entries: _*)
      out = set(out, "metadata", asMap)
    }
    out
  }

  /** DELETE /{id} (relationships.py:168-190). The endpoint's 404 on a
    * missing id is a fetch-tier concern; frame-level delete is the
    * filter. */
  def delete(rels: DataFrame, relationshipId: String): DataFrame =
    rels.where(col("id") =!= lit(relationshipId))

  /** POST /bulk-approve (relationships.py:200-226): every rostered id
    * verifies with a fresh verified_at; a truthy rationale merges
    * into metadata.review_rationale. `ids` needs one column `id`. */
  def bulkApprove(rels: DataFrame, ids: DataFrame,
      rationale: Option[String], now: String): DataFrame = {
    val hit = bulkHit(rels, ids)
    val merged = rationale.filter(_.nonEmpty) match {
      case Some(r) => when(col("_hit"), setKey(col("metadata"),
        "review_rationale", lit(r))).otherwise(col("metadata"))
      case None => col("metadata")
    }
    hit
      .withColumn("is_verified", when(col("_hit"), lit(true))
        .otherwise(col("is_verified")))
      .withColumn("verified_at", when(col("_hit"), lit(now))
        .otherwise(col("verified_at")))
      .withColumn("metadata", merged)
      .drop("_hit")
  }

  /** POST /bulk-reject (relationships.py:234-257): every rostered id
    * gains metadata.proposal_rejected=true (plus a truthy rationale)
    * and clears is_verified; verified_at is left as-is. */
  def bulkReject(rels: DataFrame, ids: DataFrame,
      rationale: Option[String]): DataFrame = {
    val hit = bulkHit(rels, ids)
    val withFlag = setKey(col("metadata"), "proposal_rejected", lit("true"))
    val merged = rationale.filter(_.nonEmpty) match {
      case Some(r) => setKey(withFlag, "review_rationale", lit(r))
      case None => withFlag
    }
    hit
      .withColumn("metadata", when(col("_hit"), merged)
        .otherwise(col("metadata")))
      .withColumn("is_verified", when(col("_hit"), lit(false))
        .otherwise(col("is_verified")))
      .drop("_hit")
  }

  /** Roster membership as a broadcast LEFT join — `_hit` true iff the
    * row's id is rostered. Distinct first: a duplicated roster id
    * must not fan out the relationship row. */
  private def bulkHit(rels: DataFrame, ids: DataFrame): DataFrame =
    rels.join(
      broadcast(ids.select(col("id").as("_rid")).distinct()
        .withColumn("_hit", lit(true))),
      col("id") === col("_rid"), "left")
      .withColumn("_hit", coalesce(col("_hit"), lit(false)))
      .drop("_rid")

  /** Seq convenience overloads for API-sized rosters. */
  def bulkApprove(rels: DataFrame, ids: Seq[String],
      rationale: Option[String], now: String): DataFrame = {
    val spark = rels.sparkSession
    import spark.implicits._
    bulkApprove(rels, ids.toDF("id"), rationale, now)
  }

  def bulkReject(rels: DataFrame, ids: Seq[String],
      rationale: Option[String]): DataFrame = {
    val spark = rels.sparkSession
    import spark.implicits._
    bulkReject(rels, ids.toDF("id"), rationale)
  }
}
