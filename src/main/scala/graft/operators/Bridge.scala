package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's API-bridge fetch tier (app/api/bridge.py): the UI
  * never queries the optimized stores directly — bridge endpoints
  * project store rows into the exact JSON shapes the frontend binds
  * to. Re-expressed as frame transforms: each endpoint is a
  * projection/join over the pipeline's output frames, so the same
  * shapes are available at corpus scale (all documents at once)
  * instead of one path-parameter document per HTTP call.
  */
object Bridge {

  /** `GET /documents/{id}/chunks` (bridge.py:25-122): the Qdrant
    * scroll listing, with the endpoint's renames and derived fields —
    * `chunk_text` (renamed from the payload's `text`), `chunk_size` =
    * len(text) (added by the endpoint, not stored), and the final
    * sort by `chunk_number`. Embeddings are excluded by construction
    * (`with_vectors=False`) — callers pass a frame without the vector
    * column.
    */
  def documentChunks(chunks: DataFrame, docCol: String, numberCol: String,
      textCol: String, startCol: String, endCol: String): DataFrame =
    chunks.select(
      col(docCol).as("document_id"),
      col(numberCol).as("chunk_number"),
      col(textCol).as("chunk_text"),
      length(col(textCol)).as("chunk_size"),
      col(startCol).as("start_position"),
      col(endCol).as("end_position"))
      .orderBy(col("document_id"), col("chunk_number"))

  /** `GET /documents/{id}/entities-neo4j` (bridge.py:126-199): the
    * document→entity edge listing with the endpoint's renames
    * (`name`→`entity_name`, `type`→`entity_type`) and its null
    * defaults — record.get(..) defaults of "Unknown" type, 0.0
    * confidences, "MENTIONS" relationship — ordered by
    * (entity_type, entity_name) as the Cypher ORDER BY does.
    *
    * `edges` carries one row per (document, relationship, entity):
    * (docCol, idCol, nameCol, typeCol, confCol, relTypeCol,
    * relConfCol); nullable cells take the endpoint defaults here.
    */
  def documentEntities(edges: DataFrame, docCol: String, idCol: String,
      nameCol: String, typeCol: String, confCol: String,
      relTypeCol: String, relConfCol: String): DataFrame =
    edges.select(
      col(idCol).as("id"),
      coalesce(col(nameCol), lit("")).as("entity_name"),
      coalesce(col(typeCol), lit("Unknown")).as("entity_type"),
      col(docCol).as("document_id"),
      coalesce(col(confCol).cast("double"), lit(0.0)).as("confidence"),
      coalesce(col(relTypeCol), lit("MENTIONS")).as("relationship_type"),
      coalesce(col(relConfCol).cast("double"), lit(0.0))
        .as("relationship_confidence"))
      .orderBy(col("document_id"), col("entity_type"), col("entity_name"))

  /** `GET /documents/{id}/relationships` (bridge.py:202-247): the
    * document's canonical relationship neighborhood — the distinct
    * non-null canonical ids mentioned in the document, then every
    * canonical relationship with EITHER end in that set, deduplicated
    * by relationship id, `confidence` mapped from the stored
    * `confidence_score` (0.0 when null — the `float(.. or 0.0)`
    * arm), sorted by `created_at`.
    *
    * The reference's two `.in_()` fetches + `seen_ids` loop become
    * two equi-joins and a key dedup — the scalable form of an OR-join
    * (an `ON source=id OR target=id` predicate would reject the
    * hash-join strategy and fall back to nested loops at 100 TB).
    *
    * `mentions`: (docCol, canonicalCol nullable). `rels`: (relIdCol,
    * srcCol, dstCol, relTypeCol, scoreCol nullable, createdCol).
    */
  def documentRelationships(mentions: DataFrame, rels: DataFrame,
      docCol: String, canonicalCol: String, relIdCol: String,
      srcCol: String, dstCol: String, relTypeCol: String,
      scoreCol: String, createdCol: String): DataFrame = {
    val ids = mentions
      .where(col(canonicalCol).isNotNull)
      .select(col(docCol).as("document_id"), col(canonicalCol).as("_cid"))
      .distinct()
    val base = rels.select(col(relIdCol).as("id"), col(srcCol).as("_src"),
      col(dstCol).as("_dst"), col(relTypeCol).as("relationship_type"),
      col(scoreCol).as("_score"), col(createdCol).as("created_at"))
    val bySrc = base.join(ids, base("_src") === ids("_cid"))
    val byDst = base.join(ids, base("_dst") === ids("_cid"))
    bySrc.unionByName(byDst)
      .dropDuplicates("document_id", "id")
      .select(col("document_id"), col("id"),
        col("_src").as("source_entity_id"),
        col("_dst").as("target_entity_id"),
        col("relationship_type"),
        coalesce(col("_score").cast("double"), lit(0.0)).as("confidence"),
        col("created_at"))
      .orderBy(col("document_id"), col("created_at"), col("id"))
  }

  /** `GET /documents/{id}/relationship-proposals`
    * (documents.py:536-583): unverified canonical relationships with
    * BOTH ends mentioned in the document, with the endpoint's two
    * optional filters and their Python quirks preserved:
    *
    *   - `type`: case-insensitive equality against
    *     `str(r.get("relationship_type", "")).upper()` — a stored
    *     NULL stringifies to "None", so filtering for type "none"
    *     matches null-typed rows exactly as the reference does;
    *   - `min_conf`: guarded by `if min_conf:` — 0.0 is FALSY in
    *     Python, so the default threshold applies NO filter and
    *     null-confidence rows survive; any positive threshold
    *     compares against `float(confidence_score or 0.0)`.
    *
    * Both-ends membership is an equi-join on the source id plus a
    * LEFT SEMI join on the target id (set containment without row
    * duplication — no OR predicate, so hash strategies survive).
    * Output keeps the raw row shape (`select("*")` in the
    * reference): confidence_score stays nullable, unlike the
    * neighborhood endpoint's 0.0 coalesce.
    */
  def relationshipProposals(mentions: DataFrame, rels: DataFrame,
      docCol: String, canonicalCol: String, relIdCol: String,
      srcCol: String, dstCol: String, relTypeCol: String,
      scoreCol: String, validatedCol: String,
      typeFilter: Option[String] = None,
      minConf: Double = 0.0): DataFrame = {
    val ids = mentions
      .where(col(canonicalCol).isNotNull)
      .select(col(docCol).as("document_id"), col(canonicalCol).as("_cid"))
      .distinct()
    val srcIds = ids.select(col("document_id"), col("_cid").as("_sid"))
    val dstIds = ids.select(col("document_id").as("_ddoc"),
      col("_cid").as("_did"))
    val base = rels.select(col(relIdCol).as("id"),
      col(srcCol).as("source_entity_id"),
      col(dstCol).as("target_entity_id"),
      col(relTypeCol).as("relationship_type"),
      col(scoreCol).cast("double").as("confidence_score"),
      col(validatedCol).as("_validated"))
      .where(!col("_validated"))
    val both = base
      .join(srcIds, base("source_entity_id") === srcIds("_sid"))
      .join(dstIds, col("target_entity_id") === col("_did") &&
        col("document_id") === col("_ddoc"), "left_semi")
    val typed = typeFilter match {
      case Some(t) => both.where(
        upper(coalesce(col("relationship_type"), lit("None"))) ===
          t.toUpperCase(java.util.Locale.ROOT))
      case None => both
    }
    val conf =
      if (minConf == 0.0) typed // Python `if min_conf:` — 0.0 is falsy
      else typed.where(
        coalesce(col("confidence_score"), lit(0.0)) >= minConf)
    conf.select(col("document_id"), col("id"), col("source_entity_id"),
      col("target_entity_id"), col("relationship_type"),
      col("confidence_score"))
  }

  /** `GET /documents` (documents.py:56-148 over
    * supabase_service.list_documents): the listing projection with
    * the endpoint's exact (and quirky) operation ORDER — status
    * filter, then created_at-desc LIMIT, then the source filter
    * (applied AFTER the limit, so it can shrink a full page), then
    * the manual offset — plus the derived fields: `title` = name,
    * chunk_count (count of the chunks table), entity_count (count of
    * ALL entity mentions, canonicalized or not), and
    * metadata_complete = every required metadata field present,
    * truthy, and non-whitespace (`field in m and m[f] and
    * str(m[f]).strip()`; list-valued fields narrow to their string
    * rendering here).
    *
    * Scale: the global order-by-desc + LIMIT plans as a top-K
    * (TakeOrderedAndProject), the page (<= 500 rows by the
    * endpoint's Query bound) broadcasts into LEFT SEMI prunes of the
    * chunks/mentions tables so the counts aggregate only the page's
    * documents, and the offset window runs on the bounded page, not
    * the corpus.
    *
    * `docs` needs (id, name, source_type, status, created_at) +
    * `metaCols`; `chunks`/`mentions` need document_id.
    */
  def documentListing(docs: DataFrame, chunks: DataFrame,
      mentions: DataFrame, metaCols: Seq[String],
      statusFilter: Option[String] = None,
      sourceFilter: Option[String] = None,
      limit: Int = 100, offset: Int = 0): DataFrame = {
    val statusFiltered = statusFilter
      .map(s => docs.where(col("status") === lit(s))).getOrElse(docs)
    val top = statusFiltered.orderBy(col("created_at").desc).limit(limit)
    val sourced = sourceFilter
      .map(s => top.where(col("source_type") === lit(s))).getOrElse(top)
    val paged = Paging.dropOffset(sourced, col("created_at").desc, offset)
    val ids = paged.select(col("id").as("_lid"))
    def countOf(t: DataFrame, outCol: String): DataFrame =
      t.join(broadcast(ids), t("document_id") === col("_lid"), "left_semi")
        .groupBy(col("document_id")).agg(count(lit(1)).as(outCol))
        .withColumnRenamed("document_id", "_cid")
    val complete = metaCols.map(f => col(f).isNotNull && col(f) =!= "" &&
      trim(col(f), graft.functions.LlmResponse.ws) =!= "").reduce(_ && _)
    paged
      .join(countOf(chunks, "chunk_count"),
        col("id") === col("_cid"), "left").drop("_cid")
      .join(countOf(mentions, "entity_count"),
        col("id") === col("_cid"), "left").drop("_cid")
      .select(col("id"), col("name").as("title"), col("name"),
        col("source_type"), col("status"),
        complete.as("metadata_complete"),
        coalesce(col("chunk_count"), lit(0L)).as("chunk_count"),
        coalesce(col("entity_count"), lit(0L)).as("entity_count"))
  }

  /** POST /bridge/search/vector (bridge.py:250-297): the UI response
    * shaping over any scored chunk result — threshold filter at >=
    * (the default 0.7 cuts, not caps), payload field defaults
    * (document_id/text default "", chunk_number 0), score as double.
    * The underlying ANN search is the caller's (q21's top-k). */
  def vectorSearchShape(results: DataFrame, threshold: Double): DataFrame =
    results.where(col("score") >= threshold)
      .select(col("id").cast("string").as("id"),
        coalesce(col("document_id").cast("string"), lit(""))
          .as("document_id"),
        coalesce(col("text"), lit("")).as("text"),
        col("score").cast("double").as("score"),
        coalesce(col("chunk_number"), lit(0)).as("chunk_number"))

  /** POST /bridge/search/graph (bridge.py:299-374), batched over a
    * (query_id, entity_name) frame: each query picks ONE root by
    * case-insensitive name containment — the reference's unordered
    * `LIMIT 1` is fixed here as the lowest entity id (documented
    * deviation; the oracle uses the same rule) — then walks outgoing
    * edges 0..depth hops. Faithful shape quirks: every node keeps its
    * MINIMUM distance (the first sighting under ORDER BY distance
    * wins), the root reports distance 0 even when revisited, null node
    * types stay null (the reference's dict(record).get("related_type",
    * "Unknown") default is dead code — the Cypher RETURN always binds
    * the key, so a null-typed node surfaces as None), and the
    * response's `edges` list is ALWAYS empty — the reference never
    * populates it.
    *
    * Documented deviation (like the LIMIT-1 root rule): the reference's
    * Cypher `LIMIT $limit` cuts PATH rows before DISTINCT/node-dedup in
    * an unordered intermediate, so when the limit binds, which nodes
    * survive is storage-order nondeterminism. Here the cut applies to
    * distinct min-distance nodes ordered by (distance, id) — a
    * deterministic refinement of the same bound, required for a stable
    * oracle.
    *
    * Scale: one bounded join per hop (depth <= 5 by the route's
    * validation), frontier keyed by (query_id, node) — the classic
    * iterative n-hop, never a cartesian. */
  def graphSearch(nodes: DataFrame, edges: DataFrame, queries: DataFrame,
      depth: Int, limit: Int): DataFrame = {
    val roots = queries.select(col("query_id"), col("entity_name"))
      .join(nodes.select(col("id"), col("name")),
        lower(col("name")).contains(lower(col("entity_name"))))
      .groupBy(col("query_id")).agg(min(col("id")).as("id"))
    var frontier = roots.select(col("query_id"), col("id"),
      lit(0).as("distance"))
    var all = frontier
    for (d <- 1 to depth) {
      frontier = frontier
        .join(edges.select(col("src").as("id"), col("dst")), Seq("id"))
        .select(col("query_id"), col("dst").as("id"),
          lit(d).as("distance"))
        .distinct()
      all = all.unionByName(frontier)
    }
    val minDist = all.groupBy(col("query_id"), col("id"))
      .agg(min(col("distance")).as("distance"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance"), col("id"))
    minDist.join(nodes.withColumnRenamed("id", "_nid"),
        col("id") === col("_nid"))
      .select(col("query_id"), col("id"), col("name"), col("type"),
        col("distance"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= limit).drop("_rn")
  }

  /** POST /bridge/search/hybrid (bridge.py:377-465), per query: the
    * weighted two-arm blend. The vector arm dedups per document_id
    * keeping the MAX score and the first (= best) text; the graph arm
    * mints synthetic `doc_<entityId>` ids with inverse-distance
    * scores, `Entity: <name>` texts, and only contributes text where
    * the vector arm didn't already claim the id. Final score =
    * vector*vw + graph*gw, sorted descending, top `limit`. */
  def weightedHybrid(vector: DataFrame, graphNodes: DataFrame,
      vectorWeight: Double, graphWeight: Double, limit: Int): DataFrame = {
    val v = vector
      .where(col("document_id").isNotNull && col("document_id") =!= "")
      .groupBy(col("query_id"), col("document_id"))
      .agg(max(struct(col("score"), col("text"))).as("_m"))
      .select(col("query_id"), col("document_id"),
        col("_m.score").as("vector_score"), col("_m.text").as("text"))
    val g = graphNodes.select(col("query_id"),
      concat(lit("doc_"), col("id")).as("document_id"),
      (lit(1.0) / (lit(1.0) + col("distance"))).as("graph_score"),
      concat(lit("Entity: "), coalesce(col("name"), lit("")))
        .as("_gtext"))
      .groupBy(col("query_id"), col("document_id"))
      .agg(max(col("graph_score")).as("graph_score"),
        first(col("_gtext")).as("_gtext"))
    val merged = v.join(g, Seq("query_id", "document_id"), "full_outer")
      .select(col("query_id"), col("document_id"),
        coalesce(col("vector_score"), lit(0.0)).as("vector_score"),
        coalesce(col("graph_score"), lit(0.0)).as("graph_score"),
        coalesce(col("text"), col("_gtext")).as("text"))
    val scored = merged.withColumn("score",
      col("vector_score") * vectorWeight + col("graph_score") * graphWeight)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("document_id"))
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= limit).drop("_rn")
      .select(col("query_id"), col("document_id"), col("score"),
        col("vector_score"), col("graph_score"), col("text"))
  }
}
