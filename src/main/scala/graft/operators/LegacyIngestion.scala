package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's archived legacy Notion ingestion pipeline
  * (archive/legacy_ingestion/notion_ingestion.py:1-471) and its
  * Celery/API frames (archive/legacy_ingestion/ingestion_tasks.py,
  * ingestion.py) — the end-to-end Notion → vector/graph path that
  * predates the current connector tier — re-expressed as per-row
  * column ladders over a pages frame.
  *
  * Everything here is a projection (zero shuffles): document
  * identity, content hashing, department/tag inference, the
  * security-level algebra, and the Qdrant point render are all
  * per-page or per-chunk, so the plan at 100 TB is a single scan.
  * The chunking stage the pipeline calls (`chunk_document(method=
  * "recursive", chunk_size=1500, chunk_overlap=200, language=
  * "markdown")`, notion_ingestion.py:228-235) is the already-modeled
  * [[DocProcessorChunker]]; [[qdrantPoints]] takes any chunk frame.
  */
object LegacyIngestion {

  /** Security hierarchy (app/config.py:65-71): higher = more access.
    * Token-map insertion order (config.py:52-58) doubles as the
    * inference scan order. */
  val securityLevels: Seq[(String, Int)] = Seq(
    "public" -> 1, "client" -> 2, "partner" -> 3,
    "employee" -> 4, "management" -> 5)

  /** `settings.security_levels.get(level, 0)`
    * (notion_ingestion.py:207, :300) — unknown levels read 0. */
  def accessLevel(level: Column): Column =
    securityLevels.foldRight(lit(0)) { case ((name, n), rest) =>
      when(level === name, lit(n)).otherwise(rest)
    }

  /** `_infer_security_level` (notion_ingestion.py:82-87): the first
    * configured (non-empty) token equal to the given one names the
    * level, in the token map's insertion order; no match reads
    * "unknown". */
  def inferSecurityLevel(token: Column,
      configured: Seq[(String, String)]): Column =
    configured.foldRight(lit("unknown")) { case ((level, tok), rest) =>
      if (tok.isEmpty) rest
      else when(token === tok, lit(level)).otherwise(rest)
    }

  /** Department scan order (notion_ingestion.py:362-366). */
  val departments: Seq[String] = Seq("engineering", "support", "sales",
    "marketing", "operations", "product", "hr", "finance")

  /** `_infer_department` (notion_ingestion.py:351-368). The
    * `"Department" in props` check SHORT-CIRCUITS on key presence —
    * a Department property with a null/absent select name still
    * returns that null rather than falling through to the parent
    * scan. Otherwise a database parent's lowercased title is scanned
    * for the first substring match in [[departments]] order and
    * returned `.title()`-cased (Python str.title of one word —
    * "hr" → "Hr"). */
  def inferDepartment(hasDeptProp: Column, deptSelectName: Column,
      parentType: Column, parentDbTitle: Column): Column = {
    val title = lower(coalesce(parentDbTitle, lit("")))
    val fromParent = departments.foldRight(lit(null).cast("string")) {
      case (dept, rest) =>
        when(title.contains(dept),
          lit(dept.head.toUpper +: dept.tail)).otherwise(rest)
    }
    when(hasDeptProp, deptSelectName)
      .when(parentType === "database_id", fromParent)
      .otherwise(lit(null).cast("string"))
  }

  /** `_extract_tags` (notion_ingestion.py:370-386): the Tags
    * multi-select names in order, then the Category select name
    * appended only when truthy (non-null, non-empty). */
  def extractTags(hasTags: Column, tagNames: Column,
      category: Column): Column = {
    val base = when(hasTags, tagNames)
      .otherwise(array().cast("array<string>"))
    when(category.isNotNull && category =!= "",
      concat(base, array(category))).otherwise(base)
  }

  /** `_create_document` + `_update_document_status`
    * (notion_ingestion.py:192-225, :342-349, :186-188): document id
    * `notion_{page_id}`, sha256 content hash (hex), source fields,
    * metadata inference, and the auto-approve status fork — final
    * status "ingested" (with ingested_at set) when auto_approve,
    * else "pending_review" (ingested_at stays null).
    *
    * Input pages frame columns: page_id, title, content, created_by,
    * created_time, last_edited_time, has_dept_prop (bool),
    * dept_select_name, parent_type, parent_db_title, has_tags (bool),
    * tag_names (array<string>), category, security_level. */
  def buildDocuments(pages: DataFrame, autoApprove: Boolean): DataFrame =
    pages.select(
      concat(lit("notion_"), col("page_id")).as("id"),
      col("content"),
      sha2(col("content"), 256).as("content_hash"),
      coalesce(col("title"), lit("Untitled")).as("title"),
      col("created_by").as("author"),
      lit("notion").as("source"),
      col("page_id").as("source_id"),
      col("created_time").as("created_at"),
      col("last_edited_time").as("updated_at"),
      inferDepartment(col("has_dept_prop"), col("dept_select_name"),
        col("parent_type"), col("parent_db_title")).as("department"),
      extractTags(col("has_tags"), col("tag_names"), col("category"))
        .as("tags"),
      col("security_level"),
      accessLevel(col("security_level")).as("access_level"),
      lit(if (autoApprove) "ingested" else "pending_review").as("status"),
      lit(autoApprove).as("has_ingested_at"))

  /** `_fetch_pages`' change cutoff (notion_ingestion.py:140-155): a
    * full scan passes everything; otherwise only pages edited strictly
    * after the cutoff (now − 7 days in the script; injected here so
    * the plan is a pushed-down filter, not driver time). Strict `>`
    * mirrors the connector's comparison (notion_connector.py:96) and
    * the Notion API `after` filter (:125-129) — a page edited exactly
    * at the cutoff is excluded. */
  def filterModifiedSince(pages: DataFrame, fullScan: Boolean,
      cutoff: String): DataFrame =
    if (fullScan) pages
    else pages.filter(col("last_edited_time") > lit(cutoff))

  /** `_store_vectors` (notion_ingestion.py:289-320): one Qdrant point
    * per chunk — id `{document_id}_chunk_{n}`, payload fields in the
    * script's literal insertion order, `location` = `chunk_{n}`.
    * Input: one row per chunk with the document columns of
    * [[buildDocuments]] joined on (document_id) plus chunk_number and
    * text. Pure projection. */
  def qdrantPoints(chunks: DataFrame): DataFrame =
    chunks.select(
      concat(col("document_id"), lit("_chunk_"), col("chunk_number"))
        .as("point_id"),
      col("document_id"),
      col("chunk_number"),
      col("text"),
      col("title"),
      lit("notion").as("source"),
      col("department"),
      col("tags"),
      col("security_level"),
      col("access_level"),
      col("created_at"),
      concat(lit("chunk_"), col("chunk_number")).as("location"))

  /** Per-chunk metadata carried by `_process_chunks`
    * (notion_ingestion.py:243-253): `start` defaults 0, `end`
    * defaults the chunk text's length. */
  def chunkMeta(start: Column, end: Column, text: Column): Column =
    struct(coalesce(start, lit(0L)).as("start"),
      coalesce(end, length(text).cast("long")).as("end"))

  /** The IngestionStatus roll-up (notion_ingestion.py:28-41,
    * :108-122): per-page outcomes aggregate to total/processed/failed
    * page counts plus new chunk/entity/relationship sums; failures
    * carry `Page {id}: {error}` strings (:117-118), in page order.
    * Input: page_id, page_ord (orders the collected error strings),
    * failed (bool), error, n_chunks, n_entities,
    * n_relationships. One aggregation — the only shuffle in the
    * pipeline model, over one row per page.
    *
    * The chunk/entity/relationship sums count FAILED pages too: the
    * reference increments its counters as steps complete
    * (notion_ingestion.py:168, :172, :180), so a page that fails at a
    * later step (vector/graph store, status update) keeps what it
    * accumulated — the input columns carry the counts accumulated
    * before the failure (0 for a page that failed before chunking).
    * Empty input yields the dataclass defaults (all 0), not nulls. */
  def statusSummary(perPage: DataFrame): DataFrame =
    perPage.agg(
      count(lit(1)).as("total_pages"),
      coalesce(sum(when(!col("failed"), 1L).otherwise(0L)), lit(0L))
        .as("processed_pages"),
      coalesce(sum(when(col("failed"), 1L).otherwise(0L)), lit(0L))
        .as("failed_pages"),
      coalesce(sum(col("n_chunks")), lit(0L)).as("new_chunks"),
      coalesce(sum(col("n_entities")), lit(0L)).as("new_entities"),
      coalesce(sum(col("n_relationships")), lit(0L))
        .as("new_relationships"),
      array_join(array_sort(collect_list(when(col("failed"),
        struct(col("page_ord"), concat(lit("Page "), col("page_id"),
          lit(": "), col("error")).as("msg"))))).getField("msg"), "|")
        .as("errors"))

  /** The Celery task-status API ladder
    * (archive/legacy_ingestion/ingestion.py:103-130): PENDING reads a
    * placeholder info, PROCESSING surfaces `result.info`, SUCCESS
    * surfaces `result.result`, FAILURE wraps `str(result.info)` with
    * status=failed — Python `str(None)` renders a missing error as
    * the literal "None" (ingestion.py:124), mirrored here by the
    * coalesce; any other state leaves info null. */
  def taskStatusInfo(state: Column, info: Column, result: Column,
      error: Column): Column =
    when(state === "PENDING", lit("Task not found or pending"))
      .when(state === "PROCESSING", info)
      .when(state === "SUCCESS", result)
      .when(state === "FAILURE",
        concat(lit("error="), coalesce(error, lit("None")),
          lit(" status=failed")))
      .otherwise(lit(null).cast("string"))

  /** GET /api/ingestion/sources (ingestion.py:249-263): per-source
    * configured flag, id list (empty unless configured) and the
    * "30 minutes"/"disabled" scan-interval fork. */
  def sourcesListing(sources: DataFrame): DataFrame =
    sources.select(
      col("source"),
      col("configured"),
      when(col("configured"), col("ids"))
        .otherwise(array().cast("array<string>")).as("ids"),
      when(col("configured"), lit("30 minutes"))
        .otherwise(lit("disabled")).as("scan_interval"))

  /** The legacy ingestion API's request/response laws
    * (archive/legacy_ingestion/ingestion.py:46-101, :135-150) beyond
    * the status ladder: the trigger validation fork, the blanket-
    * except collapse, and the fixed response vocabulary. Pinned by
    * the wave-11 reference-run fixtures (legacy_api.json). */
  object Api {
    /** trigger_notion_ingestion's happy-path response fields
      * (:89-94). */
    val triggerStatus = "started"
    val triggerMessage = "Notion ingestion task started"
    def checkUrl(taskId: String): String =
      s"/api/ingestion/status/$taskId"
    /** cancel_task's fixed response (:145-149). */
    val cancelStatus = "cancelled"
    val cancelMessage = "Task cancellation requested"

    val noTokenDetail =
      "Notion API token not provided and not configured in environment"
    val noIdsDetail = "No database IDs or page IDs specified"

    /** The blanket-except quirk (:97-99): every error inside the
      * handler — INCLUDING the handler's own 400 HTTPExceptions — is
      * re-raised as a 500 whose detail wraps the Starlette
      * `{status}: {detail}` string. A client can never observe the
      * 400s. */
    def collapse(status: Int, detail: String): (Int, String) =
      (500, s"$status: $detail")

    /** The validation + source-resolution fork (:57-83): the request
      * token falls back to the configured key (missing both → 400);
      * with neither request databases nor pages, the env default
      * databases apply (empty → 400); otherwise the REQUEST
      * database_ids pass through (even when null with page_ids set).
      * Errors arrive pre-collapsed per [[collapse]]. */
    def triggerValidation(reqToken: Option[String],
        envKey: Option[String], reqDbs: Option[Seq[String]],
        reqPageIds: Option[Seq[String]], envDbs: Seq[String])
        : Either[(Int, String), (String, Option[Seq[String]])] = {
      // `request.token or settings.notion_api_key` (:59) is Python
      // TRUTHINESS: an empty-string request token falls through to
      // the env key (and to the 400 when that is empty too)
      val token = reqToken.filter(_.nonEmpty)
        .orElse(envKey.filter(_.nonEmpty))
      if (token.isEmpty) Left(collapse(400, noTokenDetail))
      else if (reqDbs.forall(_.isEmpty) &&
          reqPageIds.forall(_.isEmpty)) {
        if (envDbs.isEmpty) Left(collapse(400, noIdsDetail))
        else Right((token.get, Some(envDbs)))
      } else Right((token.get, reqDbs))
    }
  }

  /** The Celery task tier's deterministic shapes
    * (archive/legacy_ingestion/ingestion_tasks.py): meta/result field
    * vocabularies, the beat schedule, the config constants. */
  object CeleryFaces {
    /** The PROCESSING update_state meta (:76-82). */
    val processingStatus = "Connecting to Notion..."
    /** The FAILURE update_state meta's status (:115-121). */
    val failureStatus = "failed"
    /** The completed-result dict's keys in insertion order (:94-105):
      * the IngestionStatus counters framed by task identity and
      * timestamps. */
    val completedResultFields: Seq[String] = Seq("task_id", "status",
      "total_pages", "processed_pages", "failed_pages", "new_chunks",
      "new_entities", "new_relationships", "errors", "completed_at")
    val completedStatus = "completed"
    /** process_single_document's shipped mock result (:170-177):
      * fixed 42/15/23 counts — the pipeline call is a TODO in the
      * reference, the task returns this literal. */
    val singleDocumentMock: Map[String, Long] =
      Map("chunks" -> 42L, "entities" -> 15L, "relationships" -> 23L)
    /** The beat schedule (:193-203): one entry, 1800 s; its args
      * tuple is EMPTY (the task would crash on missing keys) unless
      * the Notion API key is configured — the truthiness fork. */
    val beatScheduleName = "scan-notion-every-30-minutes"
    val beatIntervalSeconds = 1800.0
    def beatHasArgs(notionApiKeyConfigured: Boolean): Boolean =
      notionApiKeyConfigured
    /** Celery conf (:24-33): hard/soft time limits. */
    val taskTimeLimitSeconds = 3600
    val taskSoftTimeLimitSeconds = 3000
    /** health_check (:209-214): the status literal. */
    val healthStatus = "healthy"
  }
}
