package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connector scan-trigger admission: POST /processing/process/notion
  * (app/api/processing.py:206-261) and /process/gdrive (:263-321),
  * batched over request frames.
  *
  * Faithful quirks preserved:
  *   - Notion accepts the five security levels PLUS "all" (:218) and
  *     routes "all" to the scan-everything task (:232-238);
  *   - Google Drive's valid list OMITS "all" (:277-279) even though
  *     "all" is the parameter's documented DEFAULT and a
  *     `security_level.lower() == "all"` routing branch exists below
  *     (:293) — the default request 400s and that branch is dead code;
  *   - the 400 detail embeds the Python list repr of the valid levels;
  *   - gdrive's file_types parse is `split(",")` + strip when the
  *     parameter is truthy, else the empty list (:286) — empty string
  *     means no filter, and blank-padded entries are trimmed.
  *
  * Request frames are API-call-sized; every transform is a narrow
  * projection. */
object ConnectorScans {

  val securityLevels: Seq[String] =
    Seq("public", "client", "partner", "employee", "management")

  private def pyListRepr(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** POST /process/notion (processing.py:206-261). `requests` carries
    * (request_id, security_level, workspace_id, force_update). */
  def notionScan(requests: DataFrame): DataFrame = {
    val valid = securityLevels :+ "all"
    val ok = col("security_level").isInCollection(valid)
    requests.select(col("request_id"), col("security_level"),
      col("workspace_id"), col("force_update"),
      when(ok, lit("queued")).otherwise(lit("invalid_level")).as("arm"),
      when(ok, lit("notion_scan")).as("job_type"),
      when(ok, lit("notion")).as("source"),
      when(ok && col("security_level") === "all", lit("scan_notion_all"))
        .when(ok, lit("scan_notion_workspace")).as("task"),
      when(ok, lit("Notion scan queued for processing")).as("message"),
      when(!ok, lit("Invalid security level. Must be one of: " +
        pyListRepr(valid))).as("detail"))
  }

  /** The generic "Scan now" dispatcher, POST /sources/scan
    * (processing.py:36-83), batched over (request_id, source,
    * security_level, file_types, force_update).
    *
    * Faithful quirks:
    *   - `source` defaults to "all" (None → "all") and lowercases;
    *     gdrive answers to three aliases (gdrive/google_drive/drive)
    *     plus "all", notion to notion/all; anything else is the 400
    *     ("Unknown source. Use gdrive, notion, or all");
    *   - the arms run SEQUENTIALLY, gdrive first: a gdrive admission
    *     400 aborts the whole call, so the notion arm of an "all"
    *     request never runs (`gdrive_rejected` — notion columns null);
    *   - the DEFAULT call (source=all, security_level=all) therefore
    *     400s: "all" is not in gdrive's valid-level list (the q131
    *     dead-default quirk composed through the dispatcher);
    *   - notion always receives workspace_id=None, so a queued notion
    *     arm picks its task purely off security_level;
    *   - the dispatcher's own file_types default is the SEVEN-entry
    *     list (".pdf,.docx,.txt,.md,.gdoc,.gsheet,.gslides" — the
    *     direct gdrive route defaults to four);
    *   - success wraps as {"status": "queued", "results": {...}}.
    *
    * Request frames are API-call-sized; narrow projection only. */
  def sourcesScanDispatch(requests: DataFrame): DataFrame = {
    val dispatcherFileTypes = ".pdf,.docx,.txt,.md,.gdoc,.gsheet,.gslides"
    val src = lower(coalesce(col("source"), lit("all")))
    // security_level's own Query default is "all" (processing.py:41) —
    // an absent param (null) must default BEFORE the validity gates,
    // or a null would fall through every when() to 'queued'
    val lvl = coalesce(col("security_level"), lit("all"))
    val g = src.isin("gdrive", "google_drive", "drive", "all")
    val n = src.isin("notion", "all")
    val gOk = lvl.isInCollection(securityLevels)
    val nOk = lvl.isInCollection(securityLevels :+ "all")
    val arm = when(!g && !n, lit("unknown_source"))
      .when(g && !gOk, lit("gdrive_rejected"))
      .when(n && !nOk, lit("notion_rejected"))
      .otherwise(lit("queued"))
    val ft = coalesce(col("file_types"), lit(dispatcherFileTypes))
    val queued = arm === "queued"
    requests.select(col("request_id"), src.as("source_norm"),
      lvl.as("security_level"), col("force_update"), arm.as("arm"),
      when(queued, lit("queued")).as("status"),
      when(queued, g).otherwise(lit(false)).as("gdrive_included"),
      when(queued, n).otherwise(lit(false)).as("notion_included"),
      // "all" can't reach a queued gdrive arm, so the task is
      // unconditionally the single-level scan (same dead branch as
      // the direct route)
      when(queued && g, lit("scan_google_drive")).as("gdrive_task"),
      when(queued && g,
        when(length(ft) > 0, transform(split(ft, ","), x => trim(x)))
          .otherwise(array().cast("array<string>"))).as("file_type_list"),
      when(queued && n,
        when(lvl === "all", lit("scan_notion_all"))
          .otherwise(lit("scan_notion_workspace"))).as("notion_task"),
      when(arm === "unknown_source",
          lit("Unknown source. Use gdrive, notion, or all"))
        .when(arm === "gdrive_rejected",
          lit("Invalid security level. Must be one of: " +
            pyListRepr(securityLevels)))
        .when(arm === "notion_rejected",
          lit("Invalid security level. Must be one of: " +
            pyListRepr(securityLevels :+ "all")))
        .as("detail"))
  }

  /** The main_fixed entrypoint's COMPAT dispatcher, POST
    * /api/sources/scan (app/main_fixed.py:223-266) — a second,
    * semantically different twin of [[sourcesScanDispatch]]:
    *   - arms match EXACTLY, no lowercasing: "notion" or one of
    *     gdrive/google_drive/drive; ANYTHING else — null, "all",
    *     "NOTION", "slack" — falls to the scan-both default (this
    *     variant has no unknown-source 400);
    *   - scan-both runs notion FIRST (the processing.py dispatcher
    *     runs gdrive first), so the default call (source=null,
    *     level="all") QUEUES the notion scan and then 500s on the
    *     gdrive arm — a partial side-effect the caller never sees
    *     succeed;
    *   - each delegate wraps its admission HTTPException into a 500
    *     whose detail is Python str(e): "400: <original detail>".
    * Output: per-request arm, which connectors were attempted/queued
    * (a queued notion survives a later gdrive failure), the HTTP
    * status, and the wrapped detail. */
  def sourcesScanCompat(requests: DataFrame): DataFrame = {
    val src = col("source")
    val nOnly = src.isNotNull && src === "notion"
    val gOnly = src.isNotNull &&
      src.isin("gdrive", "google_drive", "drive")
    val arm = when(nOnly, lit("notion")).when(gOnly, lit("gdrive"))
      .otherwise(lit("both"))
    val lvl = coalesce(col("security_level"), lit("all"))
    val nOk = lvl.isInCollection(securityLevels :+ "all")
    val gOk = lvl.isInCollection(securityLevels)
    val nAttempted = arm =!= "gdrive"
    val gAttempted = arm === "gdrive" || (arm === "both" && nOk)
    val nDetail = "400: Invalid security level. Must be one of: " +
      pyListRepr(securityLevels :+ "all")
    val gDetail = "400: Invalid security level. Must be one of: " +
      pyListRepr(securityLevels)
    requests.select(col("request_id"), arm.as("arm"),
      nAttempted.as("notion_attempted"),
      (nAttempted && nOk).as("notion_queued"),
      when(nAttempted && nOk,
        when(lvl === "all", lit("scan_notion_all"))
          .otherwise(lit("scan_notion_workspace"))).as("notion_task"),
      gAttempted.as("gdrive_attempted"),
      (gAttempted && gOk).as("gdrive_queued"),
      when(nAttempted && !nOk, lit(500))
        .when(gAttempted && !gOk, lit(500))
        .otherwise(lit(200)).as("status_code"),
      when(nAttempted && !nOk, lit(nDetail))
        .when(gAttempted && !gOk, lit(gDetail)).as("detail"))
  }

  /** POST /process/gdrive (processing.py:263-321). `requests` carries
    * (request_id, security_level, file_types, force_update). */
  def gdriveScan(requests: DataFrame): DataFrame = {
    // "all" is NOT admitted: the valid list is the five bare levels
    val ok = col("security_level").isInCollection(securityLevels)
    val ftl = when(col("file_types").isNotNull &&
        length(col("file_types")) > 0,
        transform(split(col("file_types"), ","), x => trim(x)))
      .otherwise(array().cast("array<string>"))
    requests.select(col("request_id"), col("security_level"),
      col("force_update"),
      when(ok, lit("queued")).otherwise(lit("invalid_level")).as("arm"),
      when(ok, lit("gdrive_scan")).as("job_type"),
      when(ok, lit("google_drive")).as("source"),
      // the scan-all branch is unreachable: "all" never passes the gate
      when(ok, lit("scan_google_drive")).as("task"),
      when(ok, ftl).as("file_type_list"),
      when(ok, lit("Google Drive scan queued for processing"))
        .as("message"),
      when(!ok, lit("Invalid security level. Must be one of: " +
        pyListRepr(securityLevels))).as("detail"))
  }
}
