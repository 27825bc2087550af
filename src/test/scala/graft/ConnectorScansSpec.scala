package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectorScans

/** Pins the connector scan-trigger admission (processing.py:206-321),
  * including the gdrive valid-list quirk: the documented default
  * security_level="all" is rejected, making the scan-all branch dead
  * code. */
class ConnectorScansSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("notion: 'all' routes to scan-all, levels to workspace, else 400") {
    val spark2 = spark
    import spark2.implicits._
    val req = Seq(
      ("r1", "all", Some("w1"), false),
      ("r2", "client", None: Option[String], true),
      ("r3", "bogus", None: Option[String], false))
      .toDF("request_id", "security_level", "workspace_id", "force_update")
    val out = ConnectorScans.notionScan(req).orderBy("request_id")
      .select("request_id", "arm", "task", "detail")
      .as[(String, String, Option[String], Option[String])]
      .collect().toSeq
    assert(out(0) === ("r1", "queued", Some("scan_notion_all"), None))
    assert(out(1) === ("r2", "queued", Some("scan_notion_workspace"), None))
    assert(out(2) === ("r3", "invalid_level", None,
      Some("Invalid security level. Must be one of: ['public', 'client'," +
        " 'partner', 'employee', 'management', 'all']")))
  }

  test("gdrive: the documented default 'all' is a 400; file types trim") {
    val spark2 = spark
    import spark2.implicits._
    val req = Seq(
      ("r1", "all", ".pdf,.docx,.txt,.md", false),
      ("r2", "public", " .pdf , .md ", false),
      ("r3", "employee", "", true))
      .toDF("request_id", "security_level", "file_types", "force_update")
    val out = ConnectorScans.gdriveScan(req).orderBy("request_id")
      .select("request_id", "arm", "task", "file_type_list", "detail")
      .as[(String, String, Option[String], Option[Seq[String]],
        Option[String])]
      .collect().toSeq
    // processing.py:277-279 omits "all" from the valid list, so the
    // parameter's own default value 400s and :293's scan-all branch
    // can never run
    assert(out(0) === ("r1", "invalid_level", None, None,
      Some("Invalid security level. Must be one of: ['public', 'client'," +
        " 'partner', 'employee', 'management']")))
    assert(out(1) === ("r2", "queued", Some("scan_google_drive"),
      Some(Seq(".pdf", ".md")), None))
    // empty file_types is falsy → empty list, not [""]
    assert(out(2) === ("r3", "queued", Some("scan_google_drive"),
      Some(Seq.empty[String]), None))
  }

  test("dispatcher: aliases, sequential gdrive-first abort, unknown 400") {
    val spark2 = spark
    import spark2.implicits._
    val requests = Seq(
      (null: String, "public", null: String),   // default all: both queue
      ("DRIVE", "client", ".pdf , .md"),        // alias + trim
      ("notion", "all", null: String),          // notion-only scan-all
      ("all", "all", null: String),             // the DEFAULT params 400
      ("slack", "public", null: String),        // unknown source
      // null security_level takes the param's own "all" default
      // (processing.py:41) — notion queues scan_notion_all, and a
      // fully-default call (null, null) would 400 like row 4
      ("notion", null: String, null: String))
      .toDF("source", "security_level", "file_types")
      .withColumn("request_id", coalesce(col("source"), lit("dflt")))
      .withColumn("force_update", lit(false))
    val out = ConnectorScans.sourcesScanDispatch(requests)
      .select(col("source_norm"), col("arm"), col("gdrive_included"),
        col("notion_included"),
        when(col("file_type_list").isNotNull,
          array_join(col("file_type_list"), "|")).as("ftl"),
        col("notion_task"))
      .as[(String, String, Boolean, Boolean, Option[String],
        Option[String])].collect().toSeq
    assert(out === Seq(
      ("all", "queued", true, true,
        Some(".pdf|.docx|.txt|.md|.gdoc|.gsheet|.gslides"),
        Some("scan_notion_workspace")),
      ("drive", "queued", true, false, Some(".pdf|.md"), None),
      ("notion", "queued", false, true, None, Some("scan_notion_all")),
      // gdrive runs first and 400s on "all"; notion never evaluates
      ("all", "gdrive_rejected", false, false, None, None),
      ("slack", "unknown_source", false, false, None, None),
      ("notion", "queued", false, true, None, Some("scan_notion_all"))))
  }

  test("compat dispatcher: exact arms, notion-first partial side-effect") {
    val spark2 = spark
    import spark2.implicits._
    val requests = Seq(
      ("NOTION", "client"),        // cased: falls to scan-BOTH
      (null: String, null: String),// full default: notion queues, gdrive 500s
      ("notion", "weird"))         // notion-only rejection
      .toDF("source", "security_level")
      .withColumn("request_id", coalesce(col("source"), lit("dflt")))
    val out = ConnectorScans.sourcesScanCompat(requests)
      .select("arm", "notion_queued", "notion_task", "gdrive_attempted",
        "gdrive_queued", "status_code")
      .as[(String, Boolean, Option[String], Boolean, Boolean, Int)]
      .collect().toSeq
    assert(out === Seq(
      ("both", true, Some("scan_notion_workspace"), true, true, 200),
      // the variant's default call queues notion BEFORE the gdrive
      // arm 500s — a partial side-effect the response never reports
      ("both", true, Some("scan_notion_all"), true, false, 500),
      ("notion", false, None, false, false, 500)))
  }
}
