package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LegacyIngestion

/** The archived legacy Notion ingestion pipeline
  * (archive/legacy_ingestion/notion_ingestion.py, ingestion_tasks.py,
  * ingestion.py) — the arms the q170/q171 gates don't reach. */
class LegacyIngestionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("security-level inference scans the token map in insertion " +
      "order and skips unconfigured levels (:82-87)") {
    val configured = Seq("public" -> "", "client" -> "tokC",
      "partner" -> "tokC", "employee" -> "tokE", "management" -> "")
    val out = Seq("tokC", "tokE", "tokZ", "").toDF("token")
      .select(col("token"),
        LegacyIngestion.inferSecurityLevel(col("token"), configured)
          .as("level"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // tokC configured for BOTH client and partner — first wins
    assert(out("tokC") === "client")
    assert(out("tokE") === "employee")
    assert(out("tokZ") === "unknown")
    // the "" token never matches because unconfigured levels are
    // skipped before comparison (`if configured_token and ...`)
    assert(out("") === "unknown")
  }

  test("access map reads 0 for unknown levels (:207, config.py:65-71)") {
    val out = Seq("public", "management", "intern", "employee")
      .toDF("lvl")
      .select(col("lvl"), LegacyIngestion.accessLevel(col("lvl")).as("a"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("public" -> 1, "management" -> 5, "intern" -> 0,
      "employee" -> 4))
  }

  test("Department key presence short-circuits even with a null " +
      "select name (:351-357)") {
    val out = Seq(
      // key present, name null, parent WOULD match → stays null
      (true, null: String, "database_id", "Engineering Wiki"),
      // key absent, page parent → null even with a matching title
      (false, null: String, "page_id", "Engineering Wiki"),
      // list-order precedence: sales beats marketing
      (false, null: String, "database_id", "Marketing And Sales"),
      // .title() of "hr" is "Hr"
      (false, null: String, "database_id", "our HR portal"),
      (false, null: String, "database_id", null: String))
      .toDF("has_dept", "name", "ptype", "ptitle")
      .select(LegacyIngestion.inferDepartment(col("has_dept"),
        col("name"), col("ptype"), col("ptitle")).as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(None, None, Some("Sales"), Some("Hr"), None))
  }

  test("auto-approve fork: ingested + ingested_at vs pending_review " +
      "(:186-188, :342-349)") {
    val pages = Seq(("p1", "body")).toDF("page_id", "content")
      .select(col("page_id"), col("content"),
        lit("T").as("title"), lit("u").as("created_by"),
        lit("c").as("created_time"), lit("e").as("last_edited_time"),
        lit(false).as("has_dept_prop"),
        lit(null).cast("string").as("dept_select_name"),
        lit("page_id").as("parent_type"),
        lit(null).cast("string").as("parent_db_title"),
        lit(false).as("has_tags"),
        array().cast("array<string>").as("tag_names"),
        lit(null).cast("string").as("category"),
        lit("employee").as("security_level"))
    val auto = LegacyIngestion.buildDocuments(pages, autoApprove = true)
      .select("status", "has_ingested_at").collect().head
    assert(auto.getString(0) === "ingested" && auto.getBoolean(1))
    val manual = LegacyIngestion.buildDocuments(pages, autoApprove = false)
      .select("status", "has_ingested_at").collect().head
    assert(manual.getString(0) === "pending_review" && !manual.getBoolean(1))
  }

  test("chunk metadata defaults: start 0, end len(text) (:243-253)") {
    val out = Seq((Some(5L), Some(9L), "abcd"), (None, None, "abcd"))
      .toDF("s", "e", "text")
      .select(LegacyIngestion.chunkMeta(col("s"), col("e"), col("text"))
        .as("m"))
      .select(col("m.start"), col("m.end"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((5L, 9L), (0L, 4L)))
  }

  test("status roll-up counts pages and carries Page-prefixed errors " +
      "in page order (:28-41, :108-122)") {
    val perPage = Seq(
      (0L, "pA", false, null: String, 3L, 2L, 1L),
      (1L, "pB", true, "boom", 0L, 0L, 0L),
      (2L, "pC", false, null: String, 2L, 1L, 4L),
      // failed AFTER chunk/entity extraction: the counters keep what
      // accumulated before the failure (:168, :172, :180 increment
      // per completed step, the except arm at :117 keeps them)
      (3L, "pD", true, "bang", 4L, 2L, 0L))
      .toDF("page_ord", "page_id", "failed", "error", "n_chunks",
        "n_entities", "n_relationships")
    val r = LegacyIngestion.statusSummary(perPage).collect().head
    assert(r.getLong(0) === 4L) // total
    assert(r.getLong(1) === 2L) // processed
    assert(r.getLong(2) === 2L) // failed
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((9L, 5L, 5L)))
    assert(r.getString(6) === "Page pB: boom|Page pD: bang")
  }

  test("status roll-up over zero pages reads the dataclass defaults " +
      "(all 0), not nulls (:28-41)") {
    val empty = Seq.empty[(Long, String, Boolean, String, Long, Long,
      Long)].toDF("page_ord", "page_id", "failed", "error", "n_chunks",
        "n_entities", "n_relationships")
    val r = LegacyIngestion.statusSummary(empty).collect().head
    assert((0 to 5).map(r.getLong) === Seq(0L, 0L, 0L, 0L, 0L, 0L))
    assert(r.getString(6) === "")
  }

  test("task-status API ladder (ingestion.py:103-130)") {
    val out = Seq(
      ("PENDING", "i", "r", null: String),
      ("PROCESSING", "i", "r", null: String),
      ("SUCCESS", "i", "r", null: String),
      ("FAILURE", "i", "r", "oops"),
      // str(None) in Python renders a missing error as "None" (:124)
      ("FAILURE", "i", "r", null: String),
      ("REVOKED", "i", "r", null: String))
      .toDF("state", "info", "result", "error")
      .select(LegacyIngestion.taskStatusInfo(col("state"), col("info"),
        col("result"), col("error")).as("out"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("Task not found or pending"), Some("i"),
      Some("r"), Some("error=oops status=failed"),
      Some("error=None status=failed"), None))
  }

  test("change cutoff is strictly-after, matching the connector's > " +
      "and the Notion API after filter (notion_connector.py:96, :125)") {
    val pages = Seq("2025-08-04", "2025-08-05", "2025-08-06")
      .toDF("last_edited_time")
    val kept = LegacyIngestion
      .filterModifiedSince(pages, fullScan = false, cutoff = "2025-08-05")
      .collect().map(_.getString(0))
    assert(kept.toSeq === Seq("2025-08-06"))
    val all = LegacyIngestion
      .filterModifiedSince(pages, fullScan = true, cutoff = "2025-08-05")
      .count()
    assert(all === 3L)
  }

  test("Celery task tier shapes (ingestion_tasks.py): meta statuses, " +
      "result field order, the mock counts, the beat schedule fork") {
    import LegacyIngestion.CeleryFaces
    assert(CeleryFaces.processingStatus === "Connecting to Notion...")
    assert(CeleryFaces.failureStatus === "failed")
    assert(CeleryFaces.completedResultFields === Seq("task_id", "status",
      "total_pages", "processed_pages", "failed_pages", "new_chunks",
      "new_entities", "new_relationships", "errors", "completed_at"))
    assert(CeleryFaces.completedStatus === "completed")
    assert(CeleryFaces.singleDocumentMock ===
      Map("chunks" -> 42L, "entities" -> 15L, "relationships" -> 23L))
    assert(CeleryFaces.beatScheduleName === "scan-notion-every-30-minutes")
    assert(CeleryFaces.beatIntervalSeconds === 1800.0)
    assert(CeleryFaces.beatHasArgs(true) && !CeleryFaces.beatHasArgs(false))
    assert(CeleryFaces.taskTimeLimitSeconds === 3600)
    assert(CeleryFaces.taskSoftTimeLimitSeconds === 3000)
    assert(CeleryFaces.healthStatus === "healthy")
  }

  test("sources listing: 30-minutes vs disabled fork and the id gate " +
      "(ingestion.py:249-263)") {
    val out = LegacyIngestion.sourcesListing(Seq(
        ("notion", true, Seq("db1", "db2")),
        ("google_drive", false, Seq("f1")))
      .toDF("source", "configured", "ids"))
      .select(col("source"), array_join(col("ids"), ",").as("ids"),
        col("scan_interval"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq(("notion", "db1,db2", "30 minutes"),
      ("google_drive", "", "disabled")))
  }
}
