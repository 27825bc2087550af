package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LegacyIngestion

/** Wave-6 parity against the reference BINARY:
  * tools/gen_parity_fixtures6.py runs the REAL archived pipeline
  * (archive/legacy_ingestion/notion_ingestion.py) under recording
  * stand-ins and captures the inference helpers, the document build,
  * the chunk metadata defaults, the Qdrant point render, and the full
  * run() loop's IngestionStatus — incl. the counters-survive-late-
  * failure semantics; this spec replays the same inputs through
  * operators/LegacyIngestion.scala. */
class LegacyIngestionParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  implicit val fmts: Formats = DefaultFormats

  private lazy val fx: JValue =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/refparity/legacy_ingestion.json"),
      "UTF-8").mkString)

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }

  test("security-level inference matches the reference run (skip " +
      "unconfigured, first-wins on duplicate tokens, unknown)") {
    val configured = (fx \ "settings" \ "notion_tokens")
      .extract[List[List[String]]].map { case List(k, v) => (k, v) }
    (fx \ "infer_security_level").extract[List[JValue]].foreach { c =>
      val token = (c \ "token").extract[String]
      val want = (c \ "level").extract[String]
      val got = Seq(token).toDF("t")
        .select(LegacyIngestion.inferSecurityLevel(col("t"), configured))
        .collect().head.getString(0)
      assert(got === want, s"token=$token")
    }
  }

  test("department inference matches the reference run across every " +
      "arm (key short-circuit, list order, .title() case, no-match)") {
    (fx \ "infer_department").extract[List[JValue]].foreach { c =>
      val page = c \ "page"
      val props = page \ "properties"
      val hasDept = (props \ "Department") != JNothing
      val deptName = str(props \ "Department" \ "select" \ "name")
      val parentType = str(page \ "parent" \ "type")
      val dbTitle = str(page \ "parent" \ "database_title")
      val want = str(c \ "department")
      val got = Seq((hasDept, deptName.orNull, parentType.orNull,
        dbTitle.orNull))
        .toDF("has_dept", "name", "ptype", "ptitle")
        .select(LegacyIngestion.inferDepartment(col("has_dept"),
          col("name"), col("ptype"), col("ptitle")))
        .collect().head
      assert(Option(got.getString(0)) === want,
        (c \ "name").extract[String])
    }
    // the live-crash quirk: present-but-None database_title hits
    // None.lower() in the reference — our Column face coalesces to ""
    // (no match) by design; the fixture pins that the reference
    // CRASHES there, so the deviation is recorded, not silent
    assert((fx \ "dept_none_title_quirk").extract[String] ===
      "AttributeError")
  }

  test("tag extraction matches the reference run (multi-select order, " +
      "truthy-Category append, empty-string drop)") {
    (fx \ "extract_tags").extract[List[JValue]].foreach { c =>
      val props = c \ "page" \ "properties"
      val hasTags = (props \ "Tags") != JNothing
      val tagNames = (props \ "Tags" \ "multi_select") match {
        case JArray(xs) => xs.map(x => (x \ "name").extract[String])
        case _ => Nil
      }
      val category = str(props \ "Category" \ "select" \ "name")
      val want = (c \ "tags").extract[List[String]]
      val got = Seq((hasTags, tagNames, category.orNull))
        .toDF("has_tags", "names", "cat")
        .select(LegacyIngestion.extractTags(col("has_tags"),
          col("names"), col("cat")))
        .collect().head.getSeq[String](0)
      assert(got.toList === want, (c \ "name").extract[String])
    }
  }

  test("document build matches the reference run (notion_{id}, " +
      "sha256, Untitled default on the ABSENT-title convention)") {
    (fx \ "create_document").extract[List[JValue]].foreach { c =>
      val name = (c \ "name").extract[String]
      val page = c \ "doc"
      // the faithful-row convention: a missing dict key is a null
      // column. The present-but-None title case is the reference's
      // get-vs-default quirk — unrepresentable in a flat frame, so it
      // is pinned here AS RECORDED (None) and skipped in the replay.
      if (name == "title_present_none_stays_none") {
        assert((page \ "metadata" \ "title") === JNull)
      } else {
        val pageId = (c \ "page_id").extract[String]
        val content = (page \ "content").extract[String]
        val wantTitle = str(page \ "metadata" \ "title")
        val pages = Seq((pageId, content)).toDF("page_id", "content")
          .select(col("page_id"), col("content"),
            lit(if (name == "full") "Doc One" else null: String)
              .cast("string").as("title"),
            lit(null).cast("string").as("created_by"),
            lit(null).cast("string").as("created_time"),
            lit(null).cast("string").as("last_edited_time"),
            lit(false).as("has_dept_prop"),
            lit(null).cast("string").as("dept_select_name"),
            lit(null).cast("string").as("parent_type"),
            lit(null).cast("string").as("parent_db_title"),
            lit(false).as("has_tags"),
            array().cast("array<string>").as("tag_names"),
            lit(null).cast("string").as("category"),
            lit("employee").as("security_level"))
        val row = LegacyIngestion.buildDocuments(pages,
          autoApprove = false).collect().head
        val m = row.getValuesMap[Any](Seq("id", "content_hash", "title",
          "source", "source_id", "access_level"))
        assert(m("id") === (page \ "id").extract[String], name)
        assert(m("content_hash") ===
          (page \ "content_hash").extract[String], name)
        assert(Option(m("title").asInstanceOf[String]) === wantTitle,
          name)
        assert(m("source") === "notion" && m("source_id") === pageId,
          name)
        assert(m("access_level") === 4, name)
      }
    }
  }

  test("chunk metadata defaults match the reference run (start 0, " +
      "end len(text) on absent keys)") {
    (fx \ "process_chunks").extract[List[JValue]].foreach { c =>
      val text = (c \ "text").extract[String]
      val start = (c \ "metadata" \ "start").extract[Long]
      val end = (c \ "metadata" \ "end").extract[Long]
      // the recorded metadata came from chunk dicts where chunk one
      // had NO start/end keys: replay absent as null
      val (inS, inE): (Option[Long], Option[Long]) =
        if ((c \ "chunk_number").extract[Int] == 0)
          (Some(start), Some(end)) else (None, None)
      val got = Seq((inS, inE, text)).toDF("s", "e", "text")
        .select(LegacyIngestion.chunkMeta(col("s"), col("e"),
          col("text")).as("m"))
        .select(col("m.start"), col("m.end")).collect().head
      assert((got.getLong(0), got.getLong(1)) === ((start, end)), text)
    }
  }

  test("Qdrant point render matches the reference run: ids, location, " +
      "and the payload key insertion order") {
    val sv = fx \ "store_vectors"
    assert((sv \ "collection").extract[String] === "documents")
    val points = (sv \ "points").extract[List[JValue]]
    val wantOrder = (points.head \ "payload_key_order")
      .extract[List[String]]
    val chunks = points.zipWithIndex.map { case (pt, i) =>
      val p = pt \ "payload"
      (( p \ "document_id").extract[String], i.toLong,
        (p \ "text").extract[String], (p \ "title").extract[String],
        (p \ "department").extract[String],
        (p \ "tags").extract[List[String]],
        (p \ "security_level").extract[String],
        (p \ "access_level").extract[Int],
        (p \ "created_at").extract[String])
    }.toDF("document_id", "chunk_number", "text", "title",
      "department", "tags", "security_level", "access_level",
      "created_at")
    val out = LegacyIngestion.qdrantPoints(chunks)
    // qdrantPoints' columns after point_id are the payload fields in
    // the script's insertion order
    assert(out.columns.head === "point_id")
    assert(out.columns.drop(1).toSeq === wantOrder)
    val rows = out.orderBy("chunk_number").collect()
    points.zip(rows).foreach { case (pt, r) =>
      assert(r.getAs[String]("point_id") === (pt \ "id").extract[String])
      assert(r.getAs[String]("location") ===
        (pt \ "payload" \ "location").extract[String])
    }
  }

  test("the run() loop's IngestionStatus matches: counters keep " +
      "pre-failure work, errors carry the Page prefix") {
    val rs = fx \ "run_status"
    // reconstruct the recorded run as a per-page frame: 3 pages x 2
    // chunks each; pgB carries 1 entity and FAILS at the vector store
    // (after chunk+entity counters) — its counts still count
    val perPage = Seq(
      (0L, "pgA", false, null: String, 2L, 0L, 0L),
      (1L, "pgB", true, "qdrant down", 2L, 1L, 0L),
      (2L, "pgC", false, null: String, 2L, 0L, 0L))
      .toDF("page_ord", "page_id", "failed", "error", "n_chunks",
        "n_entities", "n_relationships")
    val r = LegacyIngestion.statusSummary(perPage).collect().head
    assert(r.getLong(0) === (rs \ "total_pages").extract[Long])
    assert(r.getLong(1) === (rs \ "processed_pages").extract[Long])
    assert(r.getLong(2) === (rs \ "failed_pages").extract[Long])
    assert(r.getLong(3) === (rs \ "new_chunks").extract[Long])
    assert(r.getLong(4) === (rs \ "new_entities").extract[Long])
    assert(r.getLong(5) === (rs \ "new_relationships").extract[Long])
    assert(r.getString(6) ===
      (rs \ "errors").extract[List[String]].mkString("|"))
  }

  // ---- wave 11: the legacy API endpoints (legacy_api.json) ----

  private lazy val api: JValue =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/refparity/legacy_api.json"),
      "UTF-8").mkString)

  test("the task-status ladder matches the reference API run, incl. " +
      "FAILURE's str(None) render") {
    import spark.implicits._
    val cases = (api \ "task_status").extract[List[JValue]]
    val byName = cases.map(c => (c \ "name").extract[String] -> c).toMap
    // PENDING reads the placeholder
    assert((byName("pending") \ "info" \ "status").extract[String] ===
      "Task not found or pending")
    // PROCESSING surfaces result.info; SUCCESS surfaces result.result
    assert((byName("processing") \ "info" \ "status")
      .extract[String] === "Connecting to Notion...")
    assert((byName("success") \ "info" \ "status").extract[String] ===
      "completed")
    // FAILURE wraps str(result.info): 'boom' / 'None'
    assert((byName("failure") \ "info" \ "error").extract[String] ===
      "boom")
    assert((byName("failure_none_info") \ "info" \ "error")
      .extract[String] === "None")
    assert((byName("failure") \ "info" \ "status").extract[String] ===
      "failed")
    // any other state leaves info null
    assert((byName("revoked") \ "info") === JNull)
    // the Column face agrees on the same five states
    val out = Seq(
      ("PENDING", null: String, null: String, null: String),
      ("PROCESSING", "Connecting to Notion...", null: String,
        null: String),
      ("SUCCESS", null: String, "completed", null: String),
      ("FAILURE", null: String, null: String, "boom"),
      ("FAILURE", null: String, null: String, null: String),
      ("REVOKED", null: String, null: String, null: String))
      .toDF("state", "info", "result", "error")
      .select(LegacyIngestion.taskStatusInfo(col("state"), col("info"),
        col("result"), col("error"))).collect()
      .map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("Task not found or pending"),
      Some("Connecting to Notion..."), Some("completed"),
      Some("error=boom status=failed"),
      Some("error=None status=failed"), None))
  }

  test("cancel/trigger response vocabulary and the 400-collapses-to-" +
      "500 quirk match the reference API run") {
    import graft.operators.LegacyIngestion.Api
    assert((api \ "cancel" \ "status").extract[String] ===
      Api.cancelStatus)
    assert((api \ "cancel" \ "message").extract[String] ===
      Api.cancelMessage)
    val trig = (api \ "trigger").extract[List[JValue]]
    val byName = trig.map(c => (c \ "name").extract[String] -> c).toMap
    val ok = byName("ok_with_request_dbs")
    assert((ok \ "response" \ "status").extract[String] ===
      Api.triggerStatus)
    assert((ok \ "response" \ "message").extract[String] ===
      Api.triggerMessage)
    assert((ok \ "response" \ "check_url").extract[String] ===
      Api.checkUrl("task-123"))
    // request dbs pass through; env defaults apply when absent
    assert(Api.triggerValidation(Some("tok"), Some("envtok"),
      Some(Seq("db1")), None, Seq("db_env")) ===
      Right(("tok", Some(Seq("db1")))))
    assert((ok \ "delayed")(0) \ "notion_token" === JString("tok"))
    val env = byName("ok_env_defaults")
    assert((env \ "delayed")(0) \ "database_ids" ===
      JArray(List(JString("db_env"))))
    assert(Api.triggerValidation(None, Some("envtok"), None, None,
      Seq("db_env")) === Right(("envtok", Some(Seq("db_env")))))
    // the collapse quirk: recorded 500s wrap the Starlette string
    val noTok = byName("no_token_collapses_to_500")
    assert((noTok \ "error_status").extract[Int] === 500)
    assert((noTok \ "error_detail").extract[String] ===
      Api.collapse(400, Api.noTokenDetail)._2)
    assert(Api.triggerValidation(None, None, None, None,
      Seq("db_env")) === Left((500, "400: " + Api.noTokenDetail)))
    val noIds = byName("no_ids_collapses_to_500")
    assert((noIds \ "error_detail").extract[String] ===
      Api.collapse(400, Api.noIdsDetail)._2)
    assert(Api.triggerValidation(None, Some("envtok"), None, None,
      Nil) === Left((500, "400: " + Api.noIdsDetail)))
    // `or` truthiness: an empty-string request token falls back to
    // the env key, and 500s when that is missing too
    val emptyTok = byName("empty_token_falls_back")
    assert((emptyTok \ "delayed")(0) \ "notion_token" ===
      JString("envtok"))
    assert(Api.triggerValidation(Some(""), Some("envtok"),
      Some(Seq("db1")), None, Seq("db_env")) ===
      Right(("envtok", Some(Seq("db1")))))
    val emptyNoEnv = byName("empty_token_no_env_500")
    assert((emptyNoEnv \ "error_detail").extract[String] ===
      Api.collapse(400, Api.noTokenDetail)._2)
    assert(Api.triggerValidation(Some(""), None, None, None,
      Seq("db_env")) === Left((500, "400: " + Api.noTokenDetail)))
  }

  test("the sources listing matches the reference API run on the " +
      "configured/disabled forks") {
    import spark.implicits._
    (api \ "sources").extract[List[JValue]].foreach { c =>
      val name = (c \ "name").extract[String]
      for ((src, idsKey) <- Seq("notion" -> "database_ids",
          "google_drive" -> "folder_ids")) {
        val o = c \ "out" \ src
        val configured = (o \ "configured").extract[Boolean]
        val ids = (o \ idsKey).extract[List[String]]
        val interval = (o \ "scan_interval").extract[String]
        val got = LegacyIngestion.sourcesListing(Seq(
            (src, configured, Seq("id1"))).toDF("source", "configured",
            "ids"))
          .select(array_join(col("ids"), ",").as("ids"),
            col("scan_interval")).collect().head
        // the id list passes through only when configured
        assert((got.getString(0).nonEmpty) === configured,
          s"$name/$src")
        assert(got.getString(1) === interval, s"$name/$src")
        if (!configured) assert(ids === Nil, s"$name/$src")
      }
    }
  }
}
