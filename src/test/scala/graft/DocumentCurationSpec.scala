package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DocumentCuration
import graft.operators.DocumentCuration.DocUpdate

/** Document-curation mutations + detail enrichment
  * (app/api/documents.py). */
class DocumentCurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs = Seq(
    ("d1", "Doc One", "alice", "text/plain", "approved", "client", 2,
      Map("topic" -> "pumps", "author" -> "meta-alice")),
    ("d2", "Doc Two", null.asInstanceOf[String], null.asInstanceOf[String],
      "pending_review", "public", 1, null.asInstanceOf[Map[String, String]]))
    .toDF("id", "name", "author", "mime_type", "status",
      "security_level", "access_level", "metadata")
    .withColumn("updated_at", lit("T0"))

  test("update: metadata pops specials, merges remainder; direct fields win") {
    val got = DocumentCuration.updateDocument(docs, "d1",
        DocUpdate(
          author = Some("carol"),
          metadata = Some(Map("author" -> "bob", "mime_type" -> "text/md",
            "topic" -> "valves", "extra" -> "1"))),
        now = "T1")
      .where(col("id") === "d1")
      .select("author", "mime_type", "metadata", "updated_at")
      .as[(String, String, Map[String, String], String)].collect().head
    // metadata's author pops to the column but the DIRECT payload
    // author overwrites it; mime_type pops; the remainder merges over
    // existing keys (topic overwritten, extra added) — the pop
    // removes author only from the INCOMING dict, so the existing
    // metadata's own author key survives the merge
    assert(got === (("carol", "text/md",
      Map("author" -> "meta-alice", "topic" -> "valves", "extra" -> "1"),
      "T1")))
  }

  test("update: title maps to name only without a direct name") {
    val a = DocumentCuration.updateDocument(docs, "d2",
        DocUpdate(title = Some("Renamed")), "T1")
      .where(col("id") === "d2").select("name").as[String].collect().head
    assert(a === "Renamed")
    val b = DocumentCuration.updateDocument(docs, "d2",
        DocUpdate(title = Some("Ignored"), name = Some("Direct")), "T1")
      .where(col("id") === "d2").select("name").as[String].collect().head
    assert(b === "Direct")
  }

  test("update: security cascade clobbers explicit access_level; unknown -> 1") {
    val got = DocumentCuration.updateDocument(docs, "d1",
        DocUpdate(securityLevel = Some("management"), accessLevel = Some(9)),
        "T1")
      .where(col("id") === "d1")
      .select("security_level", "access_level")
      .as[(String, Int)].collect().head
    assert(got === (("management", 5)))
    val unk = DocumentCuration.updateDocument(docs, "d1",
        DocUpdate(metadata = Some(Map("security_level" -> "martian"))), "T1")
      .where(col("id") === "d1")
      .select("security_level", "access_level")
      .as[(String, Int)].collect().head
    assert(unk === (("martian", 1)))
  }

  test("update touches only the hit row; soft delete = rejected + stamp") {
    val other = DocumentCuration.updateDocument(docs, "d1",
        DocUpdate(status = Some("published")), "T1")
      .where(col("id") === "d2")
      .select("status", "updated_at").as[(String, String)].collect().head
    assert(other === (("pending_review", "T0")))
    val soft = DocumentCuration.softDelete(docs, "d2", "T2")
      .orderBy("id").select("status", "updated_at")
      .as[(String, String)].collect().toSeq
    assert(soft === Seq(("approved", "T0"), ("rejected", "T2")))
  }

  test("hard delete cascades all three tables") {
    val chunks = Seq(("d1", 0), ("d2", 0), ("d2", 1)).toDF("document_id", "i")
    val mentions = Seq(("d2", "m1")).toDF("document_id", "mid")
    val (d, c, m) = DocumentCuration.hardDelete(docs, chunks, mentions, "d2")
    assert(d.select("id").as[String].collect().toSeq === Seq("d1"))
    assert(c.count() === 1 && m.count() === 0)
  }

  test("enrichEntities: precedence chains, attributes hoist, canonical ride-along") {
    val mentions = Seq(
      // canonical hit with truthy type -> canonical type wins
      ("m1", "", "Pump A", "component", null.asInstanceOf[String],
        Some(0.7), Some(0.2), Map("k" -> "v"), "attr1", "c1"),
      // canonical hit with EMPTY type -> mention chain; legacy conf
      ("m2", "Valve", null.asInstanceOf[String], "", "legacy",
        None, Some(0.3), Map("attributes" -> "kept"), "attr2", "c2"),
      // no canonical (empty string id is falsy); all fallbacks bottom out
      ("m3", null.asInstanceOf[String], "Fallback", null.asInstanceOf[String],
        null.asInstanceOf[String], None, None,
        null.asInstanceOf[Map[String, String]], null.asInstanceOf[String], ""))
      .toDF("id", "entity_name", "name", "entity_type", "type",
        "confidence_score", "confidence", "metadata", "attributes",
        "canonical_entity_id")
    val canonicals = Seq(
      ("c1", "Pump Alpha", "COMPONENT", Map("c" -> "1")),
      ("c2", "Valve Canon", "", Map.empty[String, String]))
      .toDF("id", "name", "type", "metadata")
    val got = DocumentCuration.enrichEntities(mentions, canonicals)
      .orderBy("id")
      .as[(String, String, String, Double, Map[String, String],
        Option[String], Option[String], Option[String],
        Option[Map[String, String]])]
      .collect().toSeq
    assert(got === Seq(
      // empty entity_name falls to name; attributes hoisted (key absent)
      ("m1", "Pump A", "COMPONENT", 0.7,
        Map("k" -> "v", "attributes" -> "attr1"),
        Some("c1"), Some("Pump Alpha"), Some("COMPONENT"), Some(Map("c" -> "1"))),
      // canonical type falsy -> entity_type ""  is falsy too -> legacy
      // type; attributes key PRESENT -> no hoist; canonical_type
      // reports the raw stored "" value
      ("m2", "Valve", "legacy", 0.3, Map("attributes" -> "kept"),
        Some("c2"), Some("Valve Canon"), Some(""), Some(Map.empty[String, String])),
      // everything null: conf defaults 1.0, metadata -> fresh dict
      ("m3", "Fallback", null, 1.0, Map.empty[String, String],
        None, None, None, None)))
  }

  test("process admission: force skips the state gate except processing") {
    val docsDf = Seq(
      ("p1", "approved"), ("p2", "processing"), ("p3", "failed"),
      ("p4", "discovered"), ("p5", "pending_review"))
      .toDF("document_id", "status")
    val chunks = Seq("p1", "p1", "p2", "p3").toDF("document_id")
    val mentions = Seq("p1", "p3", "p3").toDF("document_id")
    val rels = Seq("p1").toDF("document_id")
    val requests = Seq(
      ("p1", true),   // force from approved → queued + cleanup counts
      ("p2", true),   // force but mid-processing → busy 400
      ("p3", false),  // normal from failed → queued, NO cleanup
      ("p5", false),  // normal from pending_review → bad_state 400
      ("p9", true))   // unknown document → 404
      .toDF("document_id", "force_reprocess")
    val out = DocumentCuration.processAdmission(docsDf, chunks, mentions,
        rels, requests)
      .orderBy("document_id")
      .select("document_id", "arm", "new_status", "chunks_deleted",
        "mentions_deleted", "relationships_deleted")
      .as[(String, String, Option[String], Long, Long, Long)]
      .collect().toSeq
    assert(out === Seq(
      ("p1", "queued", Some("processing"), 2L, 1L, 1L),
      ("p2", "busy", Some("processing"), 0L, 0L, 0L),
      ("p3", "queued", Some("processing"), 0L, 0L, 0L),
      ("p5", "bad_state", Some("pending_review"), 0L, 0L, 0L),
      ("p9", "not_found", None, 0L, 0L, 0L)))
  }

  test("metadata route: dead merge param, empty-dict rewrite, null existing") {
    // PUT /{id}/metadata (documents.py:887-902) delegates with payload
    // {"metadata": ...} and DROPS its merge query param — merge=false
    // still merges; an empty dict rewrites the existing map unchanged;
    // a null existing map merges as {}
    val base = Seq(
      ("m1", "a0", "t/p", "public", 1, Map("keep" -> "v")),
      ("m2", "a0", "t/p", "public", 1, null.asInstanceOf[Map[String, String]]))
      .toDF("document_id", "author", "mime_type", "security_level",
        "access_level", "metadata")
    val requests = Seq(
      ("m1", Map("extra" -> "e"), false), // merge=false: still merges
      ("m2", Map.empty[String, String], true))
      .toDF("document_id", "new_metadata", "merge")
    val out = DocumentCuration.updateMetadataBatch(base, requests, "T1")
      .orderBy("document_id")
      .select(col("document_id"), col("arm"),
        element_at(col("metadata"), "keep"),
        element_at(col("metadata"), "extra"),
        size(col("metadata")), col("updated_at"), col("message"))
      .as[(String, String, Option[String], Option[String], Int,
        String, String)]
      .collect().toSeq
    assert(out === Seq(
      ("m1", "updated", Some("v"), Some("e"), 2, "T1",
        "Document m1 updated successfully"),
      ("m2", "updated", None, None, 0, "T1",
        "Document m2 updated successfully")))
    // the LIVE route outcome: update_document receives a plain dict
    // and calls .dict() on it after the 404 check (documents.py:833),
    // so every existing document 500s and only the 404 is reachable
    val live = DocumentCuration.updateMetadataBatch(base,
        Seq(("m1", Map("x" -> "1"), true), ("mX", Map("x" -> "1"), true))
          .toDF("document_id", "new_metadata", "merge"), "T1")
      .orderBy("document_id")
      .select("document_id", "route_arm", "route_detail")
      .as[(String, String, String)].collect().toSeq
    assert(live === Seq(
      ("m1", "error_500", "'dict' object has no attribute 'dict'"),
      ("mX", "not_found", "Document mX not found")))
  }

  test("extract-metadata admission: 404 / falsy-content 400 / queued") {
    val docsDf = Seq(
      ("e1", "some content"), ("e2", ""), ("e3", null.asInstanceOf[String]))
      .toDF("document_id", "content")
    val requests = Seq("e1", "e2", "e3", "e9").toDF("document_id")
    val out = DocumentCuration.extractMetadataAdmission(docsDf, requests)
      .orderBy("document_id")
      .select("document_id", "arm", "message")
      .as[(String, String, Option[String])].collect().toSeq
    assert(out === Seq(
      ("e1", "queued", Some("Metadata extraction started for document e1")),
      ("e2", "no_content", None),
      ("e3", "no_content", None),
      ("e9", "not_found", None)))
  }
}
