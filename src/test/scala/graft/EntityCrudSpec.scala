package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityCrud

/** Pins the entities.py CRUD + listing semantics (:47-373, :583-677):
  * the min_quality>0 filter quirk, the document-before-entity lookup
  * order, the exact-triple duplicate check, metadata merge-vs-replace
  * truthiness, and the pending_review side effects. */
class EntityCrudSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def canonicalDf = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("e1", "Pump", "COMPONENT", Some(0.9), true),
      ("e2", "Seal", "COMPONENT", Some(0.4), false),
      ("e3", "Acme", "ORGANIZATION", None: Option[Double], false),
      ("e4", "Unmentioned", "OTHER", Some(1.0), true))
      .toDF("id", "name", "type", "quality_score", "is_validated")
  }

  private def mentionsDf = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("m1", "d1", Some("e1")), ("m2", "d1", Some("e1")),
      ("m3", "d1", Some("e2")), ("m4", "d1", Some("e3")),
      ("m5", "d2", Some("e2")), ("m6", "d2", None: Option[String]))
      .toDF("mention_id", "document_id", "canonical_entity_id")
  }

  test("listing: default keeps NULL quality, min_quality>0 drops it") {
    val spark2 = spark
    import spark2.implicits._
    val all = EntityCrud.listCanonical(canonicalDf, mentionsDf)
      .orderBy("document_id", "id")
      .select("document_id", "id", "mentions_in_document")
      .as[(String, String, Long)].collect().toSeq
    // d2's only other mention is un-canonicalized; e4 is never listed
    assert(all === Seq(("d1", "e1", 2L), ("d1", "e2", 1L),
      ("d1", "e3", 1L), ("d2", "e2", 1L)))
    // entities.py:89-90: gte applied only when min_quality > 0 — the
    // NULL-quality e3 survives the default listing, not the filtered
    val scored = EntityCrud.listCanonical(canonicalDf, mentionsDf,
      minQuality = 0.3).select("id").as[String].collect().toSet
    assert(scored === Set("e1", "e2"))
  }

  test("listing: type filter and per-document offset/limit paging") {
    val spark2 = spark
    import spark2.implicits._
    val typed = EntityCrud.listCanonical(canonicalDf, mentionsDf,
      entityType = Some("COMPONENT"))
      .select("document_id", "id").as[(String, String)].collect().toSet
    assert(typed === Set(("d1", "e1"), ("d1", "e2"), ("d2", "e2")))
    val page = EntityCrud.listCanonical(canonicalDf, mentionsDf,
      limit = 1, offset = 1)
      .select("document_id", "id").as[(String, String)].collect().toSet
    assert(page === Set(("d1", "e2"))) // d2 has only one row
  }

  test("get resolves document ids before entity ids (entities.py:141-160)") {
    val spark2 = spark
    import spark2.implicits._
    // "d1" is a document; "e2" an entity; "zz" neither. A canonical
    // entity named like a document id resolves as the document.
    val requests = Seq("d1", "e2", "zz").toDF("request_id")
    val out = EntityCrud.resolveEntityOrDocument(requests, canonicalDf,
        mentionsDf)
      .orderBy("request_id", "id")
      .select("request_id", "arm", "id", "n_mentions")
      .as[(String, String, String, Option[Long])].collect().toSeq
    assert(out === Seq(
      ("d1", "document", "e1", None),
      ("d1", "document", "e2", None),
      ("d1", "document", "e3", None),
      ("e2", "entity", "e2", Some(2L))))
  }

  test("create: 404 / duplicate-400 / created arms with doc side effect") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq("d1", "d2").toDF("document_id")
    val existing = Seq(("d1", "Pump", "COMPONENT"))
      .toDF("document_id", "entity_name", "entity_type")
    val requests = Seq(
      ("r1", "d1", "Pump", "COMPONENT", 0.9, false),  // exact dup → 400
      ("r2", "d1", "pump", "COMPONENT", 0.9, false),  // case differs → new
      ("r3", "d9", "Valve", "COMPONENT", 0.8, true),  // no doc → 404
      ("r4", "d2", "Valve", "COMPONENT", 0.8, true))  // manual create
      .toDF("request_id", "document_id", "entity_name", "entity_type",
        "confidence", "manual")
    val out = EntityCrud.createMentions(docs, existing, requests)
      .orderBy("request_id")
      .select("request_id", "arm", "manually_created", "doc_status")
      .as[(String, String, Option[Boolean], Option[String])]
      .collect().toSeq
    assert(out === Seq(
      ("r1", "duplicate", None, None),
      ("r2", "created", None, Some("pending_review")),
      ("r3", "no_document", None, None),
      ("r4", "created", Some(true), Some("pending_review"))))
  }

  test("update: None keeps fields, metadata merges only when truthy") {
    val spark2 = spark
    import spark2.implicits._
    val mentions = Seq(
      ("m1", "d1", "Pump", "COMPONENT", 0.5, Map("a" -> "1", "b" -> "2")),
      ("m2", "d1", "Seal", "COMPONENT", 0.6, Map.empty[String, String]),
      ("m3", "d2", "Acme", "ORGANIZATION", 0.7, Map("x" -> "9")))
      .toDF("entity_id", "document_id", "entity_name", "entity_type",
        "confidence", "metadata")
    val updates = Seq(
      // merge: new wins on "b", "a" kept, original snapshot surfaced
      ("m1", Some("Pump X"), None: Option[String], None: Option[Double],
        Some(Map("b" -> "3", "c" -> "4")), true),
      // merge requested but existing map empty (falsy) → replace path
      ("m2", None: Option[String], None: Option[String], Some(0.9),
        Some(Map("k" -> "v")), true))
      .toDF("entity_id", "new_name", "new_type", "new_confidence",
        "new_metadata", "merge_metadata")
    val out = EntityCrud.updateMentions(mentions, updates)
      .orderBy("entity_id")
      .select("entity_id", "entity_name", "entity_type", "confidence",
        "metadata", "old_name", "old_confidence", "manually_edited",
        "doc_status")
      .as[(String, String, String, Double, Map[String, String],
        Option[String], Option[Double], Option[Boolean], Option[String])]
      .collect().toSeq
    assert(out(0) === ("m1", "Pump X", "COMPONENT", 0.5,
      Map("a" -> "1", "b" -> "3", "c" -> "4"), Some("Pump"), Some(0.5),
      Some(true), Some("pending_review")))
    assert(out(1) === ("m2", "Seal", "COMPONENT", 0.9, Map("k" -> "v"),
      Some("Seal"), Some(0.6), Some(true), Some("pending_review")))
    // untouched mention in an untouched doc: no status side effect
    assert(out(2) === ("m3", "Acme", "ORGANIZATION", 0.7, Map("x" -> "9"),
      None, None, None, None))
  }

  test("duplicate update keys collapse; duplicate creates 400 in-batch") {
    val spark2 = spark
    import spark2.implicits._
    val mentions = Seq(("m1", "d1", "Pump", "COMPONENT", 0.5,
        Map.empty[String, String]))
      .toDF("entity_id", "document_id", "entity_name", "entity_type",
        "confidence", "metadata")
    val updates = Seq(
      ("m1", Some("AAA"), None: Option[String], None: Option[Double],
        None: Option[Map[String, String]], false),
      ("m1", Some("ZZZ"), None: Option[String], None: Option[Double],
        None: Option[Map[String, String]], false))
      .toDF("entity_id", "new_name", "new_type", "new_confidence",
        "new_metadata", "merge_metadata")
    val upd = EntityCrud.updateMentions(mentions, updates)
    assert(upd.count() === 1) // never multiplied
    assert(upd.select("entity_name").as[String].head() === "ZZZ")
    // two identical creates in one batch: applying the endpoint
    // call-by-call, the first creates and the second is the 400
    val docs = Seq("d1").toDF("document_id")
    val existing = Seq.empty[(String, String, String)]
      .toDF("document_id", "entity_name", "entity_type")
    val requests = Seq(
      ("r1", "d1", "Valve", "COMPONENT", 0.8, false),
      ("r2", "d1", "Valve", "COMPONENT", 0.8, false))
      .toDF("request_id", "document_id", "entity_name", "entity_type",
        "confidence", "manual")
    val arms = EntityCrud.createMentions(docs, existing, requests)
      .orderBy("request_id").select("request_id", "arm")
      .as[(String, String)].collect().toSeq
    assert(arms === Seq(("r1", "created"), ("r2", "duplicate")))
  }

  test("dangling canonical ids still resolve as a document (empty list)") {
    val spark2 = spark
    import spark2.implicits._
    // 'dX' has canonicalized mentions but their entity rows are gone:
    // the reference enters the document arm on the mention check and
    // returns [] — it must NOT fall through to the entity lookup,
    // even though a canonical entity named 'dX' exists
    val mentions = Seq(("m1", "dX", Some("ghost")))
      .toDF("mention_id", "document_id", "canonical_entity_id")
    val canonical = Seq(("dX", "Trap", "OTHER", Some(0.5), false))
      .toDF("id", "name", "type", "quality_score", "is_validated")
    val requests = Seq("dX").toDF("request_id")
    val out = EntityCrud.resolveEntityOrDocument(requests, canonical,
      mentions)
    assert(out.count() === 0)
  }

  test("delete drops the mention and flags only its document") {
    val spark2 = spark
    import spark2.implicits._
    val deletes = Seq("m3").toDF("entity_id")
    val out = EntityCrud.deleteMentions(
        mentionsDf.withColumn("entity_name", lit("n"))
          .withColumn("entity_type", lit("t"))
          .withColumn("confidence", lit(0.5))
          .withColumnRenamed("mention_id", "entity_id"),
        deletes)
      .orderBy("entity_id")
      .select("entity_id", "doc_status")
      .as[(String, Option[String])].collect().toSeq
    assert(out.map(_._1) === Seq("m1", "m2", "m4", "m5", "m6"))
    // d1 rows flagged, d2 rows not
    assert(out.filter(r => Set("m1", "m2", "m4")(r._1))
      .forall(_._2 === Some("pending_review")))
    assert(out.filter(r => Set("m5", "m6")(r._1)).forall(_._2.isEmpty))
  }

  test("document entity report: by-type census with totals") {
    val spark2 = spark
    import spark2.implicits._
    val out = EntityCrud.documentEntityReport(canonicalDf, mentionsDf)
      .orderBy("document_id", "type")
      .select("document_id", "type", "n_of_type", "total_entities")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("d1", "COMPONENT", 2L, 3L),
      ("d1", "ORGANIZATION", 1L, 3L),
      ("d2", "COMPONENT", 1L, 1L)))
  }
}
