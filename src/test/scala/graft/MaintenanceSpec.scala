package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

/** Root-level maintenance scripts as batch operators
  * (cleanup_duplicate_relationships.py, migrate_relationship_types.py,
  * reset_stuck_documents.py, backfill_canonical_ids.py). */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // ---- cleanupDuplicateRelationships -------------------------------

  private def rel(id: String, src: String, tgt: String, typ: String,
      verified: Boolean = false, manual: Boolean = false,
      docId: Option[String] = Some("d1"), created: Option[String] = Some("2024-01-01"),
      conf: Option[Double] = Some(0.5)) =
    (id, src, tgt, typ, verified, manual, docId.orNull, created.orNull,
      conf.map(Double.box).orNull)

  private def relDf(rows: Seq[(String, String, String, String, Boolean,
      Boolean, String, String, java.lang.Double)]) =
    rows.toDF("id", "source_entity_id", "target_entity_id",
      "relationship_type", "is_verified", "meta_manual",
      "meta_document_id", "created_at", "confidence_score")

  private def actions(rows: Seq[(String, String, String, String, Boolean,
      Boolean, String, String, java.lang.Double)]): Map[String, String] =
    Maintenance.cleanupDuplicateRelationships(relDf(rows))
      .select("id", "action").as[(String, String)].collect().toMap

  test("cleanup: manual flag beats recency and confidence") {
    val a = actions(Seq(
      rel("r1", "a", "b", "USES", created = Some("2024-06-01"), conf = Some(0.99)),
      rel("r2", "a", "b", "USES", verified = true, created = Some("2023-01-01"),
        conf = Some(0.1))))
    assert(a === Map("r1" -> "delete", "r2" -> "keep"))
  }

  test("cleanup: missing or blank document_id counts as manual (:66)") {
    val a = actions(Seq(
      rel("r1", "a", "b", "USES", docId = None, conf = Some(0.1),
        created = Some("2023-01-01")),
      rel("r2", "a", "b", "USES", conf = Some(0.9), created = Some("2024-01-01")),
      rel("r3", "a", "b", "USES", docId = Some(""), conf = Some(0.2),
        created = Some("2023-06-01"))))
    // r1 and r3 are both "manual"; recency breaks the tie for r3
    assert(a === Map("r1" -> "delete", "r2" -> "delete", "r3" -> "keep"))
  }

  test("cleanup: recency beats confidence; missing created_at sorts last") {
    val a = actions(Seq(
      rel("r1", "a", "b", "USES", created = Some("2024-01-02"), conf = Some(0.1)),
      rel("r2", "a", "b", "USES", created = Some("2024-01-01"), conf = Some(0.9)),
      rel("r3", "a", "b", "USES", created = None, conf = Some(1.0))))
    assert(a === Map("r1" -> "keep", "r2" -> "delete", "r3" -> "delete"))
  }

  test("cleanup: confidence breaks equal timestamps; id pins full ties") {
    val a = actions(Seq(
      rel("r1", "a", "b", "USES", conf = Some(0.3)),
      rel("r2", "a", "b", "USES", conf = Some(0.7)),
      rel("r3", "a", "b", "USES", conf = None), // missing conf → 0
      rel("r4", "x", "y", "CAUSES"),
      rel("r5", "x", "y", "CAUSES")))
    assert(a("r2") === "keep" && a("r1") === "delete" && a("r3") === "delete")
    assert(a("r4") === "keep" && a("r5") === "delete") // full tie → min id
  }

  test("cleanup: singleton groups are untouched; summary census") {
    val rows = Seq(
      rel("r1", "a", "b", "USES"), rel("r2", "a", "b", "USES"),
      rel("r3", "a", "b", "CAUSES"), // different type → own group
      rel("r4", "c", "d", "USES"))
    val census = Maintenance.cleanupDuplicateRelationships(relDf(rows))
    assert(census.where(col("action") === "untouched")
      .select("id").as[String].collect().toSet === Set("r3", "r4"))
    val s = Maintenance.cleanupSummary(census)
      .as[(Long, Long, Long, Long)].collect().head
    assert(s === ((4L, 1L, 1L, 3L)))
  }

  // ---- migrateRelationshipTypes ------------------------------------

  test("migrate: canonical stays, aliases/sanitize/null migrate") {
    val out = Maintenance.migrateRelationshipTypes(
      Seq(("r1", "CAUSES"), ("r2", "may cause"), ("r3", null),
        ("r4", "part of"), ("r5", "depends_on"))
        .toDF("id", "relationship_type"))
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("r1") === (("CAUSES", "CAUSES", "already_canonical")))
    assert(out("r2") === (("may cause", "CAUSES", "migrated")))
    // missing type reads as '' (:47) → RELATES_TO, migrated
    assert(out("r3") === (("", "RELATES_TO", "migrated")))
    assert(out("r4") === (("part of", "RELATES_TO", "migrated")))
    assert(out("r5") === (("depends_on", "DEPENDS_ON", "migrated")))
    val hist = Maintenance.migrateSummary(
      Maintenance.migrateRelationshipTypes(
        Seq(("a", "may cause"), ("b", "may cause"), ("c", "CAUSES"))
          .toDF("id", "relationship_type")))
      .as[(String, String, Long)].collect().toSet
    assert(hist === Set(("may cause", "CAUSES", 2L)))
  }

  // ---- resetStuckDocuments -----------------------------------------

  test("reset: only processing rows, title → name → Untitled chain") {
    val out = Maintenance.resetStuckDocuments(
      Seq(("d1", "processing", "Title A", "name-a"),
        ("d2", "processing", null, "name-b"),
        ("d3", "processing", null, null),
        ("d4", "discovered", "Title D", "name-d"))
        .toDF("id", "status", "title", "name"))
      .as[(String, String, String, String)].collect().toSet
    assert(out === Set(
      ("d1", "Title A", "processing", "discovered"),
      ("d2", "name-b", "processing", "discovered"),
      ("d3", "Untitled", "processing", "discovered")))
  }

  // ---- backfillCanonicalIds ----------------------------------------

  private def mentions(rows: (Long, String, String, String)*) =
    rows.toSeq.toDF("mention_id", "text", "mtype", "canonical_entity_id")

  private def canon(rows: (String, String, String, Boolean)*) =
    rows.toSeq.toDF("id", "name", "ctype", "is_validated")

  private def backfill(m: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame) =
    Maintenance.backfillCanonicalIds(m, c)
      .as[(Long, String, String, String, Boolean, String)]
      .collect().map(r => r._1 -> ((r._4, r._5, r._6))).toMap

  test("backfill: assigned mentions excluded, blanks skipped") {
    val out = backfill(
      mentions((1L, "Pump", "COMPONENT", "already"),
        (2L, "", "COMPONENT", null), (3L, "   ", "COMPONENT", null),
        (4L, "Pump", "COMPONENT", null)),
      canon())
    assert(!out.contains(1L))
    assert(out(2L)._3 === "skipped_blank" && out(3L)._3 === "skipped_blank")
    assert(out(4L) === (("ce:pump:COMPONENT", true, "assigned")))
  }

  test("backfill: validated same-name canonical wins over exact type") {
    val out = backfill(
      mentions((1L, "Pump", "COMPONENT", null)),
      canon(("c1", "Pump", "COMPONENT", false),
        ("c2", "Pump", "MATERIAL", true)))
    // upsert :479-500 — the validated row is reused even though an
    // exact (name, type) match exists
    assert(out(1L) === (("c2", false, "assigned")))
  }

  test("backfill: exact (name, TYPE) beats lowercased; min id pins limit-1") {
    val store = canon(("c3", "Pump", "COMPONENT", false),
      ("c1", "Pump", "COMPONENT", false),
      ("c2", "Pump", "component", false))
    assert(backfill(mentions((1L, "Pump", "component", null)), store)(1L)
      === (("c1", false, "assigned"))) // normalizes to COMPONENT, upper first
    assert(backfill(mentions((1L, "Pump", null, null)),
      canon(("c9", "Pump", "concept", false)))(1L)
      === (("c9", false, "assigned"))) // null type → CONCEPT, lower arm hits
  }

  test("backfill: name match is exact-case (supabase eq)") {
    val out = backfill(
      mentions((1L, "pump", "COMPONENT", null)),
      canon(("c1", "Pump", "COMPONENT", true)))
    // 'pump' ≠ 'Pump' for both the validated and exact probes → mint
    assert(out(1L) === (("ce:pump:COMPONENT", true, "assigned")))
  }

  test("backfill: falsy type → CONCEPT; whitespace-only type never resolves") {
    val out = backfill(
      mentions((1L, "Valve", null, null), (2L, "Valve", "", null),
        (3L, "Valve", "  ", null)),
      canon())
    assert(out(1L) === (("ce:valve:CONCEPT", true, "assigned")))
    assert(out(2L) === (("ce:valve:CONCEPT", true, "assigned")))
    // the '' normalized type misses the CONCEPT-keyed upsert map
    // (backfill :87-96 vs upsert :476) — stays unassigned
    assert(out(3L) === ((null, false, "unmatched")))
  }

  test("backfill: group display name is the first-fetched (min mention id)") {
    val out = Maintenance.backfillCanonicalIds(
      mentions((5L, "PUMP", "COMPONENT", null),
        (2L, "Pump", "COMPONENT", null)),
      canon())
      .select("mention_id", "entity_name", "canonical_id")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // both mentions fold into one ('pump', COMPONENT) group whose
    // display/store-probe name is mention 2's exact-case 'Pump'
    assert(out(5L) === (("PUMP", "ce:pump:COMPONENT")))
    assert(out(2L) === (("Pump", "ce:pump:COMPONENT")))
  }

  test("cleanup and backfill are partition-count invariant") {
    // the ladder's id tiebreak pins a total order, and the backfill
    // ladder reduces every store probe to a min-id row — so both
    // outputs must be byte-stable under any input partitioning
    val rels = Seq(
      rel("r1", "a", "b", "USES", created = Some("2024-01-01")),
      rel("r2", "a", "b", "USES", created = Some("2024-01-01")),
      rel("r3", "a", "b", "USES", verified = true),
      rel("r4", "c", "d", "REL"))
    def runCleanup(p: Int) =
      Maintenance.cleanupDuplicateRelationships(relDf(rels).repartition(p))
        .orderBy("id").collect().toSeq
    assert(runCleanup(1) === runCleanup(7))
    val ms = Seq((1L, "Pump", "COMPONENT", null: String),
      (2L, "pump", "component", null), (3L, "Valve", null, null))
    val cs = Seq(("c1", "Pump", "COMPONENT", true),
      ("c2", "Pump", "component", false))
    def runBackfill(p: Int) =
      Maintenance.backfillCanonicalIds(
        ms.toDF("mention_id", "text", "mtype", "canonical_entity_id")
          .repartition(p),
        cs.toDF("id", "name", "ctype", "is_validated").repartition(p))
        .orderBy("mention_id").collect().toSeq
    assert(runBackfill(1) === runBackfill(5))
  }

  // ---- fixEntityTypes ----------------------------------------------

  private def fixRows(rows: (Long, String, String, Boolean, Boolean)*)
      : Map[Long, (String, String, String, Boolean, Boolean)] =
    Maintenance.fixEntityTypes(
      rows.toDF("id", "entity_type", "type", "has_entity_type", "has_type"))
      .as[(Long, String, String, String, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("fix types: mapping, case-normalize, unknown→other, valid untouched") {
    val out = fixRows(
      (1L, "component", null, true, false),
      (2L, "Component", null, true, false),
      (3L, "IssueType", null, true, true),
      (4L, "  Connector  ", null, true, false),
      (5L, "Widget", null, true, false))
    assert(out(1L) === (("component", "component", "already_valid",
      false, false)))
    assert(out(2L) === (("Component", "component", "case_normalized",
      true, false)))
    assert(out(3L) === (("IssueType", "problem", "mapped", true, true)))
    // stripped before matching; the case-insensitive map arm
    assert(out(4L) === (("Connector", "component", "mapped", true, false)))
    assert(out(5L) === (("Widget", "other", "defaulted_unknown",
      true, false)))
  }

  test("fix types: Python-or fallback — empty entity_type reads `type`, " +
      "whitespace-only is truthy and strips to missing") {
    val out = fixRows(
      (1L, "", "Solvent", true, true),
      (2L, null, "Equipment", false, true),
      // '   ' is truthy → taken, strips to '' → the default arm
      // (fix_entity_types.py:73-75, :136-147), NOT the type fallback
      (3L, "   ", "person", true, true),
      (4L, null, null, true, false))
    assert(out(1L) === (("Solvent", "chemical", "mapped", true, true)))
    assert(out(2L) === (("Equipment", "tool", "mapped", false, true)))
    assert(out(3L) === (("", "other", "defaulted_missing", true, true)))
    assert(out(4L) === (("", "other", "defaulted_missing", true, false)))
  }

  test("fix types: summary counts fixed even when no column exists to " +
      "write; distribution keys truthy pre-fix reads") {
    val census = Maintenance.fixEntityTypes(Seq(
      (1L, "component", null, true, true),
      (2L, "Status", null, false, false), // fixed, writes nowhere (:117)
      (3L, null, null, false, false))
      .toDF("id", "entity_type", "type", "has_entity_type", "has_type"))
    assert(census.where(col("id") === 2L)
      .select("wrote_entity_type", "wrote_type")
      .as[(Boolean, Boolean)].head() === ((false, false)))
    val s = Maintenance.fixEntityTypesSummary(census)
      .as[(Long, Long, Long)].head()
    assert(s === ((3L, 2L, 1L)))
    val d = Maintenance.entityTypeDistribution(census)
      .as[(String, Long)].collect().toMap
    assert(d === Map("component" -> 1L, "Status" -> 1L))
  }
}
