package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationshipCuration

/** Relationship-curation mutations (app/api/relationships.py). */
class RelationshipCurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def rels = Seq(
    ("r1", "e1", "e2", "USES", 0.8, false, null.asInstanceOf[String],
      Map("review_rationale" -> "old", "x" -> "1")),
    ("r2", "e2", "e3", "PART_OF", 0.6, true, "T0",
      Map.empty[String, String]),
    ("r3", "e3", "e1", "USES", 0.5, false, null.asInstanceOf[String],
      null.asInstanceOf[Map[String, String]]))
    .toDF("id", "source_entity_id", "target_entity_id",
      "relationship_type", "confidence_score", "is_verified",
      "verified_at", "metadata")
    .withColumn("created_at", lit("T0"))

  test("create: manual stamp, document_context only when truthy, conf default") {
    val reqs = Seq(
      ("n1", "d9", "e1", "e3", "RELATES_TO", Some(0.4),
        Map("manual" -> "false", "note" -> "k")),
      ("n2", "", "e2", "e1", "USES", None, null.asInstanceOf[Map[String, String]]))
      .toDF("id", "document_id", "source_entity_id", "target_entity_id",
        "relationship_type", "confidence_score", "metadata")
    val out = RelationshipCuration.create(rels, reqs, "T1")
      .where(col("id").startsWith("n")).orderBy("id")
      .select("id", "confidence_score", "is_verified", "verified_at",
        "metadata", "created_at")
      .as[(String, Double, Boolean, String, Map[String, String], String)]
      .collect().toSeq
    assert(out === Seq(
      // caller's manual=false is OVERWRITTEN (dict assignment), the
      // free key survives, document_context records the doc
      ("n1", 0.4, true, "T1",
        Map("note" -> "k", "manual" -> "true", "created_via" -> "api",
          "document_context" -> "d9"), "T1"),
      // empty document_id is falsy -> no document_context; null
      // metadata -> fresh dict; null confidence -> model default 1.0
      ("n2", 1.0, true, "T1",
        Map("manual" -> "true", "created_via" -> "api"), "T1")))
  }

  test("create: caller document_context survives a falsy document_id") {
    // relationships.py:59-61 assigns metadata['document_context'] only
    // inside the `if request.document_id:` branch — a caller-supplied
    // key with no document_id is left intact (ADVICE r8).
    val reqs = Seq(
      ("n3", null.asInstanceOf[String], "e1", "e2", "USES", Some(0.9),
        Map("document_context" -> "caller-kept")),
      ("n4", "d7", "e2", "e3", "USES", Some(0.9),
        Map("document_context" -> "caller-lost")))
      .toDF("id", "document_id", "source_entity_id", "target_entity_id",
        "relationship_type", "confidence_score", "metadata")
    val out = RelationshipCuration.create(rels, reqs, "T1")
      .where(col("id").startsWith("n")).orderBy("id")
      .select("id", "metadata")
      .as[(String, Map[String, String])].collect().toSeq
    assert(out === Seq(
      ("n3", Map("document_context" -> "caller-kept",
        "manual" -> "true", "created_via" -> "api")),
      // truthy document_id overwrites, exactly like dict assignment
      ("n4", Map("document_context" -> "d7",
        "manual" -> "true", "created_via" -> "api"))))
  }

  test("update: partial fields; approved=false leaves verified_at; metadata replaces") {
    val afterFalse = RelationshipCuration.update(rels, "r2",
        relationshipType = Some("CONNECTS_TO"), approved = Some(false))
      .where(col("id") === "r2")
      .select("relationship_type", "is_verified", "verified_at")
      .as[(String, Boolean, String)].collect().head
    assert(afterFalse === ("CONNECTS_TO", false, "T0"))
    val afterTrue = RelationshipCuration.update(rels, "r1",
        approved = Some(true), metadata = Some(Map("y" -> "2")), now = "T2")
      .where(col("id") === "r1")
      .select("is_verified", "verified_at", "metadata")
      .as[(Boolean, String, Map[String, String])].collect().head
    // metadata REPLACED wholesale, not merged
    assert(afterTrue === ((true, "T2", Map("y" -> "2"))))
    // untouched rows stay bit-identical
    val others = RelationshipCuration.update(rels, "r1", approved = Some(true),
        now = "T2")
      .where(col("id") =!= "r1").orderBy("id")
      .select("is_verified", "verified_at")
      .as[(Boolean, Option[String])].collect().toSeq
    assert(others === Seq((true, Some("T0")), (false, None)))
  }

  test("bulkApprove: roster verifies + stamps; rationale merges over existing key") {
    val out = RelationshipCuration.bulkApprove(rels, Seq("r1", "r3", "zz"),
        Some("fine"), "T3")
      .orderBy("id")
      .select("id", "is_verified", "verified_at", "metadata")
      .as[(String, Boolean, String, Map[String, String])].collect().toSeq
    assert(out === Seq(
      // existing review_rationale overwritten, sibling key kept
      ("r1", true, "T3", Map("review_rationale" -> "fine", "x" -> "1")),
      ("r2", true, "T0", Map.empty[String, String]),
      // null metadata -> fresh dict with just the rationale
      ("r3", true, "T3", Map("review_rationale" -> "fine"))))
  }

  test("bulkApprove: empty rationale is falsy -> metadata untouched") {
    val out = RelationshipCuration.bulkApprove(rels, Seq("r1"), Some(""), "T3")
      .where(col("id") === "r1").select("metadata")
      .as[Map[String, String]].collect().head
    assert(out === Map("review_rationale" -> "old", "x" -> "1"))
  }

  test("bulkReject: flags + clears is_verified, keeps verified_at") {
    val out = RelationshipCuration.bulkReject(rels, Seq("r2"), None)
      .where(col("id") === "r2")
      .select("is_verified", "verified_at", "metadata")
      .as[(Boolean, String, Map[String, String])].collect().head
    assert(out === ((false, "T0", Map("proposal_rejected" -> "true"))))
  }

  test("delete filters the row; duplicate roster ids don't fan out") {
    assert(RelationshipCuration.delete(rels, "r2")
      .select("id").as[String].collect().sorted.toSeq === Seq("r1", "r3"))
    val n = RelationshipCuration.bulkReject(rels, Seq("r1", "r1", "r1"), None)
      .count()
    assert(n === 3)
  }

  test("bulk ops plan broadcast joins, never a shuffle of the rels side") {
    val plan = RelationshipCuration.bulkApprove(rels, Seq("r1"), None, "T")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
