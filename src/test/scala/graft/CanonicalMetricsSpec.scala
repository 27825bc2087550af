package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CanonicalMetrics

/** Canonical-entity metric refresh
  * (app/services/supabase_service.py:830-972). */
class CanonicalMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def entities = Seq(
    ("c1", 9L, 9L, 9L, 0.1,
      Map("quality_score" -> "0.25", "keep" -> "v")),
    ("c2", 9L, 9L, 9L, 0.1, Map.empty[String, String]),
    ("c3", 9L, 9L, 9L, 0.1, null.asInstanceOf[Map[String, String]]),
    ("by", 7L, 7L, 7L, 0.7, null.asInstanceOf[Map[String, String]]))
    .toDF("id", "mention_count", "document_count", "relationship_count",
      "quality_score", "metadata")

  private val noMentions = Seq.empty[(String, String, Option[Double])]
    .toDF("canonical_entity_id", "document_id", "confidence")
  private val noRels =
    Seq.empty[(String, String, Map[String, String])]
      .toDF("source_entity_id", "target_entity_id", "metadata")
  private val noDesc = Seq.empty[(String, String)]
    .toDF("id", "description")

  private def refreshed(mentions: org.apache.spark.sql.DataFrame =
                          noMentions,
                        rels: org.apache.spark.sql.DataFrame = noRels,
                        ids: Seq[String] = Seq("c1", "c2", "c3"),
                        desc: org.apache.spark.sql.DataFrame = noDesc) =
    CanonicalMetrics.refresh(entities, mentions, rels,
      ids.toDF("id"), desc, "TS")

  test("mention aggregation: counts, truthy doc set, numeric samples") {
    val mentions = Seq(
      ("c1", "D", Some(1.5)), ("c1", "A", Some(0.9)), ("c1", "", None),
      ("c2", "E", Some(-0.5)), ("c3", null, None))
      .toDF("canonical_entity_id", "document_id", "confidence")
    val out = refreshed(mentions = mentions)
      .select("id", "mention_count", "document_count", "quality_score")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      // avg(1.5, 0.9) = 1.2 clamps to 1.0; NULL-conf row still counts
      ("by", 7L, 7L, 0.7),
      ("c1", 3L, 2L, 1.0),
      // avg(-0.5) clamps to 0.0
      ("c2", 1L, 1L, 0.0),
      // zero numeric samples + NULL metadata -> 0.5
      ("c3", 1L, 0L, 0.5)))
  }

  test("zero-sample fallback reads the stored quality_score") {
    val out = refreshed().select("id", "quality_score")
      .as[(String, Double)].collect().toMap
    assert(out("c1") === 0.25) // stored metadata value
    assert(out("c2") === 0.5)  // empty metadata -> default
    assert(out("c3") === 0.5)  // NULL metadata -> default
  }

  test("relationship double-count: cross pair +2, self-loop +4, half +1") {
    val rels = Seq(
      ("c1", "c2", Map("document_id" -> "R")), // both requested
      ("c3", "c3", Map("document_id" -> "S")), // requested self-loop
      ("c1", "by", null.asInstanceOf[Map[String, String]]), // half
      ("zz", "c2", Map("document_id" -> "")))  // half, falsy doc
      .toDF("source_entity_id", "target_entity_id", "metadata")
    val out = refreshed(rels = rels)
      .select(col("id"), col("relationship_count"),
        element_at(col("metadata"), "relationship_document_ids").as("rd"))
      .as[(String, Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      ("by", 7L, None), // bystander endpoint gains nothing
      ("c1", 3L, Some("R")),
      ("c2", 3L, Some("R")),
      ("c3", 4L, Some("S"))))
  }

  test("request list is truthiness-filtered and deduped; missing id no-ops") {
    val out = refreshed(ids = Seq("c1", "c1", "", null, "missing"))
      .select("id", "mention_count").as[(String, Long)].collect().toMap
    assert(out === Map("c1" -> 0L, "c2" -> 9L, "c3" -> 9L, "by" -> 7L))
  }

  test("metadata: conditional list keys, stamp, None-valued description") {
    val mentions = Seq(("c1", "D", Some(0.5)))
      .toDF("canonical_entity_id", "document_id", "confidence")
    val desc = Seq(("c1", null.asInstanceOf[String]), ("c2", "fresh"))
      .toDF("id", "description")
    val out = refreshed(mentions = mentions, desc = desc)
      .select("id", "metadata")
      .as[(String, Map[String, String])].collect().toMap
    // key presence (not value truthiness) gates the description write
    assert(out("c1").contains("description") &&
      out("c1")("description") == null)
    assert(out("c1")("document_ids") === "D")
    assert(!out("c1").contains("relationship_document_ids"))
    assert(out("c1")("keep") === "v") // pre-existing keys survive
    assert(out("c2") === Map("last_refreshed_at" -> "TS",
      "description" -> "fresh"))
    // empty doc sets add no list keys; the stamp always lands
    assert(out("c3") === Map("last_refreshed_at" -> "TS"))
    // bystander NULL metadata is not coalesced
    assert(out("by") == null)
  }

  test("bystander rows pass through bit-identical") {
    val out = refreshed().where(col("id") === "by")
      .select("mention_count", "document_count", "relationship_count",
        "quality_score", "metadata")
      .as[(Long, Long, Long, Double, Map[String, String])]
      .collect().toSeq
    assert(out === Seq((7L, 7L, 7L, 0.7,
      null.asInstanceOf[Map[String, String]])))
  }
}
