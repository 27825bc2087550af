package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityQuality

/** Entity-quality validator parity (entity_quality.py:94-324). */
class EntityQualitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def reasonOf(name: String): Option[String] =
    Seq(Tuple1(name)).toDF("n")
      .select(EntityQuality.invalidReason(col("n")).as("r"))
      .as[Option[String]].head()

  test("validity precedence and the acronym short-circuit") {
    assert(reasonOf("") === Some("empty_name"))
    assert(reasonOf("   ") === Some("empty_name"))
    assert(reasonOf("ab") === Some("too_short"))
    // "it" is a pronoun AND a stopword, but upper("it") = "IT" is a
    // known acronym — the whitelist short-circuits everything
    assert(reasonOf("it") === None)
    assert(reasonOf("ui") === None) // acronym beats too_short
    assert(reasonOf("this") === Some("pronoun"))
    assert(reasonOf("what happened") === Some("question_phrase"))
    assert(reasonOf("was broken") === Some("verb_phrase"))
    assert(reasonOf("broken was") === None) // verb must LEAD the phrase
    assert(reasonOf("today") === Some("generic_term"))
    // domain exceptions excuse stopwords at the validity tier
    assert(reasonOf("process") === None)
    assert(reasonOf("system check") === None) // stopword inside a compound is fine
    assert(reasonOf("a1 b2 c3 d4 e5 f6 g7 h8 i9 j0") === Some("sentence_fragment"))
    assert(reasonOf("fixed yesterday morning") === Some("temporal_reference"))
    assert(reasonOf("123 456") === Some("pure_number"))
    assert(reasonOf("pump seal") === None)
  }

  private def score(name: String, tpe: String, conf: Double,
      rels: Long): Double =
    Seq((name, tpe, conf, rels)).toDF("n", "t", "c", "r")
      .select(EntityQuality.qualityScore(col("n"), col("t"), col("c"),
        col("r")).as("s"))
      .as[Double].head()

  test("quality score factor chain matches the reference numbers") {
    // acronym x1.5, len<5 x0.7
    assert(math.abs(score("API", null, 0.5, 0) - 0.5 * 1.5 * 0.7) < 1e-12)
    // 2-3 word compound bonus, relationship bonus caps at +50%
    assert(math.abs(score("pump seal", null, 0.5, 2) - 0.5 * 1.2 * 1.2) < 1e-12)
    assert(math.abs(score("pump seal", null, 0.5, 9) - 0.5 * 1.2 * 1.5) < 1e-12)
    // score tier penalizes stopwords even when validity excused them
    assert(math.abs(score("process", null, 0.8, 0) - 0.8 * 0.3) < 1e-12)
    // specific vs generic type factors
    assert(math.abs(score("pump seal", "component", 0.5, 0) - 0.5 * 1.2 * 1.2) < 1e-12)
    assert(math.abs(score("pump seal", "concept", 0.5, 0) - 0.5 * 1.2 * 0.8) < 1e-12)
    // >5 words x0.2; clamp to [0, 1]
    assert(math.abs(score("a b c d e f", null, 1.0, 0) - 0.2) < 1e-12)
    assert(score("API", "component", 0.9, 9) === 1.0)
  }

  test("keep decision: thresholds and relationship rescues") {
    def keep(name: String, conf: Double, rels: Long) =
      Seq((name, conf, rels)).toDF("n", "c", "r")
        .select(EntityQuality.shouldKeep(col("n"), lit(null).cast("string"),
          col("c"), col("r")).as("k"))
        .select("k.keep", "k.quality_score", "k.reason")
        .as[(Boolean, Double, String)].head()
    assert(keep("pump seal assembly", 0.5, 0) === ((true, 0.6, "good_quality")))
    // low score, no relationships: dropped
    val (k1, s1, r1) = keep("widget", 0.2, 0)
    assert((k1, r1) === ((false, "low_quality")) && s1 < 0.4)
    // low score, >=3 relationships: rescued
    val (k2, _, r2) = keep("widget", 0.2, 3)
    assert((k2, r2) === ((true, "kept_for_relationships")))
    // invalid, <5 relationships: dropped with the validity reason
    assert(keep("was broken", 0.9, 4) === ((false, 0.0, "verb_phrase")))
    // invalid, >=5 relationships: kept at pinned 0.5
    assert(keep("was broken", 0.9, 5) ===
      ((true, 0.5, "kept_despite_verb_phrase_due_to_relationships")))
  }

  test("filterEntities counts both relationship endpoints") {
    val entities = Seq(
      (1L, "pump seal", "component", 0.5),
      (2L, "was broken", "concept", 0.9),
      (3L, "widget", "concept", 0.2))
      .toDF("id", "entity_name", "entity_type", "confidence")
    // entity 2 appears 5x across source+target: rescued despite verb_phrase
    val rels = Seq((2L, 1L), (2L, 1L), (2L, 3L), (1L, 2L), (3L, 2L), (3L, 1L))
      .toDF("source_entity_id", "target_entity_id")
    val got = EntityQuality.filterEntities(entities, Some(rels))
      .select($"id", $"keep", $"quality_reason")
      .as[(Long, Boolean, String)].collect()
      .map { case (id, k, r) => id -> ((k, r)) }.toMap
    assert(got(2L) === ((true, "kept_despite_verb_phrase_due_to_relationships")))
    assert(got(1L)._1 === true) // good quality, 4 endpoints
    assert(got(3L) === ((true, "kept_for_relationships"))) // 3 endpoints
    // no relationships frame: everyone scores with rel_count 0
    val solo = EntityQuality.filterEntities(entities, None)
      .where($"id" === 3L).select($"keep", $"quality_reason")
      .as[(Boolean, String)].head()
    assert(solo === ((false, "low_quality")))
  }
}
