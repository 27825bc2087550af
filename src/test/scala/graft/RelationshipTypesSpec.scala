package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationshipTypes

/** Pins the canonical relationship-type vocabulary
  * (utils/relationship_types.py): falsy defaults, the alias table,
  * sanitize-and-member with the always-default fallback, and the
  * label formatter's echo rule. */
class RelationshipTypesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def canon(v: Option[String]): String =
    Seq(v).toDF("v")
      .select(RelationshipTypes.canonicalize(col("v")))
      .as[String].head()

  private def label(t: String, raw: Option[String]): String =
    Seq((t, raw)).toDF("t", "r")
      .select(RelationshipTypes.formatLabel(col("t"), col("r")))
      .as[String].head()

  test("canonicalize: falsy, aliases, sanitize, always-default") {
    assert(canon(None) === "RELATES_TO")
    assert(canon(Some("   ")) === "RELATES_TO") // unicode strip
    assert(canon(Some("May Cause")) === "CAUSES")    // alias case-folds
    assert(canon(Some("noise_amplified_when")) === "IMPACTS")
    assert(canon(Some("depends  on!")) === "RELATES_TO") // DEPENDS__ON_ not in set
    assert(canon(Some("depends-on")) === "DEPENDS_ON")
    assert(canon(Some("Monitors")) === "MONITORS")
    assert(canon(Some("unheard of")) === "RELATES_TO")
  }

  test("label: echo title-cased raw ONLY when it canonicalizes differently") {
    // raw canonicalizes to the stored type: raw drops, display wins
    assert(label("CAUSES", Some("may cause")) === "Causes")
    // raw canonicalizes elsewhere (RELATES_TO): echo the raw title-cased
    assert(label("MITIGATES", Some("reduces  vibration"))
      === "Reduces Vibration")
    assert(label("COMPATIBLE_WITH", None) === "Compatible With")
    assert(label("RELATES_TO", Some("  ")) === "Relates To")
  }
}
