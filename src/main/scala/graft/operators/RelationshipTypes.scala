package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.LlmResponse

/** Canonical relationship-type vocabulary + label formatting
  * (app/utils/relationship_types.py:1-124) — the normalization layer
  * ABOVE the 14-type extraction taxonomy of [[Entities]]: any
  * free-form label canonicalizes into the 20-entry vocabulary or
  * falls back to RELATES_TO.
  *
  * Faithful semantics:
  *   - Python falsy/blank values (null, "", whitespace-only after
  *     strip) → RELATES_TO;
  *   - the alias table matches on the lowercased strip verbatim
  *     (24 entries, :31-55 — contract data, reproduced as data);
  *   - otherwise the label uppercases, every non-alphanumeric maps
  *     to '_' (Python isalnum — unicode letters+digits), leading/
  *     trailing underscores strip, and the result must be IN the
  *     canonical set — anything else is RELATES_TO (":83 CRITICAL
  *     FIX: Always return DEFAULT when not in canonical set");
  *   - format_relationship_label echoes a title-cased raw label ONLY
  *     when the raw canonicalizes to a DIFFERENT type than the one
  *     stored; otherwise the canonical type renders with underscores
  *     as spaces, title-cased (Python str.capitalize per word). */
object RelationshipTypes {

  val Default = "RELATES_TO"

  /** relationship_types.py:8-29. */
  val canonical: Set[String] = Set(
    "COMPONENT_OF", "CONNECTED_TO", "DEPENDS_ON", "USES", "OWNED_BY",
    "RESPONSIBLE_FOR", "CAUSES", "PREVENTS", "IMPACTS", "MITIGATES",
    "DEFINES", "DESCRIBES", "DOCUMENTS", "REFERENCES", "REPLACES",
    "COMPATIBLE_WITH", "CONFLICTS_WITH", "MONITORS", "MEASURES",
    Default)

  /** relationship_types.py:31-55, verbatim. */
  val aliases: Map[String, String] = Map(
    "may cause" -> "CAUSES",
    "cause" -> "CAUSES",
    "causes" -> "CAUSES",
    "helps prevent" -> "MITIGATES",
    "helps prevent removal" -> "MITIGATES",
    "helps prevent removal of" -> "MITIGATES",
    "prevents removal of" -> "MITIGATES",
    "prevents" -> "PREVENTS",
    "reduces" -> "MITIGATES",
    "used to clean" -> "USES",
    "used for cleaning" -> "USES",
    "used for" -> "USES",
    "contains" -> "COMPONENT_OF",
    "contain" -> "COMPONENT_OF",
    "contained in" -> "COMPONENT_OF",
    "located in" -> "COMPONENT_OF",
    "located_in" -> "COMPONENT_OF",
    "emits noise from" -> "CAUSES",
    "emits_noise_from" -> "CAUSES",
    "noise amplified when" -> "IMPACTS",
    "noise_amplified_when" -> "IMPACTS",
    "supports" -> "RESPONSIBLE_FOR",
    "support" -> "RESPONSIBLE_FOR")

  /** relationship_types.py:57-84. */
  def canonicalize(value: Column): Column = {
    val trimmed = trim(value, LlmResponse.ws)
    val alias = element_at(typedLit(aliases), lower(trimmed))
    val sanitized = regexp_replace(
      regexp_replace(upper(trimmed),
        "(?U)[^\\p{IsAlphabetic}\\p{IsDigit}]", "_"),
      "^_+|_+$", "")
    when(value.isNull || length(trimmed) === 0, lit(Default))
      .when(alias.isNotNull, alias)
      .when(sanitized.isInCollection(canonical), sanitized)
      .otherwise(lit(Default))
  }

  /** relationship_types.py:88-124. */
  def formatLabel(canonicalType: Column, raw: Column): Column = {
    val trimmed = trim(raw, LlmResponse.ws)
    val rawTruthy = raw.isNotNull && length(trimmed) > 0
    // Python " ".join(w.capitalize() for w in s.split()): whitespace
    // runs collapse and each word lowercases past its first char —
    // initcap over the collapsed strip reproduces both
    val display = initcap(regexp_replace(canonicalType, "_", " "))
    when(rawTruthy && !(canonicalize(raw) <=> canonicalType),
        initcap(regexp_replace(trimmed, "(?U)\\s+", " ")))
      .otherwise(display)
  }
}
