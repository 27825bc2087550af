package graft.operators

import java.util.Locale
import java.util.regex.Pattern

/** Faithful row-level twin of the reference's hybrid relationship
  * extractor's pure tier (app/services/relationship_extractor.py):
  * the entity lookup with acronym/compact variants, the rule-based
  * pattern matcher, document→entity relationships, the
  * keep-highest-confidence dedup, and the name-heuristic entity
  * typer (app/models/relationships.py:306-340).
  *
  * LIVE ERROR carried: the patterns dict names CAUSES / PREVENTS /
  * MITIGATES, none of which exist in the 14-member RelationshipType
  * enum, so `RelationshipType[rel_type_str]` raises KeyError('CAUSES')
  * on the fourth pattern group — before any match can be returned —
  * whenever rules are enabled. [[extractWithRules]] models that arm
  * (None, the extractor never yields). [[extractWithRulesValid]] runs
  * the same algorithm over the enum-valid pattern groups — the
  * reference's own loop under a restricted `self.patterns` instance
  * config, which is how the parity fixture pins the matching
  * algorithm itself.
  *
  * Type validation reuses [[Entities.relTaxonomy]] (the same 14
  * rows). Parity: ReferenceParity2Spec over reference-binary
  * fixtures.
  */
object RelationshipRulesRow {

  private def pyStrip(s: String): String = {
    val ws = " \t\n\r\f"
    var a = 0
    var b = s.length
    while (a < b && ws.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && ws.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }

  /** get_entity_type (relationships.py:306-340): metadata type wins;
    * else first-hit substring heuristic ladder; default "Entity". */
  def entityTypeOf(name: String,
      metadataType: Option[String] = None): String =
    metadataType.getOrElse {
      val n = name.toLowerCase(Locale.ROOT)
      def anyOf(xs: String*) = xs.exists(n.contains)
      if (anyOf("model", "x500", "x600", "dispenser", "product")) "Product"
      else if (anyOf("sensor", "pump", "filter", "module", "board",
        "valve")) "Component"
      else if (anyOf("firmware", "app", "software", "api", "platform"))
        "Software"
      else if (anyOf("sales", "marketing", "engineering", "support",
        "finance", "supply", "logistics")) "Department"
      else if (anyOf("document", "manual", "guide", "spec", "report"))
        "Document"
      else "Entity"
    }

  /** _create_entity_lookup (:129-146): name.lower, the first-letter
    * acronym when the name has a space, and the compact
    * (space-stripped) form; later entities overwrite on key collision
    * but keep the key's original position (dict semantics). */
  def createEntityLookup(entityNames: Seq[String])
      : scala.collection.mutable.LinkedHashMap[String, String] = {
    val lookup = scala.collection.mutable.LinkedHashMap.empty[String, String]
    entityNames.foreach { name =>
      lookup(name.toLowerCase(Locale.ROOT)) = name
      if (name.contains(" ")) {
        val acronym = name.split(" ").filter(_.nonEmpty)
          .map(_.charAt(0)).mkString.toLowerCase(Locale.ROOT)
        lookup(acronym) = name
      }
      lookup(name.replace(" ", "").toLowerCase(Locale.ROOT)) = name
    }
    lookup
  }

  /** The patterns dict (:28-77) in declaration order. CAUSES,
    * PREVENTS and MITIGATES name enum members that do not exist —
    * the KeyError tier. */
  val patterns: Seq[(String, Seq[String])] = Seq(
    "COMPONENT_OF" -> Seq(
      "([\\w\\s]+?)\\s+(?:is|are)\\s+(?:a|an)?\\s*(?:component|part|module|feature)\\s+(?:of|in)\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:includes|contains|has)\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:built into|integrated into)\\s+([\\w\\s]+)"),
    "CONNECTS_TO" -> Seq(
      "([\\w\\s]+?)\\s+connects?\\s+(?:to|with)\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:interfaces?|communicates?)\\s+with\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:links?|pairs?)\\s+(?:to|with)\\s+([\\w\\s]+)"),
    "DEPENDS_ON" -> Seq(
      "([\\w\\s]+?)\\s+(?:depends?|relies?)\\s+(?:on|upon)\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+requires?\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+needs?\\s+([\\w\\s]+?)\\s+to\\s+(?:function|work|operate)"),
    "CAUSES" -> Seq(
      "([\\w\\s]+?)\\s+causes?\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+leads?\\s+to\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+results?\\s+in\\s+([\\w\\s]+)"),
    "PREVENTS" -> Seq(
      "([\\w\\s]+?)\\s+prevents?\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+avoids?\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+protects?\\s+against\\s+([\\w\\s]+)"),
    "MITIGATES" -> Seq(
      "([\\w\\s]+?)\\s+mitigates?\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+reduces?\\s+([\\w\\s]+)"),
    "REPLACES" -> Seq(
      "([\\w\\s]+?)\\s+(?:replaces?|supersedes?|upgrades?)\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:is|are)\\s+(?:the)?\\s*(?:replacement|successor|upgrade)\\s+(?:for|of|to)\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:deprecated|obsolete).*?(?:replaced|succeeded)\\s+by\\s+([\\w\\s]+)"),
    "RESPONSIBLE_FOR" -> Seq(
      "([\\w\\s]+?)\\s+(?:team|department|group)\\s+(?:is)?\\s*responsible\\s+for\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:owns?|maintains?|manages?)\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:oversees?|handles?)\\s+([\\w\\s]+)"),
    "DEFINES" -> Seq(
      "([\\w\\s]+?)\\s+defines?\\s+([\\w\\s]+?)(?:\\s+as|\\s+to be|\\.|,)",
      "We define\\s+([\\w\\s]+?)\\s+as\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:establishes?|sets?)\\s+([\\w\\s]+)"),
    "IMPACTS" -> Seq(
      "([\\w\\s]+?)\\s+impacts?\\s+([\\w\\s]+)",
      "([\\w\\s]+?)\\s+(?:affects?|influences?)\\s+([\\w\\s]+)"))

  private val enumLabels = Entities.relTaxonomy.map(_._1).toSet

  private def validateTypes(relType: String, sourceType: String,
      targetType: String): Boolean =
    Entities.relTaxonomy.find(_._1 == relType).exists {
      case (_, srcs, tgts) =>
        (srcs.contains("Any") || srcs.contains(sourceType)) &&
          (tgts.contains("Any") || tgts.contains(targetType))
    }

  final case class RuleRel(sourceEntity: String, sourceType: String,
      relType: String, targetEntity: String, targetType: String,
      confidence: Double, sourceText: String, method: String)

  /** _extract_with_rules (:147-218) as shipped: ALWAYS the
    * KeyError('CAUSES') arm — no relationship can ever be returned.
    * None models the raise. */
  def extractWithRules(text: String,
      lookup: collection.Map[String, String]): Option[Vector[RuleRel]] = {
    val _ = (text, lookup)
    // the fourth pattern group's RelationshipType['CAUSES'] lookup
    // raises before any result is visible
    None
  }

  /** The same algorithm restricted to the enum-valid pattern groups —
    * the reference's own loop body under a restricted `self.patterns`
    * instance config (how the fixture exercises the matcher): per
    * group and pattern, case-insensitive finditer; both stripped
    * lowercased groups resolve through the lookup, falling back to
    * the compact form and then a word-boundary scan over the lookup
    * keys in insertion order; endpoint types from the name heuristic
    * must validate against the taxonomy; confidence 0.8. */
  def extractWithRulesValid(text: String,
      lookup: scala.collection.mutable.LinkedHashMap[String, String])
      : Vector[RuleRel] = {
    val out = Vector.newBuilder[RuleRel]
    patterns.filter(p => enumLabels.contains(p._1)).foreach {
      case (relType, pats) =>
        pats.foreach { p =>
          val re = Pattern.compile(p, Pattern.CASE_INSENSITIVE |
            Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS)
          val m = re.matcher(text)
          while (m.find()) {
            val sourceText = pyStrip(m.group(1)).toLowerCase(Locale.ROOT)
            val targetText = pyStrip(m.group(2)).toLowerCase(Locale.ROOT)

            def safeLookup(phrase: String): Option[String] = {
              if (phrase.isEmpty) None
              else lookup.get(phrase.replace(" ", "")).orElse {
                val wb = Pattern.compile(
                  "\\b" + Pattern.quote(phrase) + "\\b")
                lookup.collectFirst {
                  case (key, entity) if wb.matcher(key).find() => entity
                }
              }
            }

            val source = lookup.get(sourceText).orElse(safeLookup(sourceText))
            val target = lookup.get(targetText).orElse(safeLookup(targetText))
            (source, target) match {
              case (Some(s), Some(t)) =>
                val sType = entityTypeOf(s)
                val tType = entityTypeOf(t)
                if (validateTypes(relType, sType, tType))
                  out += RuleRel(s, sType, relType, t, tType, 0.8,
                    m.group(0), "rule_based")
              case _ =>
            }
          }
        }
    }
    out.result()
  }

  /** _create_document_relationships (:492-532): one DOCUMENTS row per
    * entity, confidence 0.9, method "automatic"; nothing without
    * document metadata. */
  final case class DocRel(sourceEntity: String, sourceType: String,
      relType: String, targetEntity: String, targetType: String,
      confidence: Double, sourceText: String, method: String,
      mentionCount: Int, firstMention: Int, sourceId: String,
      sourceName: String, targetName: String)

  def createDocumentRelationships(
      entities: Seq[(String, Int, Int)], // (name, count, first_position)
      documentMeta: Option[(Option[String], Option[String])])
      : Vector[DocRel] =
    documentMeta match {
      case None => Vector.empty
      case Some((id, title)) =>
        val docId = id.getOrElse("unknown_doc")
        val docTitle = title.getOrElse("Document")
        entities.toVector.map { case (name, count, first) =>
          DocRel(docTitle, "Document", "DOCUMENTS", name,
            entityTypeOf(name), 0.9, s"Document mentions $name",
            "automatic", count, first, docId, docTitle, name)
        }
    }

  /** _deduplicate_relationships (:533-556): key (source, type,
    * target), keep the FIRST seen unless a later one has strictly
    * higher confidence; output in first-seen key order. */
  def dedupRelationships[R](rels: Seq[R])(key: R => (String, String,
      String), confidence: R => Double): Vector[R] = {
    val seen =
      scala.collection.mutable.LinkedHashMap.empty[(String, String, String), R]
    rels.foreach { rel =>
      val k = key(rel)
      seen.get(k) match {
        case None => seen(k) = rel
        case Some(prev) =>
          if (confidence(rel) > confidence(prev)) seen(k) = rel
      }
    }
    seen.values.toVector
  }
}
