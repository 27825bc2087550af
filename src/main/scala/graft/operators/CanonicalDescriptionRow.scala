package graft.operators

import java.util.Locale

/** Faithful row-level twin of the canonical entity description
  * service (app/services/canonical_description_service.py): evidence
  * preparation (whitespace-normalized, length-capped, deduped
  * snippets with the chunk-bookkeeping attributes excluded), the
  * exact system/user prompts, and the response post-processing ladder
  * (fence unwrap, Description:/Entity: marker strips, the
  * insufficient-evidence guard prefixes, previous-description
  * fallbacks).
  *
  * The LLM sits behind [[LlmClient]] (complete() receives the USER
  * prompt; the system prompt is the [[systemPrompt]] constant the
  * caller ships alongside). [[Entities.canonicalDescriptions]] stays
  * the thin DataFrame shape behind gate q56 — this twin carries the
  * full contract, parity-pinned by ReferenceParity2Spec against the
  * reference binary.
  */
object CanonicalDescriptionRow {

  val MaxDescriptionLength = 300
  val MaxEvidenceSnippets = 6

  /** Attribute values as the reference's json-ish dicts render them
    * (str() forms: True/False for booleans, decimal integers). */
  sealed trait Attr
  case object ANull extends Attr
  final case class AStr(v: String) extends Attr
  final case class AInt(v: Long) extends Attr
  final case class ABool(v: Boolean) extends Attr
  final case class AList(items: Vector[Attr]) extends Attr
  final case class AMap(entries: Vector[(String, Attr)]) extends Attr

  private def render(a: Attr): String = a match {
    case ANull => "None"
    case AStr(v) => v
    case AInt(v) => v.toString
    case ABool(v) => if (v) "True" else "False"
    case AList(items) => items.map(render).mkString(", ")
    case AMap(entries) =>
      entries.map { case (k, v) => s"$k: ${render(v)}" }.mkString(", ")
  }

  // python `x in (None, "", [], {})`
  private def isEmptyish(a: Attr): Boolean = a match {
    case ANull => true
    case AStr("") => true
    case AList(v) => v.isEmpty
    case AMap(v) => v.isEmpty
    case _ => false
  }
  // the narrower `x in (None, "")` used inside list/dict rendering
  private def isNullOrEmptyStr(a: Attr): Boolean = a match {
    case ANull => true
    case AStr("") => true
    case _ => false
  }

  // python str whitespace semantics shared with LlmResponse (same
  // `ws` set, so the tiers can't drift)
  private def pySplitJoin(s: String): String =
    graft.functions.LlmResponse.pySplit(s).mkString(" ")
  private def pyStrip(s: String): String =
    graft.functions.LlmResponse.pyStrip(s)
  private lazy val wsSet = graft.functions.LlmResponse.ws.toSet
  private def pyRstrip(s: String): String = {
    var b = s.length
    while (b > 0 && wsSet(s.charAt(b - 1))) b -= 1
    s.substring(0, b)
  }
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)
  private def cpTake(s: String, n: Int): String =
    s.substring(0, s.offsetByCodePoints(0, math.min(n, cpLen(s))))

  /** _clean_text (:16-22): whitespace-run normalization, then an
    * optional code-point cap at max_length-3 + "...". */
  def cleanText(value: String, maxLength: Option[Int] = None): String = {
    val text = pySplitJoin(if (value == null) "" else value)
    maxLength match {
      case Some(m) if m != 0 && cpLen(text) > m =>
        pyRstrip(cpTake(text, m - 3)) + "..."
      case _ => text
    }
  }

  /** _format_attribute_fragment (:24-40). */
  def formatAttributeFragment(attributes: Seq[(String, Attr)]): String =
    attributes.collect {
      case (key, raw) if !isEmptyish(raw) =>
        val value = raw match {
          case AList(items) =>
            items.filterNot(isNullOrEmptyStr).map(render).mkString(", ")
          case AMap(entries) =>
            entries.filterNot(e => isNullOrEmptyStr(e._2))
              .map { case (k, v) => s"$k: ${render(v)}" }.mkString(", ")
          case other => render(other)
        }
        s"$key: $value"
    }.mkString("; ")

  final case class EvidenceItem(mention: String, context: String = "",
      summary: String = "", attributes: Seq[(String, Attr)] = Nil)

  private val ExcludedAttrKeys =
    Set("chunk_index", "chunking_strategy", "chunk_level", "chunk_id")

  /** _prepare_evidence (:125-160): first 2*max items considered,
    * blank mentions dropped, context/summary capped at 220, the
    * chunk-bookkeeping attribute keys excluded, summary suppressed
    * when equal to context, exact-snippet dedup, capped at max. */
  def prepareEvidence(items: Seq[EvidenceItem],
      maxSnippets: Int = MaxEvidenceSnippets): Vector[String] = {
    val formatted = Vector.newBuilder[String]
    var count = 0
    val seen = scala.collection.mutable.Set.empty[String]
    items.take(maxSnippets * 2).foreach { item =>
      if (count < maxSnippets) {
        val mention = cleanText(item.mention)
        if (mention.nonEmpty) {
          val context = cleanText(item.context, Some(220))
          val summary = cleanText(item.summary, Some(220))
          val attrs = item.attributes
            .filterNot(a => ExcludedAttrKeys.contains(a._1))
          val attrText = formatAttributeFragment(attrs)
          val parts = Vector(s"Mention: $mention") ++
            (if (summary.nonEmpty && summary != context)
              Vector(s"Summary: $summary") else Vector.empty) ++
            (if (context.nonEmpty) Vector(s"Context: $context")
            else Vector.empty) ++
            (if (attrText.nonEmpty) Vector(s"Attributes: $attrText")
            else Vector.empty)
          val snippet = parts.mkString(" | ")
          if (!seen.contains(snippet)) {
            seen += snippet
            formatted += snippet
            count += 1
          }
        }
      }
    }
    formatted.result()
  }

  /** The exact prompts (:161-199). */
  val systemPrompt: String =
    "You maintain factual one-paragraph descriptions of technical entities. " +
      "Rely exclusively on the supplied evidence snippets and previously accepted description. " +
      "If the evidence does not explicitly support a fact, do not include it. " +
      "When nothing concrete is present, respond with 'Insufficient evidence.' instead of guessing. " +
      "Keep the description under 280 characters and at most two sentences."

  def userPrompt(name: Option[String], entityType: Option[String],
      previousDescription: String, evidence: Seq[String]): String = {
    val entityLabel = cleanText(pyStrip(name.getOrElse("")))
    val entityTypeClean = cleanText(pyStrip(entityType.getOrElse("")))
    val evidenceBlock = evidence.map(s => s"- $s").mkString("\n")
    val prevBlock = {
      val p = pyStrip(previousDescription)
      if (p.nonEmpty) p else "(none)"
    }
    s"Entity: ${if (entityLabel.nonEmpty) entityLabel else "Unknown"}" +
      (if (entityTypeClean.nonEmpty) s" ($entityTypeClean)" else "") +
      "\n\n" +
      "Previous description:\n" +
      s"$prevBlock\n\n" +
      "New evidence:\n" +
      s"$evidenceBlock\n\n" +
      "Write an updated description that only contains facts directly stated in the evidence or previous description. " +
      "Quote or closely paraphrase the evidence wording; never add domain knowledge or speculation. " +
      "If the evidence lacks concrete facts, reply with 'Insufficient evidence.'" +
      "If no new facts exist beyond the previous description, return the previous description unchanged. " +
      "Respond with 2-3 sentences at most, without adding headings, labels, or bullet markers."
  }

  private val GuardPrefixes = Seq("insufficient evidence", "no evidence",
    "unknown.", "unknown", "uncertain")

  /** The response post-processing ladder (:200-244): fence unwrap
    * (drop the first line, strip a trailing fence), empty ->
    * previous-or-"", 300-cap clean, a mid-string "description:"
    * marker cut, an "entity:" prefix cut, then the guard prefixes ->
    * previous-or-"". */
  def postProcess(rawContent: String,
      previousDescription: String): String = {
    var content = pyStrip(if (rawContent == null) "" else rawContent)
    if (content.startsWith("```")) {
      val idx = content.indexOf('\n')
      content = pyStrip(if (idx < 0) content else content.substring(idx + 1))
      if (content.endsWith("```"))
        content = pyStrip(content.substring(0, content.length - 3))
    }
    if (content.isEmpty) return previousDescription
    var normalized = cleanText(content, Some(MaxDescriptionLength))
    var lower = normalized.toLowerCase(Locale.ROOT)
    val dIdx = lower.indexOf("description:")
    if (dIdx >= 0) {
      normalized = pyStrip(normalized.substring(dIdx + "description:".length))
      lower = normalized.toLowerCase(Locale.ROOT)
    }
    if (lower.startsWith("entity:")) {
      normalized = pyStrip(normalized.split(":", 2).last)
      lower = normalized.toLowerCase(Locale.ROOT)
    }
    if (normalized.isEmpty) return previousDescription
    lower = normalized.toLowerCase(Locale.ROOT)
    if (GuardPrefixes.exists(lower.startsWith)) previousDescription
    else normalized
  }

  /** _call_llm (:161-244) through the [[LlmClient]] boundary: None
    * without evidence, else the prompts above and [[postProcess]]. */
  def callLlm(name: Option[String], entityType: Option[String],
      previousDescription: String, evidence: Seq[String],
      llm: LlmClient): Option[String] =
    if (evidence.isEmpty) None
    else Some(postProcess(
      llm.complete(userPrompt(name, entityType, previousDescription,
        evidence)),
      previousDescription))

  final case class CanonicalEntity(id: Option[String],
      name: Option[String], entityType: Option[String],
      previousDescription: String = "")

  /** generate_descriptions (:57-124): per canonical id — skipped
    * without an id or without prepared evidence; a result equal to
    * the previous description is dropped. */
  def generateDescriptions(entities: Seq[CanonicalEntity],
      evidenceMap: Map[String, Seq[EvidenceItem]],
      llm: LlmClient,
      maxSnippets: Int = MaxEvidenceSnippets): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    entities.foreach { e =>
      e.id.filter(_.nonEmpty).foreach { cid =>
        val evidence = evidenceMap.getOrElse(cid, Nil)
        val formatted = prepareEvidence(evidence, maxSnippets)
        if (formatted.nonEmpty) {
          callLlm(e.name, e.entityType, e.previousDescription, formatted,
            llm).foreach { description =>
            if (description != e.previousDescription)
              out += cid -> description
          }
        }
      }
    }
    out.result()
  }
}
