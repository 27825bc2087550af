package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-metadata taxonomy + the deterministic tag-merge contract
  * around the reference's LLM metadata extraction
  * (app/models/metadata_taxonomy.py, app/services/
  * metadata_extraction_service.py:57-117; app/services/
  * metadata_extraction.py:17-116 duplicates the same four helpers
  * line-for-line — one model covers both twins).
  *
  * The LLM supplies free-form tags and a category; everything AFTER
  * that boundary is deterministic and modeled here:
  *
  *  - regex product-model extraction (`\bNC\d{4}\b` / `\bPC\d{4}\b` /
  *    `\bSM\d{3}\b`, metadata_extraction_service.py:57-63);
  *  - component / issue mention scans against the fixed taxonomy
  *    (word-boundary matches; issues also match their space-joined
  *    and hyphen-stripped variations, :66-86);
  *  - the merge: LLM tags first, then product/component/issue tags,
  *    normalized (lowercase+trim unless the tag looks like a product
  *    code `^[A-Z]+\d`), deduplicated first-wins on the normalized
  *    form, sorted by (taxonomy class, tag) and capped at 15
  *    (:88-117);
  *  - the 20-category document taxonomy with display names and the
  *    `replace('_',' ').title()` fallback (metadata_taxonomy.py:8-64).
  *
  * Scale shape: every function here is a narrow per-row projection
  * over native Spark expressions (regexp_extract_all + array HOFs) —
  * no UDFs, no shuffles; the taxonomy is compile-time data folded
  * into the plan.
  */
object Metadata {

  /** Component tags (metadata_taxonomy.py:79-95). */
  val components: Seq[String] = Seq(
    "display", "screen", "lcd", "led", "oled",
    "power-supply", "psu", "battery", "adapter",
    "motherboard", "mainboard", "cpu", "processor",
    "memory", "ram", "storage", "ssd", "hdd",
    "cooling-system", "fan", "heatsink", "thermal",
    "ports", "usb", "hdmi", "ethernet", "audio",
    "keyboard", "touchpad", "mouse", "input-device",
    "firmware", "bios", "driver", "software",
    "operating-system", "os", "application")

  /** Issue tags (metadata_taxonomy.py:97-117). */
  val issues: Seq[String] = Seq(
    "screen-flickering", "dead-pixels", "backlight-failure",
    "color-distortion", "brightness-issue", "no-display",
    "no-power", "power-cycling", "battery-drain",
    "charging-issue", "overheating",
    "slow-performance", "freezing", "crashing",
    "boot-failure", "blue-screen", "kernel-panic",
    "network-issue", "wifi-problem", "bluetooth-issue",
    "connection-drop", "port-failure")

  /** Action tags (metadata_taxonomy.py:119-124). */
  val actions: Seq[String] = Seq(
    "troubleshooting", "maintenance", "calibration",
    "replacement", "upgrade", "installation",
    "configuration", "optimization", "diagnostic",
    "repair", "cleaning", "testing")

  /** Compliance tags (metadata_taxonomy.py:126-129). */
  val compliance: Seq[String] = Seq(
    "ISO-9001", "ISO-27001", "CE", "FCC", "RoHS",
    "UL", "ETL", "Energy-Star", "GDPR", "HIPAA")

  /** Priority tags (metadata_taxonomy.py:131-135). */
  val priority: Seq[String] = Seq(
    "critical", "high-priority", "urgent",
    "normal", "low-priority", "scheduled")

  /** Known product models (metadata_taxonomy.py:72-76) — used by
    * [[tagClass]]'s exact-match product tier; extraction itself is
    * regex-driven so unseen models in the same families still tag. */
  val productModels: Seq[String] = Seq(
    "NC2050", "NC2068", "NC3000", "NC3100", "NC4000",
    "PC1000", "PC2000", "PC3000",
    "SM100", "SM200", "SM300")

  /** The 20 document categories with display names, in declaration
    * order (metadata_taxonomy.py:8-64). */
  val documentCategories: Seq[(String, String)] = Seq(
    "product_manual" -> "Product Manual",
    "troubleshooting_guide" -> "Troubleshooting Guide",
    "technical_specification" -> "Technical Specification",
    "installation_guide" -> "Installation Guide",
    "service_manual" -> "Service Manual",
    "sop" -> "Standard Operating Procedure",
    "policy" -> "Policy Document",
    "training_material" -> "Training Material",
    "meeting_notes" -> "Meeting Notes",
    "report" -> "Report",
    "faq" -> "FAQ",
    "user_guide" -> "User Guide",
    "release_notes" -> "Release Notes",
    "warranty_terms" -> "Warranty Terms",
    "datasheet" -> "Datasheet",
    "incident_report" -> "Incident Report",
    "project_plan" -> "Project Plan",
    "requirements" -> "Requirements Document",
    "design_document" -> "Design Document",
    "test_plan" -> "Test Plan")

  private val displayMap: Column =
    map(documentCategories.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** Display name for a category value; unknown categories fall back
    * to `replace('_',' ').title()` (metadata_taxonomy.py:40-64). */
  def categoryDisplayName(category: Column): Column =
    coalesce(element_at(displayMap, category),
      initcap(regexp_replace(category, "_", " ")))

  /** Whether the value is one of the 20 pre-defined categories. */
  def isValidCategory(category: Column): Column =
    category.isInCollection(documentCategories.map(_._1))

  /** `^[A-Z]+\d` — "looks like a product code", the case-preservation
    * and sort-class test (metadata_extraction_service.py:105, 110). */
  private val productLike = "^[A-Z]+\\d"

  private val productPattern =
    "\\bNC\\d{4}\\b|\\bPC\\d{4}\\b|\\bSM\\d{3}\\b"

  /** Product-model tags from content (one alternation pass instead of
    * the reference's three findall calls + set — the final sort in
    * [[mergeTags]] makes the two orderings equivalent). */
  def productModelTags(content: Column): Column =
    array_distinct(regexp_extract_all(content, lit(productPattern), lit(0)))

  // One longest-first LOOKAHEAD alternation per taxonomy scan replaces
  // the reference's per-entry re.search loop in a single regex pass.
  // The zero-width wrapper matters: a plain alternation CONSUMES its
  // match, so overlapping entries vanish ("no-power cycling" would
  // match "no-power" and skip past the "power cycling" that starts
  // inside it); the lookahead matches at every start position like
  // the reference's independent searches. Longest-first ordering
  // resolves same-position alternatives.
  private def alternation(terms: Seq[String]): String =
    "(?=\\b(" + terms.sortBy(-_.length).mkString("|") + ")\\b)"

  private val componentAlt = alternation(components)

  /** Component mentions in content (word-boundary, lowercased). */
  def componentTags(content: Column): Column =
    array_distinct(regexp_extract_all(lower(content), lit(componentAlt), lit(1)))

  // issue variation → canonical issue (hyphenated, space-joined, and
  // hyphen-stripped forms all tag the canonical hyphenated issue)
  private val issueVariations: Seq[(String, String)] = issues.flatMap { i =>
    Seq(i, i.replace("-", " "), i.replace("-", "")).distinct.map(_ -> i)
  }
  private val issueAlt = alternation(issueVariations.map(_._1))
  private val issueCanonical: Column =
    map(issueVariations.flatMap { case (v, i) => Seq(lit(v), lit(i)) }: _*)

  /** Issue mentions in content, canonicalized through the variation
    * table (metadata_extraction_service.py:77-86). */
  def issueTags(content: Column): Column =
    array_distinct(transform(
      array_distinct(regexp_extract_all(lower(content), lit(issueAlt), lit(1))),
      v => element_at(issueCanonical, v)))

  // sort class: product-like 0, component 1, issue 2, other 3; the
  // "class|tag" string compares exactly like the reference's
  // (int, str) sort_key tuple (metadata_extraction_service.py:108-115)
  private def sortKey(t: Column): Column =
    concat(
      when(t.rlike(productLike), lit("0"))
        .when(t.isInCollection(components), lit("1"))
        .when(t.isInCollection(issues), lit("2"))
        .otherwise(lit("3")),
      lit("|"), t)

  /** The full merge contract
    * (metadata_extraction_service.py:88-117): LLM tags first, then
    * product / component / issue extraction from content; normalize
    * to lowercase+trim unless product-like (those keep their original
    * form); drop empties; dedup FIRST-WINS on the normalized form;
    * sort by (taxonomy class, tag); cap at `cap`. */
  def mergeTags(llmTags: Column, content: Column, cap: Int = 15): Column = {
    val all = concat(
      coalesce(llmTags, array().cast("array<string>")),
      productModelTags(content), componentTags(content), issueTags(content))
    val deduped = aggregate(
      all,
      array().cast("array<string>"),
      (acc, t) => {
        val norm = lower(trim(t))
        val kept = when(t.rlike(productLike), t).otherwise(norm)
        when(length(norm) === 0 ||
          exists(acc, a => lower(trim(a)) === norm), acc)
          .otherwise(concat(acc, array(kept)))
      })
    val sorted = array_sort(deduped, (l, r) => {
      val (kl, kr) = (sortKey(l), sortKey(r))
      when(kl < kr, -1).when(kl > kr, 1).otherwise(0)
    })
    slice(sorted, 1, cap)
  }

  /** Six-way tag classification (metadata_taxonomy.py:145-163):
    * product models match EXACT case; compliance matches exact;
    * components/issues/actions/priority match case-insensitively;
    * everything else is "custom". */
  def tagClass(tag: Column): Column = {
    val tl = lower(tag)
    when(tag.isInCollection(productModels), lit("product"))
      .when(tl.isInCollection(components.map(_.toLowerCase)), lit("component"))
      .when(tl.isInCollection(issues.map(_.toLowerCase)), lit("issue"))
      .when(tl.isInCollection(actions.map(_.toLowerCase)), lit("action"))
      .when(tag.isInCollection(compliance), lit("compliance"))
      .when(tl.isInCollection(priority.map(_.toLowerCase)), lit("priority"))
      .otherwise(lit("custom"))
  }

  /** Parsed-JSON scalar truthiness for the string-map metadata model:
    * absent keys, JSON null/false/0, and the empty string are falsy —
    * matching what Python's `metadata.get(k)` truth-test sees after
    * json parsing. (A literal string "false" in the source JSON would
    * be truthy in Python; the map model stores parsed scalars
    * rendered to text, so "false" here always means JSON false.) */
  private def jsonTruthy(v: Column): Column =
    v.isNotNull && v =!= "" && v =!= "false" && v =!= "0" && v =!= "0.0"

  /** GET /documents/{id}/suggested-metadata (documents.py:957-1007):
    * when the document's metadata carries a truthy `ai_extracted`
    * marker, project the six fixed suggestion keys plus the
    * extraction timestamp; otherwise the null arm with the
    * use-extract-metadata-first message. Missing keys surface as
    * nulls inside the suggestions frame (the reference's .get with no
    * default), and `has_suggestions` distinguishes the arms for
    * callers. One narrow map lookup per row — no shuffle. */
  def suggestedMetadata(docs: DataFrame): DataFrame = {
    val md = col("metadata")
    def k(key: String): Column = element_at(md, key)
    val extracted = jsonTruthy(k("ai_extracted"))
    docs.select(col("document_id"),
      extracted.as("has_suggestions"),
      when(extracted, k("category")).as("category"),
      when(extracted, coalesce(k("tags"), lit(""))).as("tags"),
      when(extracted, k("author")).as("author"),
      when(extracted, k("department")).as("department"),
      when(extracted, k("version")).as("version"),
      when(extracted, k("description")).as("description"),
      when(extracted, k("extraction_timestamp")).as("extraction_timestamp"),
      when(!extracted, lit("No AI-extracted metadata available. " +
        "Use /extract-metadata endpoint first.")).as("message"))
  }
}
