package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Metadata

/** Metadata tag-merge + category taxonomy parity
  * (metadata_extraction_service.py:57-117, metadata_taxonomy.py). */
class MetadataSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def merged(llm: Seq[String], content: String): Seq[String] =
    Seq((llm, content)).toDF("llm", "content")
      .select(Metadata.mergeTags(col("llm"), col("content")).as("tags"))
      .as[Seq[String]].head()

  test("full merge: extract, normalize, dedup, class-sort") {
    val content = "The NC2050 display shows screen flickering after a " +
      "firmware upgrade; battery drain when a charging issue occurs. " +
      "Also PC1000 and SM300."
    val got = merged(Seq(" Upgrade ", "NC2050", "Custom-Tag", "display"), content)
    assert(got === Seq(
      // class 0: product codes, original case, regex-found + llm dup collapsed
      "NC2050", "PC1000", "SM300",
      // class 1: components mentioned in content (word-boundary)
      "battery", "display", "firmware", "screen",
      // class 2: issues, space-joined variations canonicalized
      "battery-drain", "charging-issue", "screen-flickering",
      // class 3: everything else, lowercased + trimmed
      "custom-tag", "upgrade"))
  }

  test("first-wins dedup keeps the first case form; product-like keeps original") {
    // llm lowercase arrives before the regex-extracted uppercase: the
    // lowercase form survives and is NOT product-like (^[A-Z]+\d)
    assert(merged(Seq("nc2050"), "NC2050 rocks") === Seq("nc2050"))
    // reversed: no llm tag, regex wins, original case kept, class 0
    assert(merged(Nil, "NC2050 rocks") === Seq("NC2050"))
  }

  test("issue variations: hyphen, space, and joined forms all canonicalize") {
    assert(merged(Nil, "observed batterydrain and power cycling events") ===
      Seq("battery-drain", "power-cycling"))
    assert(merged(Nil, "battery-drain confirmed") === Seq("battery", "battery-drain"))
  }

  test("overlapping mentions both tag (zero-width scan, like per-entry search)") {
    // "power cycling" starts INSIDE the "no-power" match — a consuming
    // alternation would drop it; the reference's per-issue re.search
    // finds both ('-' is a word boundary before "power")
    assert(merged(Nil, "no-power cycling detected") ===
      Seq("no-power", "power-cycling"))
  }

  test("empties drop, null llm is fine, cap binds at 15 after the sort") {
    assert(merged(Seq("", "  "), "nothing taxonomic here") === Nil)
    val many = (1 to 20).map(i => f"tag$i%02d")
    assert(merged(many, "no extractions") === many.take(15))
    val nullLlm = Seq(Tuple1("PC1000 fan noise")).toDF("content")
      .select(Metadata.mergeTags(lit(null).cast("array<string>"),
        col("content")).as("tags"))
      .as[Seq[String]].head()
    assert(nullLlm === Seq("PC1000", "fan"))
  }

  test("word boundaries: no substring hits inside larger words") {
    // "ramp" must not tag component "ram"; "oled" must not tag "led"
    assert(merged(Nil, "a ramp and an oled panel") === Seq("oled"))
    // "screen-flickering" content yields BOTH component screen (the
    // hyphen is a word boundary) and the canonical issue
    assert(merged(Nil, "screen-flickering seen") ===
      Seq("screen", "screen-flickering"))
  }

  test("category display names, fallback, and validity") {
    val rows = Seq("sop", "faq", "design_document", "legacy_spec")
      .toDF("category")
      .select(col("category"),
        Metadata.categoryDisplayName(col("category")).as("d"),
        Metadata.isValidCategory(col("category")).as("v"))
      .as[(String, String, Boolean)].collect()
      .map { case (k, d, v) => k -> ((d, v)) }.toMap
    assert(rows("sop") === (("Standard Operating Procedure", true)))
    assert(rows("faq") === (("FAQ", true)))
    assert(rows("design_document") === (("Design Document", true)))
    // unknown value: replace('_',' ').title() fallback, invalid
    assert(rows("legacy_spec") === (("Legacy Spec", false)))
    assert(Metadata.documentCategories.size === 20)
  }

  test("tagClass: product/compliance exact-case, others case-insensitive") {
    val got = Seq("NC2050", "nc2050", "Display", "ISO-9001", "iso-9001",
      "URGENT", "troubleshooting", "boot-failure", "whatever")
      .toDF("tag")
      .select(col("tag"), Metadata.tagClass(col("tag")).as("c"))
      .as[(String, String)].collect().toMap
    assert(got("NC2050") === "product")
    assert(got("nc2050") === "custom") // product tier is exact-case
    assert(got("Display") === "component")
    assert(got("ISO-9001") === "compliance")
    assert(got("iso-9001") === "custom") // compliance tier is exact-case
    assert(got("URGENT") === "priority")
    assert(got("troubleshooting") === "action")
    assert(got("boot-failure") === "issue")
    assert(got("whatever") === "custom")
  }

  test("suggested metadata: ai_extracted truthiness gates the arms") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      ("d1", Map("ai_extracted" -> "true", "category" -> "manual",
        "tags" -> "pump,seal", "author" -> "ai",
        "extraction_timestamp" -> "T1")),
      ("d2", Map("ai_extracted" -> "false", "category" -> "x")),
      ("d3", Map("category" -> "y")),          // marker absent
      ("d4", Map("ai_extracted" -> "1")))      // truthy, keys missing
      .toDF("document_id", "metadata")
    val out = graft.operators.Metadata.suggestedMetadata(docs)
      .orderBy("document_id")
      .select("document_id", "has_suggestions", "category", "tags",
        "author", "extraction_timestamp", "message")
      .as[(String, Boolean, Option[String], Option[String], Option[String],
        Option[String], Option[String])].collect().toSeq
    val noMsg = "No AI-extracted metadata available. " +
      "Use /extract-metadata endpoint first."
    assert(out === Seq(
      ("d1", true, Some("manual"), Some("pump,seal"), Some("ai"),
        Some("T1"), None),
      ("d2", false, None, None, None, None, Some(noMsg)),
      ("d3", false, None, None, None, None, Some(noMsg)),
      // documents.py:1001-1005: suggestions frame with nulls for the
      // missing keys — tags default to the empty list
      ("d4", true, None, Some(""), None, None, None)))
  }
}
