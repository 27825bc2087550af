package graft

import java.util.regex.Pattern

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EntityQuality, Metadata}

/** Literal Scala ports of the Python contracts, compared against the
  * Spark expression implementations over generated adversarial rows.
  * The ports follow the REFERENCE line by line (per-entry regex
  * loops, mutable seen-set, Python sort keys) — any divergence in the
  * vectorized Spark forms shows up as a row mismatch. */
object PyContracts {

  // ---- metadata_extraction_service.py:57-117, ported verbatim ----

  private val productPatterns =
    Seq("\\bNC\\d{4}\\b", "\\bPC\\d{4}\\b", "\\bSM\\d{3}\\b").map(Pattern.compile)
  private val productLike = Pattern.compile("^[A-Z]+\\d")

  def regexProductModels(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    productPatterns.foreach { p =>
      val m = p.matcher(text)
      while (m.find()) out += m.group()
    }
    out.distinct.toSeq
  }

  def regexComponents(text: String): Seq[String] = {
    val tl = text.toLowerCase
    Metadata.components.filter { c =>
      Pattern.compile("\\b" + Pattern.quote(c) + "\\b").matcher(tl).find()
    }
  }

  def regexIssues(text: String): Seq[String] = {
    val tl = text.toLowerCase
    Metadata.issues.filter { i =>
      Seq(i, i.replace("-", " "), i.replace("-", "")).exists { v =>
        Pattern.compile("\\b" + Pattern.quote(v) + "\\b").matcher(tl).find()
      }
    }
  }

  def mergeTags(llm: Seq[String], content: String): Seq[String] = {
    val all = llm ++ regexProductModels(content) ++
      regexComponents(content) ++ regexIssues(content)
    val seen = scala.collection.mutable.Set.empty[String]
    val normalized = scala.collection.mutable.ArrayBuffer.empty[String]
    all.foreach { tag =>
      val norm = tag.toLowerCase.trim
      if (norm.nonEmpty && !seen.contains(norm)) {
        seen += norm
        normalized += (if (productLike.matcher(tag).find()) tag else norm)
      }
    }
    def sortKey(t: String): (Int, String) =
      if (productLike.matcher(t).find()) (0, t)
      else if (Metadata.components.contains(t)) (1, t)
      else if (Metadata.issues.contains(t)) (2, t)
      else (3, t)
    normalized.toSeq.sortBy(sortKey).take(15)
  }

  // ---- entity_quality.py:94-268, ported verbatim ----

  def invalidReason(name: String): Option[String] = {
    if (name == null || name.trim.isEmpty) return Some("empty_name")
    val nameLower = name.toLowerCase.trim
    val words = nameLower.split("\\s+").filter(_.nonEmpty).toSeq
    if (EntityQuality.knownAcronyms.contains(name.toUpperCase)) return None
    if (nameLower.length < 3) return Some("too_short")
    if (Seq("it", "this", "that", "these", "those", "them", "they")
        .contains(nameLower)) return Some("pronoun")
    if (words.exists(EntityQuality.questionIndicators.contains))
      return Some("question_phrase")
    if (words.headOption.exists(EntityQuality.verbIndicators.contains))
      return Some("verb_phrase")
    if (EntityQuality.genericStopwords.contains(nameLower) &&
        !EntityQuality.domainExceptions.contains(nameLower) &&
        words.size == 1) return Some("generic_term")
    if (words.size > 9) return Some("sentence_fragment")
    if (words.exists(Seq("yesterday", "today", "tomorrow", "now", "then",
        "later", "earlier").contains)) return Some("temporal_reference")
    if (nameLower.replace(" ", "").matches("[0-9]+")) return Some("pure_number")
    None
  }

  def qualityScore(name: String, entityType: Option[String],
      confidence: Double, rels: Long): Double = {
    val nameLower = name.toLowerCase.trim
    val words = nameLower.split("\\s+").filter(_.nonEmpty).toSeq
    val isAcr = EntityQuality.knownAcronyms.contains(name.toUpperCase)
    var score = confidence
    if (isAcr) score *= 1.5
    if (name.length < 3 && !isAcr) score *= 0.3
    else if (name.length < 5) score *= 0.7
    if (EntityQuality.genericStopwords.contains(nameLower)) score *= 0.3
    if (words.headOption.exists(EntityQuality.verbIndicators.contains))
      score *= 0.2
    if (words.exists(EntityQuality.questionIndicators.contains)) score *= 0.1
    if (words.size >= 2 && words.size <= 3) score *= 1.2
    if (words.size > 5) score *= 0.2
    if (rels > 0) score *= (1.0 + math.min(rels * 0.1, 0.5))
    entityType.map(_.toLowerCase).foreach { t =>
      if (Seq("component", "procedure", "specification", "organization",
          "person").contains(t)) score *= 1.2
      if (Seq("concept", "other", "state").contains(t)) score *= 0.8
    }
    math.max(0.0, math.min(1.0, score))
  }

  def shouldKeep(name: String, entityType: Option[String],
      confidence: Double, rels: Long,
      minScore: Double = 0.4): (Boolean, Double, String) =
    invalidReason(name) match {
      case Some(reason) =>
        if (rels >= 5) (true, 0.5, s"kept_despite_${reason}_due_to_relationships")
        else (false, 0.0, reason)
      case None =>
        val score = qualityScore(name, entityType, confidence, rels)
        if (score >= minScore) (true, score, "good_quality")
        else if (rels >= 3) (true, score, "kept_for_relationships")
        else (false, score, "low_quality")
    }
}

class MetadataParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)

  private val fillers = Seq("pump", "seal", "assembly", "valve", "widget",
    "report", "the", "a", "unit", "panel", "check", "manual", "cycling")
  private val tagPool = Seq("", " ", "API", "api", "It", "NC2050", "nc2050",
    " Battery ", "Custom-Tag", "process", "today", "Screen", "URGENT",
    "ISO-9001", "was broken", "what next", "one")
  private val contentWords = fillers ++ Metadata.components.take(12) ++
    Seq("no-power", "power cycling", "screen flickering", "batterydrain",
      "blue-screen", "NC2050", "PC1000", "SM300", "NC0042", "ncx99",
      "Screen-Flickering", "OLED", "charging issue", "dead pixels")

  private def genContent(): String =
    Seq.fill(1 + rng.nextInt(12))(
      contentWords(rng.nextInt(contentWords.size))).mkString(" ")
  private def genTags(): Seq[String] =
    Seq.fill(rng.nextInt(6))(tagPool(rng.nextInt(tagPool.size)))

  test("mergeTags matches the verbatim Python port on 400 generated rows") {
    val rows = Seq.fill(400)((genTags(), genContent()))
    val got = rows.toDF("llm", "content")
      .select(Metadata.mergeTags(col("llm"), col("content")).as("tags"))
      .as[Seq[String]].collect()
    rows.zip(got).foreach { case ((llm, content), spark) =>
      val expected = PyContracts.mergeTags(llm, content)
      assert(spark === expected,
        s"\nllm=$llm\ncontent='$content'\nspark=$spark\nport =$expected")
    }
  }

  private val namePool = Seq("API", "it", "ui", "x", "", "  ",
    "pump seal", "pump seal assembly", "was broken", "broken was",
    "what happened", "today", "process", "system check", "123", "123 456",
    "NC2050 display panel", "fixed yesterday morning", "IT",
    "a1 b2 c3 d4 e5 f6 g7 h8 i9 j0", "a b c d e f", "widget", "this")
  private val typePool = Seq(Some("component"), Some("concept"),
    Some("person"), Some("other"), Some("state"), Some("unknown"), None)

  test("shouldKeep matches the verbatim Python port on the cross product") {
    val cases = for {
      name <- namePool
      tpe <- typePool
      conf <- Seq(0.0, 0.2, 0.47, 0.9)
      rels <- Seq(0L, 2L, 3L, 5L, 9L)
    } yield (name, tpe, conf, rels)
    val got = cases.map { case (n, t, c, r) => (n, t.orNull, c, r) }
      .toDF("n", "t", "c", "r")
      .select(EntityQuality.shouldKeep(col("n"), col("t"), col("c"),
        col("r")).as("k"))
      .select("k.keep", "k.quality_score", "k.reason")
      .as[(Boolean, Double, String)].collect()
    cases.zip(got).foreach { case ((n, t, c, r), (keep, score, reason)) =>
      val (ek, es, er) = PyContracts.shouldKeep(n, t, c, r)
      assert(keep === ek && reason === er && math.abs(score - es) < 1e-12,
        s"\nname='$n' type=$t conf=$c rels=$r" +
          s"\nspark=($keep, $score, $reason)\nport =($ek, $es, $er)")
    }
  }
}
