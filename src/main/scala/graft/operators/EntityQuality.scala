package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The entity-quality validator tier
  * (app/utils/entity_quality.py:15-324): a deterministic non-entity
  * filter that runs AFTER extraction — validity checks (pronouns,
  * question/verb phrases, generic stopwords with domain exceptions,
  * sentence fragments, temporal references, pure numbers, acronym
  * whitelist), a multiplicative quality score seeded by extraction
  * confidence, and the keep/drop decision that lets well-connected
  * entities survive low scores.
  *
  * Distinct from [[Entities.qualityFilter]] (the runner_v2 inline
  * mention filter): this is the utils-tier validator the reference
  * applies to extracted ENTITIES with relationship context.
  *
  * Scale shape: validity + score are narrow per-row expressions; the
  * only shuffle in [[filterEntities]] is the relationship-count
  * aggregation (map-side combinable) joined back to entities.
  */
object EntityQuality {

  /** entity_quality.py:19-36. */
  val genericStopwords: Seq[String] = Seq(
    "issue", "problem", "solution", "system", "process", "data",
    "information", "status", "error", "result", "update", "change",
    "last", "first", "next", "current", "new", "old", "previous",
    "thing", "stuff", "item", "object", "element", "part",
    "way", "method", "approach", "technique",
    "yesterday", "today", "tomorrow", "now", "then", "later",
    "earlier", "before", "after", "recently", "soon",
    "it", "this", "that", "these", "those", "them", "they",
    "he", "she", "we", "you", "i", "me", "us",
    "some", "any", "all", "none", "each", "every",
    "one", "two", "three", "many", "few", "several", "various",
    "different", "same", "other", "another")

  /** entity_quality.py:39-57. */
  val verbIndicators: Seq[String] = Seq(
    "did", "does", "doing", "done", "do",
    "was", "were", "been", "being", "be", "is", "are", "am",
    "has", "have", "had", "having",
    "will", "would", "could", "should", "might", "may", "can",
    "causing", "caused", "causes", "cause",
    "making", "made", "makes", "make",
    "going", "went", "goes", "go",
    "coming", "came", "comes", "come",
    "getting", "got", "gets", "get",
    "taking", "took", "takes", "take",
    "giving", "gave", "gives", "give",
    "using", "used", "uses", "use",
    "finding", "found", "finds", "find",
    "working", "worked", "works", "work",
    "trying", "tried", "tries", "try",
    "need", "needs", "needed", "needing",
    "want", "wants", "wanted", "wanting")

  /** entity_quality.py:60-63. */
  val questionIndicators: Seq[String] = Seq(
    "what", "where", "when", "why", "how", "who", "whom", "which",
    "whose", "whether", "wherever", "whenever")

  /** entity_quality.py:66-81. */
  val knownAcronyms: Seq[String] = Seq(
    "API", "UI", "UX", "URL", "URI", "HTML", "CSS", "JSON", "XML",
    "SQL", "CPU", "GPU", "RAM", "ROM", "SSD", "HDD", "USB", "HDMI",
    "LED", "LCD", "OLED", "PCB", "IC", "AC", "DC", "RF", "EMI",
    "CEO", "CTO", "CFO", "VP", "HR", "IT", "QA", "QC",
    "RCA", "CAPA", "SOP", "KPI", "ROI", "TCO", "SLA",
    "ERP", "CRM", "SCM", "BPM", "BI",
    "ISO", "IEEE", "ANSI", "DIN", "JIS",
    "USA", "UK", "EU", "UN", "WHO", "FDA", "EPA", "FCC",
    "GPS", "PDF", "ZIP", "FTP", "HTTP", "HTTPS", "SMTP")

  /** entity_quality.py:84-91. */
  val domainExceptions: Seq[String] = Seq(
    "firmware", "software", "hardware", "database", "server",
    "client", "user", "admin", "administrator", "operator",
    "sensor", "actuator", "controller", "processor",
    "configuration", "setting", "parameter", "variable",
    "interface", "protocol", "standard", "specification",
    "procedure", "process", "workflow", "inspection", "cleaning",
    "de-airing", "tank", "chlorine", "visit", "maintenance")

  private val pronouns =
    Seq("it", "this", "that", "these", "those", "them", "they")
  private val temporalWords =
    Seq("yesterday", "today", "tomorrow", "now", "then", "later", "earlier")

  // Python str.strip() removes all unicode whitespace; Spark's default
  // trim removes only spaces — a name like "\tab" or "\u00A0AI\u00A0"
  // must reach the empty/length/acronym checks stripped exactly as the
  // reference strips it (the same set LlmResponse uses)
  private val pyWs = graft.functions.LlmResponse.ws
  private def pyTrim(c: Column): Column = trim(c, pyWs)

  private def words(nameLower: Column): Column =
    filter(split(nameLower, "\\s+"), w => length(w) > 0)

  private def anyIn(ws: Column, terms: Seq[String]): Column =
    exists(ws, w => w.isInCollection(terms))

  /** Why `name` is not a valid entity, or NULL if it is — the exact
    * check precedence of is_valid_entity (entity_quality.py:94-152).
    * Known acronyms short-circuit every later check. */
  def invalidReason(name: Column): Column = {
    val nameLower = lower(pyTrim(name))
    val ws = words(nameLower)
    when(name.isNull || length(pyTrim(name)) === 0, lit("empty_name"))
      .when(upper(name).isInCollection(knownAcronyms), lit(null).cast("string"))
      .when(length(nameLower) < 3, lit("too_short"))
      .when(nameLower.isInCollection(pronouns), lit("pronoun"))
      .when(anyIn(ws, questionIndicators), lit("question_phrase"))
      .when(element_at(ws, 1).isInCollection(verbIndicators), lit("verb_phrase"))
      .when(nameLower.isInCollection(genericStopwords) &&
        !nameLower.isInCollection(domainExceptions) &&
        size(ws) === 1, lit("generic_term"))
      .when(size(ws) > 9, lit("sentence_fragment"))
      .when(anyIn(ws, temporalWords), lit("temporal_reference"))
      .when(regexp_replace(nameLower, " ", "").rlike("^[0-9]+$"), lit("pure_number"))
      .otherwise(lit(null).cast("string"))
  }

  def isValidEntity(name: Column): Column = invalidReason(name).isNull

  /** The multiplicative quality score
    * (calculate_quality_score, entity_quality.py:155-224), applied in
    * the reference's exact factor order so float results reproduce
    * bit-for-bit: seed = confidence; ×1.5 known acronym; ×0.3/<3
    * chars (non-acronym) else ×0.7/<5 chars; ×0.3 generic stopword
    * (NO domain exception here — the score tier penalizes what the
    * validity tier excuses); ×0.2 leading verb; ×0.1 question word;
    * ×1.2 2-3 words; ×0.2 >5 words; ×(1+min(0.1·rels, 0.5));
    * ×1.2 specific type; ×0.8 generic type; clamp [0,1]. */
  def qualityScore(name: Column, entityType: Column, confidence: Column,
      relationshipCount: Column): Column = {
    val nameLower = lower(pyTrim(name))
    val ws = words(nameLower)
    val isAcr = upper(name).isInCollection(knownAcronyms)
    // a product of independent factors, NOT a when(prev*f, prev) chain:
    // that shape duplicates the whole prior tree in both branches and
    // grows the expression EXPONENTIALLY in the factor count (q87 went
    // from 30 s to sub-second on this rewrite). Multiplying by the
    // 1.0 no-op is IEEE-exact (x*1.0 == x bitwise), and the
    // left-associated order matches the reference's conditional
    // multiply sequence, so float results are unchanged.
    def f(cond: Column, factor: Double): Column =
      when(cond, lit(factor)).otherwise(lit(1.0))
    val lenF = when(length(name) < 3 && !isAcr, lit(0.3))
      .when(length(name) < 5, lit(0.7)).otherwise(lit(1.0))
    val relF = when(relationshipCount > 0,
      lit(1.0) + least(relationshipCount * 0.1, lit(0.5))).otherwise(lit(1.0))
    val tl = lower(entityType)
    val score = confidence *
      f(isAcr, 1.5) * lenF *
      f(nameLower.isInCollection(genericStopwords), 0.3) *
      f(element_at(ws, 1).isInCollection(verbIndicators), 0.2) *
      f(anyIn(ws, questionIndicators), 0.1) *
      f(size(ws).between(2, 3), 1.2) *
      f(size(ws) > 5, 0.2) * relF *
      f(tl.isInCollection(Seq("component", "procedure", "specification",
        "organization", "person")), 1.2) *
      f(tl.isInCollection(Seq("concept", "other", "state")), 0.8)
    greatest(lit(0.0), least(lit(1.0), score))
  }

  /** The keep decision (should_keep_entity, entity_quality.py:226-268)
    * as a struct(keep, quality_score, reason): invalid names survive
    * only with ≥5 relationships (score pinned at 0.5); valid names
    * keep on score ≥ `minQualityScore`, or on ≥3 relationships
    * ("kept_for_relationships"), else drop as "low_quality". */
  def shouldKeep(name: Column, entityType: Column, confidence: Column,
      relationshipCount: Column, minQualityScore: Double = 0.4): Column = {
    val invalid = invalidReason(name)
    val score = qualityScore(name, entityType, confidence, relationshipCount)
    when(invalid.isNotNull,
      when(relationshipCount >= 5,
        struct(lit(true).as("keep"), lit(0.5).as("quality_score"),
          concat(lit("kept_despite_"), invalid,
            lit("_due_to_relationships")).as("reason")))
        .otherwise(struct(lit(false).as("keep"), lit(0.0).as("quality_score"),
          invalid.as("reason"))))
      .otherwise(
        when(score >= minQualityScore,
          struct(lit(true).as("keep"), score.as("quality_score"),
            lit("good_quality").as("reason")))
          .when(relationshipCount >= 3,
            struct(lit(true).as("keep"), score.as("quality_score"),
              lit("kept_for_relationships").as("reason")))
          .otherwise(struct(lit(false).as("keep"), score.as("quality_score"),
            lit("low_quality").as("reason"))))
  }

  /** Frame-level filter (filter_entities, entity_quality.py:270-324):
    * count each entity's relationship endpoints (source + target),
    * annotate every entity with keep/quality_score/quality_reason.
    * Callers split on `keep` — both halves are returned annotated,
    * like the reference's (kept, filtered) pair. */
  def filterEntities(entities: DataFrame, relationships: Option[DataFrame],
      idCol: String = "id", nameCol: String = "entity_name",
      typeCol: String = "entity_type", confCol: String = "confidence",
      minQualityScore: Double = 0.4): DataFrame = {
    val withCounts = relationships match {
      case Some(rels) =>
        val counts = rels.select(col("source_entity_id").as(idCol))
          .unionAll(rels.select(col("target_entity_id").as(idCol)))
          .groupBy(idCol).agg(count(lit(1)).as("_rel_count"))
        entities.join(counts, Seq(idCol), "left")
          .withColumn("_rel_count", coalesce(col("_rel_count"), lit(0L)))
      case None => entities.withColumn("_rel_count", lit(0L))
    }
    withCounts
      .withColumn("_sk", shouldKeep(col(nameCol), col(typeCol),
        col(confCol), col("_rel_count"), minQualityScore))
      .withColumn("keep", col("_sk.keep"))
      .withColumn("quality_score", col("_sk.quality_score"))
      .withColumn("quality_reason", col("_sk.reason"))
      .drop("_sk", "_rel_count")
  }
}
