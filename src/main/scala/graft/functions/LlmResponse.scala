package graft.functions

import java.util.Locale

import com.fasterxml.jackson.core.JsonParser
import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic handling of LLM response content
  * (app/services/llm_service.py:396-512): markdown-fence stripping,
  * JSON parsing with the reference's graded fallbacks, and API cost
  * estimation. Everything here is a narrow per-row projection —
  * the model call itself stays behind the client boundary
  * (ExtractByLlm / EmbedText); these are the contracts AROUND it.
  */
object LlmResponse {

  /** Strip a markdown code fence (llm_service.py:474-487, "common
    * with Gemini"): a leading ```json or ``` drops, a trailing ```
    * drops when present, and the remainder trims — exactly the
    * reference's branch order (the ```json tier wins, and unfenced
    * content passes through already-trimmed). */
  // Python str.strip() removes ALL unicode whitespace; Spark's
  // default trim removes only spaces — trim the full set that
  // str.isspace() covers: the ASCII whitespace (incl vertical tab),
  // the \u001C-\u001F separators, and the unicode spaces (NEL, NBSP,
  // ogham, the en/em quads, LS/PS, narrow NBSP, math space,
  // ideographic space), so a fence preceded by an NBSP is detected
  // exactly as the reference's json.loads-side .strip() would be
  private[graft] val ws = " \t\n\r\f\u000B\u001C\u001D\u001E\u001F" +
    "\u0085\u00A0\u1680\u2000\u2001\u2002\u2003\u2004\u2005" +
    "\u2006\u2007\u2008\u2009\u200A\u2028\u2029\u202F\u205F\u3000"
  private def wsTrim(c: Column): Column = trim(c, ws)

  /** Python str.split() — unicode whitespace runs, no empty tokens.
    * The shared row-level twin of the `ws` trim set, for every tier
    * that mirrors a `text.split()` (word counts, token estimates,
    * name normalization). Java's (?U)\s is the Unicode White_Space
    * property, which EXCLUDES the U+001C-U+001F file/group/record/
    * unit separators that Py_UNICODE_ISSPACE includes — add them
    * explicitly so splits match CPython on those control chars. */
  private[graft] def pySplit(s: String): Array[String] =
    s.split("(?U)[\\s\\x1c-\\x1f]+").filter(_.nonEmpty)

  private val wsSet: Set[Char] = ws.toSet

  /** Python str.strip() — the row-level twin of `wsTrim`, sharing the
    * same `ws` character set so the two can't drift. */
  private[graft] def pyStrip(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && wsSet(s(i))) i += 1
    while (j > i && wsSet(s(j - 1))) j -= 1
    s.substring(i, j)
  }

  def stripFence(c: Column): Column = {
    val t = wsTrim(c)
    def dropAround(prefixLen: Int): Column = {
      val body = t.substr(lit(prefixLen + 1),
        greatest(length(t) - prefixLen, lit(0)))
      when(body.endsWith("```"),
        wsTrim(body.substr(lit(1), greatest(length(body) - 3, lit(0)))))
        .otherwise(wsTrim(body))
    }
    when(t.startsWith("```json"), dropAround(7))
      .when(t.startsWith("```"), dropAround(3))
      .otherwise(t)
  }

  /** Parsed-metadata struct with the reference's graded fallbacks
    * (llm_service.py:488-512):
    *  - a JSON OBJECT parses field-wise, `confidence` defaulting 0.5
    *    and list fields defaulting empty;
    *  - unparseable content degrades to summary = first 200 chars of
    *    the RAW response at confidence 0.3 (the JSONDecodeError arm);
    *  - valid JSON that is not an object (scalar/array — the
    *    reference's .get AttributeError arm) degrades to an empty
    *    record at confidence 0.0.
    */
  def parseMetadata(raw: Column): Column = {
    val cleaned = stripFence(raw)
    // Validity has to be exactly json.loads, which is STRICTER than
    // every built-in probe Spark offers: get_json_object, from_json
    // and try_parse_json all read the FIRST JSON value and ignore
    // trailing garbage, while json.loads raises Extra-data (the 0.3
    // arm) on {"a":1}{"b":2} and its scalar/array analogs. JsonKind
    // runs the same Jackson core in whole-value mode, so the three
    // arms classify identically to the reference with no residual
    // leniency.
    val kind = GraftColumnBridge.column(
      JsonKindExpr(GraftColumnBridge.expression(cleaned)))
    val isObject = kind === lit(JsonKindExpr.KindObject)
    val parseable = kind =!= lit(JsonKindExpr.KindInvalid)
    def field(name: String) = get_json_object(cleaned, s"$$.$name")
    def listField(name: String) = coalesce(
      from_json(field(name), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)),
      array().cast("array<string>"))
    when(isObject, struct(
      field("title").as("title"),
      field("author").as("author"),
      field("department").as("department"),
      field("category").as("category"),
      listField("tags").as("tags"),
      field("summary").as("summary"),
      listField("key_topics").as("key_topics"),
      field("sentiment").as("sentiment"),
      coalesce(field("confidence").cast("double"), lit(0.5)).as("confidence")))
      .when(!parseable, struct(
        lit(null).cast("string").as("title"),
        lit(null).cast("string").as("author"),
        lit(null).cast("string").as("department"),
        lit(null).cast("string").as("category"),
        array().cast("array<string>").as("tags"),
        substring(raw, 1, 200).as("summary"),
        array().cast("array<string>").as("key_topics"),
        lit(null).cast("string").as("sentiment"),
        lit(0.3).as("confidence")))
      .otherwise(struct(
        lit(null).cast("string").as("title"),
        lit(null).cast("string").as("author"),
        lit(null).cast("string").as("department"),
        lit(null).cast("string").as("category"),
        array().cast("array<string>").as("tags"),
        lit(null).cast("string").as("summary"),
        array().cast("array<string>").as("key_topics"),
        lit(null).cast("string").as("sentiment"),
        lit(0.0).as("confidence")))
  }

  /** Row-level twin of [[stripFence]] (llm_service.py:474-487) —
    * shared by the row-level parse tiers below. */
  def stripFenceRow(raw: String): String = {
    val t = pyStrip(raw)
    def dropAround(s: String): String =
      pyStrip(if (s.endsWith("```")) s.substring(0, s.length - 3) else s)
    if (t.startsWith("```json")) dropAround(t.substring(7))
    else if (t.startsWith("```")) dropAround(t.substring(3))
    else t
  }

  private def cpTake(s: String, n: Int): String =
    s.substring(0,
      s.offsetByCodePoints(0, math.min(n, s.codePointCount(0, s.length))))

  final case class LlmEntity(name: String, entityType: String,
      confidence: Double, context: Option[String])

  /** The extract_entities stop-word set (llm_service.py:616-629). */
  val entityStopWords: Set[String] = Set(
    "the", "this", "that", "these", "those", "how", "when", "where",
    "why", "what", "who", "which", "can", "could", "would", "should",
    "may", "might", "must", "will", "shall", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "do", "does",
    "did", "a", "an", "and", "or", "but", "if", "then", "else", "for",
    "to", "from", "with", "without", "by", "at", "in", "on", "up",
    "down", "out", "off", "over", "under", "between", "through",
    "during", "before", "after", "above", "below", "each", "few",
    "more", "most", "other", "some", "such", "no", "nor", "not",
    "only", "own", "same", "so", "than", "too", "very", "just", "now",
    "also", "user", "users", "system", "systems", "data",
    "information", "document", "file", "files", "item", "items",
    "thing", "things", "way", "ways")

  /** The invalid-type alias table (llm_service.py:660-681). */
  val entityTypeMapping: Map[String, String] = Map(
    "ISSUETYPE" -> "PROBLEM", "ISSUE" -> "PROBLEM",
    "ERROR" -> "PROBLEM", "SYMPTOM" -> "PROBLEM",
    "DEFECT" -> "PROBLEM", "FAILURE" -> "PROBLEM",
    "HARDWARECONNECTION" -> "COMPONENT", "CONNECTION" -> "COMPONENT",
    "CONNECTOR" -> "COMPONENT", "CLEANINGAGENT" -> "CHEMICAL",
    "CLEANER" -> "CHEMICAL", "SUBSTANCE" -> "CHEMICAL",
    "METHOD" -> "PROCEDURE", "PROCESS" -> "PROCEDURE",
    "TECHNIQUE" -> "PROCEDURE", "EQUIPMENT" -> "TOOL",
    "INSTRUMENT" -> "TOOL", "SUPPLY" -> "MATERIAL",
    "CONSUMABLE" -> "MATERIAL")

  private val entityAllowedTypes: Set[String] = Set(
    "PERSON", "ORGANIZATION", "LOCATION", "DATE", "PRODUCT",
    "COMPONENT", "TECHNOLOGY", "CHEMICAL", "PROCEDURE",
    "SPECIFICATION", "SYSTEM", "MEASUREMENT", "PROBLEM", "CONDITION",
    "STATE", "TOOL", "MATERIAL", "CONCEPT", "EVENT", "OTHER")

  /** extract_entities' post-parse pipeline (llm_service.py:598-705):
    * fence strip, strict json.loads, then per-entity filters (blank /
    * short names, case-insensitive stop words, confidence < 0.5),
    * type upper-casing with the alias table (unknown → OTHER), and a
    * STABLE confidence-descending sort capped at 20. EVERY error arm
    * — non-array JSON, a non-object element, a non-string name, a
    * null type — collapses the whole result to empty, exactly the
    * reference's blanket except. The reference's single-letter skip
    * (:645-647) is dead code behind the len<2 gate and stays
    * unmodeled. */
  def parseEntitiesRow(rawContent: String): Vector[LlmEntity] = {
    try {
      val content = stripFenceRow(rawContent)
      if (content.isEmpty) return Vector.empty // json.loads('') raises
      val node = JsonKindExpr.mapper.readTree(content)
      if (node == null || !node.isArray) {
        // non-dict iteration / scalar TypeError arms → except → []
        return Vector.empty
      }
      val out = Vector.newBuilder[LlmEntity]
      val it = node.elements()
      while (it.hasNext) {
        val e = it.next()
        if (!e.isObject) return Vector.empty // e.get AttributeError arm
        val nameNode = e.get("name")
        // a present non-string (incl. null) name hits .strip() →
        // AttributeError → the blanket except empties everything
        if (nameNode != null && !nameNode.isTextual) return Vector.empty
        val name = pyStrip(if (nameNode == null) "" else nameNode.asText())
        val dropName = name.isEmpty ||
          name.codePointCount(0, name.length) < 2 ||
          entityStopWords.contains(name.toLowerCase(Locale.ROOT))
        if (!dropName) {
          // only reached past the name gates (python `continue` order)
          val confNode = e.get("confidence")
          if (confNode != null && !confNode.isNumber)
            return Vector.empty // `confidence < 0.5` TypeError arm
          val confidence = if (confNode == null) 0.5 else confNode.asDouble()
          if (confidence >= 0.5) {
            val typeNode = e.get("type")
            if (typeNode != null && typeNode.isNull)
              return Vector.empty // None.upper() AttributeError arm
            val rawType = (if (typeNode == null) "OTHER"
              else typeNode.asText()).toUpperCase(Locale.ROOT)
            val entityType =
              if (entityAllowedTypes.contains(rawType)) rawType
              else entityTypeMapping.getOrElse(rawType, "OTHER")
            val ctxNode = e.get("context")
            val context =
              if (ctxNode == null) Some("")
              else if (ctxNode.isNull) None
              else Some(ctxNode.asText())
            out += LlmEntity(name, entityType, confidence, context)
          }
        }
      }
      out.result().sortBy(-_.confidence).take(20)
    } catch {
      case scala.util.control.NonFatal(_) => Vector.empty
    }
  }

  final case class LlmMetadata(title: Option[String],
      author: Option[String], department: Option[String],
      category: Option[String], tags: Option[Vector[String]],
      summary: Option[String], keyTopics: Option[Vector[String]],
      sentiment: Option[String], confidence: Option[Double])

  /** Row-level extract_metadata parse (llm_service.py:472-512) with
    * the EXACT get-semantics the Column face can't express: a
    * present-but-null tags/key_topics stays None where a MISSING key
    * defaults to [] (get_json_object cannot distinguish the two, so
    * [[parseMetadata]] coalesces both to empty — documented
    * deviation); a present-null confidence stays None where missing
    * defaults 0.5. Arms: JSON object → field-wise; unparseable →
    * summary = first 200 code points of the RAW content at 0.3;
    * parseable non-object (the .get AttributeError) → all-empty at
    * 0.0. */
  def parseMetadataRow(rawContent: String): LlmMetadata = {
    val empty = LlmMetadata(None, None, None, None, None, None, None,
      None, Some(0.0))
    try {
      val content = stripFenceRow(rawContent)
      val node =
        if (content.isEmpty) null else JsonKindExpr.mapper.readTree(content)
      if (node == null)
        // JSONDecodeError arm: dataclass DEFAULTS for the untouched
        // fields — tags/key_topics stay None, not []
        LlmMetadata(None, None, None, None, None,
          Some(cpTake(rawContent, 200)), None, None, Some(0.3))
      else if (!node.isObject) empty
      else {
        def strField(k: String): Option[String] = {
          val n = node.get(k)
          if (n == null || n.isNull) None
          else if (n.isTextual) Some(n.asText())
          else Some(n.toString) // non-string values carried as-is
        }
        def listField(k: String): Option[Vector[String]] = {
          val n = node.get(k)
          if (n == null) Some(Vector.empty) // missing → the [] default
          else if (n.isNull) None // present null → None
          else if (n.isArray) {
            val b = Vector.newBuilder[String]
            val it = n.elements()
            while (it.hasNext) {
              val x = it.next()
              b += (if (x.isTextual) x.asText() else x.toString)
            }
            Some(b.result())
          } else Some(Vector(if (n.isTextual) n.asText() else n.toString))
        }
        val confNode = node.get("confidence")
        val conf =
          if (confNode == null) Some(0.5)
          else if (confNode.isNull) None
          else Some(confNode.asDouble())
        LlmMetadata(strField("title"), strField("author"),
          strField("department"), strField("category"),
          listField("tags"), strField("summary"),
          listField("key_topics"), strField("sentiment"), conf)
      }
    } catch {
      case scala.util.control.NonFatal(_) =>
        // json decode error arm (trailing data etc.) — same defaults
        LlmMetadata(None, None, None, None, None,
          Some(cpTake(rawContent, 200)), None, None, Some(0.3))
    }
  }

  /** Per-1K-token pricing (llm_service.py:402-421, "approximate as of
    * 2024") keyed `provider:model`. */
  val pricing: Seq[(String, Double, Double)] = Seq(
    ("openai:gpt-4o", 0.005, 0.015),
    ("openai:gpt-4o-mini", 0.00015, 0.0006),
    ("openai:gpt-4-turbo-preview", 0.01, 0.03),
    ("openai:gpt-3.5-turbo", 0.0005, 0.0015),
    ("gemini:gemini-2.5-pro", 0.0035, 0.0105),
    ("gemini:gemini-2.5-flash", 0.00035, 0.00105),
    ("gemini:gemini-2.0-flash", 0.00025, 0.00075),
    ("gemini:gemini-2.0-flash-lite", 0.0001, 0.0003),
    ("gemini:gemini-1.5-pro", 0.0035, 0.0105),
    ("gemini:gemini-1.5-flash", 0.00035, 0.00105))

  private val inRate: Column =
    map(pricing.flatMap { case (k, i, _) => Seq(lit(k), lit(i)) }: _*)
  private val outRate: Column =
    map(pricing.flatMap { case (k, _, o) => Seq(lit(k), lit(o)) }: _*)

  /** USD cost estimate (llm_service.py:396-428): token counts / 1000
    * times the per-model rates, rounded to 6 dp; unknown
    * provider/model pairs cost 0.0. Rounding note: Spark rounds
    * HALF_UP where Python's round() is half-to-even — identical
    * except on exact 5e-7 ties. */
  def estimateCost(provider: Column, model: Column,
      promptTokens: Column, completionTokens: Column): Column =
    round(estimateCostRaw(provider, model, promptTokens, completionTokens), 6)

  /** [[estimateCost]] before its 6-dp rounding — for callers that
    * re-encode the value themselves (integer micro-units in the gate,
    * where decimal-string HALF_UP vs binary rounding would diverge on
    * exact 5e-7 ties). */
  def estimateCostRaw(provider: Column, model: Column,
      promptTokens: Column, completionTokens: Column): Column = {
    val key = concat(lower(provider), lit(":"), model)
    val in = element_at(inRate, key)
    val out = element_at(outRate, key)
    when(in.isNull, lit(0.0)).otherwise(
      (promptTokens.cast("double") / 1000.0) * in +
        (completionTokens.cast("double") / 1000.0) * out)
  }
}

/** Strict whole-value JSON classifier — the `json.loads` acceptance
  * envelope that llm_service.py:488-512's graded fallbacks branch on.
  * Returns [[JsonKindExpr.KindObject]] for a JSON object,
  * [[JsonKindExpr.KindValue]] for valid JSON that is not an object
  * (the reference's `.get` AttributeError arm), and
  * [[JsonKindExpr.KindInvalid]] for anything json.loads would raise
  * on — including a valid value followed by trailing data, which
  * every built-in Spark probe (get_json_object / from_json /
  * try_parse_json) silently accepts by reading only the first value.
  * Jackson with FAIL_ON_TRAILING_TOKENS + ALLOW_NON_NUMERIC_NUMBERS
  * is json.loads' exact envelope over model output (both reject
  * comments, single quotes and unquoted keys; both accept
  * NaN/Infinity and duplicate keys).
  *
  * Per-row classification, no shuffle; CodegenFallback keeps it out
  * of whole-stage codegen but the parse is the cost, not the call.
  */
case class JsonKindExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (s.isEmpty) JsonKindExpr.KindInvalid // json.loads('') raises
    else try {
      val node = JsonKindExpr.mapper.readTree(s)
      if (node == null || node.isMissingNode) JsonKindExpr.KindInvalid
      // Jackson's non-numeric token set is wider than Python's scanner
      // (it also takes INF/+INF/+Infinity); a top-level non-finite is
      // json.loads-valid only as the three exact literals. Residual
      // (documented): the same wider tokens NESTED inside an
      // object/array still parse here but raise in json.loads.
      else if (node.isNumber && node.isDouble &&
        (node.doubleValue.isNaN || node.doubleValue.isInfinite) &&
        s != "NaN" && s != "Infinity" && s != "-Infinity")
        JsonKindExpr.KindInvalid
      else if (node.isObject) JsonKindExpr.KindObject
      else JsonKindExpr.KindValue
    } catch {
      case scala.util.control.NonFatal(_) => JsonKindExpr.KindInvalid
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsonKindExpr =
    copy(child = newChild)
}

object JsonKindExpr {
  val KindInvalid = 0
  val KindObject = 1
  val KindValue = 2

  // ObjectMapper is thread-safe once configured; one instance serves
  // every task in the executor JVM
  private[functions] lazy val mapper: ObjectMapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_TRAILING_TOKENS, true)
    .configure(JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS, true)
}
