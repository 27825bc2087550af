package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  // Python str.strip() removes ALL whitespace; Spark's default trim
  // removes only spaces — trim the ASCII whitespace set incl the
  // vertical tab (Python also strips the \u001C-\u001F separators;
  // excluded here as they never occur in model output)
  private val ws = " \t\n\r\f\u000B"
  private def wsTrim(c: Column): Column = trim(c, ws)

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
    // Validity has to be stricter than get_json_object alone: that
    // parser reads the FIRST JSON value and ignores trailing garbage,
    // while json.loads raises Extra-data (the 0.3 arm). A corrupt-
    // record probe catches malformed objects, and the closing-brace /
    // bracket guards catch well-formed prefixes with trailing text.
    // Residual leniency (documented): a bare scalar with trailing
    // garbage still classifies as the 0.0 arm, not 0.3.
    val objProbe = from_json(cleaned,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_corrupt",
          org.apache.spark.sql.types.StringType))),
      Map("columnNameOfCorruptRecord" -> "_corrupt"))
    val isObject = cleaned.startsWith("{") && cleaned.endsWith("}") &&
      objProbe.isNotNull && objProbe.getField("_corrupt").isNull
    val shapeOk =
      when(cleaned.startsWith("{"), cleaned.endsWith("}"))
        .when(cleaned.startsWith("["), cleaned.endsWith("]"))
        .otherwise(lit(true))
    // JSON `null` parses (then fails the reference's .get — 0.0 arm)
    // but get_json_object cannot distinguish it from a parse failure;
    // same for the non-standard literals json.loads accepts by default
    val jsonScalarLiterals = Seq("null", "NaN", "Infinity", "-Infinity")
    val parseable = shapeOk &&
      (cleaned.isInCollection(jsonScalarLiterals) ||
        get_json_object(cleaned, "$").isNotNull || isObject)
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
