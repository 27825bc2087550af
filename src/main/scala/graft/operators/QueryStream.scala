package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The streaming-answer endpoint's request glue (app/api/query.py):
  * metadata filter derivation, provider routing by model-id prefix,
  * and the chunked stream fallback. The prompt itself is
  * [[Search.ragPrompt]] (query.py:61-75, gate q93); this module models
  * the rest of `POST /api/query/stream` as Column transforms so a
  * whole request batch routes in one pass.
  */
object QueryStream {

  /** Provider routing (query.py:50-57 `_provider_from_model`):
    * case-insensitive model-id prefix, null model = "" — `gpt*` →
    * OPENAI, `gemini*` → GEMINI, anything else defaults to OPENAI.
    */
  def providerFromModel(model: Column): Column = {
    val m = lower(coalesce(model, lit("")))
    when(m.startsWith("gpt"), lit("OPENAI"))
      .when(m.startsWith("gemini"), lit("GEMINI"))
      .otherwise(lit("OPENAI"))
  }

  /** Filter derivation (query.py:38-47 `_filters_from_request`):
    * multi-select lists win; an ABSENT OR EMPTY multi-select falls
    * back to the deprecated single-select (Python `or` truthiness —
    * `[]` falls through, so a present-but-empty `departments` with a
    * legacy `department` still filters); a key appears only when its
    * value list is non-empty. Keys are Qdrant dot-notation payload
    * paths. Returns array<struct<filter_key, filter_value>> — one
    * entry per (key, member), the exploded form of the reference's
    * `{key: [values]}` dict.
    */
  def filterEntries(departments: Column, department: Column,
      securityTiers: Column, securityTier: Column): Column = {
    def resolve(multi: Column, single: Column): Column =
      when(multi.isNotNull && size(multi) > 0, multi)
        .otherwise(when(single.isNotNull, array(single))
          .otherwise(array().cast("array<string>")))
    def entries(key: String, values: Column): Column =
      transform(values, v =>
        struct(lit(key).as("filter_key"), v.as("filter_value")))
    concat(
      entries("metadata.department", resolve(departments, department)),
      entries("metadata.security_level", resolve(securityTiers, securityTier)))
  }

  /** The non-streaming fallback's chunked flush (query.py:104-110,
    * 113-119): `text[i:i+200]` frames for i in range(0, len, 200) —
    * an empty answer yields ZERO frames, not one empty frame.
    */
  def streamFrames(text: Column, frameSize: Int = 200): Column = {
    val t = coalesce(text, lit("")) // the reference's `content or ""`
    val n = ceil(length(t).cast("double") / frameSize).cast("int")
    // sequence(1, 0) would DESCEND in Spark; guard the empty case
    when(n <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), n),
        i => substring(t, ((i - 1) * frameSize + 1).cast("int"),
          lit(frameSize))))
  }

  /** The stream's error trailer (query.py:164-166): failures mid-flush
    * append one final `\n[error] {message}` frame rather than
    * breaking the HTTP stream.
    */
  def errorTrailer(message: Column): Column =
    concat(lit("\n[error] "), coalesce(message, lit("")))
}
