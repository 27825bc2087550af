package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The LlamaParse HTTP client's deterministic contracts
  * (app/services/llamaparse_service.py:26-409) — the wire-boundary
  * convention of [[OpenAiWire]]/[[GeminiWire]]: the upload-and-poll
  * plumbing is serving-tier, but the endpoint resolution, mime
  * inference, tier mapping, and response normalization are pure
  * functions the engine owns (and the [[Parse]] operator composes
  * through its [[ParserClient]] seam).
  *
  * Faithful quirks:
  *   - endpoint resolution accepts FOUR base forms
  *     (llamaparse_service.py:66-85): .../api/parsing,
  *     .../api/v1, .../api, and a bare host — each appends a
  *     different path to reach /api/v1/parsing/<suffix>; bases
  *     rstrip ALL trailing slashes, suffixes lstrip leading ones;
  *   - the mime table (:284-301) has eight arms and NO .md entry —
  *     a markdown filename infers application/octet-stream even
  *     though markdown is the service's native result format;
  *   - the tier map (:319-330) carries the legacy names
  *     (simple→cost_effective, standard→balanced, premium→agentic),
  *     case-folds, and defaults UNKNOWN tiers to balanced rather
  *     than erroring;
  *   - response normalization (:395-409) picks markdown via Python
  *     `or` over markdown/content/md — an empty string falls
  *     through to the next key, and an all-falsy response yields
  *     null (the no-api-key arm returns the same empty shape). */
object LlamaParseWire {

  private def rstripSlash(c: Column): Column =
    regexp_replace(c, "/+$", "")

  private def lstripSlash(c: Column): Column =
    regexp_replace(c, "^/+", "")

  /** llamaparse_service.py:66-85. */
  def parsingEndpoint(base: Column, suffix: Column): Column = {
    val b = rstripSlash(base)
    val s = lstripSlash(suffix)
    when(b.endsWith("/api/parsing"), concat(b, lit("/"), s))
      .when(b.endsWith("/api/v1"), concat(b, lit("/parsing/"), s))
      .when(b.endsWith("/api"), concat(b, lit("/v1/parsing/"), s))
      .otherwise(concat(b, lit("/api/v1/parsing/"), s))
  }

  /** llamaparse_service.py:284-301 — note: no .md arm. */
  def inferMime(filename: Column): Column = {
    val l = lower(filename)
    when(l.endsWith(".pdf"), lit("application/pdf"))
      .when(l.endsWith(".docx"), lit("application/vnd.openxmlformats-" +
        "officedocument.wordprocessingml.document"))
      .when(l.endsWith(".doc"), lit("application/msword"))
      .when(l.endsWith(".pptx"), lit("application/vnd.openxmlformats-" +
        "officedocument.presentationml.presentation"))
      .when(l.endsWith(".xlsx"), lit("application/vnd.openxmlformats-" +
        "officedocument.spreadsheetml.sheet"))
      .when(l.endsWith(".txt"), lit("text/plain"))
      .when(l.endsWith(".html") || l.endsWith(".htm"), lit("text/html"))
      .otherwise(lit("application/octet-stream"))
  }

  /** llamaparse_service.py:319-330 — legacy names fold in, unknown
    * tiers default to balanced. */
  def parsingMode(tier: Column): Column = {
    val t = lower(tier)
    when(t.isin("cost_effective", "balanced", "agentic", "agentic_plus"), t)
      .when(t === "simple", lit("cost_effective"))
      .when(t === "standard", lit("balanced"))
      .when(t === "premium", lit("agentic"))
      .otherwise(lit("balanced"))
  }

  /** llamaparse_service.py:399 — Python `or` over the three markdown
    * keys: empty strings fall through, all-falsy yields null. */
  def normalizedMarkdown(markdown: Column, content: Column,
      md: Column): Column = {
    def truthy(c: Column) = c.isNotNull && length(c) > 0
    when(truthy(markdown), markdown)
      .when(truthy(content), content)
      .when(truthy(md), md)
  }
}
