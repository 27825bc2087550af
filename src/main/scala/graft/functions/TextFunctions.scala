package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the document pipeline.
  *
  * Re-expresses (Spark-first, codegen'd `functions._` only — no UDFs):
  *  - BM25 tokenization: reference `app/chunking/two_tier_chunker.py:69-77`
  *    and `app/services/search_service.py:281-285` (lowercase, `\b\w+\b`,
  *    drop stopwords and tokens of length <= 2).
  *  - quality scoring / token stats (training-data-pipeline additions).
  *  - language ID by stopword-profile voting (n-gram heuristic tier).
  *  - document fingerprinting: reference content hashes
  *    `app/connectors/notion_connector.py:624-634` (md5 of normalized text).
  *
  * Everything here stays inside whole-stage codegen: at 100 TB these are
  * narrow per-row map stages with no shuffle.
  */
object TextFunctions {

  /** Stopword set shared with the DuckDB oracles — keep in sync with
    * [[graft.SparkEntry.oracleSql]] (SQL literal list). Subset of the
    * reference's STOPWORDS (two_tier_chunker.py:69-77).
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be", "this", "that",
    "are", "was", "from", "but", "not", "have", "has", "had")

  /** SQL literal list of [[stopwords]] for oracle strings. */
  def stopwordsSqlList: String = stopwords.map(s => s"'$s'").mkString(", ")

  /** Lowercase word tokens, length > 2, stopwords removed; duplicates
    * KEPT (term frequency matters downstream). Backed by the native
    * single-pass [[NativeText.bm25TokensOf]] — value-identical to the
    * HOF chain `filter(split(lower(text), "[^a-z0-9]+"), …)`, which is
    * what the DuckDB oracles still describe (the HOF runs interpreted
    * per element and dominates the ingest tokenization cost).
    */
  def bm25Tokens(text: Column): Column = NativeText.bm25TokensOf(text)

  /** HOF formulation of [[bm25Tokens]] (bit-identity reference). */
  def bm25TokensHof(text: Column): Column = {
    val raw = split(lower(text), "[^a-z0-9]+")
    filter(raw, t => length(t) > 2 && !t.isin(stopwords: _*))
  }

  /** All word tokens (lowercased, non-empty), stopwords kept. */
  def allTokens(text: Column): Column = NativeText.allTokensOf(text)

  /** HOF formulation of [[allTokens]] (bit-identity reference). */
  def allTokensHof(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Whitespace-ish token count (training-data token budgeting tier 0). */
  def tokenCount(text: Column): Column = size(allTokens(text))

  /** Stopword ratio among all tokens; 0.0 for empty docs. */
  def stopwordRatio(text: Column): Column =
    stopwordRatioOfTokens(allTokens(text))

  /** Stopword ratio from a materialized token-array column. */
  def stopwordRatioOfTokens(toks: Column): Column = {
    val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
    when(size(toks) > 0,
      nStop.cast("double") / size(toks).cast("double")).otherwise(lit(0.0))
  }

  /** Heuristic document quality score in [0,1]:
    * 0.5 * min(n_tokens/100, 1) + 0.3 * (1 - stopword_ratio)
    * + 0.2 * min(mean_token_len/8, 1).
    * Mirrors the reference's length/structure confidence heuristic
    * (app/processors/parser.py:227-244) re-targeted at corpus QA.
    */
  def qualityScore(text: Column): Column =
    qualityScoreOfTokens(allTokens(text))

  /** Quality score from a materialized token-array column. */
  def qualityScoreOfTokens(toks: Column): Column = {
    val n = size(toks).cast("double")
    val meanLen = when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / n).otherwise(lit(0.0))
    val lenScore = least(n / lit(100.0), lit(1.0))
    val swScore = lit(1.0) - stopwordRatioOfTokens(toks)
    val tokLenScore = least(meanLen / lit(8.0), lit(1.0))
    lit(0.5) * lenScore + lit(0.3) * swScore + lit(0.2) * tokLenScore
  }

  /** Per-language marker lexicons for the language-ID heuristic.
    * Deterministic and tiny by design — the oracle repeats them as SQL
    * literals. (Word-list voting is the degenerate 1-gram case of the
    * n-gram langid tier.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "en" -> Seq("the", "and", "not", "with", "for", "this", "that"),
    "es" -> Seq("el", "la", "los", "las", "que", "una", "por"),
    "fr" -> Seq("le", "les", "des", "une", "est", "dans", "pour"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "zhe", "yi"))

  /** Predicted language = argmax over marker-hit counts, ties broken by
    * language code ascending ("unk" when zero hits everywhere).
    */
  def langId(text: Column): Column =
    langIdOfTokens(allTokens(text))

  /** Language ID from a materialized token-array column. */
  def langIdOfTokens(toks: Column): Column = {
    val scored = langMarkers.map { case (lang, markers) =>
      (lang, size(filter(toks, t => t.isin(markers: _*))))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // first lang (alphabetical order) achieving the max; markers are
    // declared sorted by code so fold order = tie-break order
    scored.foldRight(lit("unk")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Normalized-content fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text (exact-dup key).
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Word n-gram shingles (default n=3), distinct, as array<string>.
    * Shingling tier of MinHash dedup.
    *
    * NOTE for hot paths: HOF lambdas run interpreted (outside codegen),
    * and Catalyst inlines cheap aliases — materialize the token array
    * as its own column first ([[shinglesOfTokens]]) so the tokenizer
    * runs once per row, not once per reference.
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOfTokens(bm25Tokens(text), n)

  /** Shingles from an already-materialized token-array column. */
  def shinglesOfTokens(toks: Column, n: Int): Column = {
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    val grams = transform(idx, i =>
      concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(filter(grams, g => size(split(g, " ")) === n))
  }
}
