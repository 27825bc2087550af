package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus quality filtering for training-data pipelines (beyond-
  * reference scale operators, the tier SURVEY §2.11 tracks alongside
  * dedup/ANN): the published filter batteries a 100 TB text corpus is
  * run through before training —
  *
  *  - repetition / shape signals in the style of the Gopher rules
  *    (Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
  *    Insights from Training Gopher", appendix A): word count and
  *    mean-word-length bounds, alphabetic-word fraction, duplicate
  *    word/n-gram fractions, most-common-word share, longest
  *    consecutive word run;
  *  - line-level cleaning in the style of the C4 heuristics (Raffel
  *    et al. 2020, "Exploring the Limits of Transfer Learning", §2.2):
  *    minimum words per line, terminal-punctuation requirement,
  *    boilerplate markers ("lorem ipsum", code braces);
  *  - PII redaction: e-mail / IPv4 / phone / long-digit-run patterns
  *    replaced with typed placeholders.
  *
  * Everything is a narrow per-row projection or filter — no shuffle,
  * no UDF, all built-ins and higher-order functions, so the whole
  * battery runs inside the scan stage at any corpus size and the
  * filters are pushdown-eligible. Word-level signals reformulate
  * Gopher's character-fraction thresholds at word granularity so the
  * DuckDB oracle can replay the exact integer arithmetic.
  */
object QualityFilters {

  /** The whitespace class words split on, written out explicitly:
    * Java `\s` includes U+000B where RE2's (the oracle engine's)
    * does not, so the shared definition is the RE2 set. */
  val whitespaceClass = "[ \\t\\n\\f\\r]+"

  /** Raw whitespace-split words (non-empty). Unlike the BM25
    * tokenizer this keeps punctuation and case — Gopher's word stats
    * are over raw words, not normalized tokens. Total on NULL text
    * (empty word list), matching the oracle's coalesce. */
  def rawWords(text: Column): Column =
    filter(split(coalesce(text, lit("")), whitespaceClass),
      w => w =!= "")

  /** Longest run of equal consecutive elements in a string array
    * (0 for empty). One interpreted-HOF pass; on a sorted array this
    * is the count of the most frequent element. */
  def maxRunOf(arr: Column): Column =
    aggregate(arr,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Overlapping (non-distinct) word n-grams joined with single
    * spaces; fewer than n words gives an empty array — via an
    * explicit size guard (r17 review pass 8: at n = 1 the former
    * greatest()-clamped sequence emitted one empty-slice gram "" per
    * EMPTY word array, which the inner word-count filter passes —
    * split("", " ") is [""], size 1 — so tokenless docs each fed a
    * phantom "" unigram into frequency tables). */
  def wordNgrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      filter(
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n)))),
        g => size(split(g, " ")) === n))
      .otherwise(array().cast("array<string>"))

  private def safeFrac(num: Column, den: Column): Column =
    when(den > 0, round(num.cast("double") / den.cast("double"), 6))
      .otherwise(lit(0.0))

  /** The per-document signal frame: id column + the Gopher-style
    * signals, each a deterministic function of the text column.
    * Ratios are rounded to 6 places (both engines round the same
    * IEEE double, so the oracle hash-matches).
    *
    * Columns: word_count, mean_word_len, alpha_word_frac,
    * dup_word_frac, dup_2gram_frac, dup_3gram_frac, top_word_frac,
    * max_word_run. */
  def signals(df: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    val withWords = df.withColumn("_ws", rawWords(col(textCol)))
      .withColumn("_g2", wordNgrams(col("_ws"), 2))
      .withColumn("_g3", wordNgrams(col("_ws"), 3))
    val n = size(col("_ws"))
    withWords.select((col(idCol) +: carryCols.map(col)) ++ Seq(
      n.cast("long").as("word_count"),
      safeFrac(aggregate(col("_ws"), lit(0L), (a, w) => a + length(w)), n)
        .as("mean_word_len"),
      safeFrac(size(filter(col("_ws"), w => w.rlike("[A-Za-z]"))), n)
        .as("alpha_word_frac"),
      safeFrac(n - size(array_distinct(col("_ws"))), n)
        .as("dup_word_frac"),
      safeFrac(size(col("_g2")) - size(array_distinct(col("_g2"))),
        size(col("_g2"))).as("dup_2gram_frac"),
      safeFrac(size(col("_g3")) - size(array_distinct(col("_g3"))),
        size(col("_g3"))).as("dup_3gram_frac"),
      safeFrac(maxRunOf(array_sort(col("_ws"))), n).as("top_word_frac"),
      maxRunOf(col("_ws")).as("max_word_run")): _*)
  }

  /** Gopher-style keep decision over a [[signals]] frame. Threshold
    * defaults follow the published rules where the word-level
    * reformulation has a direct analogue (word count 50–100 000,
    * mean word length 3–10, ≥ 80 % alphabetic words) and corpus-
    * conventional caps for the repetition signals. */
  def gopherKeep(
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaWordFrac: Double = 0.8,
      maxDup2gramFrac: Double = 0.6,
      maxTopWordFrac: Double = 0.2,
      maxWordRun: Long = 4L): Column =
    col("word_count") >= minWords && col("word_count") <= maxWords &&
      col("mean_word_len") >= minMeanWordLen &&
      col("mean_word_len") <= maxMeanWordLen &&
      col("alpha_word_frac") >= minAlphaWordFrac &&
      col("dup_2gram_frac") <= maxDup2gramFrac &&
      col("top_word_frac") <= maxTopWordFrac &&
      col("max_word_run") <= maxWordRun

  /** The [[gopherKeep]] decision as ONE self-contained expression
    * over the text column, for use directly in a `.where(...)`.
    *
    * Filtering on the [[signals]] frame's aliased columns is a
    * performance trap: predicate pushdown substitutes each alias
    * into the filter, so the tokenizer and n-gram builders re-run
    * once per threshold term (measured 40× slower at sf1). Here the
    * word array and 2-gram array are bound ONCE as higher-order-
    * function lambda variables — the optimizer cannot inline through
    * a lambda binding — and every threshold reads the bound value.
    * Thresholds and rounding are identical to the frame path, so
    * where(gopherKeepOf(text)) ≡ signals+where(gopherKeep). */
  def gopherKeepOf(text: Column,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaWordFrac: Double = 0.8,
      maxDup2gramFrac: Double = 0.6,
      maxTopWordFrac: Double = 0.2,
      maxWordRun: Long = 4L): Column =
    element_at(transform(array(rawWords(text)), ws =>
      element_at(transform(array(wordNgrams(ws, 2)), g2 => {
        val n = size(ws)
        n.cast("long") >= minWords && n.cast("long") <= maxWords &&
          safeFrac(aggregate(ws, lit(0L), (a, w) => a + length(w)), n)
            .between(minMeanWordLen, maxMeanWordLen) &&
          safeFrac(size(filter(ws, w => w.rlike("[A-Za-z]"))), n) >=
            minAlphaWordFrac &&
          safeFrac(size(g2) - size(array_distinct(g2)), size(g2)) <=
            maxDup2gramFrac &&
          safeFrac(maxRunOf(array_sort(ws)), n) <= maxTopWordFrac &&
          maxRunOf(ws) <= maxWordRun
      }), 1)), 1)

  /** C4-style line cleaning: keep a line iff it has at least
    * `minLineWords` whitespace words, does not contain "lorem ipsum"
    * (case-insensitive) or a curly brace (the code/boilerplate
    * marker), and — when `requireTerminalPunct` — ends in terminal
    * punctuation (./!/?/"/'). Returns struct(cleaned, n_lines_kept);
    * callers typically follow with a kept-word-count document filter
    * ([[c4Clean]]). */
  def c4CleanedLines(text: Column, minLineWords: Int,
      requireTerminalPunct: Boolean): Column = {
    // \r?\n: CRLF crawl text would otherwise leave \r on every line —
    // trim() strips only spaces, so the terminal-punctuation arm
    // rejected EVERY line of a CRLF document (r17 review pass 8).
    // (The line-DEDUP laws split on bare \n by documented design —
    // line identity there is the exact raw line.)
    val kept = filter(split(coalesce(text, lit("")), "\\r?\\n"), l => {
      val t = trim(l)
      val base = size(rawWords(t)) >= minLineWords &&
        !lower(t).contains("lorem ipsum") && !t.contains("{") &&
        !t.contains("}")
      if (requireTerminalPunct) base && t.rlike("[.!?\"']$") else base
    })
    struct(array_join(transform(kept, l => trim(l)), "\n").as("cleaned"),
      size(kept).cast("long").as("n_lines_kept"))
  }

  /** The document-level C4 pass: clean lines, then keep documents
    * whose cleaned text still has at least `minDocWords` words.
    * Output: idCol, cleaned, n_lines_kept.
    *
    * Cost note: the document filter references the projected struct,
    * so pushdown inlines the line battery into the Filter — the
    * battery evaluates twice per row (once deciding, once emitting).
    * That is filter+project's floor without a materialization
    * barrier (gopherKeepOf's lambda binding prevents the PER-TERM
    * multiplier, which does not arise here — one predicate term);
    * a caller chaining c4Clean into an expensive pipeline persists
    * its output, the library never hides a persist. */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 3, minDocWords: Int = 5,
      requireTerminalPunct: Boolean = false): DataFrame =
    df.select(col(idCol),
        c4CleanedLines(col(textCol), minLineWords, requireTerminalPunct)
          .as("_c"))
      .select(col(idCol), col("_c.cleaned").as("cleaned"),
        col("_c.n_lines_kept").as("n_lines_kept"))
      .where(size(rawWords(col("cleaned"))) >= minDocWords)

  /** Per-source (domain-level) quality census: the signals rolled up
    * to the grouping a crawl pipeline actually prunes at — a whole
    * source whose documents mostly fail the battery is dropped
    * outright (the RefinedWeb-style domain filter). Only exact
    * integer aggregates (counts, sums of word counts) feed the
    * output, so no order-dependent float summation exists; the two
    * ratios are single divisions of those exact integers. One
    * map-side-combinable groupBy — scale-safe at any corpus size.
    *
    * Output per source: n_docs, n_kept, kept_share, total_words,
    * mean_words, and the keep flag at `minKeptShare`. */
  def sourceCensus(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, minKeptShare: Double = 0.5): DataFrame = {
    val sig = signals(df, idCol, textCol, carryCols = Seq(sourceCol))
      .withColumn("_keep", gopherKeep())
    sig.groupBy(col(sourceCol))
      .agg(
        count(lit(1L)).as("n_docs"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("word_count")).as("total_words"))
      .select(col(sourceCol), col("n_docs"), col("n_kept"),
        round(col("n_kept").cast("double") /
          col("n_docs").cast("double"), 6).as("kept_share"),
        col("total_words"),
        round(col("total_words").cast("double") /
          col("n_docs").cast("double"), 6).as("mean_words"))
      .withColumn("source_keep", col("kept_share") >= minKeptShare)
  }

  /** E-mail addresses → `<EMAIL>`. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 literals → `<IP>`. */
  val ipv4Pattern = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  /** NANP-shaped phone numbers → `<PHONE>`. The separator class is
    * spelled out (Java `\s` includes U+000B where RE2's does not —
    * the same divergence [[whitespaceClass]] exists for, r17 review
    * pass 8), and the digit groups are boundary-anchored INSIDE the
    * optional paren (`\(?\b` — a `\b` before the paren would fail on
    * "(555)") so the pattern can never start mid-digit-run: without
    * the anchors, "case 123456 555 1234" matched "456 555 1234" and
    * half-ate the account id. */
  val phonePattern =
    "\\(?\\b\\d{3}\\)?[ \\t\\n\\f\\r.-]\\d{3}[ \\t\\n\\f\\r.-]\\d{4}\\b"
  /** Remaining runs of ≥ 6 digits (account/id numbers) → `<NUM>`. */
  val digitRunPattern = "\\d{6,}"

  /** PII redaction: the four patterns applied in order (e-mail first
    * so its digits never half-match as a number; the digit-run
    * catch-all last). Pure regexp_replace chain — codegen'd, no
    * shuffle, patterns valid under both Java regex and RE2 so the
    * oracle replays them verbatim. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, emailPattern, "<EMAIL>"),
          ipv4Pattern, "<IP>"),
        phonePattern, "<PHONE>"),
      digitRunPattern, "<NUM>")
}
