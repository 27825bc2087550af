package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityFilters

/** Gopher-style quality signals, C4-style line cleaning, and PII
  * redaction (operators/QualityFilters). */
class QualityFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def sig(text: String) =
    QualityFilters.signals(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head

  test("signals: a crafted doc yields the hand-computed values") {
    // 8 words: the run "b b b" and duplicate 2-gram "b b" (x2)
    val r = sig("a b b b a9 c. d e")
    assert(r.getAs[Long]("word_count") === 8L)
    // lengths 1+1+1+1+2+2+1+1 = 10 → 1.25
    assert(r.getAs[Double]("mean_word_len") === 1.25)
    // all words contain a letter
    assert(r.getAs[Double]("alpha_word_frac") === 1.0)
    // distinct: a b a9 c. d e = 6 → dup 2/8
    assert(r.getAs[Double]("dup_word_frac") === 0.25)
    // 2-grams: [a b][b b][b b][b a9][a9 c.][c. d][d e] → 7, distinct 6
    assert(r.getAs[Double]("dup_2gram_frac") === 0.142857) // 1/7 @6
    assert(r.getAs[Double]("top_word_frac") === 0.375) // "b" 3/8
    assert(r.getAs[Long]("max_word_run") === 3L)
  }

  test("signals: whitespace handling and degenerate sizes") {
    val r = sig("  one   two\tthree  ")
    assert(r.getAs[Long]("word_count") === 3L)
    assert(r.getAs[Long]("max_word_run") === 1L)
    assert(r.getAs[Double]("dup_2gram_frac") === 0.0)
    val single = sig("word")
    assert(single.getAs[Long]("word_count") === 1L)
    // fewer words than n → no grams → frac 0 (not NaN)
    assert(single.getAs[Double]("dup_2gram_frac") === 0.0)
    assert(single.getAs[Double]("dup_3gram_frac") === 0.0)
    assert(single.getAs[Double]("top_word_frac") === 1.0)
  }

  test("signals and c4Clean are total on NULL text, and the word " +
      "split uses the RE2 whitespace class (U+000B is NOT a separator)") {
    val r = QualityFilters.signals(
      Seq((1L, null: String)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(r.getAs[Long]("word_count") === 0L)
    assert(r.getAs[Double]("mean_word_len") === 0.0)
    assert(r.getAs[Long]("max_word_run") === 0L)
    assert(QualityFilters.c4Clean(
      Seq((1L, null: String)).toDF("doc_id", "text"), "doc_id", "text")
      .count() === 0L)
    // Java \s includes U+000B, RE2's does not — the shared explicit
    // class keeps both engines at one word here
    val vt = sig("alpha\u000Bbeta")
    assert(vt.getAs[Long]("word_count") === 1L)
  }

  test("signals: alpha_word_frac counts words with any letter") {
    val r = sig("abc 123 4d 99 -- x2026")
    // abc, 4d, x2026 carry letters → 3/6
    assert(r.getAs[Double]("alpha_word_frac") === 0.5)
  }

  test("maxRunOf: empty array is 0; ties take the max; run resets") {
    val df = Seq(
      (1L, Seq[String]()),
      (2L, Seq("x")),
      (3L, Seq("x", "x", "y", "y", "y", "x")),
      (4L, Seq("a", "b", "a", "b"))
    ).toDF("id", "arr")
      .select(col("id"), QualityFilters.maxRunOf(col("arr")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df === Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 1L))
  }

  test("gopherKeep: each threshold rejects independently") {
    val base = (0 until 60).map(i => s"word$i").mkString(" ")
    def keep(text: String): Boolean =
      QualityFilters.signals(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
        .withColumn("keep", QualityFilters.gopherKeep())
        .collect().head.getAs[Boolean]("keep")
    // 60 distinct ~5.5-char words: every signal inside bounds → keep
    assert(keep(base))
    // under 50 words → reject
    assert(!keep("alpha beta gamma delta epsilon"))
    // a 5-run of one word → max_word_run reject
    assert(!keep(base + " zz zz zz zz zz"))
    // half the words carry no letter → alpha_word_frac reject
    assert(!keep((0 until 60)
      .map(i => if (i % 2 == 0) s"word$i" else s"9${i}00")
      .mkString(" ")))
    // a cycling 5-word doc repeats nearly every 2-gram → reject
    assert(!keep(Seq.fill(60)("alpha beta gamma delta epsilon")
      .mkString(" ")))
  }

  test("c4Clean: line filters, terminal punctuation, doc minimum") {
    val text = Seq(
      "This line has plenty of words and ends well.",
      "too short.",
      "this long line has no terminal punctuation at all",
      "a boilerplate { code } line with many words inside.",
      "Lorem Ipsum dolor sit amet consectetur.",
      "  Trimmed line with whitespace kept words here!  "
    ).mkString("\n")
    val out = QualityFilters.c4Clean(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      minLineWords = 3, minDocWords = 5, requireTerminalPunct = true)
      .collect().head
    val cleaned = out.getAs[String]("cleaned")
    assert(out.getAs[Long]("n_lines_kept") === 2L)
    assert(cleaned ===
      "This line has plenty of words and ends well.\n" +
        "Trimmed line with whitespace kept words here!")
    // doc-level minimum: a doc whose surviving lines carry < 5 words
    // disappears entirely
    val tiny = QualityFilters.c4Clean(
      Seq((1L, "one two three.\nfour five six.")).toDF("doc_id", "text"),
      "doc_id", "text", minLineWords = 3, minDocWords = 6,
      requireTerminalPunct = true)
    assert(tiny.count() === 1L)
    val gone = QualityFilters.c4Clean(
      Seq((1L, "one two three.")).toDF("doc_id", "text"),
      "doc_id", "text", minLineWords = 3, minDocWords = 6,
      requireTerminalPunct = true)
    assert(gone.count() === 0L)
  }

  test("gopherKeepOf (single-expression filter form) decides " +
      "identically to the signals+gopherKeep frame path") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaFrame = QualityFilters.signals(docs, "doc_id", "text")
      .where(QualityFilters.gopherKeep())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaExpr = docs
      .where(QualityFilters.gopherKeepOf(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaExpr === viaFrame)
    assert(viaExpr.nonEmpty && viaExpr.size < docs.count())
  }

  test("sourceCensus: integer-exact roll-up and the keep threshold") {
    val good = (0 until 60).map(i => s"word$i").mkString(" ")
    val bad = "tiny doc"
    val docs = Seq(
      (1L, good, "a"), (2L, good, "a"), (3L, bad, "a"),
      (4L, bad, "b"), (5L, bad, "b"), (6L, good, "b")
    ).toDF("doc_id", "text", "source")
    val out = QualityFilters.sourceCensus(docs, "doc_id", "text",
      "source", minKeptShare = 0.5)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_docs") === 3L)
    assert(a.getAs[Long]("n_kept") === 2L)
    assert(a.getAs[Double]("kept_share") === 0.666667)
    assert(a.getAs[Long]("total_words") === 122L) // 60+60+2
    assert(a.getAs[Boolean]("source_keep"))
    val b = out("b")
    assert(b.getAs[Long]("n_kept") === 1L)
    assert(b.getAs[Double]("kept_share") === 0.333333)
    assert(!b.getAs[Boolean]("source_keep"))
  }

  test("redactPii: each pattern, ordering, and near-misses") {
    def red(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(QualityFilters.redactPii(col("t")).as("r"))
        .collect().head.getString(0)
    assert(red("mail a.user+tag@sub.example.co now") ===
      "mail <EMAIL> now")
    assert(red("at 192.168.0.1 and 10.0.0.255.") ===
      "at <IP> and <IP>.")
    assert(red("call (555) 867-5309 or 555.867.5309 ok") ===
      "call <PHONE> or <PHONE> ok")
    assert(red("acct 12345678 but pin 12345 stays") ===
      "acct <NUM> but pin 12345 stays")
    // the email consumes its digits before the digit-run pass
    assert(red("x123456789@example.com") === "<EMAIL>")
    // IP wins over the digit-run even with 3-digit octets
    assert(red("ip 255.255.255.255") === "ip <IP>")
  }

  test("r17 pass-8 regressions: phone anchors never bite mid-digit-" +
      "run, the separator class is the RE2 set, wordNgrams(_, 1) on " +
      "a tokenless doc is EMPTY, c4 cleans CRLF text") {
    def red(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(QualityFilters.redactPii(col("t")).as("r"))
        .collect().head.getString(0)
    // an account id is never half-eaten by the unanchored phone shape
    assert(red("case 123456 555 1234 end") === "case <NUM> 555 1234 end")
    // real phones still redact, parenthesized and dotted alike
    assert(red("call (555) 867-5309 now") === "call <PHONE> now")
    // U+000B is NOT a separator (the RE2 class — Java \s would match)
    assert(red("x 555\u000B867\u000B5309 y") === "x 555\u000B867\u000B5309 y")
    // n=1 n-grams of an empty word array: EMPTY, no phantom "" gram
    val grams = Seq(Tuple1("!!!")).toDF("t")
      .select(QualityFilters.wordNgrams(
        graft.functions.TextFunctions.allTokens(col("t")), 1).as("g"))
      .collect().head.getSeq[String](0)
    assert(grams.isEmpty)
    // CRLF text: lines clean with \r stripped, punctuation arm works
    val crlf = Seq((1L, "Good sentence here one two.\r\nshort\r\n" +
      "Another long enough line!\r\n")).toDF("id", "t")
    val out = QualityFilters.c4Clean(crlf, "id", "t",
        minLineWords = 3, minDocWords = 5, requireTerminalPunct = true)
      .collect().head
    assert(out.getString(1) ===
      "Good sentence here one two.\nAnother long enough line!")
    assert(out.getLong(2) === 2L)
  }
}
