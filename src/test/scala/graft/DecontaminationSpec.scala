package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** Eval-set decontamination (Dedup.removeContaminatedSpans — q212's
  * operator; the span-removal posture of Brown et al. 2020 app. C):
  * membership-convicts law on hand corpora — no keep-first owner, so
  * even the smallest train id loses colliding windows — plus the
  * degenerate shapes and an sf0.001 window-alignment invariant. */
class DecontaminationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def run(train: Seq[(Long, String)], eval: Seq[(Long, String)],
      n: Int): Map[Long, Row] =
    Dedup.removeContaminatedSpans(
        train.toDF("doc_id", "text"), "doc_id", "text",
        eval.toDF("eval_id", "text"), "text", n)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("membership convicts — even the minimum train id loses its " +
      "colliding window; clean train docs pass untouched; output " +
      "covers the train frame only") {
    val out = run(
      train = Seq(1L -> "a b c x y", 2L -> "p q r s"),
      eval = Seq(100L -> "noise a b c more noise"), n = 3)
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L).getLong(2) === 3L)
    assert(out(1L).getString(3) === "x y")
    assert(out(2L).getLong(2) === 0L)
    assert(out(2L).getString(3) === "p q r s")
  }

  test("overlapping hits union (a 2n-long collision drops 2n once); " +
      "repeated hits in the train doc each convict their window") {
    val out = run(
      train = Seq(1L -> "a b c d e f tail", 2L -> "a b c z a b c"),
      eval = Seq(9L -> "a b c d e f"), n = 3)
    assert(out(1L).getLong(2) === 6L)
    assert(out(1L).getString(3) === "tail")
    // doc 2: "a b c" hits at 0 and 4 → {0,1,2} ∪ {4,5,6}; z survives
    assert(out(2L).getLong(2) === 6L)
    assert(out(2L).getString(3) === "z")
  }

  test("short docs (< n tokens) and null text on either side are " +
      "inert; eval-internal repeats add nothing") {
    val out = run(
      train = Seq(1L -> "t u", 2L -> (null: String), 3L -> "v w x y"),
      eval = Seq(9L -> "v w x v w x", 8L -> (null: String), 7L -> "q"),
      n = 3)
    assert(out(1L).getLong(1) === 2L && out(1L).getLong(2) === 0L)
    assert(out(2L).getLong(1) === 0L && out(2L).getString(3) === "")
    assert(out(3L).getLong(2) === 3L)
    assert(out(3L).getString(3) === "y")
  }

  test("the corpus tokenizer decides identity: case/punctuation " +
      "cannot hide benchmark text") {
    val out = run(
      train = Seq(1L -> "The QUICK, brown fox; jumps"),
      eval = Seq(9L -> "the quick brown fox"), n = 4)
    assert(out(1L).getLong(2) === 4L)
    assert(out(1L).getString(3) === "jumps")
  }

  test("sf0.001 sanity (q212 shape): one row per train doc, drops " +
      "window-aligned, and stripping is idempotent — a second pass " +
      "against the same eval set removes nothing") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val train = docs.where(col("doc_id") % 5 =!= 0)
    val eval = docs.where(col("doc_id") % 5 === 0)
    val out = Dedup.removeContaminatedSpans(
      train, "doc_id", "text", eval, "text", 6).cache()
    try {
      assert(out.count() === train.count())
      assert(out.where(col("n_dropped") > 0 && col("n_dropped") < 6)
        .count() === 0L)
      val again = Dedup.removeContaminatedSpans(
        out.select(col("doc_id"), col("clean_text")), "doc_id",
        "clean_text", eval, "text", 6)
      assert(again.where(col("n_dropped") > 0).count() === 0L,
        "decontamination must be idempotent")
    } finally out.unpersist()
  }
}
