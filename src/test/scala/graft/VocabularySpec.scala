package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vocabulary

/** Corpus vocabulary induction (operators/Vocabulary). */
class VocabularySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("token and n-gram frequencies count occurrences, not docs") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha gamma")).toDF("doc_id", "text")
    val tf = Vocabulary.tokenFrequencies(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tf === Map("alpha" -> 3L, "beta" -> 1L, "gamma" -> 1L))
    val gf = Vocabulary.ngramFrequencies(docs, "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gf === Map("alpha beta" -> 1L, "beta alpha" -> 1L,
      "alpha gamma" -> 1L))
  }

  test("topK breaks count ties on the term ascending — the slice is " +
      "deterministic") {
    val docs = Seq((1L, "zz aa zz aa mm")).toDF("doc_id", "text")
    val top = Vocabulary.topKTokens(docs, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // aa and zz tie at 2; aa wins the tie, mm (1) is cut
    assert(top.toSeq === Seq(("aa", 2L), ("zz", 2L)))
  }

  test("top-k plans as TakeOrderedAndProject — per-partition heaps, " +
      "no global sort materialization") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Vocabulary.topKTokens(docs, "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
