package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{NativeText, TextFunctions}
import graft.operators.Dedup

/** The native expressions must be bit-identical to the HOF
  * formulations the DuckDB oracles describe. */
class NativeTextSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    .limit(100)
    .withColumn("_toks", TextFunctions.bm25Tokens(col("text")))

  test("native shingles == HOF shingles on real documents") {
    val diff = docs.select(
        NativeText.shinglesOf($"_toks", 3).as("a"),
        TextFunctions.shinglesOfTokens($"_toks", 3).as("b"))
      .where(not($"a" <=> $"b"))
    assert(diff.count() === 0)
  }

  test("native minhash == HOF minhash on real documents") {
    val diff = docs.select(
        NativeText.minhashOf($"_toks", 3, 16).as("a"),
        Dedup.minhashSignature(TextFunctions.shinglesOfTokens($"_toks", 3), 16).as("b"))
      .where(not($"a" <=> $"b"))
    assert(diff.count() === 0)
  }

  test("edge cases: empty and sub-n token arrays") {
    val df = Seq(Seq.empty[String], Seq("one"), Seq("one", "two"),
      Seq("a", "b", "c"), Seq("a", "b", "c", "a", "b", "c"))
      .toDF("_toks")
    val rows = df.select(
      NativeText.shinglesOf($"_toks", 3).as("sh"),
      NativeText.minhashOf($"_toks", 3, 4).as("mh")).collect()
    assert(rows(0).getSeq[String](0).isEmpty)
    assert(rows(1).getSeq[String](0).isEmpty)
    assert(rows(2).getSeq[String](0).isEmpty)
    assert(rows(3).getSeq[String](0) === Seq("a b c"))
    // duplicated shingles dedup; wrap-around grams included
    assert(rows(4).getSeq[String](0) === Seq("a b c", "b c a", "c a b"))
    // empty shingle set -> null signature elements
    assert(rows(0).getSeq[String](1) === Seq(null, null, null, null))
  }
}
