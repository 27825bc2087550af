package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.operators.Dsir

/** DSIR importance resampling (Dsir — q195/q196's operator): the
  * smoothed bucket distribution is a true distribution, weights move
  * in the target's direction, the zero-gram arm, gram accounting, and
  * the plan shapes (broadcast ratio join; Gumbel top-k plans as
  * TakeOrderedAndProject). */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("gramsOfText: the native one-pass expression is bit-identical " +
      "to the Column-law HOF twin") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, ""), (9002L, "one"),
        (9003L, "A, b!! c9 A b")).toDF("doc_id", "text"))
    for (b <- Seq(7, 64)) {
      val native = docs.select(col("doc_id"),
        Dsir.gramsOfText(col("text"), b).as("g")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val hof = docs.select(col("doc_id"),
        Dsir.gramsOfTextHof(col("text"), b).as("g")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native === hof, s"buckets=$b")
    }
  }

  test("bucketLogProbs: B complete rows forming a distribution") {
    val df = Seq((1L, "alpha beta alpha"), (2L, "gamma")).toDF("id", "text")
    val rows = Dsir.bucketLogProbs(df, "text", 16).collect()
    assert(rows.length === 16)
    assert(rows.map(_.getLong(0)).toSet === (0L until 16L).toSet)
    val mass = rows.map(r => math.exp(r.getDouble(1))).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"probability mass = $mass")
  }

  test("importanceWeights: target-like text outweighs off-target; " +
      "zero-gram docs weigh 0.0; gram accounting = uni + bi") {
    val docs = Seq(
      (1L, "alpha beta alpha beta"), // pure target vocabulary
      (2L, "gamma delta gamma delta"), // absent from the target
      (3L, "")
    ).toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta alpha beta alpha"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      target, "text", 64)
    assert(w.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "the B-row log-ratio side must broadcast")
    val got = w.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._2 > got(2L)._2,
      s"target-like doc must outweigh off-target: $got")
    assert(got(3L) === ((0L, 0.0)))
    // 4 tokens + 3 bigrams
    assert(got(1L)._1 === 7L)
  }

  test("gumbelTopK: deterministic, descending, k-bounded, and " +
      "planned as TakeOrderedAndProject") {
    val w = Seq((1L, 0.5), (2L, 0.4), (3L, -0.1), (4L, 2.0), (5L, 0.0))
      .toDF("doc_id", "log_weight")
    val top = Dsir.gumbelTopK(w, "doc_id", "log_weight", 3, "s")
    assert(top.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "top-k must not materialize a global sort")
    val a = top.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Dsir.gumbelTopK(w, "doc_id", "log_weight", 3, "s")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq === b.toSeq, "noise must be a pure function of (salt, id)")
    assert(a.length === 3)
    assert(a.map(_._2).toSeq === a.map(_._2).sorted.reverse.toSeq)
    // k beyond the corpus returns everything
    assert(Dsir.gumbelTopK(w, "doc_id", "log_weight", 99, "s")
      .count() === 5)
    // a different salt redraws the noise
    val c = Dsir.gumbelTopK(w, "doc_id", "log_weight", 5, "t")
      .collect().map(r => r.getDouble(1)).toSeq
    val full = Dsir.gumbelTopK(w, "doc_id", "log_weight", 5, "s")
      .collect().map(r => r.getDouble(1)).toSeq
    assert(c !== full)
  }
}
