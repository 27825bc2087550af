package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.operators.LmQuality

/** CCNet-style LM quality scoring (LmQuality — q193/q194's operator):
  * hand-computed add-α bigram NLL values on a tiny corpus, the
  * zero-bigram and unseen-context arms, banding boundaries incl. the
  * nulls-rank-last law, and the plan shape (model side broadcast, no
  * cartesian beyond the 1-row vocab-size frame). */
class LmQualitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // ref corpus "a b a": uni a→2 b→1 (V=2); bi "a b"→1 "b a"→1; α=0.5
  private def ref = Seq((100L, "a b a")).toDF("doc_id", "text")

  test("nllScore: hand-computed values, zero-bigram NULL, unseen context") {
    val docs = Seq(
      (1L, "a b c"), // -ln(1.5/3)=ln2 ; -ln(0.5/2)=ln4 → avg 1.039721
      (2L, "z"),     // no bigram → (0, NULL)
      (3L, "q q")    // unseen context: -ln(0.5/(0+1)) = ln2
    ).toDF("doc_id", "text")
    val got = LmQuality.nllScore(docs, "doc_id", "text", ref, "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(1L) === ((2L, Some(1.039721))))
    assert(got(2L) === ((0L, None)))
    assert(got(3L) === ((1L, Some(0.693147))))
  }

  test("nllScore: more training evidence lowers the NLL of seen text") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val ref2 = Seq((100L, "a b a"), (101L, "a b")).toDF("doc_id", "text")
    def score(r: org.apache.spark.sql.DataFrame): Double =
      LmQuality.nllScore(docs, "doc_id", "text", r, "text")
        .collect().head.getDouble(2)
    assert(score(ref2) < score(ref),
      "a second observation of 'a b' must lower its NLL")
  }

  test("perplexityBuckets: boundary fractions per language, nulls last") {
    val scored = Seq(
      (1L, "en", Some(1.0)), (2L, "en", Some(2.0)), (3L, "en", Some(3.0)),
      (4L, "en", Some(4.0)), (5L, "en", None),
      (9L, "de", Some(9.9))
    ).toDF("doc_id", "lang", "avg_nll")
    val got = LmQuality.perplexityBuckets(scored, "doc_id", "lang",
        "avg_nll").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3))).toMap
    // en ranks: pr = 0, .25, .5, .75, 1 (the NULL ranks last)
    assert(got(1L) === ((0.0, "head")))
    assert(got(2L) === ((0.25, "head")))
    assert(got(3L) === ((0.5, "middle")))
    assert(got(4L) === ((0.75, "tail")))
    assert(got(5L) === ((1.0, "tail")))
    // a single-member language is its own head (pr = 0)
    assert(got(9L) === ((0.0, "head")))
  }

  test("nbQualityScore: hand-computed log-odds (union vocab, add-α " +
      "floors), zero-vote unseen tokens, tokenless NULL, the 0 " +
      "boundary keeps=false, and pos/neg swap flips the sign") {
    // pos "good good nice", neg "bad bad ugly": V=4, N_pos=N_neg=3 →
    // llr(good)=ln5, llr(nice)=ln3, llr(bad)=-ln5, llr(unseen)=0
    val pos = Seq((100L, "good good nice")).toDF("doc_id", "text")
    val neg = Seq((200L, "bad bad ugly")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "good nice"), // (ln5+ln3)/2 = 1.354025
      (2L, "bad z"),     // (-ln5+0)/2 = -0.804719
      (3L, ""),          // tokenless → (0, NULL, keep=false)
      (4L, "z")          // avg exactly 0 → keep=false at the boundary
    ).toDF("doc_id", "text")
    val got = LmQuality.nbQualityScore(
        docs, "doc_id", "text", pos, "text", neg, "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3)))).toMap
    assert(got(1L) === ((2L, Some(1.354025), true)))
    assert(got(2L) === ((2L, Some(-0.804719), false)))
    assert(got(3L) === ((0L, None, false)))
    assert(got(4L) === ((1L, Some(0.0), false)))
    val swapped = LmQuality.nbQualityScore(
        docs, "doc_id", "text", neg, "text", pos, "text")
      .where(col("doc_id") === 1L).collect().head
    assert(swapped.getDouble(2) === -1.354025)
    assert(!swapped.getBoolean(3))
  }

  test("q193 plan: model joins broadcast; no cartesian beyond the " +
      "1-row vocab frame") {
    val df = SparkEntry.queries("q193_lm_nll")(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"model-side joins must broadcast:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
