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

  test("perplexityBucketsApprox: agrees with the exact window face " +
      "on the hand corpus (tie-free, fracs off the rank grid), incl. " +
      "nulls-tail and the single-member language") {
    val scored = Seq(
      (1L, "en", Some(1.0)), (2L, "en", Some(2.0)), (3L, "en", Some(3.0)),
      (4L, "en", Some(4.0)), (5L, "en", None),
      (9L, "de", Some(9.9))
    ).toDF("doc_id", "lang", "avg_nll")
    val got = LmQuality.perplexityBucketsApprox(scored, "doc_id",
        "lang", "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val exact = LmQuality.perplexityBuckets(scored, "doc_id", "lang",
        "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got === exact)
    assert(got(5L) === "tail") // NULL score: no bounds compare, tail
    assert(got(9L) === "head") // single-member language is its own head
  }

  test("perplexityBucketsApprox: monotone law (bucket is a " +
      "nondecreasing step of score per language) and the tie-free " +
      "boundary drift vs the exact face is at most one element per " +
      "band edge (ceil(f*n) vs floor(f*(n-1))+1 — n=7 at f=0.3 is " +
      "the published off-by-one)") {
    // tie-free scores, two languages whose sizes sit on both sides of
    // the convention gap: n=7 (drift 1 at the head edge) and n=10
    // (no drift at either edge)
    val rows = (0 until 7).map(i => (i.toLong, "aa", Some(i * 1.5 + 0.1))) ++
      (100 until 110).map(i => (i.toLong, "bb", Some((i % 97) * 2.0 + 0.7)))
    val scored = rows.toDF("doc_id", "lang", "avg_nll")
    val approx = LmQuality.perplexityBucketsApprox(scored, "doc_id",
      "lang", "avg_nll")
    val joined = approx.join(scored, Seq("doc_id", "lang"))
      .collect().map(r => (r.getString(1), r.getString(2),
        r.getDouble(3)))
    // monotone: within a language every head score < every middle
    // score < every tail score
    for (lang <- Seq("aa", "bb")) {
      def scores(b: String) =
        joined.filter(t => t._1 == lang && t._2 == b).map(_._3)
      val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
      if (h.nonEmpty && m.nonEmpty) assert(h.max < m.min)
      if (m.nonEmpty && t.nonEmpty) assert(m.max < t.min)
      if (h.nonEmpty && t.nonEmpty) assert(h.max < t.min)
    }
    val exact = LmQuality.perplexityBuckets(scored, "doc_id", "lang",
        "avg_nll").collect()
      .map(r => (r.getString(1), r.getString(3))).groupBy(identity)
      .view.mapValues(_.size).toMap
    val got = joined.map(t => (t._1, t._2)).groupBy(identity)
      .view.mapValues(_.size).toMap
    for (lang <- Seq("aa", "bb"); b <- Seq("head", "middle", "tail")) {
      val d = math.abs(got.getOrElse((lang, b), 0) -
        exact.getOrElse((lang, b), 0))
      assert(d <= (if (b == "middle") 2 else 1), // middle touches both edges
        s"($lang,$b): approx=${got.getOrElse((lang, b), 0)} " +
          s"exact=${exact.getOrElse((lang, b), 0)}")
    }
  }

  test("perplexityBucketsApprox: a tie run always shares one band " +
      "(the exact face's id tie-break splits it across the boundary " +
      "— the characterized drift on ties)") {
    val scored = Seq(
      (1L, "en", Some(1.0)), (2L, "en", Some(2.0)), (3L, "en", Some(2.0)),
      (4L, "en", Some(2.0)), (5L, "en", Some(5.0))
    ).toDF("doc_id", "lang", "avg_nll")
    val approx = LmQuality.perplexityBucketsApprox(scored, "doc_id",
        "lang", "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // score 2.0 is the 0.3-quantile boundary: the WHOLE run is head
    assert(approx === Map(1L -> "head", 2L -> "head", 3L -> "head",
      4L -> "head", 5L -> "tail"))
    val exact = LmQuality.perplexityBuckets(scored, "doc_id", "lang",
        "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // the exact face splits the tie run by id rank: pr = .25/.5/.75
    assert(exact(2L) === "head")
    assert(Set("middle", "tail")(exact(3L)) && exact(4L) === "tail")
  }

  test("perplexityBucketsApprox: the NULL-share divergence class is " +
      "real and unbounded (r17 review pass 1) — a null-heavy " +
      "language bands headFrac of its SCORED docs here, while the " +
      "exact face's null-inflated denominator heads them all") {
    // 3 scored + 7 NULL docs: exact pr of the 3rd scored doc is
    // 2/9 < 0.3 → all three head under the exact face; approx draws
    // boundaries over the scored rows only → 1 head, and the 0.7
    // boundary lands on the 3rd scored value (ceil(0.7*3) = 3) so
    // the last scored doc is middle, not tail
    val scored = ((1 to 3).map(i => (i.toLong, "en", Some(i * 1.0))) ++
      (4 to 10).map(i => (i.toLong, "en", None: Option[Double])))
      .toDF("doc_id", "lang", "avg_nll")
    val approx = LmQuality.perplexityBucketsApprox(scored, "doc_id",
        "lang", "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val exact = LmQuality.perplexityBuckets(scored, "doc_id", "lang",
        "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(exact(1L) === "head" && exact(2L) === "head" &&
      exact(3L) === "head")
    assert(approx(1L) === "head" && approx(2L) === "middle" &&
      approx(3L) === "middle")
    // approx bands every NULL tail; the exact face even MIDDLES the
    // nulls whose last-ranked pr still sits under midFrac (pr of doc
    // 4 is 3/9) — one more face of the same denominator divergence
    (4L to 10L).foreach(i => assert(approx(i) === "tail"))
    assert(exact(4L) === "middle" && exact(10L) === "tail")
  }

  test("perplexityBucketsApprox: a NULL language is a language like " +
      "any other (r17 pass-9: the equi-join key never matched the " +
      "NULL bounds row, tail-banding every null-lang doc)") {
    val scored = (1 to 10).map(i =>
      (i.toLong, null.asInstanceOf[String], Some(i * 1.0)))
      .toDF("doc_id", "lang", "avg_nll")
    val got = LmQuality.perplexityBucketsApprox(scored, "doc_id",
        "lang", "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) === "head" && got(10L) === "tail")
    assert(got.values.toSet === Set("head", "middle", "tail"))
  }

  test("perplexityBucketsApprox plan: no Window, no per-language " +
      "sort — one aggregate pass plus a broadcast bounds join") {
    val scored = Seq((1L, "en", Some(1.0))).toDF("doc_id", "lang", "avg_nll")
    val plan = LmQuality.perplexityBucketsApprox(scored, "doc_id",
      "lang", "avg_nll").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
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
