package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** CCNet-style language-model quality scoring (Wenzek et al. 2020,
  * arXiv:1911.00359 §3 "LM filtering"): score each document by its
  * per-bigram negative log-likelihood under an add-α bigram model
  * trained on a trusted reference slice, then band the corpus per
  * language into head/middle/tail by score rank. CCNet runs a KenLM
  * 5-gram over Wikipedia; the law here is the same pipeline at the
  * model order the DuckDB oracle can replay exactly (counts are
  * exact integers, the score a deterministic double, q193/q194).
  *
  * Scale (100 TB):
  *  - training is ONE map-side-combined groupBy per model table over
  *    the REFERENCE slice (vocabulary-sized outputs);
  *  - scoring joins the corpus's exploded bigrams against the model —
  *    the model side is vocabulary-cardinality (prune to top-V via
  *    [[Vocabulary.topKTokens]]/[[Vocabulary.topKNgrams]] first at
  *    scale) and is broadcast, so the corpus never shuffles for the
  *    join; the only corpus shuffle is the per-document aggregation;
  *  - banding here is a per-language window (exact percent_rank, the
  *    oracle-replayable form); at 100 TB swap the window for approx
  *    per-language quantile BOUNDARIES (one pass + broadcast compare)
  *    — the banding law is monotone per language, so sample-based
  *    boundaries compose without changing downstream semantics.
  */
object LmQuality {

  /** (w1, "w1 w2") struct pairs per document, empty under 2 tokens —
    * two shifted slices zipped, so no sequence() underflow and no
    * filter re-parse of the gram. */
  private def docBigrams(ws: Column): Column =
    zip_with(
      slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("g")))

  /** Add-α bigram NLL per document under counts trained on `ref`:
    * avg over the doc's bigrams of
    * −ln((c(w1 w2) + α) / (c(w1) + α·V)), with V the reference
    * unigram vocabulary size (a 1-row in-plan aggregate — no driver
    * action). Unseen grams/contexts count 0. Documents with no
    * bigram score NULL at n_bigrams = 0 (kept via the roster join).
    * Output: (idCol, n_bigrams, avg_nll round 6).
    *
    * Cost note (the Dsir docCounts class, r17 pass 9): `docs` is
    * read twice (scoring explode + the zero-bigram roster) and `ref`
    * tokenizes once per model table — persist an expensive upstream
    * before calling, or read the scored output through its
    * CorpusArtifacts memo (nbScores' posture); the library never
    * hides a persist. */
  def nllScore(docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String,
      alpha: Double = 0.5): DataFrame = {
    val uni = Vocabulary.tokenFrequencies(ref, refTextCol)
      .select(col("token").as("w1"), col("n").as("c_uni"))
    val bi = Vocabulary.ngramFrequencies(ref, refTextCol, 2)
      .select(col("gram").as("g"), col("n").as("c_bi"))
    val vocab = uni.agg(count(lit(1L)).as("v"))
    // bind the token array ONCE before docBigrams references it four
    // times (two slices + two sizes) — fed the raw tokenizer
    // expression, each reference re-tokenized the row (r17 review
    // pass 9, the Vocabulary.ngramFrequencies precedent)
    val exploded = docs
      .select(col(idCol),
        TextFunctions.allTokens(col(textCol)).as("_ws"))
      .select(col(idCol), explode(docBigrams(col("_ws"))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.g").as("g"))
    val scored = exploded
      .join(broadcast(bi), Seq("g"), "left")
      .join(broadcast(uni), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("nll", -log(
        (coalesce(col("c_bi"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c_uni"), lit(0L)) + lit(alpha) * col("v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1L)).as("n_bigrams"),
        round(sum(col("nll")) / count(lit(1L)), 6).as("avg_nll"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"))
  }

  /** Seed-labeled Naive-Bayes quality classifier (the deterministic,
    * oracle-replayable form of the GPT-3 appendix-A / CCNet-family
    * quality filter, which trains a linear classifier on a trusted
    * positive seed vs. a crawl negative seed and keeps
    * positive-scoring docs): per-token log-odds under add-α
    * multinomial models,
    * llr(w) = ln((c_pos(w)+α)/(N_pos+α·V)) −
    *          ln((c_neg(w)+α)/(N_neg+α·V)),
    * with V the UNION vocabulary of both seeds; a document scores
    * the mean llr over its token OCCURRENCES and keeps iff the mean
    * is positive. (GPT-3 adds a Pareto-noise re-admission of
    * negatives; that draw is the documented nondeterministic
    * departure — the threshold form here is the replayable law.)
    *
    * Scale (100 TB): both seed count tables are vocabulary-sized
    * map-side-combined aggregates; the full-outer model join and the
    * 1-row totals frame broadcast onto the corpus token stream
    * (q205's counter posture), so the only corpus shuffle is the
    * per-document mean. Unseen tokens fall back to the α floors on
    * both sides. Tokenless docs score NULL and keep=false (roster
    * join, as [[nllScore]]).
    *
    * Output: (idCol, n_tokens, avg_llr round 6, keep). */
  def nbQualityScore(docs: DataFrame, idCol: String, textCol: String,
      pos: DataFrame, posTextCol: String,
      neg: DataFrame, negTextCol: String,
      alpha: Double = 0.5): DataFrame = {
    val cp = Vocabulary.tokenFrequencies(pos, posTextCol)
      .select(col("token"), col("n").as("c_pos"))
    val cn = Vocabulary.tokenFrequencies(neg, negTextCol)
      .select(col("token"), col("n").as("c_neg"))
    val model = cp.join(cn, Seq("token"), "full")
    val consts = model.agg(count(lit(1L)).as("v"),
      sum(coalesce(col("c_pos"), lit(0L))).as("n_pos"),
      sum(coalesce(col("c_neg"), lit(0L))).as("n_neg"))
    val scored = docs
      .select(col(idCol),
        explode(TextFunctions.allTokens(col(textCol))).as("token"))
      .join(broadcast(model), Seq("token"), "left")
      .crossJoin(broadcast(consts))
      .withColumn("llr",
        log((coalesce(col("c_pos"), lit(0L)) + lit(alpha)) /
          (col("n_pos") + lit(alpha) * col("v"))) -
        log((coalesce(col("c_neg"), lit(0L)) + lit(alpha)) /
          (col("n_neg") + lit(alpha) * col("v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1L)).as("n_tokens"),
        round(sum(col("llr")) / count(lit(1L)), 6).as("avg_llr"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("avg_llr"),
        coalesce(col("avg_llr") > 0, lit(false)).as("keep"))
  }

  /** Approx-quantile twin of [[perplexityBuckets]] — the 100 TB path
    * this file's header documented as prose through round 16 (r16
    * verdict item 2): per-language head/mid score BOUNDARIES from one
    * `percentile_approx` aggregation pass (NULL scores ignored, as
    * SQL aggregates do), broadcast back onto the corpus — banding
    * becomes a per-row compare, and the per-language GLOBAL SORT the
    * exact window pays (every language's whole corpus slice through
    * one sort per window partition) disappears. The banding law is
    * monotone per language — bucket is a nondecreasing step function
    * of score — so boundary-based bands compose with every downstream
    * consumer unchanged. Divergences from the exact face, both
    * spec-pinned (LmQualitySpec):
    *  - boundary-inclusion convention: percent_rank counts strictly-
    *    below over n−1 while the quantile counts at-or-below over n,
    *    so each band edge can shift by ONE element on tie-free data
    *    (ceil(f·n) vs floor(f·(n−1))+1);
    *  - ties: equal scores always share a band here (the decision
    *    reads the score alone), where the exact face's id tie-break
    *    can split a tie run across the boundary;
    *  - sketch error: at corpus scale the boundary is approximate
    *    within percentile_approx's accuracy guarantee — which moves
    *    WHERE the band edge falls, never the monotone law;
    *  - NULL share (r17 review pass 1 — the one UNBOUNDED class):
    *    the exact face counts NULL rows in percent_rank's
    *    denominator while ranking them last, so a language that is
    *    90% NULL puts ALL its scored docs in the exact head (their
    *    pr never reaches headFrac); this face draws its boundaries
    *    over SCORED rows only, always banding headFrac of them.
    *    The fractions-of-what difference is a semantic choice, not
    *    an approximation error — CCNet bands scored documents —
    *    and it vanishes as the NULL share does.
    * NULL scores (no bigrams) band tail, matching nulls-last. Output:
    * (idCol, langCol, bucket) — no `pr` column: the exact rank ratio
    * is precisely what this face does not compute. */
  def perplexityBucketsApprox(scored: DataFrame, idCol: String,
      langCol: String, scoreCol: String,
      headFrac: Double = 0.3, midFrac: Double = 0.7,
      accuracy: Int = 10000): DataFrame =
    perplexityBucketsAgainstBounds(scored, idCol, langCol, scoreCol,
      perplexityBoundaries(scored, langCol, scoreCol, headFrac,
        midFrac, accuracy))

  /** The per-language (head, mid) score boundaries alone — the
    * TRAINABLE artifact of [[perplexityBucketsApprox]] (r18, the r17
    * verdict's streaming-tier item): one percentile_approx pass over
    * a scored snapshot, persistable like Dsir's ratio model or the
    * IVF centroids. Output: (`_lang`, `_b` = [head, mid]). */
  def perplexityBoundaries(scored: DataFrame, langCol: String,
      scoreCol: String, headFrac: Double = 0.3, midFrac: Double = 0.7,
      accuracy: Int = 10000): DataFrame =
    scored.where(col(scoreCol).isNotNull)
      .groupBy(col(langCol))
      .agg(percentile_approx(col(scoreCol),
        array(lit(headFrac), lit(midFrac)), lit(accuracy)).as("_b"))
      .withColumnRenamed(langCol, "_lang")

  /** Band a frame against FIXED boundaries — the per-row compare half
    * of [[perplexityBucketsApprox]], and the natural STREAMING scorer:
    * boundaries trained once on the corpus snapshot
    * ([[perplexityBoundaries]], stream-static), each micro-batch
    * banded by pure projection under foreachBatch — per-batch output
    * ≡ the batch law row-for-row because nothing here depends on the
    * batch's own distribution (StreamingSpec pins it). */
  def perplexityBucketsAgainstBounds(scored: DataFrame, idCol: String,
      langCol: String, scoreCol: String, bounds: DataFrame): DataFrame =
    // NULL-SAFE left join (r17 review pass 9): groupBy emits a bounds
    // row for the NULL language, but an equi-join key would never
    // match it — every null-lang doc banded tail regardless of score,
    // where the exact face's window treats NULL as a language like
    // any other. An all-NULL-score language still has no bounds row
    // and every member bands tail through the isNull arm.
    scored.join(broadcast(bounds),
        col(langCol) <=> col("_lang"), "left")
      .withColumn("bucket",
        when(col(scoreCol).isNull, lit("tail"))
          .when(col(scoreCol) <= element_at(col("_b"), 1), lit("head"))
          .when(col(scoreCol) <= element_at(col("_b"), 2), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(langCol), col("bucket"))

  /** CCNet head/middle/tail banding per language: percent_rank over
    * (score asc, id asc) within each language — head = the best
    * `headFrac` of the language, tail = everything past `midFrac`.
    * NULL scores (no bigrams) rank last deterministically (and COUNT
    * in the denominator — the fractions-of-what divergence
    * [[perplexityBucketsApprox]] documents). The bucket decision uses
    * the EXACT rank ratio; the emitted `pr` is rounded like every
    * float output. (Scaladoc re-attached r17 pass 9 — two insertions
    * had orphaned it 115 lines above its def.) */
  def perplexityBuckets(scored: DataFrame, idCol: String,
      langCol: String, scoreCol: String,
      headFrac: Double = 0.3, midFrac: Double = 0.7): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col(scoreCol).asc_nulls_last, col(idCol).asc)
    scored.withColumn("pr", percent_rank().over(w))
      .withColumn("bucket",
        when(col("pr") <= headFrac, lit("head"))
          .when(col("pr") <= midFrac, lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(langCol),
        round(col("pr"), 6).as("pr"), col("bucket"))
  }
}
