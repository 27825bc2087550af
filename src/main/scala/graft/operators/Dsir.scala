package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents that look like a
  * small TARGET corpus by (1) hashing each document's word uni+bigrams
  * into B buckets, (2) estimating smoothed bucket distributions on the
  * target and the raw corpus, (3) scoring each document by its
  * importance log-weight Σ_grams (ln p_target(b) − ln p_raw(b)), and
  * (4) resampling without replacement by Gumbel top-k over the
  * weights. Every stage is deterministic here — the hash is the
  * engine's md5 law and the Gumbel noise draws from the md5 24-bit
  * fraction — so the DuckDB oracle replays the full pipeline
  * (q195/q196).
  *
  * Scale (100 TB):
  *  - both distributions are ONE map-side-combined groupBy each with
  *    a B-sized output (B = 10k in the paper); the target corpus is
  *    small by definition;
  *  - scoring joins exploded doc grams against the BROADCAST B-row
  *    log-ratio table — the corpus shuffles only for its per-doc sum;
  *  - Gumbel top-k plans as TakeOrderedAndProject (per-partition
  *    heaps, no global sort materialization).
  */
object Dsir {

  /** Hashed n-gram feature stream of a token array: unigrams and
    * bigrams, each to bucket conv(md5[:6], 16) mod `buckets` — the
    * 24-bit md5 value is the library's engine-replayable hash law. */
  def hashedGrams(ws: Column, buckets: Int): Column =
    transform(
      concat(ws, QualityFilters.wordNgrams(ws, 2)),
      g => conv(substring(md5(g), 1, 6), 16, 10)
        .cast("long") % buckets)

  /** Smoothed per-bucket log-probabilities of a corpus: ALL `buckets`
    * rows (missing buckets carry the floor), add-1 smoothing:
    * ln((c_b + 1) / (total + B)). The total enters as a 1-row in-plan
    * aggregate — no driver action. Output: (bucket, logp). */
  def bucketLogProbs(df: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    val counts = df
      .select(explode(hashedGrams(
        TextFunctions.allTokens(col(textCol)), buckets)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1L)).as("c"))
    val total = counts.agg(sum(col("c")).as("total"))
    val all = df.sparkSession.range(buckets)
      .select(col("id").cast("long").as("bucket"))
    all.join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(total))
      .select(col("bucket"),
        log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("total"), lit(0L)) + lit(buckets.toLong))
            .cast("double")).as("logp"))
  }

  /** Per-document importance log-weight against a target corpus:
    * Σ over the doc's hashed grams of (logp_target − logp_raw), the
    * raw side estimated on `docs` itself. Zero-gram documents weigh
    * 0.0 at n_grams = 0 (roster join). Output:
    * (idCol, n_grams, log_weight round 6). */
  def importanceWeights(docs: DataFrame, idCol: String,
      textCol: String, target: DataFrame, targetTextCol: String,
      buckets: Int): DataFrame = {
    val ratio = bucketLogProbs(target, targetTextCol, buckets)
      .withColumnRenamed("logp", "logp_t")
      .join(bucketLogProbs(docs, textCol, buckets)
        .withColumnRenamed("logp", "logp_r"), Seq("bucket"))
      .select(col("bucket"), (col("logp_t") - col("logp_r")).as("lr"))
    val exploded = docs
      .select(col(idCol), explode(hashedGrams(
        TextFunctions.allTokens(col(textCol)), buckets)).as("bucket"))
    val scored = exploded
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1L)).as("n_grams"),
        round(sum(col("lr")), 6).as("log_weight"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /** Gumbel top-k resampling without replacement (the paper's §3
    * sampling step): score = log_weight + Gumbel noise, keep the k
    * best. The noise is deterministic — u = (conv(md5("{salt}:{id}")
    * [:6]) + 0.5) / 2^24 ∈ (0,1) exactly (a dyadic, never 0 or 1),
    * g = −ln(−ln u) — so runs, engines, and the oracle agree.
    * Output: (idCol, round(score, 6)), score-desc, id-asc ties. */
  def gumbelTopK(weights: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))), 1, 6), 16, 10).cast("double") +
      lit(0.5)) / lit(16777216.0)
    val score = col(weightCol) + -log(-log(u))
    weights.withColumn("score", score)
      .orderBy(col("score").desc, col(idCol).asc)
      .select(col(idCol), round(col("score"), 6).as("score"))
      .limit(k)
  }
}
