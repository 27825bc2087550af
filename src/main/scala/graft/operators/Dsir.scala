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

  /** Alternate-hash twin of [[hashedGrams]]: xxhash64 (codegen'd —
    * no hex-string md5 round-trip per gram). A different hash only
    * relabels which bucket a gram lands in, so every DSIR law
    * (distribution mass, weight shape, selection semantics) is
    * hash-agnostic — spec-pinned. Kept as the knob for corpora where
    * md5 parity with an external system doesn't matter; the DEFAULT
    * production path is the native one-pass md5 expression below,
    * which keeps oracle parity AND beats this HOF form. */
  def hashedGramsFast(ws: Column, buckets: Int): Column =
    transform(
      concat(ws, QualityFilters.wordNgrams(ws, 2)),
      g => pmod(xxhash64(g), lit(buckets.toLong)))

  /** Text-level gram-hash contract (text column → bucket array).
    * Default everywhere: the native ONE-PASS expression — the HOF
    * twins above re-tokenize the text three times per row through
    * interpreted lambdas (tokenize 0.35 s vs grams+hash 2.6 s at
    * sf1; SCALING.md). Bit-identical to [[gramsOfTextHof]] —
    * DsirSpec pins the equality. */
  def gramsOfText(text: Column, buckets: Int): Column =
    graft.functions.NativeText.hashedGramBucketsOf(text, buckets)

  /** The Column-law HOF twin of [[gramsOfText]] (the independent
    * formulation the bit-identity spec checks against). */
  def gramsOfTextHof(text: Column, buckets: Int): Column =
    hashedGrams(TextFunctions.allTokens(text), buckets)

  /** xxhash64 variant of the text-level contract. */
  def gramsOfTextFast(text: Column, buckets: Int): Column =
    hashedGramsFast(TextFunctions.allTokens(text), buckets)

  /** Per-(id, bucket) gram histogram: ONE explode+hash pass over the
    * corpus, map-side-combined down to ≤ B rows per document — the
    * shared input both the raw distribution and the scoring pass
    * derive from (the corpus is hashed once, not once per consumer). */
  def docBucketCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int,
      hashFn: (Column, Int) => Column = gramsOfText): DataFrame =
    df.select(col(idCol),
        explode(hashFn(col(textCol), buckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1L)).as("cnt"))

  /** [[bucketLogProbs]] over a precomputed bucket-count frame —
    * add-1 smoothing on re-aggregated counts, no re-hash. The total
    * comes from an unpartitioned WINDOW over the completed B-row
    * frame (bounded by `buckets` — the q187 n_min posture), NOT a
    * second aggregate branch: a separate `agg` would re-evaluate the
    * counts subtree and re-scan the corpus it came from. */
  def bucketLogProbsFromCounts(counts: DataFrame, buckets: Int): DataFrame = {
    val agg = counts.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("c"))
    val all = counts.sparkSession.range(buckets)
      .select(col("id").cast("long").as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    all.join(agg, Seq("bucket"), "left")
      .withColumn("total", sum(coalesce(col("c"), lit(0L))).over(w))
      .select(col("bucket"),
        log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("total"), lit(0L)) + lit(buckets.toLong))
            .cast("double")).as("logp"))
  }

  /** Smoothed per-bucket log-probabilities of a corpus: ALL `buckets`
    * rows (missing buckets carry the floor), add-1 smoothing:
    * ln((c_b + 1) / (total + B)). The total enters as a 1-row in-plan
    * aggregate — no driver action. Output: (bucket, logp). */
  def bucketLogProbs(df: DataFrame, textCol: String, buckets: Int,
      hashFn: (Column, Int) => Column = gramsOfText): DataFrame = {
    val counts = df
      .select(explode(hashFn(col(textCol), buckets)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1L)).as("cnt"))
    bucketLogProbsFromCounts(counts, buckets)
  }

  /** Per-document importance log-weight against a target corpus:
    * Σ over the doc's hashed grams of (logp_target − logp_raw), the
    * raw side estimated on `docs` itself. Zero-gram documents weigh
    * 0.0 at n_grams = 0 (roster join). Output:
    * (idCol, n_grams, log_weight round 6). */
  def importanceWeights(docs: DataFrame, idCol: String,
      textCol: String, target: DataFrame, targetTextCol: String,
      buckets: Int,
      hashFn: (Column, Int) => Column = gramsOfText,
      docCounts: Option[DataFrame] = None): DataFrame = {
    // The (id, bucket, cnt) histogram feeds BOTH the raw distribution
    // and the scoring join. Pass a MATERIALIZED one (CorpusArtifacts
    // .dsirCounts — the ingest-written artifact, compact at ≤ B rows
    // per document; 7.5 s → 2.4 s at sf1, SCALING.md) or the lazy
    // default pays two corpus tokenize+hash passes. No cache hides in
    // here: an operator-owned persist with no unpersist handle leaks
    // storage blocks across invocations (the Ranking.scala:25 rule;
    // r16 review pass 10).
    val dc = docCounts.getOrElse(
      docBucketCounts(docs, idCol, textCol, buckets, hashFn))
    scoreCountsAgainstRatio(docs.select(col(idCol)), idCol, dc,
      importanceRatio(dc, target, targetTextCol, buckets, hashFn))
  }

  /** The persistable DSIR MODEL: per-bucket log ratio
    * lr = logp_target − logp_raw, with the raw side estimated from a
    * corpus (id, bucket, cnt) histogram ([[docBucketCounts]] /
    * CorpusArtifacts.dsirCounts). Buckets-sized (≤ B rows) — the
    * artifact a continuous pipeline trains once at ingest and
    * broadcasts onto every crawl delta (the streaming posture
    * StreamingSpec pins). Output: (bucket, lr). */
  def importanceRatio(rawCounts: DataFrame, target: DataFrame,
      targetTextCol: String, buckets: Int,
      hashFn: (Column, Int) => Column = gramsOfText): DataFrame =
    bucketLogProbs(target, targetTextCol, buckets, hashFn)
      .withColumnRenamed("logp", "logp_t")
      .join(bucketLogProbsFromCounts(rawCounts, buckets)
        .withColumnRenamed("logp", "logp_r"), Seq("bucket"))
      .select(col("bucket"), (col("logp_t") - col("logp_r")).as("lr"))

  /** Score a BATCH against a trained [[importanceRatio]] model — the
    * per-doc law is a pure function of (doc grams, model), so this
    * face applies unchanged to streaming deltas via foreachBatch with
    * the model stream-static, equal row-for-row to the batch law.
    * Output: (idCol, n_grams, log_weight round 6), zero-gram docs
    * (0, 0.0) via the roster join.
    *
    * Cost (r17 review pass 3): the default evaluates `batch` twice —
    * once for the gram histogram, once for the zero-gram roster —
    * exactly the double pass [[importanceWeights]]' docCounts knob
    * exists to avoid. Same escape here: pass `batchCounts` (or
    * persist the delta caller-side before the foreachBatch body; the
    * library never hides a persist, Ranking.scala:25). */
  def importanceWeightsAgainstModel(batch: DataFrame, idCol: String,
      textCol: String, ratio: DataFrame, buckets: Int,
      hashFn: (Column, Int) => Column = gramsOfText,
      batchCounts: Option[DataFrame] = None): DataFrame =
    scoreCountsAgainstRatio(batch.select(col(idCol)), idCol,
      batchCounts.getOrElse(
        docBucketCounts(batch, idCol, textCol, buckets, hashFn)),
      ratio)

  private def scoreCountsAgainstRatio(roster: DataFrame, idCol: String,
      counts: DataFrame, ratio: DataFrame): DataFrame = {
    val scored = counts
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_grams"),
        round(sum(col("cnt") * col("lr")), 6).as("log_weight"))
    roster
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
