package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines (beyond-reference
  * scale operator): the concat-and-chop preprocessing step — within a
  * shard, documents are concatenated in a deterministic order and the
  * token stream is chopped into fixed `budget`-token training
  * sequences; each document records which sequences its tokens land
  * in (Radford et al. 2019-style preprocessing; Raffel et al. 2020
  * §2.2 packs the same way for T5).
  *
  * Scale posture: real pipelines pack per shard, never globally — the
  * window partitions on the shard key, so each shard's cumulative sum
  * is independent and the whole operator is one shuffle (by shard) at
  * any corpus size. All arithmetic is exact integers (token counts,
  * running sums, floor divisions), so the oracle replays it
  * bit-identically. */
object Packing {

  /** Chop a per-document token-count frame into training sequences.
    *
    * Input: one row per document with `idCol` (unique, orders the
    * concatenation within a shard) and `tokenCountCol` (exact
    * per-document token count). `shard` is any deterministic
    * grouping expression (id modulo, a hash band, a date …).
    *
    * Output: idCol, shard, n_tokens, `start` (the document's first
    * token's offset in its shard stream), `seq_first`/`seq_last`
    * (the budget-sized sequence ids the document's tokens span; an
    * empty document sits at its boundary with seq_last = seq_first).
    */
  def concatChop(df: DataFrame, idCol: String, tokenCountCol: String,
      shard: Column, budget: Long,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    // a null token count packs as 0 tokens (the lengthBucketBatches /
    // budgetSelect convention) — un-coalesced it would skip the
    // cumulative sum and emit NULL start/seq bounds, silently
    // vanishing the doc from sequenceIndex while shardManifest still
    // counts it (r17 review pass 7)
    val tc = coalesce(col(tokenCountCol).cast("long"), lit(0L))
    // SQL's integral `div` — exact on longs at any magnitude, unlike
    // Column./ (double division, mis-floors past 2^53)
    def idiv(a: Column): Column =
      call_function("div", a, lit(budget))
    // the shard expression passes through UNCAST: the contract allows
    // any deterministic grouping expression (a hash band string, a
    // date) — the r17 pass-7 finding: a long cast crashed those under
    // ANSI and silently null-collapsed every shard under legacy casts
    df.withColumn("shard", shard)
      .withColumn("_cum", sum(tc).over(w))
      .select((col(idCol) +: carryCols.map(col)) ++ Seq(
        col("shard"), tc.as("n_tokens"),
        (col("_cum") - tc).as("start"),
        idiv(col("_cum") - tc).as("seq_first"),
        when(tc > 0, idiv(col("_cum") - 1))
          .otherwise(idiv(col("_cum") - tc))
          .as("seq_last")): _*)
  }

  /** Per-shard release manifest over a packed frame: doc / token /
    * sequence totals plus an ORDER-INSENSITIVE mergeable checksum —
    * bit_xor of each document's 48-bit md5 over "id:n_tokens" — the
    * integrity artifact a data release ships per shard. XOR is
    * commutative and merge-associative, so the checksum aggregates
    * map-side in constant memory at any shard size (the obvious
    * md5-of-sorted-id-list holds the shard's entire id list in one
    * group buffer); comparing manifests localizes a damaged or
    * drifted shard without re-reading the others. n_sequences is
    * ceil(total_tokens / budget) from the totals — deliberately NOT
    * max(seq_last)+1, which over-counts by one when a shard's stream
    * ends in empty documents sitting at an exact budget boundary. */
  def shardManifest(packed: DataFrame, shardCol: String, idCol: String,
      tokenCountCol: String, budget: Long): DataFrame =
    shardManifest(packed, Seq(shardCol), idCol, tokenCountCol, budget)

  /** Multi-key face: manifests per (split, shard), (date, shard), …
    * — the shape a release with named subsets ships. */
  def shardManifest(packed: DataFrame, groupCols: Seq[String],
      idCol: String, tokenCountCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(groupCols.nonEmpty, "at least one grouping column")
    // null-total coalesces: Spark's concat null-propagates and bit_xor
    // skips NULLs, so an un-coalesced null id or token count would be
    // counted in n_docs yet INVISIBLE to the checksum — the exact rows
    // an integrity artifact must not skip (r17 review pass 7). A null
    // id keys as '' (hashSlice's convention), a null count as 0.
    packed
      .withColumn("_h", graft.functions.Sketch.hash48Of(
        concat(coalesce(col(idCol).cast("string"), lit("")), lit(":"),
          coalesce(col(tokenCountCol).cast("long"), lit(0L))
            .cast("string"))))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col(tokenCountCol).cast("long"), lit(0L)))
          .as("total_tokens"),
        expr("bit_xor(_h)").as("checksum"))
      .select(groupCols.map(col) ++ Seq(
        col("n_docs"), col("total_tokens"),
        call_function("div",
          col("total_tokens") + lit(budget - 1), lit(budget))
          .as("n_sequences"),
        col("checksum")): _*)
  }

  /** The INVERSE face of [[concatChop]] — the dataloader's
    * random-access index: one row per (sequence, contributing
    * document) with the document's offset and token count INSIDE
    * that sequence. A document spanning sequences s_first..s_last
    * contributes tokens [max(start, s·B), min(start+n, (s+1)·B))
    * to sequence s; empty documents contribute nothing. Narrow
    * per-row explode over the already-packed frame — no shuffle of
    * its own at any scale. Spec-pinned tiling invariant: within a
    * shard, every sequence except the last sums to exactly `budget`
    * tokens and offsets tile [0, budget) contiguously.
    * `budget` MUST equal the budget `packed` was built with — the
    * frame does not carry it, and a mismatch silently mis-tiles
    * (offsets escape [0, budget) rather than erroring).
    * Output: (shard, seq, idCol, seq_offset, n_tokens_in_seq). */
  def sequenceIndex(packed: DataFrame, idCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    packed.where(col("n_tokens") > 0)
      .select(col("shard"), col(idCol), col("n_tokens"), col("start"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .withColumn("_from",
        greatest(col("start"), col("seq") * lit(budget)))
      .withColumn("_to",
        least(col("start") + col("n_tokens"),
          (col("seq") + lit(1L)) * lit(budget)))
      .select(col("shard"), col("seq"), col(idCol),
        (col("_from") - col("seq") * lit(budget)).as("seq_offset"),
        (col("_to") - col("_from")).as("n_tokens_in_seq"))
  }

  /** Length-bucketed batching index (the padded-batch dataloader's
    * alternative to [[concatChop]]'s packing — dynamic batching as
    * popularized by seq2seq toolkits: group examples of similar
    * length so per-batch padding waste is bounded by the bucket
    * width): bucket = ceil(n_tokens / bucketWidth) (0-token docs sit
    * in bucket 0), examples order deterministically by id WITHIN the
    * bucket and chop into batches of `batchSize`; the emitted
    * pad_to = bucket · bucketWidth is the batch's padded length (all
    * members pad to it, the bucket-width waste law).
    *
    * Scale (100 TB): one bucket-keyed window (row_number in id
    * order) — buckets are the partition key, so parallelism is the
    * bucket count and the documented lever is bucketWidth: narrow
    * buckets bound padding waste AND widen the key space; a single
    * pathological bucket (every doc the same length) degrades to one
    * reducer, the capPerStratum local-precap escape applying
    * unchanged if it ever matters. Output: (idCol, n_tokens, bucket,
    * batch_in_bucket, pad_to). */
  def lengthBucketBatches(df: DataFrame, idCol: String,
      tokenCountCol: String, bucketWidth: Long,
      batchSize: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val n = coalesce(col(tokenCountCol).cast("long"), lit(0L))
    val bucket = call_function("div", n + lit(bucketWidth - 1),
      lit(bucketWidth))
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
    df.select(col(idCol), n.as(tokenCountCol), bucket.as("bucket"))
      .withColumn("batch_in_bucket",
        call_function("div", row_number().over(w).cast("long") - lit(1L),
          lit(batchSize.toLong)))
      .withColumn("pad_to", col("bucket") * lit(bucketWidth))
  }

  /** The document-count face: token counts computed from a text
    * column with the library tokenizer, sharded by id modulo. */
  def packDocuments(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, budget: Long): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    import graft.functions.TextFunctions
    concatChop(
      df.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens")),
      idCol, "n_tokens", pmod(col(idCol), lit(nShards)), budget)
  }
}
