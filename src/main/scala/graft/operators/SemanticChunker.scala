package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Partitioning
import graft.functions.{TextFunctions, VectorFunctions}

/** Semantic chunking (semantic_chunker.py:61-264): embed consecutive
  * sentences, place a chunk boundary wherever cosine similarity of
  * neighbors drops below the threshold, re-assemble chunks, then MERGE
  * short chunks into their next neighbor when similar enough
  * (semantic_chunker.py:105-141 merge_short_chunks).
  *
  * Spark shape (SURVEY §2.5 row): sentence explode → batched embed
  * (mapPartitions through the [[Embedder]] boundary) →
  * `Window.orderBy(idx)` + `lag` cosine → boundary flag → running-sum
  * chunk id → groupBy re-assembly → merge pass. All shuffles key on
  * the doc id, so at cluster scale each stage reuses the partitioning.
  *
  * Merge semantics, carried exactly: scanning chunks left to right, a
  * chunk shorter than `minChunkSize` tokens (and not the doc's last)
  * merges with its NEXT chunk when the mean pairwise cosine between
  * the two chunks' sentence embeddings is >= 0.8·threshold; the merged
  * pair is then skipped (the result never re-merges). The sequential
  * scan is a run-parity rule over per-chunk eligibility — within each
  * maximal run of consecutive eligible chunks, merges initiate at even
  * offsets — so it is computable with windows, no per-doc loop:
  * eligibility needs only the chunk's own token count and its
  * similarity to the next chunk, both precomputed on the ORIGINAL
  * chunks (the reference's merge loop also evaluates original chunks;
  * a merged result is appended and never reconsidered).
  *
  * Sentence tier: for corpora with punctuation use the regex sentence
  * split (Chunker.sentence); this entry point uses fixed token windows
  * as the sentence stand-in (the driver corpus has no terminators).
  */
object SemanticChunker {

  def chunks(df: DataFrame, idCol: String, textCol: String,
      sentTokens: Int, mkEmbedder: () => Embedder,
      threshold: Double, minChunkSize: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // pseudo-sentences: consecutive token windows
    val toks = TextFunctions.allTokens(col(textCol))
    val base = Partitioning.spread(df.select(col(idCol), col(textCol)))
      .withColumn("_toks", toks)
    val nSents = floor((greatest(size(col("_toks")), lit(1)) - 1) / sentTokens).cast("int")
    val sents = transform(sequence(lit(0), nSents),
      i => concat_ws(" ", slice(col("_toks"), (i * sentTokens + 1).cast("int"), lit(sentTokens))))
    val sentRows = base.select(col(idCol).cast("long").as("doc_id"),
      posexplode(sents).as(Seq("sent_index", "sent_text")))

    // batched embedding via the Embedder boundary
    val embedded = sentRows.as[(Long, Int, String)]
      .mapPartitions { it =>
        val e = mkEmbedder()
        it.grouped(100).flatMap { batch =>
          val vecs = e.embedBatch(batch.map(_._3))
          batch.zip(vecs).map { case ((d, i, t), v) => (d, i, t, v) }
        }
      }
      .toDF("doc_id", "sent_index", "sent_text", "emb")

    val w = Window.partitionBy(col("doc_id")).orderBy(col("sent_index"))
    val withSim = embedded
      .withColumn("prev_emb", lag(col("emb"), 1).over(w))
      .withColumn("sim",
        when(col("prev_emb").isNull, lit(null))
          .otherwise(VectorFunctions.cosine(col("prev_emb"), col("emb"))))
      .withColumn("boundary",
        when(col("prev_emb").isNull || col("sim") < threshold, 1).otherwise(0))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunks0 = withSim
      .withColumn("chunk_index", sum(col("boundary")).over(wRun))
      .groupBy(col("doc_id"), col("chunk_index"))
      .agg(array_sort(collect_list(
        struct(col("sent_index"), col("sent_text"), col("emb")))).as("sents"))
      .withColumn("chunk_text", concat_ws(" ",
        transform(col("sents"), s => s.getField("sent_text"))))
      .withColumn("n_sentences", size(col("sents")).cast("long"))

    if (minChunkSize <= 0) {
      // merge pass disabled: boundary chunks are final (running-sum
      // chunk ids over consecutive groups are already dense 1..n)
      chunks0.select(col("doc_id"), col("chunk_index"),
        col("chunk_text"), col("n_sentences"))
    } else {
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("chunk_index"))
      val wDocRun = wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // token count = sum of per-sentence whitespace word counts
      // (semantic_chunker.py:119 `sum(len(s.split()) for s in chunk)`)
      val tokenCount = aggregate(
        transform(col("sents"), s => s.getField("sent_text")),
        lit(0),
        (acc, t) => acc + size(filter(split(t, " "), x => length(x) > 0)))
      // mean pairwise cosine between this chunk's and the next chunk's
      // sentence embeddings (the similarity-matrix block mean of
      // semantic_chunker.py:128-130)
      val embs = transform(col("sents"), s => s.getField("emb"))
      val staged = chunks0
        .withColumn("tokens", tokenCount)
        .withColumn("embs", embs)
        .withColumn("nxt_embs", lead(col("embs"), 1).over(wDoc))
        .withColumn("nxt_sim",
          when(col("nxt_embs").isNull, lit(null)).otherwise(
            aggregate(col("embs"), lit(0.0), (acc, x) =>
              acc + aggregate(col("nxt_embs"), lit(0.0), (a2, y) =>
                a2 + VectorFunctions.cosine(x, y))) /
              (size(col("embs")) * size(col("nxt_embs")))))
        .withColumn("eligible",
          col("nxt_embs").isNotNull && col("tokens") < minChunkSize &&
            col("nxt_sim") >= threshold * 0.8)
      val merged = staged
        .withColumn("seg",
          sum(when(col("eligible"), 0).otherwise(1)).over(wDocRun))
        .withColumn("run_start",
          min(when(col("eligible"), col("chunk_index")))
            .over(Window.partitionBy(col("doc_id"), col("seg"))))
        .withColumn("merge_at",
          col("eligible") && (col("chunk_index") - col("run_start")) % 2 === 0)
        .withColumn("consumed",
          coalesce(lag(col("merge_at"), 1).over(wDoc), lit(false)))
        .withColumn("grp",
          when(col("consumed"), col("chunk_index") - 1).otherwise(col("chunk_index")))
        .groupBy(col("doc_id"), col("grp"))
        .agg(
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("chunk_index"), col("chunk_text")))),
            s => s.getField("chunk_text"))).as("chunk_text"),
          sum(col("n_sentences")).as("n_sentences"))
      merged.select(col("doc_id"),
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("grp")))
          .cast("long").as("chunk_index"),
        col("chunk_text"), col("n_sentences"))
    }
  }
}
