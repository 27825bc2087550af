package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Partitioning
import graft.functions.{TextFunctions, VectorFunctions}

/** Semantic chunking (semantic_chunker.py:61-264): embed consecutive
  * sentences, place a chunk boundary wherever cosine similarity of
  * neighbors drops below the threshold, then re-assemble chunks.
  *
  * Spark shape (SURVEY §2.5 row): sentence explode → batched embed
  * (mapPartitions through the [[Embedder]] boundary) →
  * `Window.orderBy(idx)` + `lag` cosine → boundary flag → running-sum
  * chunk id → groupBy re-assembly. One shuffle on the doc key for the
  * window, one for the final groupBy — both on the same key, so at
  * cluster scale the second reuses the first's partitioning.
  *
  * Sentence tier: for corpora with punctuation use the regex sentence
  * split (Chunker.sentence); this entry point uses fixed token windows
  * as the sentence stand-in (the driver corpus has no terminators).
  */
object SemanticChunker {

  def chunks(df: DataFrame, idCol: String, textCol: String,
      sentTokens: Int, mkEmbedder: () => Embedder,
      threshold: Double): DataFrame = {
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
    withSim
      .withColumn("chunk_index", sum(col("boundary")).over(wRun))
      .groupBy(col("doc_id"), col("chunk_index"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("sent_index"), col("sent_text")))),
          s => s.getField("sent_text"))).as("chunk_text"),
        count(lit(1)).as("n_sentences"))
  }
}
