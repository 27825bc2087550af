package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunking operators over a documents DataFrame — the SPARK-NATIVE
  * simplified forms (fully codegen'd, no per-row Scala), kept as the
  * oracle-gated q10/q11 tier:
  *  - fixed char windows size+overlap (cf. app/processors/
  *    chunker.py:92-113 — the faithful port, including the
  *    strip-dropped windows, is [[ProcessorChunker.fixedChunking]]);
  *  - sentence chunking (regex split, greedy fill; cf.
  *    chunker.py:114-156 — the faithful port with the terminator
  *    replace-chain and overlap carry is
  *    [[ProcessorChunker.sentenceChunking]]);
  *  - deterministic chunk ids (md5 of `{document_id}_{level}_{index}`):
  *    app/processors/two_tier_chunker.py:377-389.
  *
  * Spark-first shape: per-row `transform(sequence(...))` building the
  * chunk array inside codegen, then a single `posexplode` generator —
  * one narrow stage, no shuffle, scales linearly with input splits.
  */
object Chunker {

  /** Fixed-size character windows with overlap.
    * step = size - overlap; chunk i covers [i*step, i*step + size).
    * Output: all input cols + (chunk_index, chunk_text).
    */
  def fixed(df: DataFrame, textCol: String, size: Int, overlap: Int): DataFrame = {
    require(overlap < size, "overlap must be < size")
    val step = size - overlap
    val t = col(textCol)
    val nChunks = floor((greatest(length(t), lit(1)) - 1) / step).cast("int")
    val chunks = transform(sequence(lit(0), nChunks),
      i => substring(t, (i * step + 1).cast("int"), lit(size)))
    df.select(col("*"), posexplode(chunks).as(Seq("chunk_index", "chunk_text")))
  }

  /** Sentence chunks: split on sentence terminators, greedily pack
    * consecutive sentences into chunks of at most maxChars
    * (a sentence longer than maxChars becomes its own chunk).
    * Greedy packing is a per-row scan → expressed with `aggregate`
    * (fold) over the sentence array, still fully codegen-composable.
    */
  def sentence(df: DataFrame, textCol: String, maxChars: Int): DataFrame = {
    val sents = filter(
      transform(split(col(textCol), "(?<=[.!?])\\s+"), s => trim(s)),
      s => length(s) > 0)
    // fold: acc = array of chunks; append sentence to last chunk if it
    // still fits, else start a new chunk
    val packed = aggregate(
      sents,
      array().cast("array<string>"),
      (acc, s) => {
        val last = element_at(acc, -1)
        val merged = concat_ws(" ", last, s)
        when(size(acc) === 0, array(s))
          .otherwise(when(length(merged) <= maxChars,
            concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
            .otherwise(concat(acc, array(s))))
      })
    df.select(col("*"), posexplode(packed).as(Seq("chunk_index", "chunk_text")))
  }

  /** Deterministic chunk id — md5("{docId}_{level}_{index}")
    * (two_tier_chunker.py:377-389).
    */
  def chunkId(docId: Column, level: String, index: Column): Column =
    md5(concat_ws("_", docId.cast("string"), lit(level), index.cast("string")))
}
