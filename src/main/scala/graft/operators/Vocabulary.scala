package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus vocabulary induction for training-data pipelines (beyond-
  * reference scale operator): the frequency tables tokenizer training
  * and vocabulary pruning start from — corpus-wide token and word-
  * n-gram counts, and the deterministic top-k slice of either.
  *
  * Shapes: explode → groupBy is ONE shuffle with map-side combine
  * (partial counts per partition, vocabulary-sized output); top-k is
  * orderBy+limit, which Spark plans as TakeOrderedAndProject — per-
  * partition heaps, no global sort materialization. Ordering ties
  * break on the term ascending, so the slice is deterministic and
  * the oracle replays it exactly. */
object Vocabulary {

  /** Corpus-wide token frequencies: (token, n) — the library
    * tokenizer (lowercase [a-z0-9] runs, stopwords kept). */
  def tokenFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.allTokens(col(textCol)))
        .as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1L)).as("n"))

  /** Corpus-wide word n-gram frequencies (non-distinct grams per
    * document — frequency means OCCURRENCES, so a doc repeating a
    * gram counts it every time). */
  def ngramFrequencies(df: DataFrame, textCol: String,
      n: Int): DataFrame =
    // bind the token array ONCE before the n-gram builder references
    // it (size + per-element slice + the empty guard): fed the raw
    // tokenizer expression, each reference re-tokenizes the row —
    // the interpreted-HOF cost Dsir.gramsOfText quantifies (r17
    // review pass 8). CollapseProject keeps the binding: the alias
    // is non-cheap and multiply referenced.
    df.select(TextFunctions.allTokens(col(textCol)).as("_ws"))
      .select(explode(QualityFilters.wordNgrams(col("_ws"), n))
        .as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1L)).as("n"))

  private def topK(freq: DataFrame, termCol: String,
      k: Int): DataFrame =
    freq.orderBy(col("n").desc, col(termCol).asc).limit(k)

  /** The k most frequent tokens, count-descending with the token
    * ascending as the deterministic tie-break. */
  def topKTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    topK(tokenFrequencies(df, textCol), "token", k)

  /** The k most frequent word n-grams, same deterministic order. */
  def topKNgrams(df: DataFrame, textCol: String, n: Int,
      k: Int): DataFrame =
    topK(ngramFrequencies(df, textCol, n), "gram", k)
}
