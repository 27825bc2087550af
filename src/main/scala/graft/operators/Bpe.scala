package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer TRAINING and encoding (Sennrich et
  * al. 2016, arXiv:1508.07909) — the subword-vocabulary induction
  * step of a training-data pipeline, distributed the published way:
  *
  *   - ONE corpus-sized shuffle builds the word-frequency table
  *     ([[wordFreqs]]); every merge round after that touches only the
  *     vocabulary-sized table (Heaps' law: ~O(corpus^0.5) rows), so M
  *     rounds cost M vocab-sized aggregations, not M corpus passes.
  *   - Each round counts adjacent symbol pairs weighted by word
  *     frequency (map-side-combinable groupBy), picks the argmax with
  *     a DETERMINISTIC tie-break (count desc, then pair lexicographic
  *     asc — the reference implementation's dict-order max is
  *     nondeterministic; we pin it), and applies the merge as a
  *     per-row greedy left-to-right fold. The 1-row-per-round argmax
  *     collect is the kmeansIvf posture: driver holds k×1 state, the
  *     table never leaves the cluster.
  *   - ENCODING new text is a join against the final word→symbols
  *     table ([[encode]]) — the word-memoization trick production
  *     tokenizers use, which at 100 TB is a broadcast-or-shuffle
  *     dictionary join instead of a per-word merge replay; the
  *     from-scratch replay ([[replaySymbols]]) covers OOV words and
  *     is spec-pinned equal to the table path on in-vocab words.
  *
  * Merge-count posture at scale: each round costs one vocab-sized
  * aggregation (sub-second at sf1's ~50k-word vocabulary, measured
  * SCALING.md addendum 9), so a production 32k-merge vocabulary is
  * hours over a 100 TB corpus's ~10⁸-word table. The published
  * practice is the answer, not a bigger cluster: tokenizers train on
  * a bounded DETERMINISTIC SAMPLE (SentencePiece defaults to 10⁷
  * sentences) — compose [[graft.operators.Sampling]]'s salted draw
  * in front of [[wordFreqs]] — while the corpus-sized work stays in
  * [[encode]]'s dictionary join, which is one pass however many
  * merges were trained.
  *
  * Symbols follow the paper: characters, with `</w>` appended to the
  * word-final character so word-internal and word-final units are
  * distinct mergeable symbols. A merged symbol is the concatenation
  * of its parts; within a round, merging cannot create a fresh
  * occurrence of the SAME pair (the merged symbol differs from both
  * parts), so repeated-leftmost merging — the DuckDB oracle's
  * recursive form — equals this fold's greedy non-overlap scan. */
object Bpe {

  final case class Merge(rank: Int, lhs: String, rhs: String,
      merged: String, cnt: Long)

  /** Corpus word-frequency table: (word, freq) — the one
    * corpus-sized shuffle of the whole training procedure. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.allTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character symbols with the paper's `</w>` end-of-word marker on
    * the final character. Empty on the empty word (r17 review pass 9:
    * unguarded, sequence(1, 0) DESCENDS — the same hazard
    * [[adjacentPairs]] guards — and an empty word yielded the phantom
    * symbols ["", "</w>"]; the library tokenizer never emits "", but
    * initSymbols/replaySymbols are public OOV-path API over arbitrary
    * word columns). */
  def initSymbols(word: Column): Column =
    when(length(word) > 0,
      transform(sequence(lit(1), length(word)), i =>
        when(i === length(word),
          concat(word.substr(i, lit(1)), lit("</w>")))
          .otherwise(word.substr(i, lit(1)))))
      .otherwise(array().cast("array<string>"))

  /** Adjacent symbol pairs as struct(l, r); empty for 1-symbol words
    * (guarded: Spark's sequence DESCENDS when start > stop). */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) > 1,
      transform(sequence(lit(1), size(syms) - 1), i =>
        struct(element_at(syms, i).as("l"),
          element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** One greedy left-to-right non-overlapping merge pass: every
    * occurrence of (l, r) becomes the concatenated symbol; a matched
    * right element cannot start the next match ("a a a" under (a,a)
    * → ["aa", "a"]). The i<n guard short-circuits before the ANSI
    * 1-based element_at can see index n+1. */
  def applyMergeOnce(syms: Column, l: Column, r: Column): Column = {
    val n = size(syms)
    aggregate(
      when(n > 0, sequence(lit(1), n)).otherwise(array().cast("array<int>")),
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (acc, i) =>
        when(acc.getField("skip"),
          struct(acc.getField("out").as("out"), lit(false).as("skip")))
        .when(i < n && element_at(syms, i) === l &&
            element_at(syms, i + 1) === r,
          struct(concat(acc.getField("out"), array(concat(l, r))).as("out"),
            lit(true).as("skip")))
        .otherwise(
          struct(concat(acc.getField("out"), array(element_at(syms, i)))
            .as("out"), lit(false).as("skip"))),
      acc => acc.getField("out"))
  }

  /** Replay a learned merge list — ONE greedy pass per merge, in
    * rank order (the OOV path of an encoder; in-vocab words take the
    * [[encode]] join instead). The loop lives at RUNTIME, not in the
    * expression tree: an aggregate fold over the merge-table literal
    * whose accumulator is the symbol array. Composing
    * [[applyMergeOnce]] per merge instead — as columns or as
    * withColumn stages — duplicates the `syms` subtree ~5× per level
    * (element_at ×3 + size ×2 per lambda) and the analyzer/optimizer
    * tree grows exponentially in the merge count (8 merges OOM'd a
    * 4 GiB driver); here every `syms` mention is one lambda-variable
    * node, so the tree is constant in the merge count.
    *
    * Law note (r17 review pass 9): this is the SINGLE-PASS-per-rank
    * law — identical to training's evolution, so it equals the
    * [[encode]] table on every in-vocab word (spec-pinned). It is
    * NOT the reference apply_bpe loop (subword-nmt re-scans lowest-
    * rank-first until no learned pair remains): with an EXTERNAL
    * merge table, a low-rank pair whose occurrence only materializes
    * after a higher-rank merge stays unapplied here (merges =
    * [(1: ab+c), (2: a+b)] on "abcd" ends [ab, c, d</w>], the
    * reference reaches [abc, d</w>]). Self-trained tables replayed on
    * OOV words share the single-pass law by construction. */
  def replaySymbols(word: Column, merges: Seq[Merge]): Column =
    if (merges.isEmpty) initSymbols(word)
    else aggregate(
      array(merges.map(m =>
        struct(lit(m.lhs).as("l"), lit(m.rhs).as("r"))): _*),
      initSymbols(word),
      (syms, m) =>
        applyMergeOnce(syms, m.getField("l"), m.getField("r")))

  /** Train m merges over a (word, freq) table. Returns the learned
    * merge list (driver-held, m rows — the tokenizer artifact) and
    * the final word→symbols table (the encode dictionary; caller
    * unpersists). Each round materializes its cache before dropping
    * the parent so lineage stays one hop; stops early if the corpus
    * runs out of adjacent pairs. */
  def learnMerges(words: DataFrame, m: Int): (Seq[Merge], DataFrame) = {
    var cur = words.select(col("word"), col("freq"),
      initSymbols(col("word")).as("syms")).cache()
    cur.count()
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= m && !exhausted) {
      val best = cur
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Row(l: String, r: String, cnt: Long) = best(0)
        out += Merge(rank, l, r, l + r, cnt)
        val next = cur.withColumn("syms",
          applyMergeOnce(col("syms"), lit(l), lit(r))).cache()
        next.count()
        cur.unpersist()
        cur = next
        rank += 1
      }
    }
    (out.result(), cur)
  }

  /** The merge table as a frame (merge_rank, lhs, rhs, merged, cnt)
    * — the gate face of [[learnMerges]]. */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Encode documents against a trained symbol table: per-doc word
    * and subword totals via the dictionary join (broadcast when the
    * vocabulary is small; shuffle join on the word key otherwise —
    * never a per-word merge replay over the corpus).
    *
    * CONTRACT (r17 review pass 9): this face covers IN-VOCAB text
    * only — the inner join DROPS out-of-vocabulary occurrences (and
    * an all-OOV doc entirely), which is exact when encoding the
    * training corpus (the gate posture) and silently undercounts on
    * anything else. Encoding open text takes the [[encode]] overload
    * WITH the merge list, whose replay fallback counts every word. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      symtab: DataFrame): DataFrame =
    df.select(col(idCol),
        explode(TextFunctions.allTokens(col(textCol))).as("word"))
      .join(symtab.select(col("word"), col("syms")), Seq("word"))
      .groupBy(idCol)
      .agg(sum(size(col("syms"))).cast("long").as("n_subwords"),
        count(lit(1)).cast("long").as("n_words"))

  /** The open-text encoder: in-vocab words read the dictionary,
    * OOV words fall back to [[replaySymbols]] over the learned merge
    * list (the deployment path the header's sample-training posture
    * requires — new crawl text WILL contain words the sample never
    * saw). LEFT join + per-row replay only on misses; same output
    * shape, every word counted. Spec-pinned: equals the dictionary
    * face on in-vocab text, and an all-OOV document emits a row. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      symtab: DataFrame, merges: Seq[Merge]): DataFrame =
    df.select(col(idCol),
        explode(TextFunctions.allTokens(col(textCol))).as("word"))
      .join(symtab.select(col("word"), col("syms")), Seq("word"), "left")
      .withColumn("syms",
        coalesce(col("syms"), replaySymbols(col("word"), merges)))
      .groupBy(idCol)
      .agg(sum(size(col("syms"))).cast("long").as("n_subwords"),
        count(lit(1)).cast("long").as("n_words"))
}
