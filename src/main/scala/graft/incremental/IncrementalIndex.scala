package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Search

/** Incremental BM25 index maintenance — the index-side twin of the
  * source sync (SURVEY §2.8 applied to the search artifacts of
  * bm25_statistics / search_service.py:287-368).
  *
  * At corpus scale the expensive phase of an index rebuild is
  * tokenizing every document; the score artifacts are cheap,
  * vocab-sized aggregations over the token frame. So the maintained
  * artifact is the TOKEN BASE `(id, dl, _toks)` — kept current by a
  * primary-key MERGE that re-tokenizes ONLY the changed documents —
  * and the per-corpus artifacts (df, stats, impacts) recompute from
  * it on demand. Recomputing them is not wasted work: BM25's idf and
  * length normalization are corpus-global, so ANY delta legitimately
  * moves every impact value (N, avgdl, and the changed tokens' df all
  * shift); what an incremental design must avoid is re-reading and
  * re-tokenizing the unchanged 99.99% of a 100 TB corpus, and the
  * merged base avoids exactly that.
  *
  * The parquet PK-merge swaps to Delta `MERGE INTO` on a cluster
  * (ParquetSink scaladoc) — rewrite cost then becomes O(delta). */
object IncrementalIndex {

  /** Apply one change batch to the token-base artifact at `basePath`:
    * rows of `changedDocs` (`idCol`, `textCol`) re-tokenize — only
    * the delta — and merge by id; ids in `deletedIds` drop. Returns
    * the number of documents (re)tokenized. */
  def syncTokenBase(spark: SparkSession, basePath: String,
      changedDocs: DataFrame, idCol: String, textCol: String,
      deletedIds: Option[DataFrame] = None): Long = {
    // persist the delta: the count and the merge share one
    // tokenization pass instead of re-evaluating the upstream lineage
    val delta = Search.tokenBase(changedDocs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = delta.count()
    ParquetSink.merge(spark, basePath, delta, Seq(idCol),
      deletedIds.map(_.select(idCol)))
    delta.unpersist()
    n
  }

  /** The queryable index over the maintained base: vocab-sized
    * aggregations and joins only — no document is re-read. */
  def index(spark: SparkSession, basePath: String, idCol: String,
      eager: Boolean = false): Search.Bm25Index = {
    val base = ParquetSink.read(spark, basePath).getOrElse(
      throw new IllegalStateException(s"no token base at $basePath — " +
        "run syncTokenBase with the initial corpus first"))
    Search.buildIndexFromTokens(base, idCol, eager)
  }
}
