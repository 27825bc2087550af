package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Ingest-time artifacts, memoized per corpus.
  *
  * The reference precomputes its lexical statistics at ingest
  * (contextual_retrieval_schema.sql:33 `bm25_statistics`; chunk tables
  * carry `bm25_tokens`) and every query reuses them — queries never
  * re-tokenize the corpus. This object is the Spark analogue: the
  * first caller of an artifact for a given corpus key builds and
  * persists it; later queries (BM25 scoring, hybrid RRF, Jaccard /
  * MinHash dedup) reuse the same persisted frames.
  *
  * At cluster scale these frames are written once as parquet/Delta by
  * the ingest job; the in-session memo is the local[n] stand-in with
  * identical dataflow shape. Keyed memoization also fixes the re-cache
  * leak of building a fresh `.cache()` plan per query invocation.
  */
object CorpusArtifacts {

  private val bm25Cache = new ConcurrentHashMap[String, Search.Bm25Index]()
  private val shingleCache = new ConcurrentHashMap[String, DataFrame]()
  private val winnowCache = new ConcurrentHashMap[String, DataFrame]()

  /** Explicit ingest-phase entry: build BOTH artifacts for a corpus
    * from ONE persisted tokenization pass (tokenizing dominates both
    * builds; at 100 TB this halves the ingest scans). Lazy per-artifact
    * entries below stay independent — a BM25-only workload never pays
    * for a shingle index it didn't ask for. */
  def buildAll(key: String, df: => DataFrame, idCol: String,
      textCol: String, n: Int): Unit = {
    val shKey = s"$key#$n"
    if (bm25Cache.containsKey(key) && shingleCache.containsKey(shKey)) return
    val base = Search.tokenBase(df, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    bm25Cache.computeIfAbsent(key, _ =>
      Search.buildIndexFromTokens(base, idCol, eager = true))
    shingleCache.computeIfAbsent(shKey, _ => {
      val sh = Dedup.shingleIndexFromTokens(base, idCol, n)
        .persist(StorageLevel.MEMORY_AND_DISK)
      sh.count()
      sh
    })
    base.unpersist()
  }

  /** BM25 index (inverted index, doc lengths, corpus stats), persisted.
    * `key` identifies the corpus version — at cluster scale the ingest
    * run id; here the sf directory. Per-key computeIfAbsent: cache hits
    * never block behind another corpus's build. */
  def bm25Index(key: String, df: => DataFrame, idCol: String,
      textCol: String): Search.Bm25Index =
    bm25Cache.computeIfAbsent(key, _ =>
      Search.buildIndex(df, idCol, textCol, eager = true))

  /** Exploded (id, shingle) inverted index, persisted. */
  def shingleIndex(key: String, df: => DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    shingleCache.computeIfAbsent(s"$key#$n", _ =>
      Dedup.shingleIndex(df, idCol, textCol, n)
        .persist(StorageLevel.MEMORY_AND_DISK))

  /** Exploded (id, fp) winnowed-fingerprint index, persisted — the
    * span-pair analogue of [[shingleIndex]] (the per-row winnowing
    * hash pass dwarfs scan cost; never rebuild it per branch). */
  def winnowIndex(key: String, df: => DataFrame, idCol: String,
      textCol: String, k: Int, w: Int): DataFrame =
    winnowCache.computeIfAbsent(s"$key#$k#$w", _ =>
      Dedup.winnowIndex(df, idCol, textCol, k, w)
        .persist(StorageLevel.MEMORY_AND_DISK))

  /** DSIR (id, bucket, cnt) gram histogram, persisted — the shared
    * input the raw distribution AND the scoring join derive from
    * (Dsir.importanceWeights' docCounts parameter). Compact: ≤
    * `buckets` rows per document. One tokenize+hash pass per corpus
    * key instead of one per consumer (7.5 s → 2.4 s at sf1). */
  def dsirCounts(key: String, df: => DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    dsirCache.computeIfAbsent(s"$key#$buckets", _ =>
      Dsir.docBucketCounts(df, idCol, textCol, buckets)
        .persist(StorageLevel.MEMORY_AND_DISK))

  private val dsirCache = new ConcurrentHashMap[String, DataFrame]()

  /** Near-dup component labels ((doc_id, component,
    * is_representative) — the q176 law), persisted. The dedup
    * section's group post-processing (keep-best representative,
    * group-size census) re-reads these labels per report; computing
    * the MinHash walk once at ingest and memoizing is the same
    * "persist the scored frame once" posture as [[nbScores]].
    * `key` must pin corpus AND candidate-generation parameters — a
    * shingle/band change under the same key would serve stale
    * groups. */
  def neardupComponents(key: String, build: => DataFrame): DataFrame =
    componentCache.computeIfAbsent(key, _ =>
      build.persist(StorageLevel.MEMORY_AND_DISK))

  private val componentCache = new ConcurrentHashMap[String, DataFrame]()

  /** NB-quality scored frame ([[LmQuality.nbQualityScore]] output:
    * (idCol, n_tokens, avg_llr, keep)), persisted — the "persist the
    * scored frame once" posture the round-16 SCALING addenda held as
    * prose (the q221 gate plan re-evaluates the uncached NB chain
    * once per downstream branch: 10 totals crosses in one plan).
    * Production writes this at ingest next to the seed models; the
    * memo is the local[n] stand-in, exactly [[dsirCounts]]' shape.
    * `key` must pin corpus AND seed identities — a seed swap under
    * the same key would silently serve stale scores. */
  def nbScores(key: String, docs: => DataFrame, idCol: String,
      textCol: String, pos: => DataFrame, posTextCol: String,
      neg: => DataFrame, negTextCol: String,
      alpha: Double = 0.5): DataFrame =
    nbCache.computeIfAbsent(s"$key#$alpha", _ =>
      LmQuality.nbQualityScore(docs, idCol, textCol,
          pos, posTextCol, neg, negTextCol, alpha)
        .persist(StorageLevel.MEMORY_AND_DISK))

  private val nbCache = new ConcurrentHashMap[String, DataFrame]()

  /** Decontaminated-text frame ([[Dedup.removeContaminatedSpans]]
    * output: (idCol, n_tokens, n_dropped, clean_text)), persisted —
    * the shared input every post-decontamination stage reads (NB
    * scoring, the keep join, packing). Without the memo a capstone
    * composition re-runs the span-removal coverage shuffle once per
    * consumer. `key` must pin corpus, eval slice and n. */
  def decontaminated(key: String, train: => DataFrame, idCol: String,
      textCol: String, evalDf: => DataFrame, evalTextCol: String,
      n: Int): DataFrame =
    deconCache.computeIfAbsent(s"$key#$n", _ =>
      Dedup.removeContaminatedSpans(train, idCol, textCol,
          evalDf, evalTextCol, n)
        .persist(StorageLevel.MEMORY_AND_DISK))

  private val deconCache = new ConcurrentHashMap[String, DataFrame]()

  /** Drop every memoized artifact (tests / corpus reload). */
  def reset(): Unit = {
    bm25Cache.values.forEach { ix =>
      ix.idx.unpersist(); ix.dls.unpersist(); ix.stats.unpersist()
      ix.impacts.unpersist()
    }
    shingleCache.values.forEach(_.unpersist())
    winnowCache.values.forEach(_.unpersist())
    dsirCache.values.forEach(_.unpersist())
    nbCache.values.forEach(_.unpersist())
    deconCache.values.forEach(_.unpersist())
    bm25Cache.clear(); shingleCache.clear(); winnowCache.clear()
    dsirCache.clear(); nbCache.clear(); deconCache.clear()
  }
}
