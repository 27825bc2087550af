package graft.operators

import java.util.Locale
import java.util.regex.Pattern

/** Faithful row-level twin of the reference search service's pure
  * tier (app/services/search_service.py): the candidate-set BM25
  * scorer behind bm25_search, RRF fusion (_fuse_results), the legacy
  * weighted merge (_merge_and_rank), the Cypher builder
  * (_build_graph_query), the keyword-overlap rerank fallback
  * (reranker_service.py:55-63) and the performance-stats frame.
  *
  * The service's external fetches (Supabase ILIKE candidates, Qdrant
  * hits, Neo4j records) are injectable boundaries; everything after
  * the fetch is carried exactly — including the quirks: per-token df
  * counted over the FETCHED candidate rows (not the corpus),
  * duplicate query tokens double-scored, results outside the
  * primary/bm25/graph source sets silently dropped, and a duplicate
  * id inside one source taking its LAST occurrence's rank.
  *
  * The DataFrame tier ([[Search]]: impact-index BM25, rrf,
  * weightedMerge, rerankLexicalBoost) is the scale path behind the
  * oracle gates; this twin is the API-fidelity path, parity-pinned by
  * ReferenceParity2Spec against the reference binary. Where the
  * reference's output order is genuinely nondeterministic (hash-set
  * iteration feeding a stable sort), ties break by id ascending — a
  * documented deterministic deviation; the parity fixtures carry no
  * such ties.
  */
object SearchServiceRow {

  final case class Result(id: String, score: Double, source: String,
      title: String = "", content: String = "",
      relationships: Option[Vector[String]] = None)

  final case class Candidate(id: String, documentId: Option[String],
      chunkText: Option[String], contextualizedText: Option[String],
      bm25Tokens: Option[Vector[String]])

  private val TokenRe = Pattern.compile("(?U)\\w+")
  private val Stop = Set("the", "a", "an", "and", "or", "but", "in",
    "on", "at", "to", "for", "of", "with", "by", "as", "is", "was",
    "are", "were")

  /** _tokenize (:281-285) — same body as the two-tier BM25
    * tokenizer. */
  def tokenize(text: String): Vector[String] = {
    val m = TokenRe.matcher(text.toLowerCase(Locale.ROOT))
    val out = Vector.newBuilder[String]
    while (m.find()) {
      val t = m.group()
      if (!Stop.contains(t) && t.codePointCount(0, t.length) > 2)
        out += t
    }
    out.result()
  }

  private def cpTake(s: String, n: Int): String =
    s.substring(0,
      s.offsetByCodePoints(0, math.min(n, s.codePointCount(0, s.length))))

  // python `a or b or ''` over possibly-missing/empty strings
  private def firstTruthy(opts: Option[String]*): String =
    opts.collectFirst { case Some(s) if s.nonEmpty => s }.getOrElse("")

  /** bm25_search (:287-370) after the fetch boundary: `fetch(token,
    * perTokenLimit)` stands for the Supabase ILIKE candidate query.
    * df per token = FETCHED row count; candidates dedup first-seen
    * across tokens in order; doc length from bm25_tokens (empty list
    * falls through to tokenizing contextualized-else-chunk text);
    * avg_len 100.0 when no candidates; idf = ln((N-df+0.5)/(df+0.5)+1)
    * over the candidate-set N; duplicate query tokens score twice;
    * zero-score candidates dropped; stable score-desc sort, top
    * `limit`. */
  def bm25CandidateSearch(query: String,
      fetch: (String, Int) => Seq[Candidate],
      limit: Int = 10): Vector[Result] = {
    val tokens = tokenize(query)
    if (tokens.isEmpty) return Vector.empty
    val perTokenLimit = math.max(20, limit)

    val candidates =
      scala.collection.mutable.LinkedHashMap.empty[String, Candidate]
    val df = scala.collection.mutable.Map.empty[String, Int]
    tokens.foreach(t => df(t) = 0)
    tokens.foreach { t =>
      val rows = fetch(t, perTokenLimit)
      df(t) = rows.length
      rows.foreach { r =>
        if (!candidates.contains(r.id)) candidates(r.id) = r
      }
    }

    val n = math.max(1, candidates.size)
    def toksOf(r: Candidate): Vector[String] =
      r.bm25Tokens.filter(_.nonEmpty).getOrElse(
        tokenize(firstTruthy(r.contextualizedText, r.chunkText)))
    val lengths = candidates.map { case (cid, r) => cid -> toksOf(r).length }
    val avgLen =
      if (lengths.nonEmpty) lengths.values.sum.toDouble / lengths.size
      else 100.0

    val k1 = 1.2
    val b = 0.75
    val out = Vector.newBuilder[Result]
    candidates.foreach { case (cid, r) =>
      val toks = toksOf(r)
      var score = 0.0
      tokens.foreach { t =>
        val tf = toks.count(_ == t)
        if (tf != 0) {
          val dft = math.max(1, df.getOrElse(t, 1))
          val idf = math.log((n - dft + 0.5) / (dft + 0.5) + 1)
          val dl = math.max(1, lengths.getOrElse(cid, toks.length))
          val denom = tf + k1 * (1 - b + b * dl / avgLen)
          score += idf * (tf * (k1 + 1)) / denom
        }
      }
      if (score > 0) {
        val content = firstTruthy(r.contextualizedText, r.chunkText)
        // the select list always returns document_id, so the py
        // r.get(..., '') default is dead: a NULL renders as the
        // f-string's literal 'None'
        out += Result(cid, score, "bm25",
          s"Document ${r.documentId.getOrElse("None")}",
          cpTake(content, 500))
      }
    }
    out.result().sortBy(-_.score).take(limit)
  }

  /** _fuse_results (:370-423): RRF k=60 between the primary (vector)
    * and bm25 source groups, each group ranked as ONE pooled list;
    * graph results append unfused when their id is absent; sources
    * outside all three groups are dropped. Rank maps are
    * score-desc-stable with a duplicate id keeping its LAST
    * occurrence's rank; the fused payload comes from the
    * highest-score instance. */
  def fuseResults(results: Seq[Result], primarySources: Set[String],
      bm25Sources: Set[String], limit: Int): Vector[Result] = {
    val k = 60
    val vec = results.filter(r => primarySources.contains(r.source))
    val bm = results.filter(r => bm25Sources.contains(r.source))
    val gr = results.filter(_.source == "graph")

    def rankMap(items: Seq[Result]): Map[String, Int] =
      items.sortBy(-_.score).zipWithIndex
        .map { case (it, idx) => it.id -> (idx + 1) }.toMap // later wins

    val vr = rankMap(vec)
    val br = rankMap(bm)

    val bestById = scala.collection.mutable.Map.empty[String, Result]
    (vec ++ bm).foreach { item =>
      if (!bestById.contains(item.id) ||
          item.score > bestById(item.id).score)
        bestById(item.id) = item
    }

    val fused = scala.collection.mutable.LinkedHashMap.empty[String, Result]
    (vr.keySet ++ br.keySet).toVector.sorted.foreach { cid =>
      var rr = 0.0
      vr.get(cid).foreach(rank => rr += 1.0 / (k + rank))
      br.get(cid).foreach(rank => rr += 1.0 / (k + rank))
      val base = bestById(cid)
      fused(cid) = Result(cid, rr, "hybrid", base.title, base.content,
        relationships = None)
    }
    gr.foreach { g =>
      if (!fused.contains(g.id)) fused(g.id) = g
    }
    // ties (hash-order in the reference) break by id asc — documented
    fused.values.toVector.sortBy(r => (-r.score, r.id)).take(limit)
  }

  /** _merge_and_rank (:502-542): duplicate ids combine —
    * vector+graph by the weighted blend, same-source by max — and
    * relationship lists extend; first-seen order breaks score ties
    * (dict insertion, deterministic here). */
  def mergeAndRank(results: Seq[Result],
      vectorWeight: Double = 0.7): Vector[Result] = {
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, Result]
    results.foreach { result =>
      merged.get(result.id) match {
        case None => merged(result.id) = result
        case Some(existing) =>
          val newScore =
            if (result.source == "vector" && existing.source == "graph")
              result.score * vectorWeight +
                existing.score * (1 - vectorWeight)
            else if (result.source == "graph" && existing.source == "vector")
              existing.score * vectorWeight +
                result.score * (1 - vectorWeight)
            else math.max(existing.score, result.score)
          // python truthiness: an empty incoming list never merges,
          // and an empty existing list is REPLACED, not extended
          val newRels = result.relationships match {
            case Some(rs) if rs.nonEmpty =>
              existing.relationships match {
                case Some(es) if es.nonEmpty => Some(es ++ rs)
                case _ => Some(rs)
              }
            case _ => existing.relationships
          }
          merged(result.id) =
            existing.copy(score = newScore, relationships = newRels)
      }
    }
    merged.values.toVector.sortBy(-_.score)
  }

  /** _build_graph_query (:463-501): the exact Cypher text, including
    * its indentation and the string-interpolated (unparameterized)
    * filters. */
  def buildGraphQuery(entityName: Option[String],
      entityType: Option[String], relationshipType: Option[String],
      limit: Int, depth: Int): String = {
    val whereClauses =
      entityName.map(n => s"e.name CONTAINS '$n'").toSeq ++
        entityType.map(t => s"e.type = '$t'").toSeq
    val whereClause =
      if (whereClauses.nonEmpty) s"WHERE ${whereClauses.mkString(" AND ")}"
      else ""
    val relPattern =
      relationshipType.map(r => s"-[r:$r]-").getOrElse("-[r]-")
    s"""
        MATCH (e:Entity) $whereClause
        OPTIONAL MATCH path = (e)$relPattern(connected)
        WITH e, collect({
            type: type(r),
            target: connected.name,
            properties: properties(r)
        }) as relationships
        RETURN {
            id: e.id,
            name: e.name,
            type: e.type,
            properties: properties(e)
        } as entity, relationships
        LIMIT $limit
        """
  }

  /** reranker_service.py:55-63, the no-Cohere fallback: overlap =
    * count of query words SUBSTRING-contained in the lowercased
    * content ('pump' matches 'pumps'); score ×= 1 + 0.1·overlap;
    * stable score-desc sort, top_k. */
  def rerankFallback(query: String, candidates: Seq[Result],
      topK: Int = 20): Vector[Result] = {
    val qWords = query.toLowerCase(Locale.ROOT)
      .split("(?U)\\s+").filter(_.nonEmpty).toSet
    candidates.toVector.map { c =>
      val text = c.content.toLowerCase(Locale.ROOT)
      val overlap = qWords.count(text.contains)
      c.copy(score = c.score * (1 + 0.1 * overlap))
    }.sortBy(-_.score).take(topK)
  }

  /** numpy-style linear-interpolation percentile over a SORTED
    * sequence (np.percentile default). */
  def percentileLinear(sorted: IndexedSeq[Double], q: Double): Double = {
    val pos = (sorted.length - 1) * q / 100.0
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 < sorted.length)
      sorted(lo) + (sorted(lo + 1) - sorted(lo)) * frac
    else sorted(lo)
  }

  /** get_performance_stats (:569-597): per-metric frames (the empty
    * frame has only count/avg/p95/p99 keys) plus the 200 ms
    * meeting-target census over the NON-EMPTY metric lists
    * (vacuously met when all are empty). */
  def performanceStats(vector: Seq[Double], graph: Seq[Double],
      hybrid: Seq[Double]): Map[String, Any] = {
    def calc(metrics: Seq[Double]): Map[String, Any] =
      if (metrics.isEmpty)
        Map("count" -> 0, "avg_ms" -> 0.0, "p95_ms" -> 0.0,
          "p99_ms" -> 0.0)
      else {
        val sorted = metrics.toVector.sorted
        Map("count" -> metrics.length,
          "avg_ms" -> metrics.sum / metrics.length,
          "min_ms" -> sorted.head, "max_ms" -> sorted.last,
          "p50_ms" -> percentileLinear(sorted, 50),
          "p95_ms" -> percentileLinear(sorted, 95),
          "p99_ms" -> percentileLinear(sorted, 99))
      }
    val all = Seq(vector, graph, hybrid)
    Map("vector" -> calc(vector), "graph" -> calc(graph),
      "hybrid" -> calc(hybrid), "target_latency_ms" -> 200,
      "meeting_target" -> all.filter(_.nonEmpty).forall(m =>
        calc(m)("p95_ms").asInstanceOf[Double] < 200))
  }
}
