package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Cross-encoder reranking boundary (reranker_service.py:17-63:
  * Cohere rerank-english-v3.0 over the top-N; fallback is the lexical
  * boost in Search.rerankLexicalBoost).
  *
  * The candidate set is small (top-N of a search), so the reference
  * calls the reranker once per query. Here: a `mapPartitions` over the
  * (tiny, usually 1-partition) candidate DataFrame with the client
  * constructed once per partition — same boundary shape as LlmClient /
  * Embedder. [[StubReranker]] is deterministic for tests.
  */
trait RerankClient extends Serializable {
  /** Scores for (query, passage) pairs — one batch per call. */
  def scoreBatch(query: String, passages: Seq[String]): Seq[Double]
}

/** Deterministic stub: score = fraction of query terms present in the
  * passage (the reference's own fallback heuristic family). */
final case class StubReranker() extends RerankClient {
  def scoreBatch(query: String, passages: Seq[String]): Seq[Double] = {
    val qt = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    passages.map { p =>
      val pt = p.toLowerCase.split("\\s+").toSet
      if (qt.isEmpty) 0.0 else qt.count(pt.contains).toDouble / qt.length
    }
  }
}

object Rerank {

  case class Reranked(id: Long, rerank_score: Double)

  /** Rerank candidates (id, textCol) against `query`; returns
    * (id, rerank_score), descending ties broken by id downstream.
    */
  def rerank(candidates: DataFrame, idCol: String, textCol: String,
      query: String, mkClient: () => RerankClient): Dataset[Reranked] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val client = mkClient()
        it.grouped(64).flatMap { batch =>
          val scores = client.scoreBatch(query, batch.map(_._2))
          batch.map(_._1).zip(scores).map { case (id, s) => Reranked(id, s) }
        }
      }
  }

  case class RerankedWithScore(id: Long, vscore: Double,
    rerank_score: Double)

  /** [[rerank]] with the retrieval score carried THROUGH the
    * mapPartitions boundary (r22, guide §1.2 step 1: don't compute
    * things twice). The join-back form — rerank(candidates) joined
    * against candidates for the retrieval score — plans the candidate
    * subtree twice, and when that subtree is an embed pass over the
    * corpus with no exchange between the scan and the top-k cut
    * (q52's shape: mapPartitions embed → TakeOrderedAndProject),
    * AQE's exchange reuse has nothing to dedup and the whole corpus
    * is embedded twice. Same rows, same scores: the carry is the
    * identical deterministic value the join re-derived. */
  def rerankWithScore(candidates: DataFrame, idCol: String,
      scoreCol: String, textCol: String, query: String,
      mkClient: () => RerankClient): Dataset[RerankedWithScore] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates.select(col(idCol).cast("long"),
        col(scoreCol).cast("double"), col(textCol))
      .as[(Long, Double, String)]
      .mapPartitions { it =>
        val client = mkClient()
        it.grouped(64).flatMap { batch =>
          val scores = client.scoreBatch(query, batch.map(_._3))
          batch.zip(scores).map { case ((id, v, _), s) =>
            RerankedWithScore(id, v, s)
          }
        }
      }
  }
}
