package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Text-embedding boundary (EmbedText, embed_text.rs:9-104 /
  * embedding_service.py:44-196): batched calls through an [[Embedder]]
  * initialized once per partition; the reference batches 100 texts per
  * API call (embedding_service.py:125) — same shape here.
  *
  * [[StubEmbedder]] is the deterministic hash-projection used by tests
  * and oracles (FIXTURES.md §2: "stub embedder = seeded hash-projection
  * so cosine ranks are deterministic").
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Embed a batch of texts (one call = one provider request). */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic embedder: component k = first-24-bits of
  * md5(utf8(text) ‖ byte(k)) / 2^24 ∈ [0,1). Matches
  * graft.multimodal.Multimodal.decodeStub over the utf8 payload.
  */
final case class StubEmbedder(dim: Int) extends Embedder {
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      graft.multimodal.Multimodal.decodeStub(t.getBytes("UTF-8"), dim)
    }
}

object EmbedText {

  case class Embedded(id: Long, embedding: Array[Float])

  /** Embed a text column: (id, embedding[dim]). Batches of `batchSize`
    * rows per embedder call, embedder constructed once per partition.
    */
  def embed(df: DataFrame, idCol: String, textCol: String,
      mkEmbedder: () => Embedder, batchSize: Int = 100): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Partitioning.spread(df.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val embedder = mkEmbedder() // once per partition
        it.grouped(batchSize).flatMap { batch =>
          val vecs = embedder.embedBatch(batch.map(_._2))
          batch.map(_._1).zip(vecs).map { case (id, v) => Embedded(id, v) }
        }
      }
      .toDF("id", "embedding")
  }

  /** Async variant: up to `maxConcurrent` embed batches in flight per
    * partition (Throttle — the reference's max_inflight/concurrency-
    * controller semantics), output order preserved. */
  def embedAsync(df: DataFrame, idCol: String, textCol: String,
      mkEmbedder: () => Embedder, batchSize: Int = 100,
      maxConcurrent: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Partitioning.spread(df.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val embedder = mkEmbedder()
        Throttle.batchedAsync(it, batchSize, maxConcurrent) { batch =>
          val vecs = embedder.embedBatch(batch.map(_._2))
          batch.map(_._1).zip(vecs).map { case (id, v) => Embedded(id, v) }
        }
      }
      .toDF("id", "embedding")
  }

  /** Embedding model table — (model, dimensions, price per 1K tokens)
    * (embedding_service.py:29-42; unknown models are a loud error in
    * the reference's constructor, so [[embedCost]] mirrors that with
    * null rather than a silent 0). */
  val models: Seq[(String, Int, Double)] = Seq(
    ("text-embedding-3-small", 1536, 0.00002),
    ("text-embedding-3-large", 3072, 0.00013),
    ("text-embedding-ada-002", 1536, 0.00010))

  /** The reference's token estimate: whitespace word count × 1.3
    * (embedding_service.py:163). */
  def estimatedTokens(text: Column): Column =
    size(filter(split(text, "\\s+"), w => length(w) > 0)).cast("double") * 1.3

  /** Estimated USD cost of embedding `text` with `model`
    * (embedding_service.py:162-165: estimated tokens / 1000 × the
    * model's rate); null for models outside the table. */
  def embedCost(model: Column, text: Column): Column = {
    val rate = element_at(
      map(models.flatMap { case (m, _, p) => Seq(lit(m), lit(p)) }: _*),
      model)
    (estimatedTokens(text) / 1000.0) * rate
  }

  // ---- faithful row tier (parity-pinned by ReferenceParity2Spec) ----

  private val modelMap: Map[String, (Int, Double)] =
    models.map { case (m, d, p) => m -> (d, p) }.toMap

  /** python round(x, n): half-even over the EXACT binary value. */
  private def pyRound(x: Double, n: Int): Double =
    new java.math.BigDecimal(x)
      .setScale(n, java.math.RoundingMode.HALF_EVEN).doubleValue()

  private def wordCount(s: String): Int =
    s.split("(?U)\\s+").count(_.nonEmpty)

  /** calculate_similarity (embedding_service.py:197-237): cosine with
    * the zero-norm 0.0 arm, inverted euclidean 1/(1+d), raw dot;
    * unknown metrics raise (None = the ValueError arm). */
  def similarityRow(a: Seq[Double], b: Seq[Double],
      metric: String): Option[Double] = {
    def dotp = a.zip(b).map { case (x, y) => x * y }.sum
    metric match {
      case "cosine" =>
        val n1 = math.sqrt(a.map(x => x * x).sum)
        val n2 = math.sqrt(b.map(x => x * x).sum)
        Some(if (n1 == 0 || n2 == 0) 0.0 else dotp / (n1 * n2))
      case "euclidean" =>
        val d = math.sqrt(a.zip(b).map { case (x, y) =>
          val z = x - y; z * z
        }.sum)
        Some(1 / (1 + d))
      case "dot" => Some(dotp)
      case _ => None
    }
  }

  /** get_model_info (:268-276); None = the unsupported-model
    * constructor ValueError. */
  def modelInfo(model: String): Option[Map[String, Any]] =
    modelMap.get(model).map { case (dim, rate) =>
      Map("model" -> model, "dimensions" -> dim,
        "price_per_1k_tokens" -> rate,
        "price_per_1m_tokens" -> rate * 1000)
    }

  /** embed_text's cost estimate (:160-165): words × 1.3 / 1000 ×
    * rate, rounded 8 half-even. */
  def singleCost(text: String, model: String): Double = {
    val rate = modelMap(model)._2
    val tokens = wordCount(text) * 1.3
    pyRound((tokens / 1000) * rate, 8)
  }

  /** embed_batch's per-item cost distribution (:125-171): texts
    * slice into batches (size clamped at 2048), each batch's summed
    * token estimate prices the batch, and every item in it carries
    * batch_cost / len(batch) rounded 8 half-even; a timed-out batch
    * (per `timedOut`) zero-fills instead. */
  def batchCosts(texts: Seq[String], model: String,
      batchSize: Int = 20,
      timedOut: Int => Boolean = _ => false): Seq[Double] = {
    val bs = math.min(batchSize, 2048)
    val rate = modelMap(model)._2
    texts.grouped(bs).zipWithIndex.flatMap { case (batch, bi) =>
      if (timedOut(bi)) batch.map(_ => 0.0)
      else {
        val tokenCount = batch.map(t => wordCount(t) * 1.3).sum
        val batchCost = (tokenCount / 1000) * rate
        batch.map(_ => pyRound(batchCost / batch.length, 8))
      }
    }.toSeq
  }
}
