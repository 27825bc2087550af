package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embedder, Publish}
import graft.sinks.{Neo4jConnector, QdrantConnector, QdrantPoints,
  RecordingCypherSession, RecordingQdrantApi}

/** Counting stub embedder: records how many texts actually embed. */
object CountingEmbedder {
  val calls = new AtomicInteger(0)
}
final case class CountingEmbedder(dim: Int) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    CountingEmbedder.calls.addAndGet(texts.size)
    texts.map(_ => Array.fill(dim)(0.5f))
  }
}

/** Approved-document publish pipeline
  * (document_tasks.py:1587-1737). */
class PublishSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def chunksDf = Seq(
    (1L, "alpha text", Some(Seq(1.0f, 0.0f))),
    (2L, "beta text", None), // missing: backfills
    (3L, "gamma text", Some(Seq(0.0f, 1.0f))),
    (4L, "delta text", None)) // missing: backfills
    .toDF("chunk_id", "chunk_text", "embedding")

  test("backfill embeds ONLY the chunks missing a vector") {
    CountingEmbedder.calls.set(0)
    val (filled, n) = Publish.backfillEmbeddings(chunksDf, "chunk_id",
      "chunk_text", "embedding", () => CountingEmbedder(2))
    assert(n === 2)
    assert(filled.where(col("embedding").isNull).count() === 0)
    // the embed plan is lazy; after the action above, exactly the two
    // missing rows have gone through the embedder
    assert(CountingEmbedder.calls.get() === 2)
    // pre-existing vectors untouched
    val kept = filled.where(col("chunk_id") === 1)
      .select(col("embedding")).as[Seq[Float]].head()
    assert(kept === Seq(1.0f, 0.0f))
  }

  test("publish drives vector + graph stores and reports counts") {
    CountingEmbedder.calls.set(0)
    val qid = "pub-q-" + System.nanoTime()
    val cid = "pub-c-" + System.nanoTime()
    val entities = Seq((10L, "Pump"), (11L, "Seal")).toDF("id", "name")
    val rels = Seq((10L, 11L, "CONNECTS_TO"))
      .toDF("src", "dst", "rel_type")
      .withColumn("id", concat_ws(":", col("src"), col("dst")))
    val got = Publish.publishApproved(spark,
      chunksDf, "chunk_id", "chunk_text", "embedding",
      () => CountingEmbedder(2),
      vectorStore = Some((QdrantConnector(() => RecordingQdrantApi(qid),
        Seq(QdrantPoints.VectorField("embedding", 2))), "chunks")),
      graphEntities = Some(Publish.StoreBatch(
        Neo4jConnector(() => RecordingCypherSession(cid)), "Entity",
        entities, Seq("id"))),
      graphRelationships = Some(Publish.StoreBatch(
        Neo4jConnector(() => RecordingCypherSession(cid)), "RelRow",
        rels, Seq("id"))),
      priorAttempts = 2)
    assert(got === Publish.PublishResult("published", 4L, 2L, 1L, 2L, 3L, None))
    // the upsert and the point count both act on the filled frame —
    // the persisted backfill must keep the paid embedder at ONE call
    // per missing chunk
    assert(CountingEmbedder.calls.get() === 2)
    // the vector store saw every chunk, with backfilled vectors present
    val bodies = RecordingQdrantApi.requests(qid)
      .filter(_.path.contains("/points?")).map(_.body).mkString
    assert(bodies.contains("\"id\":2") && bodies.contains("\"id\":4"))
    assert(!bodies.contains("null"))
    // the graph store saw MERGEs for both labels
    val cy = RecordingCypherSession.statements(cid).map(_.cypher).mkString("\n")
    assert(cy.contains("MERGE (new_node:Entity") && cy.contains("MERGE (new_node:RelRow"))
    RecordingQdrantApi.clear(qid); RecordingCypherSession.clear(cid)
  }

  test("a failing store lands publish_failed with the error and a bumped attempt") {
    val boom = new graft.sinks.TargetConnector {
      override def kind = "boom"
      override def applySetup(s: org.apache.spark.sql.SparkSession,
          t: String, d: org.apache.spark.sql.types.StructType,
          a: Boolean) = throw new IllegalStateException("nope")
      override def applyMutation(s: org.apache.spark.sql.SparkSession,
          t: String, r: org.apache.spark.sql.DataFrame,
          pk: Seq[String], d: Option[org.apache.spark.sql.DataFrame]) =
        throw new IllegalStateException("store down")
      override def read(s: org.apache.spark.sql.SparkSession, t: String) = None
    }
    val got = Publish.publishApproved(spark,
      chunksDf, "chunk_id", "chunk_text", "embedding",
      () => CountingEmbedder(2),
      vectorStore = Some((boom, "chunks")),
      graphEntities = None, graphRelationships = None,
      priorAttempts = 0)
    assert(got.status === "publish_failed")
    assert(got.publishAttempts === 1L)
    assert(got.lastPublishError.exists(_.contains("store down")))
    // absent stores skip cleanly (the unconfigured branches)
    val skipped = Publish.publishApproved(spark, chunksDf, "chunk_id",
      "chunk_text", "embedding", () => CountingEmbedder(2),
      None, None, None)
    assert(skipped.status === "published")
    assert((skipped.vectorPoints, skipped.graphEntities) === ((0L, 0L)))
  }

  test("publish releases the backfill cache once the counts are taken") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Publish.publishApproved(spark, chunksDf, "chunk_id",
      "chunk_text", "embedding", () => CountingEmbedder(2),
      None, None, None)
    assert(got.status === "published")
    assert(got.embeddingsGenerated === 2L)
    // the MEMORY_AND_DISK backfill frame must not outlive the publish:
    // a long-lived session publishing many documents would otherwise
    // accumulate one cached embed frame per call until eviction
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }
}
