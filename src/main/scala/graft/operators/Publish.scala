package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.TargetConnector

/** The approved-document publish pipeline
  * (app/tasks/document_tasks.py:1587-1737): once a reviewed document
  * is approved, its chunks publish to the vector store and its graph
  * to the property store — backfilling embeddings for any chunk that
  * is missing one (ONLY the missing rows hit the embedder), counting
  * what each store received, and recording the attempt/error
  * bookkeeping the reference writes back to the document row
  * (publish_attempts increments whether the attempt succeeds or
  * fails; failures land `publish_failed` with the error message,
  * success lands `published`). Stores are optional exactly like the
  * reference's "not configured; skipping" branches.
  *
  * Scale shape: the backfill is a null-filter + per-partition batched
  * embed + one id-keyed join back — the 99% of chunks that already
  * carry vectors are never re-embedded or shuffled through the
  * embedder. */
object Publish {

  /** One store to publish a frame into. */
  final case class StoreBatch(connector: TargetConnector, target: String,
      rows: DataFrame, primaryKey: Seq[String])

  final case class PublishResult(status: String, vectorPoints: Long,
      graphEntities: Long, graphRelationships: Long,
      embeddingsGenerated: Long, publishAttempts: Long,
      lastPublishError: Option[String])

  /** Backfill embeddings for rows whose `embedCol` is null
    * (document_tasks.py:1624-1654 _ensure_embeddings): only the
    * missing rows are embedded; everything else passes through
    * untouched. Returns the filled frame and the backfill count. */
  def backfillEmbeddings(chunks: DataFrame, idCol: String,
      textCol: String, embedCol: String,
      mkEmbedder: () => graft.operators.Embedder,
      batchSize: Int = 100): (DataFrame, Long) = {
    val (filled, n, _) =
      backfillWithHandle(chunks, idCol, textCol, embedCol, mkEmbedder,
        batchSize)
    (filled, n)
  }

  /** [[backfillEmbeddings]] plus the persisted fresh-embeddings frame
    * (when any backfill happened) so the caller can unpersist it once
    * the filled frame has been fully consumed — without this, a
    * long-lived session publishing many documents accumulates one
    * MEMORY_AND_DISK cache per publish until eviction. */
  private[graft] def backfillWithHandle(chunks: DataFrame, idCol: String,
      textCol: String, embedCol: String,
      mkEmbedder: () => graft.operators.Embedder,
      batchSize: Int = 100): (DataFrame, Long, Option[DataFrame]) = {
    val missing = chunks.where(col(embedCol).isNull)
      .select(col(idCol), col(textCol))
    val n = missing.count()
    if (n == 0) (chunks, 0L, None)
    else {
      // App-tier chunk ids are UUID strings while EmbedText's contract
      // is a long id — mint a surrogate instead of casting (a string
      // id would throw CAST_INVALID_INPUT). The surrogate assignment
      // is nondeterministic across evaluations, so persist+materialize
      // it BEFORE anything forks the lineage; the embed and the
      // id-recovery join below must see the same assignment.
      val keyed = missing
        .withColumn("_rid", monotonically_increasing_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      keyed.count()
      // persist + materialize the fresh vectors NOW: the filled frame
      // is acted on more than once downstream (store upsert, counts),
      // and every re-evaluation of an unpersisted embed lineage would
      // call the PAID embedder again for the same chunks
      val fresh = EmbedText.embed(
          keyed.select(col("_rid"), col(textCol)), "_rid", textCol,
          mkEmbedder, batchSize)
        .withColumnRenamed("id", "_rid")
        .join(keyed.select(col("_rid"), col(idCol)), Seq("_rid"))
        .select(col(idCol), col("embedding").as("_backfilled"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fresh.count()
      keyed.unpersist(blocking = false)
      val filled = chunks.join(fresh, Seq(idCol), "left")
        .withColumn(embedCol, coalesce(col(embedCol), col("_backfilled")))
        .drop("_backfilled")
      (filled, n, Some(fresh))
    }
  }

  /** Drive one publish attempt: backfill → vector upsert → graph
    * entity/relationship upserts → result. Absent stores skip (the
    * reference's unconfigured branches); any store failure produces
    * status `publish_failed` carrying the error, with the attempt
    * counter advanced either way. */
  def publishApproved(spark: SparkSession,
      chunks: DataFrame, idCol: String, textCol: String, embedCol: String,
      mkEmbedder: () => graft.operators.Embedder,
      vectorStore: Option[(TargetConnector, String)],
      graphEntities: Option[StoreBatch],
      graphRelationships: Option[StoreBatch],
      priorAttempts: Long = 0): PublishResult = {
    val attempts = priorAttempts + 1
    // the backfill cache exists only to keep the paid embedder at one
    // call per missing chunk across the store writes below; by the
    // time this method returns the counts are taken, so release it —
    // success or failure — rather than letting a long-lived session
    // accumulate one cached embed frame per publish
    var cache: Option[DataFrame] = None
    try {
      val (filled, nEmb, handle) =
        backfillWithHandle(chunks, idCol, textCol, embedCol, mkEmbedder)
      cache = handle
      val points = vectorStore.map { case (c, target) =>
        c.applyMutation(spark, target, filled, Seq(idCol), None)
        filled.count()
      }.getOrElse(0L)
      def drive(b: StoreBatch): Long = {
        b.connector.applyMutation(spark, b.target, b.rows, b.primaryKey, None)
        b.rows.count()
      }
      val nEnt = graphEntities.map(drive).getOrElse(0L)
      val nRel = graphRelationships.map(drive).getOrElse(0L)
      PublishResult("published", points, nEnt, nRel, nEmb, attempts, None)
    } catch {
      case scala.util.control.NonFatal(e) =>
        PublishResult("publish_failed", 0L, 0L, 0L, 0L, attempts,
          Some(e.toString))
    } finally {
      cache.foreach(_.unpersist(blocking = false))
    }
  }
}
