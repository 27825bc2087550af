package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.incremental.Incremental

/** One SQS message as receive_message returns it. */
case class SqsMessage(receiptHandle: String, body: String)

/** The SQS API boundary (amazon_s3.rs:236-249 receive_message /
  * delete_message): a real implementation wraps the AWS SDK; tests use
  * a deterministic in-memory queue. Receiving does NOT consume — a
  * message stays visible until deleted (the at-least-once contract the
  * ack design exists for). */
trait SqsQueueClient extends Serializable {
  def receive(maxMessages: Int): Seq[SqsMessage]
  def delete(receiptHandle: String): Unit
}

/** The object-store fetch boundary for change re-evaluation
  * (amazon_s3.rs:147-178 get_value): (lastModified micros, utf8 body),
  * or None when the key no longer exists. */
trait S3ObjectStore extends Serializable {
  def get(key: String): Option[(Long, String)]
}

/** AmazonS3 event-queue change stream (src/ops/sources/amazon_s3.rs:
  * 180-300) without the network: S3 event notifications arrive on an
  * SQS queue; each poll parses the notification JSON, keeps
  * ObjectCreated:/ObjectRemoved: events for the configured bucket and
  * prefix, form-url-decodes keys, and acks — immediately for messages
  * with no relevant change, AFTER processing otherwise (a crash before
  * ack redelivers, never loses). Changed keys are re-fetched and run
  * through [[Incremental.applyChangeStreamTo]]: upserts take the usual
  * ordinal/content-hash skips, removed keys delete exactly their
  * previously exported target keys.
  */
object S3EventQueue {

  /** Hard ceiling on messages collected to the driver in one [[poll]]
    * round. SQS itself caps a receive at 10; 10k leaves three orders
    * of headroom for fan-in wrappers while still bounding the
    * driver-side receipt/key collect to kilobytes. */
  val MaxPollBatch: Int = 10000

  /** Relevant changes of one SQS message + its deferred ack
    * (amazon_s3.rs SourceChangeMessage/ack_fn). */
  final case class ChangeBatch(changes: Seq[String], ack: () => Unit)

  /** S3EventNotification wire shape (amazon_s3.rs:205-230). */
  val recordsSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("eventName", StringType),
    StructField("s3", StructType(Seq(
      StructField("bucket", StructType(Seq(StructField("name", StringType)))),
      StructField("object", StructType(Seq(StructField("key", StringType))))))))))

  private val notificationSchema = StructType(Seq(
    StructField("Records", recordsSchema)))

  /** Declarative twin of the poll_sqs filter chain
    * (amazon_s3.rs:256-281): bodies → one row per relevant record,
    * with `event_name` and the form-url-decoded `key`. The bucket and
    * (raw-key) prefix filters and the Created/Removed event gate all
    * run before decoding, exactly like the reference; everything is
    * built-in expressions, so the plan stays codegen'd at any volume.
    */
  def parseNotifications(bodies: DataFrame, bodyCol: String,
      bucketName: String, prefix: Option[String]): DataFrame = {
    val rec = explode(coalesce(
      from_json(col(bodyCol), notificationSchema).getField("Records"),
      array().cast(recordsSchema)))
    val prefixOk = prefix
      .map(p => col("_rec").getField("s3").getField("object").getField("key").startsWith(p))
      .getOrElse(lit(true))
    bodies.withColumn("_rec", rec)
      .where(
        (col("_rec.eventName").startsWith("ObjectCreated:") ||
          col("_rec.eventName").startsWith("ObjectRemoved:")) &&
          col("_rec.s3.bucket.name") === bucketName && prefixOk)
      .withColumn("event_name", col("_rec.eventName"))
      .withColumn("key", url_decode(col("_rec.s3.object.key")))
      .drop("_rec")
  }

  /** One queue poll (amazon_s3.rs:236-300): receive up to
    * `maxMessages`, parse + filter, group relevant keys per message.
    * Messages that parse to nothing relevant (wrong bucket/prefix,
    * non-change events, the s3:TestEvent setup ping) are deleted on
    * the spot; messages whose body is NOT valid notification JSON are
    * left on the queue for redelivery — the reference surfaces a parse
    * failure as a stream error without acking, and deleting would
    * silently drop the underlying change forever. The rest carry their
    * ack for the caller to invoke after processing.
    *
    * Driver-memory bound (deliberate): receipt handles and (receipt,
    * key) pairs collect to the driver each round. That is the
    * reference's own execution model — SQS caps a receive at 10
    * messages and a poll round is one receive — so the collected set
    * is SQS-batch-sized, kilobytes not gigabytes. The [[MaxPollBatch]]
    * cap makes the assumption LOUD: a client that hands back an
    * unbounded backlog in one call (someone pointing this at a
    * firehose replay) fails fast instead of silently ballooning the
    * driver heap. Drain a deep queue by calling poll repeatedly. */
  def poll(spark: SparkSession, client: SqsQueueClient, bucketName: String,
      prefix: Option[String], maxMessages: Int = 10): Seq[ChangeBatch] = {
    import spark.implicits._
    require(maxMessages > 0 && maxMessages <= MaxPollBatch,
      s"maxMessages must be in 1..$MaxPollBatch (poll collects " +
        "receipts to the driver; drain deep queues with repeated polls)")
    val msgs = client.receive(maxMessages)
    require(msgs.size <= maxMessages,
      s"queue client returned ${msgs.size} messages for a receive of " +
        s"$maxMessages — refusing to collect an unbounded batch to the driver")
    if (msgs.isEmpty) return Seq.empty
    val bodies = msgs.map(m => (m.receiptHandle, m.body)).toDF("receipt", "body")
    // malformed = the body is not parseable JSON at all (valid JSON
    // with no Records field still parses → benign). PERMISSIVE
    // from_json yields a struct of nulls either way, so detection
    // goes through the corrupt-record column.
    val corruptSchema = StructType(Seq(
      StructField("Records", recordsSchema),
      StructField("_corrupt_record", StringType)))
    val malformed = bodies
      .where(from_json(col("body"), corruptSchema,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record"))
        .getField("_corrupt_record").isNotNull)
      .select(col("receipt")).as[String].collect().toSet
    val parsed = parseNotifications(bodies, "body", bucketName, prefix)
      .select(col("receipt"), col("key"))
      .as[(String, String)].collect()
    val byReceipt = parsed.groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).toSeq }
    msgs.flatMap { m =>
      byReceipt.get(m.receiptHandle) match {
        case Some(keys) =>
          Some(ChangeBatch(keys, () => client.delete(m.receiptHandle)))
        case None if malformed.contains(m.receiptHandle) =>
          None // leave unacked: visibility timeout redelivers
        case None =>
          client.delete(m.receiptHandle) // nothing relevant: ack now
          None
      }
    }
  }

  /** Distributed re-fetch of changed keys — one store client per
    * partition (the GoogleDrive.fetchContent shape). Keys that no
    * longer exist produce no row (NonExistence). Output is the engine
    * source contract: (source_key, ordinal, content, content_hash). */
  def refetch(spark: SparkSession, keys: Seq[String],
      mkStore: () => S3ObjectStore): DataFrame = {
    import spark.implicits._
    graft.Partitioning.spread(keys.toDF("source_key")).as[String]
      .mapPartitions { it =>
        val store = mkStore()
        it.flatMap(k => store.get(k).map { case (ord, content) => (k, ord, content) })
      }
      .toDF("source_key", "ordinal", "content")
      .withColumn("content_hash", sha2(col("content"), 256))
  }

  /** Handle on a running [[S3EventQueue.startPolling]] loop. */
  final class PollingHandle private[sources] (
      thread: Thread,
      stopFlag: java.util.concurrent.atomic.AtomicBoolean,
      roundsDone: java.util.concurrent.atomic.AtomicLong,
      lastError: java.util.concurrent.atomic.AtomicReference[Throwable]) {
    /** Signal the loop to end and wait for the thread to exit. */
    def stop(): Unit = {
      stopFlag.set(true)
      thread.interrupt()
      thread.join(30000)
    }
    /** Completed consume rounds (error rounds excluded). */
    def rounds: Long = roundsDone.get()
    /** Failure of the most recent round, if it failed; cleared once a
      * later round succeeds (the loop keeps going either way). */
    def error: Option[Throwable] = Option(lastError.get())
  }

  /** The reference's change_stream loop (amazon_s3.rs:180-203): poll
    * the queue forever on a daemon thread, one [[consume]] round per
    * `intervalMillis`. A failed round records the error and KEEPS
    * polling — the stream yields Err without dying, and unacked
    * messages redeliver — so transient store/queue failures self-heal.
    * Stop via the returned handle. */
  def startPolling(spark: SparkSession, client: SqsQueueClient,
      bucketName: String, prefix: Option[String],
      mkStore: () => S3ObjectStore,
      process: DataFrame => DataFrame, logicFp: String,
      connector: graft.sinks.TargetConnector, target: String,
      trackingPath: String, intervalMillis: Long = 1000,
      maxMessages: Int = 10): PollingHandle = {
    val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    val roundsDone = new java.util.concurrent.atomic.AtomicLong(0L)
    val lastError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() => {
      SparkSession.setActiveSession(spark)
      while (!stopFlag.get()) {
        try {
          consume(spark, client, bucketName, prefix, mkStore, process,
            logicFp, connector, target, trackingPath, maxMessages)
          roundsDone.incrementAndGet()
          lastError.set(null) // self-healed: don't report a stale failure
        } catch {
          case _: InterruptedException => ()
          case e: Throwable => lastError.set(e)
        }
        if (!stopFlag.get()) {
          try Thread.sleep(intervalMillis)
          catch { case _: InterruptedException => () }
        }
      }
    }, "graft-s3-event-poll")
    t.setDaemon(true)
    t.start()
    new PollingHandle(t, stopFlag, roundsDone, lastError)
  }

  /** One change-stream consumption round (the reference's
    * change_stream loop body + executor re-fetch): poll, re-fetch,
    * sync upserts + removals, then ack every processed message.
    * Returns the number of source keys actually re-evaluated (skips —
    * e.g. an event for content that did not change — count zero). */
  def consume(spark: SparkSession, client: SqsQueueClient,
      bucketName: String, prefix: Option[String],
      mkStore: () => S3ObjectStore,
      process: DataFrame => DataFrame, logicFp: String,
      connector: graft.sinks.TargetConnector, target: String,
      trackingPath: String, maxMessages: Int = 10): Long = {
    import spark.implicits._
    val batches = poll(spark, client, bucketName, prefix, maxMessages)
    if (batches.isEmpty) return 0L
    val keys = batches.flatMap(_.changes).distinct
    val current = refetch(spark, keys, mkStore).cache()
    val present = current.select("source_key").as[String].collect().toSet
    val removed = keys.filterNot(present)
    val n = Incremental.applyChangeStreamTo(spark, current,
      removed.toDF("source_key"), process, logicFp, connector, target,
      trackingPath)
    current.unpersist()
    batches.foreach(_.ack())
    n
  }
}
