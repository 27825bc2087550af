package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Job/progress tracking, thin shim tier (reference job_tracker.py +
  * api/sse.py:1-228: processing_jobs rows with progress % streamed to
  * the UI; SURVEY §2.5 maps it to a StreamingQueryListener + progress
  * table, out of analytic scope).
  *
  * The listener turns Spark's own progress events into appendable
  * progress rows — the `processing_jobs` analogue. A UI tier would
  * stream `progressFrame` (or its changes) the way api/sse.py streams
  * job rows; analytics never read this table.
  */
final class ProgressTracker(maxRows: Int = ProgressTracker.DefaultMaxRows)
    extends StreamingQueryListener {
  import ProgressTracker.Progress

  // bounded ring: a continuous stream emits one row per micro-batch
  // forever — keep the newest maxRows instead of leaking driver heap
  // (the reference persists processing_jobs externally; this shim is
  // in-memory by design)
  private val rows = new ConcurrentLinkedQueue[Progress]()
  private val size = new java.util.concurrent.atomic.AtomicInteger(0)

  private def append(p: Progress): Unit = {
    rows.add(p)
    if (size.incrementAndGet() > maxRows) {
      rows.poll()
      size.decrementAndGet()
    }
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    append(Progress(e.id.toString, e.runId.toString,
      Option(e.name).getOrElse(""), -1L, 0L, e.timestamp, "started"))

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    append(Progress(p.id.toString, p.runId.toString,
      Option(p.name).getOrElse(""), p.batchId, p.numInputRows,
      p.timestamp, "running"))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    append(Progress(e.id.toString, e.runId.toString, "", -1L, 0L, "",
      e.exception.map(_ => "failed").getOrElse("finished")))

  def snapshot: Seq[Progress] = {
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq
  }

  /** The progress table (processing_jobs analogue). */
  def progressFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.toDF()
  }
}

object ProgressTracker {

  val DefaultMaxRows = 10000

  /** One processing_jobs-shaped progress row. */
  final case class Progress(queryId: String, runId: String, name: String,
      batchId: Long, numInputRows: Long, timestamp: String, state: String)

  /** Attach a tracker to the session's listener bus. */
  def attach(spark: SparkSession): ProgressTracker = {
    val t = new ProgressTracker
    spark.streams.addListener(t)
    t
  }

  def detach(spark: SparkSession, t: ProgressTracker): Unit =
    spark.streams.removeListener(t)
}
