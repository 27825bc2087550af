package graft.operators

import java.util.concurrent.{Callable, ExecutorService, Executors, Future => JFuture}

import scala.collection.mutable

/** Bounded-concurrency async batching for external-service calls
  * (reference: per-row async pipelining capped by `max_inflight_rows`
  * + the global concurrency controller, spec.rs:247-262 /
  * utils/concur_control.rs; batched embed calls
  * embedding_service.py:125-196).
  *
  * Spark's parallelism is partition-level; an LLM/embedding endpoint
  * wants many overlapping in-flight BATCHES per partition with a hard
  * cap. [[batchedAsync]] recreates that inside `mapPartitions`: up to
  * `maxConcurrent` batches in flight, submission windowed so at most
  * that many are pending, results emitted in input order (the
  * collector-order guarantees downstream ids rely on).
  */
object Throttle {

  def batchedAsync[T, R](it: Iterator[T], batchSize: Int, maxConcurrent: Int)(
      f: Seq[T] => Seq[R]): Iterator[R] = {
    require(batchSize > 0 && maxConcurrent > 0)
    // daemon threads: a caller outside a Spark task (driver-side or
    // plain unit use) that abandons the iterator mid-stream has no
    // completion hook — daemon workers keep an abandoned pool from
    // pinning the JVM either way
    val pool: ExecutorService = Executors.newFixedThreadPool(maxConcurrent,
      (r: Runnable) => {
        val t = new Thread(r, "graft-throttle")
        t.setDaemon(true)
        t
      })
    // a downstream limit() can abandon the iterator mid-partition —
    // tie pool shutdown to task completion so threads never leak
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
    val batches = it.grouped(batchSize)
    val inFlight = mutable.Queue.empty[JFuture[Seq[R]]]

    def refill(): Unit =
      while (inFlight.size < maxConcurrent && batches.hasNext) {
        val batch = batches.next()
        inFlight.enqueue(pool.submit(new Callable[Seq[R]] {
          override def call(): Seq[R] = f(batch)
        }))
      }

    new Iterator[Seq[R]] {
      override def hasNext: Boolean = {
        refill()
        val more = inFlight.nonEmpty
        if (!more) pool.shutdown()
        more
      }
      override def next(): Seq[R] = {
        refill()
        val head = inFlight.dequeue().get() // in-order emission
        refill() // keep the window full while the caller consumes
        head
      }
    }.flatten
  }
}
