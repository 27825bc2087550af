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

  /** Exponential-backoff retry for external-service calls
    * (app/utils/retry.py:24-114: tenacity-style decorator + the
    * explicit async wrapper, backoff_factor 2.0 from initial_wait,
    * capped at max_wait). Non-retryable failures (per `retryable`)
    * and the final attempt's failure propagate unchanged. `sleep` is
    * injectable so specs can record the schedule instead of waiting.
    *
    * Compose with [[batchedAsync]] by wrapping the batch fn:
    * `batchedAsync(it, bs, mc)(b => withRetry()(client.call(b)))` —
    * retries then happen per batch inside the concurrency window,
    * which is where the reference's embed/LLM clients retry. */
  def withRetry[R](maxAttempts: Int = 3, initialWaitMillis: Long = 1000,
      backoffFactor: Double = 2.0, maxWaitMillis: Long = 60000,
      retryable: Throwable => Boolean = _ => true,
      sleep: Long => Unit = Thread.sleep)(f: => R): R = {
    require(maxAttempts >= 1)
    var attempt = 1
    var wait = initialWaitMillis.toDouble
    var done = false
    var result: R = null.asInstanceOf[R] // done-flag guards the read
    while (!done) {
      try { result = f; done = true }
      catch {
        // NonFatal first: OOM / InterruptedException / LinkageError
        // must propagate immediately, never sleep-and-retry
        case scala.util.control.NonFatal(e)
            if retryable(e) && attempt < maxAttempts =>
          sleep(math.min(wait, maxWaitMillis.toDouble).toLong)
          wait *= backoffFactor
          attempt += 1
      }
    }
    result
  }
}
