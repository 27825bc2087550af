package graft.sinks

/** Bounded in-process recording log backing the statement/request
  * recording seams ([[RecordingCypherSession]], [[RecordingQdrantApi]]):
  * drop-oldest past `max`, with the evicted count kept so truncation
  * is visible. Single-JVM by design — the recording tier's scope. */
final class BoundedRecordingLog[T](max: Int) {
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[T]()
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)
  private val nDropped = new java.util.concurrent.atomic.AtomicLong(0L)

  def add(t: T): Unit = {
    q.add(t)
    if (n.incrementAndGet() > max && q.poll() != null) {
      n.decrementAndGet()
      nDropped.incrementAndGet()
    }
  }

  def items: Seq[T] = {
    import scala.jdk.CollectionConverters._
    q.asScala.toSeq
  }
  def dropped: Long = nDropped.get()
  def clear(): Unit = { q.clear(); n.set(0); nDropped.set(0L) }
}

object BoundedRecordingLog {
  /** Named-log registry: one bounded log per id, created on demand. */
  def registry[T](max: Int): String => BoundedRecordingLog[T] = {
    val m = new java.util.concurrent.ConcurrentHashMap[String, BoundedRecordingLog[T]]()
    id => m.computeIfAbsent(id, _ => new BoundedRecordingLog[T](max))
  }
}
