package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcConnector

/** Round-7 additions: destructive-change gating on the JDBC setup
  * path (column drops are data loss in a live store, so they are
  * gated exactly like recreate). */
class JdbcDropGatingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val url = s"jdbc:derby:memory:dropgate;create=true"

  test("column drops are gated behind allowRecreate and reported") {
    val conn = JdbcConnector(url)
    val v1 = StructType(Seq(StructField("id", LongType),
      StructField("payload", StringType), StructField("extra", StringType)))
    assert(conn.applySetup(spark, "gate_t", v1).action === "created")
    conn.applyMutation(spark, "gate_t",
      Seq((1L, "a", "x")).toDF("id", "payload", "extra"), Seq("id"), None)

    // ungated: the narrowing setup keeps (and reports) the extra
    // column — no silent data loss
    val v2 = StructType(Seq(StructField("id", LongType),
      StructField("payload", StringType)))
    val kept = conn.applySetup(spark, "gate_t", v2)
    assert(kept.action ===
      "evolved (kept extra columns: extra; dropping requires allowRecreate)")
    val live = conn.read(spark, "gate_t").get
    assert(live.schema.fieldNames.map(_.toLowerCase).contains("extra"))
    assert(live.count() === 1)

    // gated: the drop applies and is reported
    val dropped = conn.applySetup(spark, "gate_t", v2, allowRecreate = true)
    assert(dropped.action === "evolved (dropped columns: extra)")
    val after = conn.read(spark, "gate_t").get
    assert(!after.schema.fieldNames.map(_.toLowerCase).contains("extra"))
    assert(after.select("id").as[Long].collect().toSeq === Seq(1L))
  }
}

/** Line-ending parity for the heading-block split: CRLF and lone-\r
  * documents split identically to their LF twins (Python splitlines
  * semantics), instead of gluing a \r-terminated heading to its body. */
class HeadingBlocksCrlfSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.functions.HeadingBlocks

  private def blocks(text: String): Seq[(String, String)] =
    Seq(Tuple1(text)).toDF("t")
      .select(HeadingBlocks.headingBlocksOf(col("t")).as("b"))
      .selectExpr("inline(b)")
      .as[(String, String)].collect().toSeq

  test("CRLF and lone-CR documents split like their LF twin") {
    val lf = "intro\n# One\nbody a\nbody b\n# Two\nbody c"
    val want = blocks(lf)
    assert(want === Seq(
      ("# One", "intro\n\nbody a\nbody b"),
      ("# Two", "body c")))
    assert(blocks(lf.replace("\n", "\r\n")) === want)
    assert(blocks(lf.replace("\n", "\r")) === want)
    // CRLF bodies re-join with \n (no \r retained anywhere)
    assert(want.forall { case (h, b) => !h.contains('\r') && !b.contains('\r') })
  }
}

/** In-memory SQS twin: receive is non-destructive (at-least-once);
  * only delete removes a message. */
final class FixtureSqsQueue extends graft.sources.SqsQueueClient {
  private val q = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)
  def enqueue(body: String): Unit = {
    val r = s"r${n.incrementAndGet()}"
    q.put(r, body); order.add(r)
  }
  override def receive(maxMessages: Int): Seq[graft.sources.SqsMessage] = {
    import scala.jdk.CollectionConverters._
    order.asScala.filter(q.containsKey).take(maxMessages)
      .map(r => graft.sources.SqsMessage(r, q.get(r))).toSeq
  }
  override def delete(receiptHandle: String): Unit = q.remove(receiptHandle)
  def size: Int = q.size
}

/** In-memory object store keyed through a static map so executor
  * threads in local mode see test mutations. */
object FixtureS3Store {
  val objects = new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()
}
final case class FixtureS3Store() extends graft.sources.S3ObjectStore {
  override def get(key: String): Option[(Long, String)] =
    Option(FixtureS3Store.objects.get(key))
}

class S3EventQueueSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  import graft.sources.S3EventQueue

  private def body(events: (String, String, String)*): String =
    """{"Records":[""" + events.map { case (name, bucket, key) =>
      s"""{"eventName":"$name","s3":{"bucket":{"name":"$bucket"},"object":{"key":"$key"}}}"""
    }.mkString(",") + "]}"

  test("poll filters bucket/prefix/event, decodes form-encoded keys, acks per relevance") {
    val q = new FixtureSqsQueue
    q.enqueue(body(("ObjectCreated:Put", "corpus", "inbox/a+b%2Bc.txt"),
      ("ObjectRemoved:Delete", "corpus", "inbox/old.txt"),
      ("ObjectCreated:Put", "elsewhere", "inbox/skip-bucket.txt"),
      ("ObjectCreated:Put", "corpus", "tmp/skip-prefix.txt"),
      ("ObjectAccessed:Get", "corpus", "inbox/skip-event.txt")))
    q.enqueue(body(("ObjectAccessed:Get", "corpus", "inbox/only-irrelevant.txt")))
    q.enqueue("""{"Event":"s3:TestEvent"}""") // valid JSON, no Records: benign
    q.enqueue("""{"Records":[{"eventName":""") // NOT valid JSON
    val batches = S3EventQueue.poll(spark, q, "corpus", Some("inbox/"))
    // messages 2 and 3 had nothing relevant: acked immediately; the
    // malformed message 4 is NOT acked (left for redelivery, never
    // silently dropped) and yields no batch
    assert(q.size === 2)
    assert(batches.size === 1)
    // + and %2B decode per form-url rules; filtered keys never surface
    assert(batches.head.changes === Seq("inbox/a b+c.txt", "inbox/old.txt"))
    batches.head.ack()
    assert(q.size === 1) // only the malformed message remains visible
  }

  test("poll refuses unbounded batches instead of ballooning the driver") {
    // a maxMessages beyond the documented cap fails before any receive
    val q = new FixtureSqsQueue
    val tooBig = intercept[IllegalArgumentException] {
      S3EventQueue.poll(spark, q, "corpus", None,
        maxMessages = S3EventQueue.MaxPollBatch + 1)
    }
    assert(tooBig.getMessage.contains("maxMessages"))
    // a client that hands back MORE than asked (firehose replay shape)
    // fails loudly instead of silently collecting it all
    val firehose = new graft.sources.SqsQueueClient {
      override def receive(maxMessages: Int) =
        (1 to maxMessages + 5).map(i =>
          graft.sources.SqsMessage(s"r$i", body(
            ("ObjectCreated:Put", "corpus", s"inbox/f$i.txt"))))
      override def delete(receiptHandle: String): Unit = ()
    }
    val overCap = intercept[IllegalArgumentException] {
      S3EventQueue.poll(spark, firehose, "corpus", None)
    }
    assert(overCap.getMessage.contains("refusing to collect"))
  }

  test("consume reprocesses exactly the queued keys; removals clean target keys") {
    import graft.incremental.Incremental
    import graft.sinks.ParquetConnector
    val tmp = java.nio.file.Files.createTempDirectory("sqs").toString
    val (sink, track) = (s"$tmp/out", s"$tmp/tracking")
    def process(delta: DataFrame): DataFrame =
      delta.select(col("source_key"),
        concat_ws("#", col("source_key"), lit("t")).as("target_key"),
        upper(col("content")).as("content"))

    // seed the store + initial full sync of 4 keys
    FixtureS3Store.objects.clear()
    Seq("inbox/a" -> "alpha", "inbox/b" -> "bravo",
      "inbox/c" -> "charlie", "inbox/d" -> "delta")
      .foreach { case (k, v) => FixtureS3Store.objects.put(k, (100L, v)) }
    val s0 = S3EventQueue.refetch(spark,
      Seq("inbox/a", "inbox/b", "inbox/c", "inbox/d"), () => FixtureS3Store())
    Incremental.syncSource(spark, s0, process, "v1", sink, track)
    assert(spark.read.parquet(sink).count() === 4)

    // a edited, b removed, c touched with UNCHANGED content, d silent
    FixtureS3Store.objects.put("inbox/a", (200L, "alpha2"))
    FixtureS3Store.objects.remove("inbox/b")
    FixtureS3Store.objects.put("inbox/c", (200L, "charlie"))
    val q = new FixtureSqsQueue
    q.enqueue(body(("ObjectCreated:Put", "corpus", "inbox/a"),
      ("ObjectRemoved:Delete", "corpus", "inbox/b"),
      ("ObjectCreated:Put", "corpus", "inbox/c")))
    val n = S3EventQueue.consume(spark, q, "corpus", Some("inbox/"),
      () => FixtureS3Store(), process, "v1", ParquetConnector, sink, track)
    assert(n === 1) // only a re-evaluated: c skipped by content hash, d untouched
    assert(q.size === 0) // acked after processing
    val out = spark.read.parquet(sink)
      .select($"target_key", $"content").as[(String, String)].collect().toMap
    assert(out === Map("inbox/a#t" -> "ALPHA2", "inbox/c#t" -> "CHARLIE",
      "inbox/d#t" -> "DELTA")) // b's target key removed
    val tracking = spark.read.parquet(track)
    assert(tracking.where($"source_key" === "inbox/b").count() === 0)
    assert(tracking.where($"source_key" === "inbox/c")
      .select($"ordinal").as[Long].head() === 200L) // touch bumped ordinal
  }
}

class QdrantSinkSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.sinks.{QdrantConnector, QdrantPoints, QdrantRequest, RecordingQdrantApi}
  import graft.sinks.QdrantPoints.VectorField

  test("collection setup renders named vector params") {
    val req = QdrantPoints.createCollectionRequest("chunks",
      Seq(VectorField("emb", 4), VectorField("colpali", 2, "Dot")))
    assert(req === QdrantRequest("PUT", "/collections/chunks",
      """{"vectors":{"emb":{"size":4,"distance":"Cosine"},"colpali":{"size":2,"distance":"Dot"}}}"""))
    assert(QdrantPoints.deleteCollectionRequest("chunks") ===
      QdrantRequest("DELETE", "/collections/chunks", ""))
  }

  test("points render typed ids, named vectors, and payload; nulls drop") {
    val rows = Seq(
      (7L, Some(Seq(1.0f, 2.0f)), Some("alpha"), Some(0.5)),
      (8L, None, None, Some(1.0)))
      .toDF("chunk_id", "emb", "text", "score")
    val pts = QdrantPoints.renderPoints(rows, "chunk_id", Seq("emb"))
      .as[String].collect().toSeq.sorted
    // integer id stays a number; null vector/payload fields drop like
    // the reference's is_null skip
    assert(pts === Seq(
      """{"id":7,"vector":{"emb":[1.0,2.0]},"payload":{"text":"alpha","score":0.5}}""",
      """{"id":8,"vector":{},"payload":{"score":1.0}}""").sorted)
    val strPts = QdrantPoints.renderPoints(
      Seq(("k1", 1.5)).toDF("key", "v"), "key", Nil).as[String].collect()
    assert(strPts.toSeq === Seq("""{"id":"k1","payload":{"v":1.5}}"""))
  }

  test("connector drives setup + batched upserts + deletes through the API") {
    import graft.sinks.TargetRegistry
    assert(TargetRegistry.registered.contains("qdrant"))
    val logId = "qdrant-spec-" + System.nanoTime()
    val c = QdrantConnector(() => RecordingQdrantApi(logId), Seq(VectorField("emb", 2)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("chunk_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("emb",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val setup = c.applySetup(spark, "chunks", schema)
    assert(setup.action === "created collection with vectors: emb[2], Cosine")
    val rows = Seq((1L, Seq(1.0f, 0.0f), "keep"), (2L, Seq(0.0f, 1.0f), "gone"))
      .toDF("chunk_id", "emb", "text")
    c.applyMutation(spark, "chunks", rows, Seq("chunk_id"),
      Some(Seq(Tuple1(2L)).toDF("chunk_id")))
    val got = RecordingQdrantApi.requests(logId)
    assert(got.head.path === "/collections/chunks")
    val upserts = got.filter(_.path == "/collections/chunks/points?wait=true")
    assert(upserts.map(_.body).mkString === // delete won over the same-batch upsert
      """{"points":[{"id":1,"vector":{"emb":[1.0,0.0]},"payload":{"text":"keep"}}]}""")
    val dels = got.filter(_.path == "/collections/chunks/points/delete?wait=true")
    assert(dels.map(_.body) === Seq("""{"points":[2]}"""))
  }
}

class ReviewSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Review

  test("applyEdits stores the FIRST original; re-edit never overwrites it") {
    val chunks = Seq((1L, 0, "one"), (1L, 1, "two"), (2L, 0, "three"))
      .toDF("doc_id", "chunk_index", "chunk_text")
    val e1 = Seq((1L, 0, "one-v2")).toDF("doc_id", "chunk_index", "edited_text")
    val r1 = Review.applyEdits(chunks, Seq("doc_id", "chunk_index"), "chunk_text",
      e1, "edited_text")
    val row1 = r1.where($"doc_id" === 1 && $"chunk_index" === 0)
      .select($"chunk_text", $"original_text", $"is_edited")
      .as[(String, String, Boolean)].head()
    assert(row1 === (("one-v2", "one", true)))
    // untouched chunks: not edited, no original
    assert(r1.where(!$"is_edited").count() === 2)
    assert(r1.where(!$"is_edited" && $"original_text".isNotNull).count() === 0)
    // second edit on the already-edited frame: text moves on, original stays "one"
    val e2 = Seq((1L, 0, "one-v3")).toDF("doc_id", "chunk_index", "edited_text")
    val r2 = Review.applyEdits(r1, Seq("doc_id", "chunk_index"), "chunk_text",
      e2, "edited_text")
    val row2 = r2.where($"doc_id" === 1 && $"chunk_index" === 0)
      .select($"chunk_text", $"original_text", $"is_edited")
      .as[(String, String, Boolean)].head()
    assert(row2 === (("one-v3", "one", true)))
  }

  test("duplicate edits for one key collapse instead of fanning out rows") {
    val chunks = Seq((1L, 0, "one")).toDF("doc_id", "chunk_index", "chunk_text")
    val dup = Seq((1L, 0, "edit-a"), (1L, 0, "edit-b"))
      .toDF("doc_id", "chunk_index", "edited_text")
    val r = Review.applyEdits(chunks, Seq("doc_id", "chunk_index"), "chunk_text",
      dup, "edited_text")
    assert(r.count() === 1) // no join fan-out
    assert(r.select($"chunk_text").as[String].head() === "edit-b") // deterministic max
  }

  test("versionChains resolves roots, versions, and latest heads") {
    // chain 10 -> 11 -> 12 (parent points to the previous version),
    // plus a lone root 20
    val docs = Seq(
      (10L, None), (11L, Some(10L)), (12L, Some(11L)), (20L, None))
      .toDF("doc_id", "parent_document_id")
    val got = Review.versionChains(docs, "doc_id", "parent_document_id")
      .select($"doc_id", $"root_document_id", $"version", $"is_latest")
      .as[(Long, Long, Int, Boolean)].collect().toSet
    assert(got === Set(
      (10L, 10L, 1, false),
      (11L, 10L, 2, false),
      (12L, 10L, 3, true),
      (20L, 20L, 1, true)))
  }

  test("selectByConfidence picks max confidence, ties break on model name") {
    val df = Seq(
      (1L, "a1", Some(0.9), "b1", 0.7, "c1", Some(0.9)), // tie alpha/gamma -> name
      (2L, "a2", Some(0.1), "b2", 0.8, "c2", None))      // null conf ranks last
      .toDF("id", "alpha_output", "alpha_confidence", "beta_output",
        "beta_confidence", "gamma_output", "gamma_confidence")
    val got = Review.selectByConfidence(df, Seq("alpha", "beta", "gamma"))
      .select($"id", $"selected_model", $"selected_output", $"selected_confidence")
      .as[(Long, String, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === (("alpha", "a1", 0.9)))
    assert(got(2L) === (("beta", "b2", 0.8))) // null confidence ranks last
  }
}

class S3PollingLoopSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  import graft.incremental.Incremental
  import graft.sinks.ParquetConnector
  import graft.sources.S3EventQueue

  // The poll thread swap-rewrites the sink parquet concurrently with
  // the predicate's reads, so a read landing in the delete/move window
  // throws — treat that as "not yet" and retry, don't fail the test.
  private def awaitUntil(timeoutMs: Long)(cond: => Boolean): Boolean = {
    def check: Boolean = try cond catch { case _: Exception => false }
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (check) return true
      Thread.sleep(100)
    }
    check
  }

  test("polling loop applies queued changes and survives a failing round") {
    val tmp = java.nio.file.Files.createTempDirectory("sqspoll").toString
    val (sink, track) = (s"$tmp/out", s"$tmp/tracking")
    def process(delta: DataFrame): DataFrame =
      delta.select(col("source_key"),
        concat_ws("#", col("source_key"), lit("t")).as("target_key"),
        upper(col("content")).as("content"))

    FixtureS3Store.objects.clear()
    FixtureS3Store.objects.put("poll/a", (100L, "alpha"))
    val s0 = S3EventQueue.refetch(spark, Seq("poll/a"), () => FixtureS3Store())
    Incremental.syncSource(spark, s0, process, "v1", sink, track)

    val q = new FixtureSqsQueue
    val handle = S3EventQueue.startPolling(spark, q, "corpus", Some("poll/"),
      () => FixtureS3Store(), process, "v1", ParquetConnector, sink, track,
      intervalMillis = 100)
    try {
      // an edit lands on the queue -> the loop picks it up
      FixtureS3Store.objects.put("poll/a", (200L, "alpha2"))
      q.enqueue("""{"Records":[{"eventName":"ObjectCreated:Put","s3":{"bucket":{"name":"corpus"},"object":{"key":"poll/a"}}}]}""")
      assert(awaitUntil(30000) {
        spark.read.parquet(sink).where($"target_key" === "poll/a#t")
          .select($"content").as[String].collect().headOption.contains("ALPHA2")
      })
      // the sink write lands mid-round; the round counter ticks when
      // consume returns, so await it rather than asserting instantly
      assert(awaitUntil(10000)(handle.rounds >= 1L))
      assert(awaitUntil(10000)(q.size === 0)) // acked after processing
      // malformed message: the loop neither dies nor acks it
      q.enqueue("""{"Records":[{"eventName":""")
      assert(awaitUntil(10000)(handle.rounds >= 3L)) // keeps polling
      assert(q.size === 1)
    } finally handle.stop()
    // stopped: no further rounds accumulate
    val after = handle.rounds
    Thread.sleep(500)
    assert(handle.rounds === after)
  }
}

class KuzuSinkSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType, StructField, StructType}
  import graft.sinks.{CypherStatement, KuzuConnector, KuzuDdl, RecordingCypherSession}

  test("DDL renders schema-ful node/rel tables with the ownership tag") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("title", StringType),
      StructField("emb", ArrayType(FloatType))))
    assert(KuzuDdl.createNodeTable("Document", schema, Seq("doc_id")) ===
      "CREATE NODE TABLE IF NOT EXISTS Document (doc_id INT64, title STRING, " +
        "emb FLOAT[], __self_contained BOOL, PRIMARY KEY (doc_id));")
    assert(KuzuDdl.createRelTable("MENTIONS", "Document", "Entity",
      StructType(Seq(StructField("confidence", org.apache.spark.sql.types.DoubleType)))) ===
      "CREATE REL TABLE IF NOT EXISTS MENTIONS (FROM Document TO Entity, confidence DOUBLE);")
    assert(KuzuDdl.deleteOrphanedNodes("Entity") ===
      "MATCH (n:Entity) WITH n WHERE NOT (n)--() DELETE n;")
  }

  test("upserts inline typed literals with escaping; deletes untag then conditionally delete") {
    val rows = Seq((7L, "it's \"quoted\"", Seq(1.5f, 2.0f)))
      .toDF("doc_id", "title", "emb")
    val up = KuzuDdl.renderNodeUpserts(rows, "Document", Seq("doc_id"))
      .as[String].collect()
    // strings double-quote with escapes (kuzu.rs:292-313); floats bare
    assert(up.toSeq === Seq(
      """MERGE (n:Document {doc_id: 7}) SET n.__self_contained = true, """ +
        """n.title = "it's \"quoted\"", n.emb = [1.5, 2.0];"""))
    val del = KuzuDdl.renderNodeDeletes(
      Seq(Tuple1(7L)).toDF("doc_id"), "Document", Seq("doc_id"))
      .as[String].collect()
    // the per-key delete carries its own disconnected check; NO
    // table-wide sweep follows (that is setup-tier, rel drops only —
    // on a node-only export it would delete every node)
    assert(del.toSeq === Seq(
      "MATCH (n:Document {doc_id: 7}) SET n.__self_contained = NULL " +
        "WITH n WHERE NOT (n)--() DELETE n;"))
  }

  test("string array elements quote and escape; null elements render NULL") {
    val rows = Seq((1L, Seq(Some("alpha"), Some("be\"ta"), None)))
      .toDF("doc_id", "tags")
    val up = KuzuDdl.renderNodeUpserts(rows, "Document", Seq("doc_id"))
      .as[String].collect()
    assert(up.toSeq === Seq(
      """MERGE (n:Document {doc_id: 1}) SET n.__self_contained = true, """ +
        """n.tags = ["alpha", "be\"ta", NULL];"""))
  }

  test("timestamps render as TIMESTAMP literals") {
    val rows = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("doc_id", "ts")
    val up = KuzuDdl.renderNodeUpserts(rows, "Document", Seq("doc_id"))
      .as[String].collect()
    assert(up.toSeq === Seq(
      """MERGE (n:Document {doc_id: 1}) SET n.__self_contained = true, """ +
        """n.ts = TIMESTAMP("2024-01-01 12:00:00");"""))
  }

  test("connector drives DDL + upserts + per-key deletes; no table sweep") {
    import graft.sinks.TargetRegistry
    assert(TargetRegistry.registered.contains("kuzu"))
    val logId = "kuzu-spec-" + System.nanoTime()
    val c = KuzuConnector(() => RecordingCypherSession(logId), Seq("doc_id"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("title", StringType)))
    assert(c.applySetup(spark, "Document", schema).action === "created table")
    c.applyMutation(spark, "Document",
      Seq((1L, "keep"), (2L, "gone")).toDF("doc_id", "title"),
      Seq("doc_id"), Some(Seq(Tuple1(2L)).toDF("doc_id")))
    val got = RecordingCypherSession.statements(logId).map(_.cypher)
    assert(got.head.startsWith("CREATE NODE TABLE IF NOT EXISTS Document"))
    assert(got.count(_.startsWith("MERGE (n:Document")) === 1) // delete won
    assert(got.last.startsWith("MATCH (n:Document {doc_id: 2})"))
    // a disconnected-but-live node 1 must survive the delete of node 2
    assert(!got.exists(_ === KuzuDdl.deleteOrphanedNodes("Document")))
  }

  test("setup converges drift: noop, column evolve, gated drops, gated key recreate") {
    val logId = "kuzu-setup-" + System.nanoTime()
    val c = KuzuConnector(() => RecordingCypherSession(logId), Seq("doc_id"))
    val v1 = StructType(Seq(StructField("doc_id", LongType),
      StructField("title", StringType), StructField("extra", StringType)))
    assert(c.applySetup(spark, "Doc", v1).action === "created table")
    // identical re-setup: nothing to do, nothing rendered
    val before = RecordingCypherSession.statements(logId).size
    assert(c.applySetup(spark, "Doc", v1).action === "noop")
    assert(RecordingCypherSession.statements(logId).size === before)

    // value column retyped + narrowed schema: retype converges via
    // DROP IF EXISTS + ADD (kuzu.rs:268-282); the removed column is
    // KEPT without allowRecreate (data-loss gate, like JDBC)
    val v2 = StructType(Seq(StructField("doc_id", LongType),
      StructField("title", LongType)))
    val evolved = c.applySetup(spark, "Doc", v2)
    assert(evolved.action ===
      "evolved (upserted columns: title; kept extra columns: extra " +
        "(dropping requires allowRecreate))")
    val stmts = RecordingCypherSession.statements(logId).map(_.cypher)
    assert(stmts.contains("ALTER TABLE Doc DROP IF EXISTS title;"))
    assert(stmts.contains("ALTER TABLE Doc ADD title INT64;"))
    assert(!stmts.contains("ALTER TABLE Doc DROP IF EXISTS extra;"))
    // gated: the extra column drops
    assert(c.applySetup(spark, "Doc", v2, allowRecreate = true).action ===
      "evolved (dropped columns: extra)")
    assert(RecordingCypherSession.statements(logId).map(_.cypher)
      .contains("ALTER TABLE Doc DROP IF EXISTS extra;"))

    // key column retype: recreate, and only under allowRecreate
    val v3 = StructType(Seq(StructField("doc_id", StringType),
      StructField("title", LongType)))
    intercept[IllegalStateException](c.applySetup(spark, "Doc", v3))
    assert(c.applySetup(spark, "Doc", v3, allowRecreate = true).action ===
      "recreated table")
    val after = RecordingCypherSession.statements(logId).map(_.cypher)
    assert(after.contains("DROP TABLE IF EXISTS Doc;"))
    assert(after.last.startsWith("CREATE NODE TABLE IF NOT EXISTS Doc (doc_id STRING"))

    // key columns must exist in the exported schema — no silent
    // first-field fallback
    intercept[IllegalArgumentException](c.applySetup(spark, "Doc",
      StructType(Seq(StructField("title", StringType)))))
    RecordingCypherSession.clear(logId)
  }

  test("write-only session: ensure by default, drop+create only under allowRecreate") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    // no tableInfo override: the trait default (Unknown) — the seam
    // cannot diff, so allowRecreate is the caller's explicit authority
    val session = new graft.sinks.CypherSession {
      override def run(st: CypherStatement): Unit = seen += st.cypher
    }
    val c = KuzuConnector(() => session, Seq("doc_id"))
    val schema = StructType(Seq(StructField("doc_id", LongType)))
    assert(c.applySetup(spark, "Blind", schema).action ===
      "ensured table (write-only session: IF NOT EXISTS, drift undetectable)")
    assert(seen.toSeq.count(_.startsWith("DROP TABLE")) === 0)
    assert(c.applySetup(spark, "Blind", schema, allowRecreate = true).action ===
      "recreated table (write-only session: drift undetectable)")
    assert(seen.toSeq.takeRight(2).map(_.takeWhile(_ != ' ')) ===
      Seq("DROP", "CREATE"))
  }
}
