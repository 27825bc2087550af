package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.SetupDriver
import graft.incremental.SetupDriver.{Declaration, DeclarationAction}

class HeadingBlocksSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import org.apache.spark.sql.Row
  import graft.functions.HeadingBlocks.headingBlocksOf
  import spark.implicits._

  private def blocks(text: String): Seq[(Option[String], String)] =
    Seq(text).toDF("t").select(headingBlocksOf($"t").as("b"))
      .collect().head.getSeq[Row](0)
      .map(r => (Option(r.getString(0)), r.getString(1)))

  test("preamble merges into the first heading block") {
    assert(blocks("pre\n# A\nbody1\n## B\nbody2") === Seq(
      (Some("# A"), "pre\n\nbody1"), (Some("## B"), "body2")))
    // preamble with an empty first body stands alone as the body
    assert(blocks("pre only\n# H") === Seq((Some("# H"), "pre only")))
  }

  test("no headings, blank text, heading-only, over-deep hashes") {
    assert(blocks("no headings here") === Seq((None, "no headings here")))
    assert(blocks("   \n  ") === Seq.empty)
    assert(blocks("# only heading") === Seq((Some("# only heading"), "")))
    // 7+ hashes is not a markdown heading (reference regex #{1,6})
    assert(blocks("####### seven\nbody") ===
      Seq((None, "####### seven\nbody")))
  }

  test("heading line is trimmed and body runs to the next heading") {
    assert(blocks("# A  \nline1\nline2\n###### deep\nend") === Seq(
      (Some("# A"), "line1\nline2"), (Some("###### deep"), "end")))
  }

  test("heading-aware two-tier chunks never straddle a section") {
    import org.apache.spark.sql.functions._
    import graft.operators.TwoTier
    val words = (1 to 60).map(i => s"w$i").mkString(" ")
    val md = s"intro words\n# Alpha\n$words\n## Beta\nshort section"
    val df = Seq((7L, md)).toDF("doc_id", "text")
    val got = TwoTier.chunkHeadingAware(df, "doc_id", "text",
      pageTokens = 20, pageOverlap = 5, childTokens = 10)
    val byBlock = got.select($"block_index", $"heading", $"chunk_text")
      .collect().groupBy(_.getInt(0))
    // two blocks, each chunked independently with its heading carried
    assert(byBlock.keySet === Set(0, 1))
    assert(byBlock(0).forall(_.getString(1) == "# Alpha"))
    assert(byBlock(1).forall(_.getString(1) == "## Beta"))
    // the preamble landed in block 0's first chunk, not a block of its own
    assert(byBlock(0).map(_.getString(2)).exists(_.startsWith("intro words")))
    // block 1 is short: exactly one chunk, no Alpha tokens leaked in
    assert(byBlock(1).map(_.getString(2)).toSeq === Seq("short section"))
  }
}

class MultiProbeLshSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import graft.operators.SimilaritySearch
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-probe is a superset of exact-bucket candidates with better recall") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = pairs(SimilaritySearch.lshCosineCandidates(
      emb, "vec_id", "embedding", 64, 8))
    val probed = pairs(SimilaritySearch.lshCosineCandidatesMultiProbe(
      emb, "vec_id", "embedding", 64, 8))
    assert(exact.subsetOf(probed))
    assert(probed.size > exact.size) // distance-1 probes really add pairs
    // recall against the true near-dup set (cosine >= 0.4)
    val truth = pairs(graft.operators.Dedup.embeddingNearDup(
      emb, "vec_id", "embedding", 0.4).select("id_a", "id_b"))
    val rExact = truth.intersect(exact).size.toDouble / truth.size
    val rProbed = truth.intersect(probed).size.toDouble / truth.size
    assert(rProbed > rExact)
  }
}

class AudioSegmentSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import graft.multimodal.Multimodal
  import spark.implicits._

  test("u8 PCM: hop-spaced windows, truncated tail, centered rms") {
    // 10 samples at 1000 Hz: window 4 ms (4 samples), hop 3 ms
    val payload: Array[Byte] = Array(128, 128, 128, 128, 130, 126, 130, 126,
      129, 127).map(_.toByte)
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val segs = Multimodal.segmentAudio(media, 1000, 1, 4, 3, 2)
      .collect().sortBy(_.segment_index)
    assert(segs.map(s => (s.segment_index, s.start_ms, s.end_ms, s.n_bytes)).toSeq
      === Seq((0, 0L, 4L, 4), (1, 3L, 7L, 4), (2, 6L, 10L, 4), (3, 9L, 10L, 1)))
    assert(segs(0).rms === 0.0) // silence: all samples at the 128 center
    assert(segs(1).rms === math.sqrt(3.0)) // samples 128,130,126,130 → 0,±2
    assert(segs.forall(_.features.length == 2))
  }

  test("s16le PCM interprets two-byte samples") {
    // two samples: +256, -256 (little-endian)
    val payload: Array[Byte] = Array(0x00, 0x01, 0x00, 0xFF).map(_.toByte)
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val segs = Multimodal.segmentAudio(media, 1000, 2, 2, 2, 2).collect()
    assert(segs.length === 1)
    assert(segs.head.n_bytes === 4)
    assert(segs.head.rms === 256.0)
  }

  test("empty payload yields no segments") {
    val media = Seq((1L, Array.empty[Byte])).toDF("media_id", "payload")
    assert(Multimodal.segmentAudio(media, 8000, 1, 8, 6, 4).count() === 0)
  }
}

class FiltersSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import org.apache.spark.sql.functions._
  import graft.operators.Filters
  import graft.operators.Filters.{MatchAny, MatchValue}
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "en", "src1", """{"category":"manual","level":2}"""),
    (2L, "en", "src2", """{"category":"faq","level":1}"""),
    (3L, "de", "src1", """{"category":"manual","level":2}"""),
    (4L, "en", "src9", """{"category":"manual","level":3}"""))
    .toDF("id", "lang", "source", "payload")

  test("MatchValue + MatchAny AND-compose like qdrant must filters") {
    val got = Filters(df, Seq(
      MatchValue("lang", "en"), MatchAny("source", Seq("src1", "src2"))))
      .select($"id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("dot-notation keys reach into a JSON payload column") {
    val got = Filters(df, Seq(
      MatchValue("payload.category", "manual"),
      MatchAny("payload.level", Seq(2, 3))))
      .select($"id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 3L, 4L))
  }

  test("payload root resolves case-insensitively, like Spark's resolver") {
    val got = Filters(df, Seq(MatchValue("Payload.category", "faq")))
      .select($"id").as[Long].collect()
    assert(got.toSeq === Seq(2L))
  }

  test("dot-notation keys resolve into nested struct columns") {
    val nested = df.select($"id",
      struct($"lang", $"source").as("meta"))
    val got = Filters(nested, Seq(MatchValue("meta.lang", "de")))
      .select($"id").as[Long].collect()
    assert(got.toSeq === Seq(3L))
  }

  test("empty filter list keeps every row; struct filters push down") {
    assert(Filters(df, Nil).count() === 4)
    val dir = Files.createTempDirectory("flt").toString + "/t"
    df.write.parquet(dir)
    val filtered = Filters(spark.read.parquet(dir),
      Seq(MatchValue("lang", "en")))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lang"),
      s"filter not pushed:\n$plan")
  }
}

class ProgressTrackerSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("listener records start, per-batch progress, and termination") {
    import org.apache.spark.sql.functions._
    import graft.streaming.ProgressTracker
    val tracker = ProgressTracker.attach(spark)
    try {
      val dir = Files.createTempDirectory("prog")
      val in = dir.toString + "/in"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      import spark.implicits._
      Seq(1L, 2L, 3L).toDF("v").coalesce(1).write.mode("append").parquet(in)
      val q = spark.readStream.schema("v LONG").parquet(in)
        .withColumn("v2", col("v") * 2)
        .writeStream.format("noop").queryName("graft_progress_probe")
        .option("checkpointLocation", dir.toString + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // listener events are asynchronous; wait for the terminal row
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!tracker.snapshot.exists(_.state == "finished") &&
        System.nanoTime() < deadline) Thread.sleep(50)
      val states = tracker.snapshot.filter(p =>
        p.queryId == q.id.toString).map(_.state)
      assert(states.contains("started"))
      assert(states.contains("finished"))
      val running = tracker.snapshot.filter(p =>
        p.queryId == q.id.toString && p.state == "running")
      assert(running.map(_.numInputRows).sum === 3L)
      assert(running.forall(_.name == "graft_progress_probe"))
      // the processing_jobs analogue is a queryable frame
      assert(tracker.progressFrame(spark).where(col("state") === "running")
        .count() >= 1)
    } finally ProgressTracker.detach(spark, tracker)
  }

  test("progress ring is bounded: oldest rows drop past maxRows") {
    import graft.streaming.ProgressTracker
    val t = new ProgressTracker(maxRows = 5)
    val ev = (1 to 12).map { i =>
      new org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent(
        java.util.UUID.randomUUID(), java.util.UUID.randomUUID(), None)
    }
    ev.foreach(t.onQueryTerminated)
    val snap = t.snapshot
    assert(snap.size === 5)
    assert(snap.map(_.queryId) === ev.takeRight(5).map(_.id.toString))
  }
}

class TargetConnectorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._
  import graft.sinks.{JdbcConnector, TargetConnector, TargetRegistry}
  import graft.incremental.SetupDriver
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private val url = s"jdbc:derby:memory:graftconn${System.nanoTime()};create=true"

  /** A user-defined store: rows live in a driver-side map — exactly
    * the shape of a custom connector plugging a bespoke service into
    * the export path. */
  object MemoryConnector extends TargetConnector {
    val store = scala.collection.concurrent.TrieMap
      .empty[String, Map[Seq[Any], Seq[Any]]]
    override def kind = "memory"
    override def applySetup(s: org.apache.spark.sql.SparkSession, target: String,
        desired: StructType, allowRecreate: Boolean) = {
      store.putIfAbsent(target, Map.empty)
      SetupDriver.SetupResult(SetupDriver.Compatible, "created")
    }
    override def applyMutation(s: org.apache.spark.sql.SparkSession,
        target: String, rows: org.apache.spark.sql.DataFrame,
        primaryKey: Seq[String], deletes: Option[org.apache.spark.sql.DataFrame]) = {
      val ki = primaryKey.map(rows.schema.fieldIndex)
      val up = rows.collect().map(r => ki.map(r.get) -> r.toSeq).toMap
      val dels = deletes.toSeq.flatMap(_.collect().map(_.toSeq))
      store(target) = (store.getOrElse(target, Map.empty) ++ up) -- dels
    }
    override def read(s: org.apache.spark.sql.SparkSession, target: String) = None
  }

  test("a custom connector registers and receives flow exports") {
    TargetRegistry.register(MemoryConnector)
    assert(TargetRegistry.registered.contains("memory"))
    val flow = graft.dataflow.Flow(spark)
    flow.importSource(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")
      .collect("out", Seq("id" -> col("id"), "v" -> col("v")))
    flow.exportTo("out", "memory", "t1", Seq("id"))
    assert(MemoryConnector.store("t1") === Map(
      Seq(1L) -> Seq(1L, "a"), Seq(2L) -> Seq(2L, "b")))
    // upsert semantics on re-export
    MemoryConnector.applyMutation(spark, "t1",
      Seq((2L, "b2")).toDF("id", "v"), Seq("id"),
      Some(Seq(Tuple1(1L)).toDF("id")))
    assert(MemoryConnector.store("t1") === Map(Seq(2L) -> Seq(2L, "b2")))
    intercept[IllegalArgumentException] { TargetRegistry("no-such-kind") }
  }

  test("jdbc connector: setup create/noop/evolve/recreate against live metadata") {
    val conn = JdbcConnector(url)
    val v1 = StructType(Seq(StructField("id", LongType),
      StructField("payload", StringType)))
    assert(conn.applySetup(spark, "conn_t", v1).action === "created")
    assert(conn.applySetup(spark, "conn_t", v1).action === "noop")
    // add a column, keep data
    conn.applyMutation(spark, "conn_t",
      Seq((1L, "a")).toDF("id", "payload"), Seq("id"), None)
    val v2 = StructType(v1.fields :+ StructField("score", DoubleType))
    assert(conn.applySetup(spark, "conn_t", v2).action === "evolved")
    val rows = conn.read(spark, "conn_t").get.collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a")))
    assert(conn.read(spark, "conn_t").get.schema.fieldNames.map(_.toLowerCase)
      .contains("score"))
    // type change: refused without allowRecreate, applied with it
    val v3 = StructType(Seq(StructField("id", LongType),
      StructField("payload", LongType), StructField("score", DoubleType)))
    intercept[IllegalStateException] { conn.applySetup(spark, "conn_t", v3) }
    assert(conn.applySetup(spark, "conn_t", v3, allowRecreate = true)
      .action === "recreated")
    assert(conn.read(spark, "conn_t").get.count() === 0)
  }

  test("parquet connector round-trips through the shared contract") {
    val dir = Files.createTempDirectory("conn").toString + "/t"
    val c = TargetRegistry("parquet")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    assert(c.applySetup(spark, dir, schema).action === "created")
    c.applyMutation(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      Seq("id"), None)
    c.applyMutation(spark, dir, Seq((2L, "b2")).toDF("id", "v"),
      Seq("id"), Some(Seq(Tuple1(1L)).toDF("id")))
    val got = c.read(spark, dir).get.as[(Long, String)].collect().toSet
    assert(got === Set((2L, "b2")))
  }
}

class HyperplaneSigSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  // HOF twin of NativeVector.hyperplaneSigOf — the formulation the
  // q26/q72 DuckDB oracles mirror (dyadic-rational LCG planes,
  // sequential left fold). Test-only since the native expression
  // replaced it on the hot path.
  private def hofHyperplaneSignature(vec: org.apache.spark.sql.Column,
      dim: Int, nBits: Int) = {
    val bits = (0 until nBits).map { b =>
      val w = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, d) => x.cast("double") *
            (((lit(1103515245L) * (lit(b.toLong * dim) + d.cast("long")) + lit(12345L))
              % lit(2147483648L)) % lit(2001L) - lit(1000L)).cast("double") / lit(1024.0)),
        lit(0.0), (acc, v) => acc + v)
      when(w >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  test("native signature is bit-identical to the HOF twin") {
    import graft.functions.NativeVector
    // deterministic pseudo-random float vectors, plus edge cases the
    // HOF maps to the all-zeros signature: short vector, long vector,
    // null element, null vector
    val vecs: Seq[(Long, Option[Seq[Option[Float]]])] =
      (1L to 50L).map { i =>
        i -> Option((0 until 8).map(d =>
          Option(((i * 31 + d * 17) % 23 - 11).toFloat / 7f)))
      } ++ Seq(
        100L -> Option(Seq(Option(1f), Option(2f))),
        101L -> Option((0 until 12).map(d => Option(d.toFloat))),
        102L -> Option(Seq(Option(1f), None) ++ (2 until 8).map(d => Option(d.toFloat))),
        103L -> None,
        // NaN projection: SQL NaN ordering makes `w >= 0` true → all-ones
        104L -> Option(Option(Float.NaN) +: (1 until 8).map(d => Option(d.toFloat))),
        105L -> Option(Option(Float.PositiveInfinity) +: (1 until 8).map(d => Option(d.toFloat))))
    val df = vecs.toDF("id", "vec")
    val both = df.select(
      NativeVector.hyperplaneSigOf($"vec", 8, 12).as("native"),
      hofHyperplaneSignature($"vec", 8, 12).as("hof"))
    assert(both.where($"native" =!= $"hof" ||
      $"native".isNull =!= $"hof".isNull).count() === 0)
    // degenerate inputs really take the all-zeros branch
    val z = df.where($"id".between(100L, 103L))
      .select(NativeVector.hyperplaneSigOf($"vec", 8, 12)).as[String].collect()
    assert(z.forall(_ === "0" * 12))
    // NaN really takes the all-ones branch on both sides
    val nan = df.where($"id" === 104L)
      .select(NativeVector.hyperplaneSigOf($"vec", 8, 12)).as[String].head()
    assert(nan === "1" * 12)
  }
}

class DeclarationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tmp() = Files.createTempDirectory("decl").toString + "/state"

  test("declarations round-trip through setup diffing") {
    val path = tmp()
    val nodes = Declaration("PropertyGraph", "Entity", Seq("entity_id"),
      Seq("embedding_ivf"))
    val chunks = Declaration("Parquet", "chunks", Seq("chunk_id"))

    // first apply: everything created
    val a1 = SetupDriver.applyDeclarations(spark, path, Seq(nodes, chunks))
    assert(a1.toSet === Set(
      DeclarationAction("PropertyGraph/Entity", "created"),
      DeclarationAction("Parquet/chunks", "created")))

    // idempotent: same desired state is all-noop
    val a2 = SetupDriver.applyDeclarations(spark, path, Seq(nodes, chunks))
    assert(a2.forall(_.action == "noop"))

    // index change on one, removal of the other
    val evolved = nodes.copy(indexes = Seq("embedding_ivf", "name_btree"))
    val a3 = SetupDriver.applyDeclarations(spark, path, Seq(evolved))
    assert(a3.toSet === Set(
      DeclarationAction("PropertyGraph/Entity", "updated"),
      DeclarationAction("Parquet/chunks", "dropped")))

    // tracked state reflects the last apply exactly
    assert(SetupDriver.declaredState(spark, path) === Seq(evolved))
  }

  test("duplicate declaration keys are rejected") {
    val d = Declaration("Parquet", "t", Seq("id"))
    intercept[IllegalArgumentException] {
      SetupDriver.applyDeclarations(spark, tmp(), Seq(d, d.copy(primaryKey = Seq("x"))))
    }
  }

  test("security access filter reaches the parquet scan as a pushed filter") {
    import org.apache.spark.sql.functions._
    import graft.operators.Security
    import spark.implicits._
    val dir = Files.createTempDirectory("sec").toString + "/docs"
    val docs = Seq((1L, "public"), (2L, "client"), (3L, "employee"),
      (4L, "management"), (5L, "mystery")).toDF("doc_id", "security_level")
    Security.tag(docs, "security_level").write.parquet(dir)
    val visible = Security.accessibleTo(
      spark.read.parquet(dir).select(col("doc_id"), col("access_level")), 3)
    // hierarchy: level-3 user sees public+client+partner, default(4) hidden
    assert(visible.select("doc_id").as[Long].collect().sorted === Array(1L, 2L))
    // the filter must reach the scan (row-group pruning at scale)
    val plan = visible.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.replaceAll("\\s", "").contains("LessThanOrEqual(access_level,3)"),
      s"access filter not pushed:\n$plan")
  }

  test("unknown security level fails closed to employee, never public") {
    import org.apache.spark.sql.functions._
    import graft.operators.Security
    import spark.implicits._
    val lvl = Seq("nonsense").toDF("security_level")
      .select(Security.accessLevelFor(col("security_level")))
      .as[Int].head()
    assert(lvl === Security.DefaultAccessLevel && lvl > 1)
  }

  test("flow accumulates declarations and applies them") {
    import graft.dataflow.Flow
    val path = tmp()
    val flow = Flow(spark)
      .declare(Declaration("PropertyGraph", "Document", Seq("doc_id")))
      .declare(Declaration("PropertyGraph", "Entity", Seq("entity_id")))
    assert(flow.declarations.map(_.name) === Seq("Document", "Entity"))
    val actions = flow.applyDeclarations(path)
    assert(actions.forall(_.action == "created"))
    assert(flow.applyDeclarations(path).forall(_.action == "noop"))
  }
}
