package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.Flow
import graft.incremental.{Incremental, Memo, ParquetSink}

class FlowSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("import → transform → forEach → collect → export round-trip") {
    val tmp = Files.createTempDirectory("flow").toString
    val docs = Seq(
      (1L, "alpha beta. gamma delta."),
      (2L, "epsilon zeta.")).toDF("doc_id", "content")

    val flow = Flow(spark)
    flow.importSource(docs, "doc_id")
      .transform("sentences", split($"content", "\\. *"))
      .forEach("sentences", "sentence")
      .transform("n_chars", length($"sentence"))
      .collect("chunks", Seq(
        "doc_id" -> $"doc_id",
        "chunk_index" -> $"sentence_index",
        "text" -> $"sentence",
        "n_chars" -> $"n_chars"),
        autoUuidField = Some("chunk_uuid"))
    flow.export("chunks", s"$tmp/chunks", Seq("chunk_uuid"))

    val out = spark.read.parquet(s"$tmp/chunks")
    assert(out.columns.toSet === Set("chunk_uuid", "doc_id", "chunk_index", "text", "n_chars"))
    // doc1: "alpha beta", "gamma delta", ""; doc2: "epsilon zeta", ""
    val texts = out.select($"text").as[String].collect().toSet
    assert(texts.contains("alpha beta"))
    // stable UUID: re-running the flow produces identical ids
    val flow2 = Flow(spark)
    flow2.importSource(docs, "doc_id")
      .transform("sentences", split($"content", "\\. *"))
      .forEach("sentences", "sentence")
      .transform("n_chars", length($"sentence"))
      .collect("chunks", Seq(
        "doc_id" -> $"doc_id", "chunk_index" -> $"sentence_index",
        "text" -> $"sentence", "n_chars" -> $"n_chars"),
        autoUuidField = Some("chunk_uuid"))
    val ids1 = out.select($"chunk_uuid").as[String].collect().sorted
    val ids2 = flow2.collector("chunks").select($"chunk_uuid").as[String].collect().sorted
    assert(ids1.toSeq === ids2.toSeq)
  }

  test("r18 pass 9: stableUuid cannot collide on shifted nulls or " +
      "embedded separators (the Memo.fingerprint law)") {
    import graft.dataflow.Flow
    val rows = Seq(
      (Option("x"), Option.empty[String]),
      (Option.empty[String], Option("x")),
      (Option("ab"), Option("c")),
      (Option("a"), Option("bc")),
      (Option("x"), Option("x")))
      .toDF("f1", "f2")
    val ids = rows.select(Flow.stableUuid(col("f1"), col("f2")).as("id"))
      .as[String].collect()
    assert(ids.distinct.length === ids.length,
      s"uuid collision among distinct rows: ${ids.mkString(", ")}")
    // stability: the same content yields the same id across plans
    val again = rows.orderBy($"f1").select(
      Flow.stableUuid(col("f1"), col("f2")).as("id")).as[String].collect()
    assert(ids.sorted.toSeq === again.sorted.toSeq)
  }

  test("transform enforces write-once fields") {
    val docs = Seq((1L, "x")).toDF("doc_id", "content")
    val scope = Flow(spark).importSource(docs, "doc_id")
      .transform("f", lit(1))
    assertThrows[IllegalArgumentException](scope.transform("f", lit(2)))
  }

  test("importSource requires a key column") {
    assertThrows[IllegalArgumentException](
      Flow(spark).importSource(Seq(1).toDF("x"), "missing_key"))
  }
}

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** chunking "pipeline": doc → one target row per fixed chunk. */
  private def process(delta: DataFrame): DataFrame =
    operators.Chunker.fixed(delta, "content", 10, 2)
      .select(col("source_key"),
        concat_ws("#", col("source_key"), col("chunk_index")).as("target_key"),
        col("chunk_text"))

  private def src(rows: (String, Long, String)*): DataFrame =
    rows.toSeq.toDF("source_key", "ordinal", "content")
      .withColumn("content_hash", sha2(col("content"), 256))

  test("S0→S1: only added+edited evaluated; touch bumps ordinal; delete removes stale keys") {
    val tmp = Files.createTempDirectory("incr").toString
    val sink = s"$tmp/chunks"
    val track = s"$tmp/tracking"
    val fp = "chunker-v1"

    val s0 = src(("a", 100L, "aaaaaaaaaaaaaaa"), ("b", 100L, "bbbb"),
      ("c", 100L, "cccc"), ("d", 100L, "dddddddddddddddddddd"))
    val n0 = Incremental.syncSource(spark, s0, process, fp, sink, track)
    assert(n0 === 4)
    val chunks0 = spark.read.parquet(sink)
    assert(chunks0.count() === 2 + 1 + 1 + 3) // 15→2, 4→1, 4→1, 20→3 chunks (size10/ov2)

    // S1: edit a (new ordinal+content), touch b (new ordinal same
    // content), keep c, delete d, add e
    val s1 = src(("a", 200L, "zzzz"), ("b", 200L, "bbbb"),
      ("c", 100L, "cccc"), ("e", 200L, "eeee"))
    val n1 = Incremental.syncSource(spark, s1, process, fp, sink, track)
    assert(n1 === 2) // only a (changed) and e (new)

    val chunks1 = spark.read.parquet(sink)
    val keys = chunks1.select($"target_key").as[String].collect().toSet
    assert(keys === Set("a#0", "b#0", "c#0", "e#0")) // d's 3 chunks gone, a's extra chunk gone
    assert(chunks1.where($"target_key" === "a#0")
      .select($"chunk_text").as[String].head() === "zzzz")

    val tracking = spark.read.parquet(track)
    assert(tracking.where($"source_key" === "b")
      .select($"ordinal").as[Long].head() === 200L) // touch bumped
    assert(tracking.where($"source_key" === "d").count() === 0)
  }

  test("stale ordinal is ignored (late-write protection)") {
    val tmp = Files.createTempDirectory("incr2").toString
    val (sink, track) = (s"$tmp/chunks", s"$tmp/tracking")
    Incremental.syncSource(spark, src(("a", 200L, "new content")),
      process, "v1", sink, track)
    val n = Incremental.syncSource(spark, src(("a", 100L, "old content")),
      process, "v1", sink, track)
    assert(n === 0)
    assert(spark.read.parquet(sink).where($"target_key" === "a#0")
      .select($"chunk_text").as[String].head() === "new conten")
  }

  test("logic fingerprint change reprocesses everything") {
    val tmp = Files.createTempDirectory("incr3").toString
    val (sink, track) = (s"$tmp/chunks", s"$tmp/tracking")
    val s = src(("a", 100L, "aaaa"), ("b", 100L, "bbbb"))
    assert(Incremental.syncSource(spark, s, process, "v1", sink, track) === 2)
    assert(Incremental.syncSource(spark, s, process, "v1", sink, track) === 0)
    assert(Incremental.syncSource(spark, s, process, "v2", sink, track) === 2)
  }

  test("r18 parity: a micro-batch carrying one source_key at two " +
      "ordinals evaluates last-wins (source_indexer.rs:142-177 per-key " +
      "serialization + row_indexer.rs:110-133 ordinal monotonicity)") {
    val tmp = Files.createTempDirectory("incr-lw").toString
    val (sink, track) = (s"$tmp/chunks", s"$tmp/tracking")
    // three change files for 'a' land in ONE AvailableNow trigger
    val batch = src(("a", 100L, "oldest a"), ("a", 300L, "newest a!"),
      ("a", 200L, "middle a"), ("b", 100L, "bbbb"))
    val n = Incremental.applyChanges(spark, batch, process, "v1", sink, track)
    assert(n === 2, "a evaluates ONCE (max ordinal), plus b")
    assert(spark.read.parquet(sink).where($"target_key" === "a#0")
      .select($"chunk_text").as[String].head() === "newest a!")
    val trk = spark.read.parquet(track)
    assert(trk.where($"source_key" === "a").count() === 1,
      "no duplicate tracking rows for the duplicated key")
    assert(trk.where($"source_key" === "a")
      .select($"ordinal").as[Long].head() === 300L)
    // a later batch at ordinal 250 (between the duplicates) is stale
    assert(Incremental.applyChanges(spark,
      src(("a", 250L, "late write")), process, "v1", sink, track) === 0)
  }

  test("r18 parity: a replayed stale ObjectRemoved never drops a newer " +
      "row — deletes share the upserts' ordinal guard " +
      "(row_indexer.rs:99-131 NonExistence through should_skip)") {
    val tmp = Files.createTempDirectory("incr-del").toString
    val (sink, track) = (s"$tmp/chunks", s"$tmp/tracking")
    val conn = graft.sinks.ParquetConnector
    Incremental.applyChanges(spark, src(("a", 200L, "live")), process,
      "v1", sink, track)
    // replayed delete at an OLDER ordinal → skipped entirely
    Incremental.applyChangeStreamTo(spark, src(),
      Seq(("a", 100L)).toDF("source_key", "ordinal"), process, "v1",
      conn, sink, track)
    assert(spark.read.parquet(sink).where($"target_key" === "a#0")
      .count() === 1, "stale delete must not drop the newer row")
    assert(spark.read.parquet(track).where($"source_key" === "a")
      .count() === 1)
    // ordinal TIE → the delete wins (NonExistence outranks
    // CurrentLogic, row_indexer.rs:34-41)
    Incremental.applyChangeStreamTo(spark, src(),
      Seq(("a", 200L)).toDF("source_key", "ordinal"), process, "v1",
      conn, sink, track)
    assert(spark.read.parquet(sink).count() === 0)
    assert(spark.read.parquet(track).count() === 0)
  }

  test("r18 parity: same-batch upsert-vs-delete adjudicates by ordinal; " +
      "a delete with no ordinal is never skippable (row_indexer.rs:117-124)") {
    val tmp = Files.createTempDirectory("incr-mix").toString
    val (sink, track) = (s"$tmp/chunks", s"$tmp/tracking")
    val conn = graft.sinks.ParquetConnector
    // batch: upsert a@300 + delete a@200 → upsert strictly newer, wins
    val n1 = Incremental.applyChangeStreamTo(spark,
      src(("a", 300L, "a survives")),
      Seq(("a", 200L)).toDF("source_key", "ordinal"), process, "v1",
      conn, sink, track)
    assert(n1 === 1)
    assert(spark.read.parquet(sink).where($"target_key" === "a#0")
      .select($"chunk_text").as[String].head() === "a survives")
    // batch: upsert a@400 + delete a@400 → tie, delete wins
    val n2 = Incremental.applyChangeStreamTo(spark,
      src(("a", 400L, "a at 400")),
      Seq(("a", 400L)).toDF("source_key", "ordinal"), process, "v1",
      conn, sink, track)
    assert(n2 === 0, "the tied upsert must not evaluate")
    assert(spark.read.parquet(sink).count() === 0)
    // reseed, then an ordinal-less delete stream (the S3 re-fetch
    // path) drops unconditionally even against a newer stored row
    Incremental.applyChanges(spark, src(("b", 900L, "bbbb")), process,
      "v1", sink, track)
    Incremental.applyChangeStreamTo(spark, src(),
      Seq("b").toDF("source_key"), process, "v1", conn, sink, track)
    assert(spark.read.parquet(track).count() === 0)
  }

  test("r19 ADVICE: last-wins ties beyond (ordinal, content_hash) pick " +
      "deterministically across input orderings (the Memo.cached " +
      "stability law applied to the batch pre-dedup)") {
    // two rows tied on key+ordinal+hash but differing payload — a
    // hash-contract violation; the pick must still be stable
    val rows = Seq(
      ("a", 100L, "h1", "payload-zzz"),
      ("a", 100L, "h1", "payload-aaa"))
    def pick(rs: Seq[(String, Long, String, String)]): String = {
      val batch = rs.toDF("source_key", "ordinal", "content_hash", "body")
        .repartition(4)
      Incremental.diff(batch, Incremental.emptyTracking(spark), "v1")
        .toEvaluate.select($"body").as[String].head()
    }
    val p1 = pick(rows)
    val p2 = pick(rows.reverse)
    assert(p1 === p2, "pick must not depend on input order")
    assert(p1 === "payload-zzz",
      "string-cast desc nulls-last picks the max payload")
    // a null payload ranks below any value (nulls last)
    val withNull = Seq(("a", 100L, "h1", null: String),
      ("a", 100L, "h1", "payload-aaa"))
    assert(pick(withNull) === "payload-aaa")
    assert(pick(withNull.reverse) === "payload-aaa")
    // a DOTTED payload column name flows through the tie-break
    // (r19 review: unquoted col() parses the dot as nested access)
    val dotted = Seq(("a", 100L, "h1", "v1"), ("a", 200L, "h2", "v2"))
      .toDF("source_key", "ordinal", "content_hash", "user.name")
    val got = Incremental.diff(dotted, Incremental.emptyTracking(spark), "v1")
      .toEvaluate.select(col("`user.name`")).as[String].collect().toSeq
    assert(got === Seq("v2"))
  }

  test("memoization: second run computes only misses") {
    val tmp = Files.createTempDirectory("memo").toString
    val cache = s"$tmp/cache"
    var computeCalls = 0L
    def compute(misses: DataFrame): DataFrame = {
      computeCalls += misses.count()
      misses.withColumn("value", upper(col("payload"))).select("_fp", "value")
    }
    def in(rows: String*): DataFrame = rows.toSeq.toDF("payload")
      .withColumn("_fp", Memo.fingerprint("upper-v1", col("payload")))
    val r1 = Memo.cached(spark, cache, in("x", "y"), compute)
    assert(r1.select($"value").as[String].collect().toSet === Set("X", "Y"))
    assert(computeCalls === 2)
    val r2 = Memo.cached(spark, cache, in("x", "y", "z"), compute)
    assert(r2.select($"value").as[String].collect().toSet === Set("X", "Y", "Z"))
    assert(computeCalls === 3) // only z computed
  }

  test("r18 ADVICE: contract-violating inputs (same _fp, different " +
      "payload) compute a DETERMINISTIC representative") {
    val tmp = Files.createTempDirectory("memo-det").toString
    def compute(misses: DataFrame): DataFrame =
      misses.withColumn("value", upper(col("payload"))).select("_fp", "value")
    // two payloads under ONE fingerprint — a broken caller; the
    // representative must be the payload-order minimum, not
    // partition-order luck
    val in = Seq(("zz", "f1"), ("aa", "f1"), ("mm", "f1"))
      .toDF("payload", "_fp").repartition(3)
    val out = Memo.cached(spark, s"$tmp/cache", in, compute)
    assert(out.select($"value").as[String].collect().toSeq === Seq("AA"))
  }

  test("r18 pass 8: Memo.cached preserves the caller's column order " +
      "(positional compute implementations) and still accepts an " +
      "UNORDERABLE map-typed payload via the window arm") {
    val tmp = Files.createTempDirectory("memo-ord").toString
    // payload BEFORE _fp: compute reads positionally
    def compute(misses: DataFrame): DataFrame = {
      assert(misses.columns.toSeq === Seq("payload", "_fp", "extra"),
        "input column order must survive the dedup")
      misses.withColumn("value", upper(col("payload"))).select("_fp", "value")
    }
    val in = Seq(("x", "f1", 1), ("y", "f2", 2))
      .toDF("payload", "_fp", "extra")
    val r = Memo.cached(spark, s"$tmp/c1", in, compute)
    assert(r.count() === 2)
    // map payload: min(struct) would throw (maps are unorderable) —
    // the window arm must carry it
    val in2 = Seq(("f3", Map("k" -> "v")), ("f3", Map("k" -> "v")))
      .toDF("_fp", "props")
    def compute2(m: DataFrame): DataFrame =
      m.select(col("_fp"), lit("ok").as("value"))
    val r2 = Memo.cached(spark, s"$tmp/c2", in2, compute2)
    assert(r2.select($"value").as[String].collect().toSeq === Seq("ok"))
  }

  test("r19 pass 8: a DOTTED payload column flows through Memo.cached " +
      "on both the aggregate and the window arms (the lastWinsPerKey " +
      "quoting class, applied where it was still missing)") {
    val tmp = Files.createTempDirectory("memo-dot").toString
    // orderable (string) payload with a dot → the aggregate arm
    val in = Seq(("zz", "f1"), ("aa", "f1"))
      .toDF("user.name", "_fp").repartition(2)
    def compute(m: DataFrame): DataFrame =
      m.select(col("_fp"), upper(col("`user.name`")).as("value"))
    val r = Memo.cached(spark, s"$tmp/c1", in, compute)
    assert(r.select($"value").as[String].collect().toSeq === Seq("AA"))
    // unorderable (map) payload NEXT TO a dotted column → the window
    // arm orders over both
    val in2 = Seq(("f2", Map("k" -> "v"), "x"), ("f2", Map("k" -> "v"), "x"))
      .toDF("_fp", "props", "a.b")
    def compute2(m: DataFrame): DataFrame =
      m.select(col("_fp"), lit("ok").as("value"))
    val r2 = Memo.cached(spark, s"$tmp/c2", in2, compute2)
    assert(r2.select($"value").as[String].collect().toSeq === Seq("ok"))
  }
}
