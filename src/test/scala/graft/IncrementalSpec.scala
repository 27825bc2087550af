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
}
