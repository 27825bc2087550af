package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EmbedText, StateMachine, StubEmbedder}
import graft.sources.FileSource

class StateMachineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("valid transitions apply; invalid are rejected with reason; audit logged") {
    val current = Seq(
      ("d1", "discovered"), ("d2", "pending_review"), ("d3", "published"))
      .toDF("id", "status")
    val requests = Seq(
      ("d1", "processing"),      // valid
      ("d2", "approved"),        // valid
      ("d3", "discovered"))      // invalid: published is terminal
      .toDF("id", "to_status")
    val r = StateMachine.applyTransitions(current, requests)
    val updated = r.updated.as[(String, String)].collect().toMap
    assert(updated === Map("d1" -> "processing", "d2" -> "approved",
      "d3" -> "published"))
    val rejected = r.rejectedRequests
      .select($"id", $"reason").as[(String, String)].collect()
    assert(rejected.toSeq === Seq(("d3", "transition not allowed")))
    assert(r.auditLog.count() === 2)
  }

  test("rows without requests keep their state") {
    val current = Seq(("d1", "discovered")).toDF("id", "status")
    val requests = Seq.empty[(String, String)].toDF("id", "to_status")
    val r = StateMachine.applyTransitions(current, requests)
    assert(r.updated.as[(String, String)].head() === ("d1", "discovered"))
    assert(r.auditLog.count() === 0)
  }
}

class FileSourceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("recursive listing with include glob and exclude regex; KTable contract") {
    val dir = Files.createTempDirectory("fsrc")
    Files.writeString(dir.resolve("a.md"), "hello doc a")
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("sub/b.md"), "nested doc b")
    Files.writeString(dir.resolve("c.txt"), "not markdown")
    Files.writeString(dir.resolve("skip_this.md"), "excluded")

    val df = FileSource.text(spark, dir.toString,
      includeGlob = Some("*.md"), excludeRegex = Some("skip_"))
    val rows = df.select($"source_key", $"content").as[(String, String)]
      .collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq === Seq("hello doc a", "nested doc b"))
    // contract columns for the incremental driver
    assert(df.columns.toSet ===
      Set("source_key", "ordinal", "content", "content_hash", "length"))
    val ords = df.select($"ordinal").as[Long].collect()
    assert(ords.forall(_ > 1600000000000000L)) // micros since epoch
  }
}

class EmbedTextSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("stub embedding is deterministic, batched, dim-correct") {
    val df = (1 to 250).map(i => (i.toLong, s"text number $i")).toDF("id", "text")
    val e1 = EmbedText.embed(df, "id", "text", () => StubEmbedder(8), batchSize = 100)
    val e2 = EmbedText.embed(df, "id", "text", () => StubEmbedder(8), batchSize = 7)
    val m1 = e1.as[(Long, Array[Float])].collect().toMap
    val m2 = e2.as[(Long, Array[Float])].collect().toMap
    assert(m1.keySet === (1 to 250).map(_.toLong).toSet)
    assert(m1.forall(_._2.length === 8))
    // batch size must not affect results
    assert(m1.map { case (k, v) => k -> v.toSeq } === m2.map { case (k, v) => k -> v.toSeq })
    // distinct texts embed differently
    assert(m1(1L).toSeq !== m1(2L).toSeq)
  }
}
