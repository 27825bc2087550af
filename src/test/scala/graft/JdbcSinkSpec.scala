package graft

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.Incremental
import graft.sinks.JdbcSink

/** JDBC sink against embedded Derby (the one JDBC engine on the Spark
  * classpath) — the IncrementalSpec contract on a relational store. */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  val url = s"jdbc:derby:memory:graftjdbc${System.nanoTime()};create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().executeUpdate(sql) } finally c.close()
  }

  private def readTable(table: String) =
    spark.read.jdbc(url, table, new Properties)

  test("merge: upsert replaces by key, delete drops, others preserved") {
    exec("CREATE TABLE sink_t (id BIGINT, payload VARCHAR(100), score DOUBLE)")
    JdbcSink.upsert(
      Seq((1L, "a", 0.1), (2L, "b", 0.2), (3L, "c", 0.3))
        .toDF("id", "payload", "score"),
      url, "sink_t", Seq("id"))
    // second batch: id 2 changes, id 4 new, id 3 deleted
    JdbcSink.merge(url, "sink_t",
      Seq((2L, "b2", 0.25), (4L, "d", 0.4)).toDF("id", "payload", "score"),
      Seq("id"), Some(Seq(Tuple1(3L)).toDF("id")))
    val got = readTable("sink_t")
      .select($"id", $"payload", $"score").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a", 0.1), (2L, "b2", 0.25), (4L, "d", 0.4)))
    // idempotent: re-upserting the same batch changes nothing
    JdbcSink.upsert(
      Seq((2L, "b2", 0.25), (4L, "d", 0.4)).toDF("id", "payload", "score"),
      url, "sink_t", Seq("id"))
    assert(readTable("sink_t").count() === 3)
  }

  test("incremental diff drives the JDBC export: evaluate upserts, vanished deletes") {
    exec("CREATE TABLE inc_t (target_key VARCHAR(50), body VARCHAR(100))")
    def srcRow(k: String, ord: Long, content: String) =
      (k, ord, content)
    val run1 = Seq(srcRow("a", 1L, "va"), srcRow("b", 1L, "vb"))
      .toDF("source_key", "ordinal", "content")
      .withColumn("content_hash", md5($"content"))
    JdbcSink.upsert(
      run1.select($"source_key".as("target_key"), $"content".as("body")),
      url, "inc_t", Seq("target_key"))
    val tracking = run1
      .select($"source_key", $"ordinal", $"content_hash")
      .withColumn("logic_fp", lit("fp1"))
      .withColumn("target_keys", array($"source_key"))
    // run 2: a changed, b vanished, c new
    val run2 = Seq(srcRow("a", 2L, "va2"), srcRow("c", 1L, "vc"))
      .toDF("source_key", "ordinal", "content")
      .withColumn("content_hash", md5($"content"))
    val d = Incremental.diff(run2, tracking, "fp1")
    JdbcSink.merge(url, "inc_t",
      d.toEvaluate.select($"source_key".as("target_key"), $"content".as("body")),
      Seq("target_key"),
      Some(d.toDelete.select(explode($"target_keys").as("target_key"))))
    val got = readTable("inc_t").as[(String, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("a", "va2"), ("c", "vc")))
  }
}
