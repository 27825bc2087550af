package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.{Flow, Naming, NamingException}

/** Identifier naming rules (python/cocoindex/validation.py:12-105). */
class NamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("identifier rules: empty, length, reserved prefix, charset") {
    assert(Naming.validateIdentifier("chunks") === None)
    assert(Naming.validateIdentifier("_private") === None)
    assert(Naming.validateIdentifier("A1_b2") === None)
    assert(Naming.validateIdentifier("").get ===
      "identifier name cannot be empty")
    assert(Naming.validateIdentifier("x" * 65).get.contains(
      "exceeds maximum length of 64"))
    assert(Naming.validateIdentifier("__internal").get.contains(
      "reserved for internal usage"))
    assert(Naming.validateIdentifier("1leading").get.contains(
      "must start with a letter or underscore"))
    assert(Naming.validateIdentifier("has-dash").get.contains(
      "letters, digits, and underscores"))
    // trailing newline must NOT slip past the anchors ($ would allow it)
    assert(Naming.validateIdentifier("chunks\n").isDefined)
    // dots only for full flow names
    assert(Naming.validateIdentifier("ns.flow").isDefined)
    assert(Naming.validateIdentifier("ns.flow", allowDots = true) === None)
    assert(Naming.validateFullFlowName("app.ingest") === "app.ingest")
    intercept[NamingException](Naming.validateFlowName("app.ingest"))
  }

  test("flow enforces field and target names at build time") {
    val flow = Flow(spark)
    val scope = flow.importSource(
      Seq((1L, "a")).toDF("id", "text"), "id")
    // valid name passes through; invalid throws before any plan builds
    scope.transform("n_chars", length(col("text")))
    intercept[NamingException](
      scope.transform("bad-name", length(col("text"))))
    intercept[NamingException](
      scope.transform("__reserved", length(col("text"))))
    scope.collect("rows", Seq("id" -> col("id")))
    intercept[NamingException](
      flow.export("not/a/name", "/tmp/never-used", Seq("id")))
  }

  test("app-namespace helpers and CORS parsing (setting.py:14-36, :173-181)") {
    import graft.dataflow.Naming
    // trailing delimiter appends only when BOTH namespace and
    // delimiter are present
    assert(Naming.appNamespaceWithDelimiter("", Some(".")) === "")
    assert(Naming.appNamespaceWithDelimiter("app", None) === "app")
    assert(Naming.appNamespaceWithDelimiter("app", Some(".")) === "app.")
    // split on the FIRST delimiter; no delimiter = empty namespace
    assert(Naming.splitAppNamespace("ns.flow.sub", ".") === (("ns", "flow.sub")))
    assert(Naming.splitAppNamespace("flowonly", ".") === (("", "flowonly")))
    // CORS: strip entries, drop empties, null stays null
    assert(Naming.parseCorsOrigins(" https://a.com , ,https://b.com,")
      === Some(Seq("https://a.com", "https://b.com")))
    assert(Naming.parseCorsOrigins(null) === None)
  }
}
