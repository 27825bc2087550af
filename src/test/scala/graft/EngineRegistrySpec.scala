package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.EngineRegistry
import graft.dataflow.EngineRegistry._
import graft.operators.ProviderWires.ApiError

/** Factory/auth registries and the Settings serde shape. */
class EngineRegistrySpec extends AnyFunSuite {

  test("builtin factory roster and registry errors") {
    assert(BuiltinFactories === Seq("LocalFile", "GoogleDrive", "AmazonS3",
      "AzureBlob", "ParseJson", "SplitRecursively", "ExtractByLlm",
      "EmbedText", "Postgres", "Qdrant", "Kuzu", "Neo4j"))
    val r = builtinRegistry()
    assert(r.get("Postgres") === Some("target"))
    assert(r.get("SplitRecursively") === Some("function"))
    assert(r.get("LocalFile") === Some("source"))
    assert(r.get("Nope") === None)
    val dup = intercept[IllegalStateException](
      r.register("Qdrant", "target"))
    assert(dup.getMessage === "Factory with name already exists: Qdrant")
    val miss = intercept[IllegalStateException](r.require("CustomOp"))
    assert(miss.getMessage ===
      "Executor factory not found for op kind: CustomOp")
    assert(r.require("Neo4j") === "target")
  }

  test("auth registry: duplicate add, missing entry hint verbatim") {
    val a = new AuthRegistry
    a.add("neo4j_conn", """{"uri":"bolt://x"}""")
    assert(a.get("neo4j_conn") === """{"uri":"bolt://x"}""")
    val dup = intercept[ApiError](a.add("neo4j_conn", "{}"))
    assert(dup.getMessage === "Auth entry already exists: neo4j_conn")
    val miss = intercept[ApiError](a.get("old_conn"))
    assert(miss.getMessage ===
      "Auth entry `old_conn` not found.\n" +
        "Hint: If you're not referencing `old_conn` in your flow, it " +
        "will likely be caused by a previously persisted target using " +
        "it. You need to bring back the definition for the auth entry " +
        "`old_conn`, so that CocoIndex will be able to do a cleanup in " +
        "the next `setup` run. " +
        "See https://cocoindex.io/docs/core/flow_def#auth-registry for " +
        "more details.")
  }

  test("python transient auth key grammar: __auth_{n}, 1-based " +
      "(auth_registry.py:19-24)") {
    assert(EngineRegistry.transientAuthKey(1) === "__auth_1")
    assert(EngineRegistry.transientAuthKey(42) === "__auth_42")
  }

  test("settings deserialize (the settings.rs inline tests)") {
    val full = parseSettings(
      """{
        |  "database": {
        |    "url": "postgresql://localhost:5432/test",
        |    "user": "testuser",
        |    "password": "testpass",
        |    "min_connections": 1,
        |    "max_connections": 10
        |  },
        |  "app_namespace": "test_app"
        |}""".stripMargin)
    assert(full.database === Some(DatabaseConnectionSpec(
      "postgresql://localhost:5432/test", Some("testuser"),
      Some("testpass"), 10, 1)))
    assert(full.appNamespace === "test_app")
    assert(full.globalExecutionOptions === GlobalExecutionOptions())
    // without database
    val noDb = parseSettings("""{"app_namespace": "test_app"}""")
    assert(noDb.database === None && noDb.appNamespace === "test_app")
    // empty object: every default fires
    val empty = parseSettings("{}")
    assert(empty === Settings(None, "", GlobalExecutionOptions()))
    // database without user/password
    val anon = parseSettings(
      """{"database": {"url": "postgresql://localhost:5432/test",
        |  "min_connections": 1, "max_connections": 10}}""".stripMargin)
    assert(anon.database.get.user === None)
    assert(anon.database.get.password === None)
    // required database fields are missing-field errors
    val e = intercept[IllegalArgumentException](
      parseSettings("""{"database": {"min_connections": 1,
        |  "max_connections": 10}}""".stripMargin))
    assert(e.getMessage === "missing field `url`")
    // execution options parse through
    val exec = parseSettings(
      """{"global_execution_options": {"source_max_inflight_rows": 100}}""")
    assert(exec.globalExecutionOptions ===
      GlobalExecutionOptions(Some(100L), None))
    // serde #[serde(default)] covers MISSING fields only — explicit
    // null is the invalid-type error (review r14 #2-6); a null
    // database is fine (it's an Option)
    val nullNs = intercept[IllegalArgumentException](
      parseSettings("""{"app_namespace": null}"""))
    assert(nullNs.getMessage === "invalid type: null, expected a string")
    val nullExec = intercept[IllegalArgumentException](
      parseSettings("""{"global_execution_options": null}"""))
    assert(nullExec.getMessage ===
      "invalid type: null, expected struct GlobalExecutionOptions")
    assert(parseSettings("""{"database": null}""").database === None)
  }
}
