package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AppConfig

/** The app settings shell's deterministic wiring (app/config.py). */
class AppConfigSpec extends AnyFunSuite {

  test("the token env map keeps config.py's insertion order — the " +
      "security-inference scan order (:52-58)") {
    assert(AppConfig.notionTokenEnvVars.map(_._1) ===
      Seq("public", "client", "partner", "employee", "management"))
    assert(AppConfig.notionTokenEnvVars.toMap.apply("employee") ===
      "NOTION_API_KEY_EMPLOYEE_ACCESS")
  }

  test("notion_api_key: the general key falls back to the EMPLOYEE " +
      "token on Python truthiness (:60)") {
    assert(AppConfig.notionApiKey(Some("gen"), Some("emp")) === "gen")
    assert(AppConfig.notionApiKey(Some(""), Some("emp")) === "emp")
    assert(AppConfig.notionApiKey(None, Some("emp")) === "emp")
    assert(AppConfig.notionApiKey(Some(""), Some("")) === "")
    assert(AppConfig.notionApiKey(None, None) === "")
  }

  test("notion_database_ids: JSON array parse with the [] default; " +
      "malformed values fail at import (:61)") {
    assert(AppConfig.notionDatabaseIds(None) === Right(Nil))
    assert(AppConfig.notionDatabaseIds(Some("""["a","b"]""")) ===
      Right(Seq("a", "b")))
    assert(AppConfig.notionDatabaseIds(Some("not json")).isLeft)
    assert(AppConfig.notionDatabaseIds(Some("""{"a":1}""")).isLeft)
  }

  test("behavioral defaults and the placeholder embedding grammar") {
    assert(AppConfig.defaultChunkSize === 500)
    assert(AppConfig.defaultChunkOverlap === 50)
    assert(AppConfig.embeddingModel === "text-embedding-3-small")
    assert(AppConfig.embeddingDimension === 1536)
    assert(AppConfig.qdrantCollection === "document_embeddings")
    assert(AppConfig.debug("development") && !AppConfig.debug("prod"))
    assert(AppConfig.placeholderEmbeddingId("c1") === "emb_c1")
  }
}
