package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.SetupMetadata
import graft.incremental.SetupMetadata._
import graft.incremental.SetupStates.{Upsert, Delete => DeleteStaged}

/** The setup-metadata store protocol (db_metadata.rs): version fence,
  * stage→commit, legacy absorption, the pinned statement text. */
class SetupMetadataSpec extends AnyFunSuite {

  private val target = ResourceTypeKey("Target:postgres",
    """{"table":"docs"}""")
  private val tracking = ResourceTypeKey("SourceTracking", "null")

  test("version fence: Rust Option ordering — None seen conflicts " +
    "with any stored version") {
    val store: Store = Map(VersionKey -> Record(Some("3"), Vector.empty))
    assert(stageChanges(store, None, Nil) === Left(ConflictError))
    assert(stageChanges(store, Some(2), Nil) === Left(ConflictError))
    // equal or newer seen passes and bumps
    val Right((s1, v1)) = stageChanges(store, Some(3), Nil)
    assert(v1 === 4L)
    assert(s1(VersionKey) === Record(Some("4"), Vector.empty))
    // empty store: version 1, Insert arm
    val Right((s2, v2)) = stageChanges(Map.empty, None, Nil)
    assert(v2 === 1L && s2(VersionKey).state === Some("1"))
    assert(parseFlowVersion(Some("3")) === Some(3L))
    assert(parseFlowVersion(Some("3.5")) === None)
    assert(parseFlowVersion(Some("\"x\"")) === None)
    assert(parseFlowVersion(None) === None)
  }

  test("staging: dedup of identical changes, delete-of-nothing skip") {
    // brand-new resource stages its upsert
    val Right((s1, _)) = stageChanges(Map.empty, None,
      Seq(target -> StateUpdateInfo(Some("""{"v":1}"""))))
    assert(s1(target) === Record(None, Vector(Upsert("""{"v":1}"""))))
    // re-staging the SAME change is a no-op on the staging list
    val Right((s2, _)) = stageChanges(s1, Some(1),
      Seq(target -> StateUpdateInfo(Some("""{"v":1}"""))))
    assert(s2(target) === s1(target))
    // a DIFFERENT change appends
    val Right((s3, _)) = stageChanges(s2, Some(2),
      Seq(target -> StateUpdateInfo(Some("""{"v":2}"""))))
    assert(s3(target).stagingChanges ===
      Vector(Upsert("""{"v":1}"""), Upsert("""{"v":2}""")))
    // deleting a resource that has no record stages nothing
    val Right((s4, _)) = stageChanges(Map.empty, None,
      Seq(tracking -> StateUpdateInfo(None)))
    assert(!s4.contains(tracking))
    // deleting an EXISTING resource stages the delete
    val Right((s5, _)) = stageChanges(s3, Some(3),
      Seq(target -> StateUpdateInfo(None)))
    assert(s5(target).stagingChanges.last === DeleteStaged)
  }

  test("legacy absorption: staging carries over, legacy row dies") {
    val legacy = ResourceTypeKey("Target:postgres", """{"table":"old"}""")
    val store: Store = Map(
      VersionKey -> Record(Some("5"), Vector.empty),
      legacy -> Record(Some("""{"v":0}"""), Vector(Upsert("""{"v":0}"""))))
    val Right((s, _)) = stageChanges(store, Some(5),
      Seq(target -> StateUpdateInfo(Some("""{"v":1}"""),
        legacyKey = Some(legacy))))
    assert(!s.contains(legacy))
    assert(s(target) === Record(None,
      Vector(Upsert("""{"v":0}"""), Upsert("""{"v":1}"""))))
  }

  test("commit: exact-version fence, state confirm clears staging, " +
    "flow drop removes the version row") {
    val staged: Store = Map(
      VersionKey -> Record(Some("6"), Vector.empty),
      target -> Record(Some("""{"v":1}"""), Vector(Upsert("""{"v":2}"""))),
      tracking -> Record(Some("""{"t":1}"""), Vector(DeleteStaged)))
    assert(commitChanges(staged, 5, Nil, deleteVersion = false) ===
      Left(ConflictError))
    val Right(s) = commitChanges(staged, 6,
      Seq(target -> StateUpdateInfo(Some("""{"v":2}""")),
        tracking -> StateUpdateInfo(None)),
      deleteVersion = false)
    assert(s(target) === Record(Some("""{"v":2}"""), Vector.empty))
    assert(!s.contains(tracking))
    assert(s.contains(VersionKey))
    val Right(dropped) = commitChanges(staged, 6, Nil, deleteVersion = true)
    assert(!dropped.contains(VersionKey))
  }

  test("metadata-table setup status and pinned statements") {
    val missing = MetadataTableSetup(metadataTableMissing = true)
    assert(missing.changeType === graft.incremental.SetupStates.Create)
    assert(missing.describeChanges.map(_.text) === Seq(
      "Create the cocoindex metadata table cocoindex_setup_metadata"))
    assert(missing.description === "CocoIndex Metadata Table")
    val present = MetadataTableSetup(metadataTableMissing = false)
    assert(present.changeType === graft.incremental.SetupStates.NoChange)
    assert(present.describeChanges === Nil)
    assert(CreateTableSql.startsWith(
      "CREATE TABLE IF NOT EXISTS cocoindex_setup_metadata (\n" +
        "                flow_name TEXT NOT NULL,"))
    assert(CreateTableSql.contains(
      "PRIMARY KEY (flow_name, resource_type, key)"))
    assert(ReadAllSql === "SELECT flow_name, resource_type, key, state, " +
      "staging_changes FROM cocoindex_setup_metadata")
    assert(FlowVersionResourceType === "__FlowVersion")
  }

  test("field-attribute names (field_attrs.rs)") {
    import graft.types.SchemaMapping.FieldAttrs
    assert(FieldAttrs.ContentFilename === "cocoindex.io/content_filename")
    assert(FieldAttrs.ContentMimeType === "cocoindex.io/content_mime_type")
    assert(FieldAttrs.ChunkBaseText === "cocoindex.io/chunk_base_text")
    assert(FieldAttrs.EmbeddingOriginText ===
      "cocoindex.io/embedding_origin_text")
  }
}
