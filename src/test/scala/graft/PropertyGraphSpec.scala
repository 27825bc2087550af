package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.PropertyGraph

class SetupDriverSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import org.apache.spark.sql.types._
  import graft.incremental.SetupDriver
  import graft.incremental.SetupDriver._

  private def s(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  test("classify: identical / additive / type-conflict") {
    val base = s("id" -> LongType, "name" -> StringType)
    assert(classify(base, s("name" -> StringType, "id" -> LongType)) === Compatible)
    assert(classify(base, s("id" -> LongType, "name" -> StringType,
      "score" -> DoubleType)) === PartialCompatible)
    assert(classify(base, s("id" -> LongType)) === PartialCompatible)
    assert(classify(base, s("id" -> StringType, "name" -> StringType)) === NotCompatible)
  }

  test("applySetup creates, evolves in place preserving data, guards recreate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("setup").toString + "/t"
    val v1 = s("id" -> LongType, "name" -> StringType)
    assert(SetupDriver.applySetup(spark, dir, v1).action === "created")
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(dir)
    // additive evolution keeps rows, backfills null
    val v2 = s("id" -> LongType, "name" -> StringType, "score" -> DoubleType)
    assert(SetupDriver.applySetup(spark, dir, v2).action === "evolved")
    val rows = spark.read.parquet(dir).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows.forall(_.isNullAt(2)))
    assert(SetupDriver.applySetup(spark, dir, v2).action === "noop")
    // incompatible requires explicit opt-in
    val bad = s("id" -> StringType, "name" -> StringType, "score" -> DoubleType)
    intercept[IllegalStateException] {
      SetupDriver.applySetup(spark, dir, bad)
    }
    assert(SetupDriver.applySetup(spark, dir, bad, allowRecreate = true)
      .action === "recreated")
    assert(spark.read.parquet(dir).count() === 0)
  }
}

class PropertyGraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("pgraph").toString + "/graph"

  test("rel upsert creates endpoint stubs; stubs never clobber full nodes") {
    val dir = freshDir()
    val entities = Seq((1L, "pump", "COMPONENT"), (2L, "valve", "COMPONENT"))
      .toDF("eid", "name", "etype")
    val nodes = PropertyGraph.nodeRows(entities, "Entity", Seq("name"), Seq("etype"))
    val relsIn = Seq(("pump", "valve"), ("pump", "motor")).toDF("a", "b")
    val rels = PropertyGraph.relRows(relsIn, "CO_OCCURS", "Entity", Seq("a"),
      "Entity", Seq("b"))
    PropertyGraph.upsert(spark, dir, nodes, rels)

    val stored = PropertyGraph.nodes(spark, dir).get.collect()
    assert(stored.length === 3) // pump, valve full; motor stub
    val motor = stored.find(_.getAs[String]("node_key") == "motor").get
    assert(motor.getAs[Boolean]("stub"))
    val pump = stored.find(_.getAs[String]("node_key") == "pump").get
    assert(!pump.getAs[Boolean]("stub"))
    assert(pump.getAs[String]("properties").contains("COMPONENT"))
    assert(PropertyGraph.rels(spark, dir).get.count() === 2)

    // re-upserting the same rels must not demote full nodes to stubs
    PropertyGraph.upsert(spark, dir, nodes.limit(0), rels)
    val after = PropertyGraph.nodes(spark, dir).get.collect()
    assert(after.count(!_.getAs[Boolean]("stub")) === 2)
  }

  test("deleting a rel orphan-cleans its stub but keeps full nodes") {
    val dir = freshDir()
    val entities = Seq((1L, "pump", "COMPONENT")).toDF("eid", "name", "etype")
    val nodes = PropertyGraph.nodeRows(entities, "Entity", Seq("name"), Seq("etype"))
    val rels = PropertyGraph.relRows(
      Seq(("pump", "motor")).toDF("a", "b"),
      "CO_OCCURS", "Entity", Seq("a"), "Entity", Seq("b"))
    PropertyGraph.upsert(spark, dir, nodes, rels)
    assert(PropertyGraph.nodes(spark, dir).get.count() === 2)

    PropertyGraph.deleteRels(spark, dir,
      rels.select("rel_type", "src_label", "src_key", "dst_label", "dst_key"))
    val left = PropertyGraph.nodes(spark, dir).get.collect()
    assert(left.map(_.getAs[String]("node_key")).toSet === Set("pump"))
    assert(PropertyGraph.rels(spark, dir).get.count() === 0)
  }

  test("node upsert by key updates properties in place") {
    val dir = freshDir()
    val noRels = PropertyGraph.relRows(
      Seq.empty[(String, String)].toDF("a", "b"),
      "CO_OCCURS", "Entity", Seq("a"), "Entity", Seq("b"))
    val v1 = PropertyGraph.nodeRows(
      Seq(("pump", "OLD")).toDF("name", "etype"), "Entity", Seq("name"), Seq("etype"))
    PropertyGraph.upsert(spark, dir, v1, noRels)
    val v2 = PropertyGraph.nodeRows(
      Seq(("pump", "NEW")).toDF("name", "etype"), "Entity", Seq("name"), Seq("etype"))
    PropertyGraph.upsert(spark, dir, v2, noRels)
    val rows = PropertyGraph.nodes(spark, dir).get.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("properties").contains("NEW"))
  }
}

class Neo4jCypherSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  import graft.sinks.{CypherStatement, Neo4jConnector, Neo4jCypher, RecordingCypherSession}
  import graft.sinks.Neo4jCypher.{NodeMapping, RelMapping}

  test("node insert/delete templates match the reference shapes") {
    val m = NodeMapping("Document", Seq("doc_id"), Seq("title", "status"))
    assert(m.insertCypher ===
      """MERGE (new_node:Document {doc_id: $key_0})
        |SET new_node.__self_contained = TRUE, new_node += $props
        |FINISH""".stripMargin)
    assert(m.deleteCypher ===
      """OPTIONAL MATCH (old_node:Document {doc_id: $key_0})
        |WITH old_node
        |SET old_node.__self_contained = NULL
        |WITH old_node
        |WHERE NOT (old_node)--()
        |DELETE old_node
        |FINISH""".stripMargin)
    // key-only mapping omits the props clause (neo4j.rs optional_set_props)
    assert(NodeMapping("Tag", Seq("name")).insertCypher ===
      """MERGE (new_node:Tag {name: $key_0})
        |SET new_node.__self_contained = TRUE
        |FINISH""".stripMargin)
  }

  test("relationship insert merges endpoints first; delete cleans orphans") {
    val m = RelMapping("MENTIONS", Seq("mention_id"), Seq("confidence"),
      "Document", Seq("doc_id"), "Entity", Seq("name", "etype"))
    assert(m.insertCypher ===
      """MERGE (new_src:Document {doc_id: $source_key_0})
        |
        |MERGE (new_tgt:Entity {name: $target_key_0, etype: $target_key_1})
        |
        |MERGE (new_src)-[new_rel:MENTIONS {mention_id: $key_0}]->(new_tgt)
        |SET new_rel += $props
        |
        |FINISH""".stripMargin)
    assert(m.deleteCypher.contains("DELETE old_rel"))
    assert(m.deleteCypher.contains("WHERE NOT COALESCE(node.__self_contained, FALSE)"))
    assert(m.deleteCypher.contains("AND COUNT{ (node)--() } = 0"))
    assert(m.deleteCypher.contains(
      "OPTIONAL MATCH (old_src)-[old_rel:MENTIONS {mention_id: $key_0}]->(old_tgt)"))
  }

  test("a nodes+rels mutation batch renders one params row per input row") {
    val nodes = Seq((1L, "spec"), (2L, "guide")).toDF("doc_id", "title")
    val rels = Seq((10L, 1L, "sensor", 0.9), (11L, 2L, "bolt", 0.7))
      .toDF("mention_id", "doc_id", "name", "confidence")
    val nm = NodeMapping("Document", Seq("doc_id"), Seq("title"))
    val rm = RelMapping("MENTIONS", Seq("mention_id"), Seq("confidence"),
      "Document", Seq("doc_id"), "Entity", Seq("name"))
    val up = Neo4jCypher.renderNodeUpserts(nodes, nm)
      .as[(String, String)].collect().toSeq.sortBy(_._2)
    assert(up.size === 2)
    assert(up.forall(_._1 === nm.insertCypher))
    assert(up.head._2 === """{"key_0":1,"props":{"title":"spec"}}""")
    val rup = Neo4jCypher.renderRelUpserts(rels, rm)
      .as[(String, String)].collect().toSeq.sortBy(_._2)
    assert(rup.forall(_._1 === rm.insertCypher))
    assert(rup.head._2 ===
      """{"source_key_0":1,"target_key_0":"sensor","key_0":10,"props":{"confidence":0.9}}""")
    val del = Neo4jCypher.renderRelDeletes(rels.select($"mention_id"), rm)
      .as[(String, String)].collect().toSeq
    assert(del.forall(_._1 === rm.deleteCypher))
    assert(del.map(_._2).sorted === Seq("""{"key_0":10}""", """{"key_0":11}"""))
  }

  test("Neo4jConnector drives constraint + upserts + deletes through the session") {
    import graft.sinks.TargetRegistry
    assert(TargetRegistry.registered.contains("neo4j"))
    val logId = "neo4j-spec-" + System.nanoTime()
    val c = Neo4jConnector(() => RecordingCypherSession(logId))
    val rows = Seq((1L, "keep"), (2L, "gone")).toDF("doc_id", "title")
    val dels = Seq(Tuple1(2L)).toDF("doc_id")
    c.applyMutation(spark, "Document", rows, Seq("doc_id"), Some(dels))
    val got = RecordingCypherSession.statements(logId)
    assert(got.head === CypherStatement(
      "CREATE CONSTRAINT IF NOT EXISTS FOR (e:Document) REQUIRE (e.doc_id) IS UNIQUE", "{}"))
    val nm = NodeMapping("Document", Seq("doc_id"), Seq("title"))
    // delete wins over the same-batch upsert for doc 2
    assert(got.collect { case CypherStatement(c2, p) if c2 == nm.insertCypher => p }
      === Seq("""{"key_0":1,"props":{"title":"keep"}}"""))
    assert(got.collect { case CypherStatement(c2, p) if c2 == nm.deleteCypher => p }
      === Seq("""{"key_0":2}"""))
  }
}
