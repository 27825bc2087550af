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
