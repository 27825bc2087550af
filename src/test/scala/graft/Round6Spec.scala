package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.SetupDriver
import graft.incremental.SetupDriver.{Declaration, DeclarationAction}

class DeclarationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tmp() = Files.createTempDirectory("decl").toString + "/state"

  test("declarations round-trip through setup diffing") {
    val path = tmp()
    val nodes = Declaration("PropertyGraph", "Entity", Seq("entity_id"),
      Seq("embedding_ivf"))
    val chunks = Declaration("Parquet", "chunks", Seq("chunk_id"))

    // first apply: everything created
    val a1 = SetupDriver.applyDeclarations(spark, path, Seq(nodes, chunks))
    assert(a1.toSet === Set(
      DeclarationAction("PropertyGraph/Entity", "created"),
      DeclarationAction("Parquet/chunks", "created")))

    // idempotent: same desired state is all-noop
    val a2 = SetupDriver.applyDeclarations(spark, path, Seq(nodes, chunks))
    assert(a2.forall(_.action == "noop"))

    // index change on one, removal of the other
    val evolved = nodes.copy(indexes = Seq("embedding_ivf", "name_btree"))
    val a3 = SetupDriver.applyDeclarations(spark, path, Seq(evolved))
    assert(a3.toSet === Set(
      DeclarationAction("PropertyGraph/Entity", "updated"),
      DeclarationAction("Parquet/chunks", "dropped")))

    // tracked state reflects the last apply exactly
    assert(SetupDriver.declaredState(spark, path) === Seq(evolved))
  }

  test("duplicate declaration keys are rejected") {
    val d = Declaration("Parquet", "t", Seq("id"))
    intercept[IllegalArgumentException] {
      SetupDriver.applyDeclarations(spark, tmp(), Seq(d, d.copy(primaryKey = Seq("x"))))
    }
  }

  test("flow accumulates declarations and applies them") {
    import graft.dataflow.Flow
    val path = tmp()
    val flow = Flow(spark)
      .declare(Declaration("PropertyGraph", "Document", Seq("doc_id")))
      .declare(Declaration("PropertyGraph", "Entity", Seq("entity_id")))
    assert(flow.declarations.map(_.name) === Seq("Document", "Entity"))
    val actions = flow.applyDeclarations(path)
    assert(actions.forall(_.action == "created"))
    assert(flow.applyDeclarations(path).forall(_.action == "noop"))
  }
}
