package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.PyFlowFaces

/** Wave-9 parity against the reference BINARY:
  * tools/gen_parity_fixtures9.py runs the REAL flow.py DSL faces
  * (pre-engine arms only); this spec replays each recorded case
  * through dataflow/PyFlowFaces.scala. */
class PyFlowFacesSpec extends AnyFunSuite {

  implicit val fmts: Formats = DefaultFormats

  private lazy val fx: JValue =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/refparity/py_flow_faces.json"),
      "UTF-8").mkString)

  test("snake-case spec-kind prefixes match the reference run incl. " +
      "acronym explosion") {
    (fx \ "to_snake_case").extract[List[JValue]].foreach { c =>
      val in = (c \ "in").extract[String]
      assert(PyFlowFaces.toSnakeCase(in) === (c \ "out").extract[String],
        in)
    }
  }

  test("the generated-name law matches the reference run: per-prefix " +
      "counters, explicit registration, cross-prefix collision skip") {
    val nb = new PyFlowFaces.NameBuilder
    (fx \ "name_builder").extract[List[JValue]].foreach { c =>
      val name = (c \ "name") match {
        case JString(s) => Some(s)
        case _ => None
      }
      val prefix = (c \ "prefix").extract[String]
      assert(nb.buildName(name, prefix) === (c \ "out").extract[String],
        s"$name/$prefix")
    }
  }

  test("full flow name matches the reference run") {
    (fx \ "full_flow_name").extract[List[JValue]].foreach { c =>
      assert(PyFlowFaces.fullFlowName((c \ "ns").extract[String],
        (c \ "name").extract[String]) === (c \ "out").extract[String])
    }
  }

  test("registry duplicate and the type-guard vocabulary match the " +
      "reference run") {
    assert((fx \ "open_flow_duplicate").extract[String] ===
      PyFlowFaces.Errors.flowExists("wave9_flow"))
    assert((fx \ "flow_def_default_name").extract[Boolean])
    val g = fx \ "guards"
    assert((g \ "transform_not_function").extract[String] ===
      PyFlowFaces.Errors.transformNotFunction)
    assert((g \ "add_source_not_source").extract[String] ===
      PyFlowFaces.Errors.addSourceNotSource)
    assert((g \ "transform_no_inputs").extract[String] ===
      PyFlowFaces.Errors.transformNoInputs)
    assert((g \ "slice_not_initialized").extract[String] ===
      PyFlowFaces.Errors.sliceNotInitialized)
    assert((g \ "creator_not_initialized").extract[String] ===
      PyFlowFaces.Errors.creatorNotInitialized)
    assert((g \ "already_attached").extract[String] ===
      PyFlowFaces.Errors.alreadyAttached)
    // __getitem__ raises KeyError(field_name) — the bare field name
    assert((g \ "getitem_miss").extract[String] === "missing_field")
  }

  test("GeneratedField validation matches the reference run") {
    assert((fx \ "generated_field" \ "double_uuid").extract[String] ===
      PyFlowFaces.Errors.onlyOneUuid)
    assert((fx \ "generated_field_values")
      .extract[List[List[String]]].map(l => (l(0), l(1))) ===
      PyFlowFaces.generatedFields.toList)
    assert(PyFlowFaces.validateGeneratedFields(
      Seq("a" -> Some("Uuid"), "b" -> Some("Uuid"))) ===
      Left(PyFlowFaces.Errors.onlyOneUuid))
    assert(PyFlowFaces.validateGeneratedFields(
      Seq("a" -> Some("Uuid"), "b" -> None)) === Right(Some("a")))
    assert(PyFlowFaces.validateGeneratedFields(
      Seq("a" -> Some("Weird"))) ===
      Left("Unexpected generated field: Weird"))
  }

  test("transform_flow decorator parameter validation matches the " +
      "reference run (address-scrubbed)") {
    val tf = fx \ "transform_flow"
    assert((tf \ "var_positional").extract[String] ===
      PyFlowFaces.Errors.paramNotByName("texts"))
    assert((tf \ "no_annotation").extract[String] ===
      PyFlowFaces.Errors.paramNoValueType("text",
        "<function bad_unannotated at 0xADDR>"))
  }
}
