package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.OpBinding
import graft.dataflow.OpBinding._

/** Wave-8 parity against the reference BINARY:
  * tools/gen_parity_fixtures8.py runs the REAL op.py decorator /
  * analyze_schema / __call__ surface (real typing.py + convert.py
  * underneath, `_engine` recorded stand-in); this spec replays each
  * recorded case through dataflow/OpBinding.scala. */
class OpBindingSpec extends AnyFunSuite {

  implicit val fmts: Formats = DefaultFormats

  private lazy val fx: JValue =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/refparity/op_binding.json"),
      "UTF-8").mkString)

  test("snake->camel op naming matches the reference run incl. " +
      "inner-caps lowering and underscore edges") {
    (fx \ "op_name").extract[List[JValue]].foreach { c =>
      val fn = (c \ "fn").extract[String]
      assert(OpBinding.opName(fn) === (c \ "op_name").extract[String],
        fn)
    }
  }

  /** The recorded signatures, as Param lists. */
  private val sigs: Map[String, Seq[Param]] = Map(
    "f2" -> Seq(Param("a", PositionalOrKeyword, hasDefault = false,
        requiredNonNull = true),
      Param("b", PositionalOrKeyword, hasDefault = true,
        requiredNonNull = true)),
    "f_kwonly" -> Seq(Param("a", PositionalOrKeyword, hasDefault = false,
        requiredNonNull = true),
      Param("flag", KeywordOnly, hasDefault = false,
        requiredNonNull = true)),
    "f_varpos" -> Seq(Param("a", PositionalOrKeyword, hasDefault = false,
        requiredNonNull = true),
      Param("rest", VarPositional, hasDefault = false,
        requiredNonNull = true)),
    "f_varkw" -> Seq(Param("a", PositionalOrKeyword, hasDefault = false,
        requiredNonNull = true),
      Param("kw", VarKeyword, hasDefault = false,
        requiredNonNull = true)),
    "f_opt" -> Seq(Param("a", PositionalOrKeyword, hasDefault = false,
        requiredNonNull = false)),
    "f_req" -> Seq(Param("a", PositionalOrKeyword, hasDefault = false,
        requiredNonNull = true)))

  /** The generator's argument shapes per case name. */
  private val caseArgs
      : Map[String, (Seq[Arg], Seq[(String, Arg)])] = Map(
    "pos_and_default_kwarg" ->
      ((Seq(Arg(false)), Seq("b" -> Arg(false)))),
    "too_many_args" ->
      ((Seq(Arg(false), Arg(false), Arg(false)), Nil)),
    "kwonly_hit_positionally" -> ((Seq(Arg(false), Arg(false)), Nil)),
    "unexpected_kwarg" -> ((Seq(Arg(false)), Seq("zzz" -> Arg(false)))),
    "missing_required_kwonly" -> ((Seq(Arg(false)), Nil)),
    "missing_positional" -> ((Nil, Nil)),
    "varpos_absorbs" -> ((Seq(Arg(false), Arg(false), Arg(false)), Nil)),
    "varkw_absorbs_unknown" ->
      ((Seq(Arg(false)), Seq("zzz" -> Arg(false)))),
    "nullable_arg_into_required_flips_output" ->
      ((Seq(Arg(true)), Nil)),
    "nullable_arg_into_optional_no_flip" -> ((Seq(Arg(true)), Nil)),
    "plain_no_flip" -> ((Seq(Arg(false)), Nil)))

  test("the binding ladder matches the reference run: error " +
      "vocabulary, var-arg absorption, the nullable-output flip") {
    (fx \ "bind").extract[List[JValue]].foreach { c =>
      val name = (c \ "name").extract[String]
      val sig = (c \ "sig").extract[String]
      val (pos, kw) = caseArgs(name)
      val got = OpBinding.bind(sigs(sig), pos, kw)
      (c \ "out" \ "error") match {
        case JString(err) => assert(got === Left(err), name)
        case _ =>
          val wantFlip = (c \ "out" \ "result_type" \ "nullable")
            .extractOpt[Boolean].getOrElse(false)
          assert(got === Right(wantFlip), name)
      }
    }
  }

  test("the call-time required-null short-circuit matches the " +
      "reference run") {
    val cases = (fx \ "call_null").extract[List[JValue]]
    val byName = cases.map(c =>
      (c \ "name").extract[String] -> (c \ "result")).toMap
    // required + null -> None WITHOUT running the body
    assert(byName("required_null_returns_none") === JNull)
    assert(OpBinding.callShortCircuits(Seq(true), Seq(true)))
    // required + value, optional + null -> the body runs
    assert(byName("required_value_passes") === JString("hello"))
    assert(!OpBinding.callShortCircuits(Seq(true), Seq(false)))
    assert(byName("optional_null_decodes") === JString(""))
    assert(!OpBinding.callShortCircuits(Seq(false), Seq(true)))
  }

  test("OpArgs fallbacks and the decorator error vocabulary") {
    assert((fx \ "op_args_fallback" \ "enable_cache").extract[Boolean])
    assert((fx \ "op_args_fallback" \ "behavior_version")
      .extract[Int] === 7)
    val args = OpArgs(cache = true, behaviorVersion = Some(7))
    assert(OpBinding.enableCache(args) &&
      OpBinding.behaviorVersion(args) === Some(7))
    assert((fx \ "no_spec_error").extract[String] ===
      OpBinding.Errors.specFieldMissing)
    assert(OpBinding.Errors.unsupportedExecutor("OpCategory.TARGET") ===
      "Unsupported executor type OpCategory.TARGET")
  }
}
