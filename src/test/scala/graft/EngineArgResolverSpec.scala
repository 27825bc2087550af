package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.EngineArgResolver
import graft.dataflow.EngineArgResolver.{OpArgSchema, Resolver}

/** The engine-side op-argument resolver
  * (src/ops/factory_bases.rs:14-312) — every arm walked against the
  * Rust source. */
class EngineArgResolverSpec extends AnyFunSuite {

  private def pos(typ: String, nullable: Boolean = false) =
    OpArgSchema(None, typ, nullable)
  private def kw(name: String, typ: String, nullable: Boolean = false) =
    OpArgSchema(Some(name), typ, nullable)

  test("construction: positional args must precede keyword args " +
      "(:141-146)") {
    assert(Resolver(Seq(pos("Str"), kw("b", "Int64"))).isRight)
    assert(Resolver(Seq(kw("b", "Int64"), pos("Str"))) ===
      Left("Positional arguments must be provided before keyword " +
        "arguments"))
  }

  test("next_arg: kwarg wins only once positionals are exhausted; " +
      "the both-ways bail (:159-179)") {
    val r = Resolver(Seq(pos("Str"), kw("text", "Str"))).toOption.get
    // `text` is a kwarg while a positional is still unconsumed
    assert(r.nextArg("text") ===
      Left("`text` is provided as both positional and keyword " +
        "arguments"))
    val r2 = Resolver(Seq(pos("Str"), kw("flag", "Bool"))).toOption.get
    val a = r2.nextArg("text").toOption.get.get
    assert(a.idx === 0 && a.name === "text")
    val b = r2.nextArg("flag").toOption.get.get
    assert(b.idx === 1 && b.typ === "Bool")
    // a third parameter resolves to nothing (optional territory)
    assert(r2.nextArg("extra") === Right(None))
    assert(r2.done() === Right(()))
  }

  test("expect_type: the mismatch vocabulary, null-short-circuit " +
      "registration, and the output-nullability flip (:22-45)") {
    val r = Resolver(Seq(pos("Str"), pos("Int64", nullable = true)))
      .toOption.get
    val a = r.nextArg("text").toOption.get
    assert(r.expectType(a, "Bytes") ===
      Left("Expected argument `text` to be of type `Bytes`, got `Str`"))
    assert(r.expectType(a, "Str").isRight)
    assert(r.nonnullArgsIdx.toSeq === Seq(0) && !r.mayNullifyOutput)
    val b = r.nextArg("count").toOption.get
    assert(r.expectType(b, "Int64").isRight)
    // a NULLABLE value into expect_type flips the output
    assert(r.nonnullArgsIdx.toSeq === Seq(0, 1) && r.mayNullifyOutput)
    // an unresolved arg passes both checks untouched
    val none = r.nextArg("ghost").toOption.get
    assert(r.expectNullableType(none, "Str") === Right(None))
  }

  test("required / missing and done()'s leftover bails (:55-60, " +
      ":181-199)") {
    val r = Resolver(Seq(pos("Str"))).toOption.get
    val none = r.nextArg("a").toOption.get
    assert(r.required(none, "a").isRight)
    val r2 = Resolver(Seq.empty).toOption.get
    assert(r2.required(r2.nextArg("a").toOption.get, "a") ===
      Left("Required argument `a` is missing"))
    // unconsumed positional: the reference's (consumed, provided)
    // operand order
    val r3 = Resolver(Seq(pos("Str"), pos("Str"))).toOption.get
    r3.nextArg("x")
    assert(r3.done() ===
      Left("Expected 1 positional arguments, got 2"))
    // leftover kwargs render backticked
    val r4 = Resolver(Seq(kw("zzz", "Str"))).toOption.get
    assert(r4.done() === Left("Unexpected keyword arguments: `zzz`"))
  }

  test("the wrapper's call-time null short-circuit tracks ONLY " +
      "expect_type'd indexes (:294-301)") {
    assert(EngineArgResolver.evaluateShortCircuits(Seq(0, 2),
      Seq(false, true, true)))
    assert(!EngineArgResolver.evaluateShortCircuits(Seq(0),
      Seq(false, true, true)))
    assert(!EngineArgResolver.evaluateShortCircuits(Nil,
      Seq(true, true, true)))
  }
}
