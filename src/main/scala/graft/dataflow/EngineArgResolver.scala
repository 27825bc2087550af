package graft.dataflow

/** The engine-side op-argument resolver
  * (src/ops/factory_bases.rs:14-312) — the Rust twin of the
  * Python-side binding ladder ([[OpBinding]]): how a native factory's
  * `resolve_schema` consumes its `OpArgSchema` list. Positional args
  * must precede keyword args; each `next_arg` pulls the named kwarg
  * or the next positional (bailing when a name is supplied both
  * ways); `expect_type` enforces the declared type, records the
  * argument for the call-time null short-circuit, and flips the
  * output-nullability when a nullable value feeds it; `done` bails on
  * unconsumed positionals or leftover kwargs. The wrapper's
  * `evaluate` returns Null without calling the executor when any
  * tracked argument is null (factory_bases.rs:294-301) — the engine
  * mirror of op.py's required-null short-circuit.
  *
  * Hand-pinned against the Rust source (no runnable reference
  * binary); EngineArgResolverSpec walks every arm. */
object EngineArgResolver {

  /** One supplied argument: kwargs carry a name, positionals don't. */
  final case class OpArgSchema(name: Option[String], typ: String,
      nullable: Boolean)

  object Errors {
    val positionalAfterKeyword =
      "Positional arguments must be provided before keyword arguments"
    def bothPositionalAndKeyword(name: String): String =
      s"`$name` is provided as both positional and keyword arguments"
    def typeMismatch(name: String, expected: String, got: String)
        : String =
      s"Expected argument `$name` to be of type `$expected`, got `$got`"
    def missingRequired(name: String): String =
      s"Required argument `$name` is missing"
    /** done()'s leftover-positional bail — the reference renders
      * (consumed, provided) in THIS order (factory_bases.rs:182-186):
      * "Expected {consumed} positional arguments, got {provided}". */
    def leftoverPositional(consumed: Int, provided: Int): String =
      s"Expected $consumed positional arguments, got $provided"
    def unexpectedKwargs(names: Seq[String]): String =
      "Unexpected keyword arguments: " +
        names.map(n => s"`$n`").mkString(", ")
  }

  /** A resolved argument reference. */
  final case class ResolvedOpArg(name: String, typ: String,
      nullable: Boolean, idx: Int)

  final class Resolver private (args: Seq[OpArgSchema],
      numPositional: Int,
      private var remainingKwargs: Map[String, Int]) {
    private var nextPositionalIdx = 0
    /** Indexes whose null value short-circuits evaluate. */
    val nonnullArgsIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    var mayNullifyOutput = false

    /** One named parameter's resolution: kwarg wins (but bails if
      * positionals are still unconsumed), else the next positional,
      * else unresolved (for `optional`). */
    def nextArg(name: String): Either[String, Option[ResolvedOpArg]] = {
      remainingKwargs.get(name) match {
        case Some(idx) =>
          if (nextPositionalIdx < numPositional)
            Left(Errors.bothPositionalAndKeyword(name))
          else {
            remainingKwargs -= name
            val a = args(idx)
            Right(Some(ResolvedOpArg(name, a.typ, a.nullable, idx)))
          }
        case None =>
          if (nextPositionalIdx < numPositional) {
            val idx = nextPositionalIdx
            nextPositionalIdx += 1
            val a = args(idx)
            Right(Some(ResolvedOpArg(name, a.typ, a.nullable, idx)))
          } else Right(None)
      }
    }

    /** expect_nullable_type: type check only (an unresolved arg
      * passes). */
    def expectNullableType(arg: Option[ResolvedOpArg],
        expectedType: String): Either[String, Option[ResolvedOpArg]] =
      arg match {
        case Some(a) if a.typ != expectedType =>
          Left(Errors.typeMismatch(a.name, expectedType, a.typ))
        case other => Right(other)
      }

    /** expect_type: the nullable check PLUS null-short-circuit
      * registration and the output-nullability flip. */
    def expectType(arg: Option[ResolvedOpArg], expectedType: String)
        : Either[String, Option[ResolvedOpArg]] =
      expectNullableType(arg, expectedType).map { r =>
        r.foreach { a =>
          nonnullArgsIdx += a.idx
          if (a.nullable) mayNullifyOutput = true
        }
        r
      }

    def required(arg: Option[ResolvedOpArg], name: String)
        : Either[String, ResolvedOpArg] =
      arg.toRight(Errors.missingRequired(name))

    /** done(): every positional consumed, no kwargs left. Leftover
      * names render backticked, comma-joined; the reference iterates
      * a HashMap (unspecified order for 2+ names), so this model
      * sorts for determinism — single-name renders are exact. */
    def done(): Either[String, Unit] =
      if (nextPositionalIdx < numPositional)
        Left(Errors.leftoverPositional(nextPositionalIdx,
          numPositional))
      else if (remainingKwargs.nonEmpty)
        Left(Errors.unexpectedKwargs(
          remainingKwargs.keys.toSeq.sorted))
      else Right(())
  }

  object Resolver {
    /** new(): positional args count until the first kwarg; a
      * positional AFTER any kwarg bails. Duplicate kwarg names
      * overwrite (the reference's HashMap insert). */
    def apply(args: Seq[OpArgSchema]): Either[String, Resolver] = {
      var numPositional = 0
      var kwargs = Map.empty[String, Int]
      for ((arg, idx) <- args.zipWithIndex) {
        arg.name match {
          case Some(n) => kwargs += (n -> idx)
          case None =>
            if (kwargs.nonEmpty)
              return Left(Errors.positionalAfterKeyword)
            numPositional += 1
        }
      }
      Right(new Resolver(args, numPositional, kwargs))
    }
  }

  /** FunctionExecutorWrapper.evaluate's short-circuit
    * (factory_bases.rs:294-301): any tracked-null argument → Null
    * without invoking the executor. */
  def evaluateShortCircuits(nonnullArgsIdx: Seq[Int],
      argIsNull: Seq[Boolean]): Boolean =
    nonnullArgsIdx.exists(argIsNull(_))
}
