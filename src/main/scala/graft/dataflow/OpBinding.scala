package graft.dataflow

/** The custom-op registration surface's deterministic laws
  * (python/cocoindex/op.py:104-440) — what `@op.function()` /
  * `@op.executor_class()` do before any execution: the snake→camel op
  * naming rule, the analyze-time argument-binding ladder with its
  * exact error vocabulary, the nullable-output flip when a nullable
  * engine value feeds a non-nullable parameter, the call-time
  * required-null short-circuit, and the OpArgs cache/behavior-version
  * fallbacks. Pinned by the wave-8 reference-run fixtures
  * (op_binding.json / OpBindingSpec).
  *
  * This is the law the Scala UDF registry enforces at flow build
  * time; the execution side (decoders, memoization keyed on
  * behavior_version) lives in types/PyValueConversion and
  * incremental/Incremental.
  */
object OpBinding {

  /** Python `str.capitalize`: TITLECASE the first CODE POINT (full
    * mapping — 'ß' → "Ss", 'ǆ' → 'ǅ', surrogate pairs intact), lower
    * the rest. */
  private def pyCapitalize(w: String): String =
    if (w.isEmpty) ""
    else {
      val cp = w.codePointAt(0)
      val firstLen = Character.charCount(cp)
      val rest = w.substring(firstLen)
        .toLowerCase(java.util.Locale.ROOT)
      val title = Character.toTitleCase(cp)
      val head =
        if (title != cp) new String(Character.toChars(title))
        else {
          // no simple titlecase mapping: fall back to the full
          // UPPERCASE expansion, titlecased (ß → SS → Ss)
          val up = w.substring(0, firstLen)
            .toUpperCase(java.util.Locale.ROOT)
          if (up.length > firstLen)
            up.substring(0, 1) +
              up.substring(1).toLowerCase(java.util.Locale.ROOT)
          else up
        }
      head + rest
    }

  /** `@op.function`'s op name (op.py:399): split on '_', Python
    * `str.capitalize` each word ("HTTP_call" → "HttpCall"), join.
    * Empty segments from doubled/edge underscores vanish. */
  def opName(fnName: String): String =
    fnName.split("_", -1).map(pyCapitalize).mkString

  /** inspect.Parameter kinds, as the binding ladder distinguishes
    * them. */
  sealed trait ParamKind
  case object PositionalOnly extends ParamKind
  case object PositionalOrKeyword extends ParamKind
  case object VarPositional extends ParamKind
  case object KeywordOnly extends ParamKind
  case object VarKeyword extends ParamKind

  /** One declared parameter: `requiredNonNull` is the annotation's
    * non-nullability (drives the output flip), `hasDefault` drives
    * the missing-argument check — the two are INDEPENDENT, as in the
    * reference. */
  final case class Param(name: String, kind: ParamKind,
      hasDefault: Boolean, requiredNonNull: Boolean)

  /** One supplied argument's engine-side nullability. */
  final case class Arg(nullable: Boolean)

  object Errors {
    def tooManyArgs(n: Int, expected: Int): String =
      s"Too many arguments passed in: $n > $expected"
    def tooManyPositional(n: Int, paramIdx: Int): String =
      s"Too many positional arguments passed in: $n > $paramIdx"
    def unexpectedKwarg(name: String): String =
      s"Unexpected keyword argument passed in: $name"
    def missingArgs(names: Seq[String]): String =
      s"Missing arguments: ${names.mkString(", ")}"
    /** executor_class on a class without a `spec` annotation
      * (op.py:376-377). */
    val specFieldMissing = "Expect a `spec` field with type hint"
    /** _register_op_factory's non-FUNCTION category arm
      * (op.py:358-360). */
    def unsupportedExecutor(category: String): String =
      s"Unsupported executor type $category"
  }

  /** The analyze_schema binding ladder (op.py:230-295): positional
    * args consume parameters in order (a VAR_POSITIONAL parameter
    * never advances), keyword args match remaining
    * keyword-capable parameters or a VAR_KEYWORD catch-all, then the
    * remaining no-default non-VAR parameters are the missing set.
    * Returns whether the op's OUTPUT becomes nullable — true when any
    * nullable engine value fed a non-nullable parameter
    * (op.py:222-224, :304-306). */
  def bind(params: Seq[Param], positional: Seq[Arg],
      kwargs: Seq[(String, Arg)]): Either[String, Boolean] = {
    var flip = false
    var next = 0
    for (arg <- positional) {
      if (next >= params.length)
        return Left(Errors.tooManyArgs(positional.length, params.length))
      val p = params(next)
      if (p.kind == KeywordOnly || p.kind == VarKeyword)
        return Left(Errors.tooManyPositional(positional.length, next))
      if (p.requiredNonNull && arg.nullable) flip = true
      if (p.kind != VarPositional) next += 1
    }
    val expectedKwargs = params.drop(next)
    for ((name, arg) <- kwargs) {
      val matched = expectedKwargs.find(e =>
        (e.name == name &&
          (e.kind == KeywordOnly || e.kind == PositionalOrKeyword)) ||
          e.kind == VarKeyword)
      matched match {
        case None => return Left(Errors.unexpectedKwarg(name))
        case Some(p) =>
          if (p.requiredNonNull && arg.nullable) flip = true
      }
    }
    val kwargNames = kwargs.map(_._1).toSet
    val missing = expectedKwargs.filter(e =>
      !e.hasDefault && (e.kind == PositionalOnly ||
        ((e.kind == KeywordOnly || e.kind == PositionalOrKeyword) &&
          !kwargNames.contains(e.name))))
    if (missing.nonEmpty) Left(Errors.missingArgs(missing.map(_.name)))
    else Right(flip)
  }

  /** __call__'s short-circuit (op.py:320-324, :331-335): a null value
    * in a non-nullable-annotated position returns None WITHOUT
    * invoking the op body. */
  def callShortCircuits(requiredNonNull: Seq[Boolean],
      argIsNull: Seq[Boolean]): Boolean =
    requiredNonNull.zip(argIsNull).exists { case (req, n) => req && n }

  /** The OpArgs fallback accessors (op.py:177-182): a wrapped
    * executor without its own enable_cache/behavior_version reads the
    * decorator's values. */
  final case class OpArgs(gpu: Boolean = false, cache: Boolean = false,
      behaviorVersion: Option[Int] = None)
  def enableCache(args: OpArgs): Boolean = args.cache
  def behaviorVersion(args: OpArgs): Option[Int] = args.behaviorVersion
}
