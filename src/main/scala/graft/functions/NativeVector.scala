package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The HOF formulation (`aggregate(zip_with(...))`) is interpreted and
  * allocates an intermediate array per row; over an ANN corpus the
  * per-element expression dispatch dominates the multiply-adds. These
  * run the identical left-to-right double arithmetic in one imperative
  * pass — bit-identical results (the DuckDB oracles still describe the
  * HOF semantics), including the HOF null behavior: mismatched lengths
  * → null; a null element → null sum (cosine maps both per its
  * `when(...).otherwise(0.0)` wrapper).
  *
  * Both expressions implement `doGenCode`, so the per-vector loop is
  * emitted INSIDE whole-stage codegen — no fallback boundary, no row
  * boxing between the parquet scan and the similarity arithmetic.
  */
object NativeVector {

  def dotOf(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cosineOf(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def hyperplaneSigOf(vec: Column, dim: Int, nBits: Int): Column =
    GraftColumnBridge.column(HyperplaneSigExpr(
      GraftColumnBridge.expression(vec), dim, nBits))

  def argmaxCosineOf(vec: Column, cents: Array[Array[Double]]): Column =
    GraftColumnBridge.column(ArgmaxCosineExpr(
      GraftColumnBridge.expression(vec),
      cents.map(_.toIndexedSeq).toIndexedSeq))

  private[functions] def elemReader(dt: DataType): (ArrayData, Int) => Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => (arr, i) => arr.getFloat(i).toDouble
      case DoubleType => (arr, i) => arr.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"NativeVector expects array<float|double>, got array<$other>")
    }

  /** Java accessor snippet for the codegen path. */
  private[functions] def javaGetter(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other => throw new IllegalArgumentException(
        s"NativeVector expects array<float|double>, got array<$other>")
    }

  private[functions] def hasNullElement(arr: ArrayData): Boolean = {
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

  private[functions] def javaHasNull(ctx: CodegenContext): String =
    ctx.addNewFunction("graftHasNullElem",
      s"""private boolean graftHasNullElem(org.apache.spark.sql.catalyst.util.ArrayData a) {
         |  for (int i = 0; i < a.numElements(); i++) {
         |    if (a.isNullAt(i)) return true;
         |  }
         |  return false;
         |}""".stripMargin)
}

/** Σ aᵢ·bᵢ left-to-right in double — twin of VectorFunctions.dot. */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)

  @transient private lazy val getX = NativeVector.elemReader(left.dataType)
  @transient private lazy val getY = NativeVector.elemReader(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // zip_with pads the shorter side with null → null product → null sum
    if (x.numElements() != y.numElements() ||
        NativeVector.hasNullElement(x) || NativeVector.hasNullElement(y)) {
      null
    } else {
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) {
        acc += getX(x, i) * getY(y, i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hasNull = NativeVector.javaHasNull(ctx)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""if ($x.numElements() != $y.numElements() ||
         |    $hasNull($x) || $hasNull($y)) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $x.numElements(); $i++) {
         |    $acc += ${NativeVector.javaGetter(left.dataType, x, i)} *
         |            ${NativeVector.javaGetter(right.dataType, y, i)};
         |  }
         |  ${ev.value} = $acc;
         |}""".stripMargin
    })
  }
}

/** Cosine similarity — twin of VectorFunctions.cosine: dot/(‖a‖·‖b‖),
  * all three folds left-to-right in double; 0.0 whenever the HOF
  * version's `when(na > 0 && nb > 0)` guard is not (or cannot be
  * proven) true: zero norms, null elements, or null inputs. The one
  * null-producing case is a pure length mismatch (guard true, dot
  * null).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)

  @transient private lazy val getX = NativeVector.elemReader(left.dataType)
  @transient private lazy val getY = NativeVector.elemReader(right.dataType)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return 0.0
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (NativeVector.hasNullElement(x) || NativeVector.hasNullElement(y))
      return 0.0
    var na = 0.0
    var i = 0
    while (i < x.numElements()) { val v = getX(x, i); na += v * v; i += 1 }
    var nb = 0.0
    i = 0
    while (i < y.numElements()) { val v = getY(y, i); nb += v * v; i += 1 }
    if (!(math.sqrt(na) > 0 && math.sqrt(nb) > 0)) return 0.0
    if (x.numElements() != y.numElements()) return null // guard true, dot null
    var d = 0.0
    i = 0
    while (i < x.numElements()) { d += getX(x, i) * getY(y, i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hasNull = NativeVector.javaHasNull(ctx)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val x = ctx.freshName("xArr")
    val y = ctx.freshName("yArr")
    val i = ctx.freshName("i")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val d = ctx.freshName("d")
    val v = ctx.freshName("v")
    val code =
      code"""${leftGen.code}
         |${rightGen.code}
         |boolean ${ev.isNull} = false;
         |double ${ev.value} = 0.0;
         |if (!${leftGen.isNull} && !${rightGen.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $x = ${leftGen.value};
         |  org.apache.spark.sql.catalyst.util.ArrayData $y = ${rightGen.value};
         |  if (!$hasNull($x) && !$hasNull($y)) {
         |    double $na = 0.0;
         |    for (int $i = 0; $i < $x.numElements(); $i++) {
         |      double $v = ${NativeVector.javaGetter(left.dataType, x, i)};
         |      $na += $v * $v;
         |    }
         |    double $nb = 0.0;
         |    for (int $i = 0; $i < $y.numElements(); $i++) {
         |      double $v = ${NativeVector.javaGetter(right.dataType, y, i)};
         |      $nb += $v * $v;
         |    }
         |    if (Math.sqrt($na) > 0 && Math.sqrt($nb) > 0) {
         |      if ($x.numElements() != $y.numElements()) {
         |        ${ev.isNull} = true;
         |      } else {
         |        double $d = 0.0;
         |        for (int $i = 0; $i < $x.numElements(); $i++) {
         |          $d += ${NativeVector.javaGetter(left.dataType, x, i)} *
         |                ${NativeVector.javaGetter(right.dataType, y, i)};
         |        }
         |        ${ev.value} = $d / (Math.sqrt($na) * Math.sqrt($nb));
         |      }
         |    }
         |  }
         |}""".stripMargin
    ev.copy(code = code)
  }
}

/** Hyperplane LSH signature — twin of the HOF formulation kept in
  * Round6Spec.hofHyperplaneSignature (and mirrored by the q26/q72
  * DuckDB oracles): bit b is the sign of the projection onto the
  * integer-LCG dyadic-rational plane
  * `w(b,d) = (lcg(b·dim+d) mod 2001 − 1000) / 1024`. Every product
  * with a float32 component is exact in double (24+11 mantissa bits),
  * so only the sequential left-fold sum order matters — preserved
  * here. HOF null semantics: a null vector, length mismatch, or null
  * element nulls the projection, and `when(w >= 0,...).otherwise`
  * turns a null projection into bit '0' — i.e. the all-zeros
  * signature, never SQL null.
  *
  * Interpreted (CodegenFallback): weights are precomputed once per
  * expression instance and the loop is one tight imperative pass —
  * replacing nBits interpreted aggregate(zip_with(...)) chains per
  * row, which dominated q72's runtime.
  */
case class HyperplaneSigExpr(child: Expression, dim: Int, nBits: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = false

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)

  @transient private lazy val getX = NativeVector.elemReader(child.dataType)
  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](nBits * dim)
    var i = 0
    while (i < w.length) {
      w(i) = (((1103515245L * i + 12345L) % 2147483648L) % 2001L - 1000L) / 1024.0
      i += 1
    }
    w
  }
  @transient private lazy val zeros =
    org.apache.spark.unsafe.types.UTF8String.fromString("0" * nBits)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return zeros
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim || NativeVector.hasNullElement(x)) return zeros
    val out = new Array[Byte](nBits)
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      var d = 0
      val off = b * dim
      while (d < dim) {
        acc += getX(x, d) * weights(off + d)
        d += 1
      }
      // SQL ordering ranks NaN above every number (Spark and DuckDB
      // alike), so the HOF's `w >= 0` is TRUE for a NaN projection —
      // Java's `>=` is false for NaN and would flip the bit
      out(b) = if (acc >= 0 || java.lang.Double.isNaN(acc)) '1' else '0'
      b += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }
}

/** Index of the max-cosine centroid for a vector — the k-means / IVF
  * assignment step as one native pass over the embedded centroid
  * table, replacing a boxed per-row UDF (Seq[Float] conversion per
  * vector per iteration). Centroids ship inside the serialized
  * expression, the plan-literal equivalent of broadcasting the
  * driver-held array. Arithmetic is kept IDENTICAL to the UDF it
  * replaces (per-centroid single pass over min(len) elements, score
  * −2.0 on a zero norm, strict `>` keeps the first best) so
  * assignments are bit-for-bit unchanged; the UDF twin lives in the
  * test suite as the parity oracle.
  *
  * Centroids are a Seq-of-Seq so the case class keeps STRUCTURAL
  * equals/hashCode — Catalyst's semantic-equality machinery (common
  * subexpression elimination, exchange reuse) compares expressions by
  * value, and an Array field would compare by reference and render
  * unreadably in explain output; the hot loop reads a flat Array
  * prebuilt once per instance.
  */
case class ArgmaxCosineExpr(child: Expression, cents: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): ArgmaxCosineExpr =
    copy(child = newChild)

  @transient private lazy val getX = NativeVector.elemReader(child.dataType)
  @transient private lazy val centArrays: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val cs = centArrays
    var best = 0
    var bestScore = Double.MinValue
    var c = 0
    while (c < cs.length) {
      val cent = cs(c)
      var d = 0.0; var na = 0.0; var nb = 0.0
      val n = math.min(cent.length, arr.numElements())
      var i = 0
      while (i < n) {
        val x = getX(arr, i)
        d += x * cent(i); na += x * x; nb += cent(i) * cent(i)
        i += 1
      }
      val score = if (na > 0 && nb > 0) d / (math.sqrt(na) * math.sqrt(nb)) else -2.0
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  override def prettyName: String = "graft_argmax_cosine"
}
