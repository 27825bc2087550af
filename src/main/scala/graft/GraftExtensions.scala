package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineSimExpr, DotExpr, MinHashExpr, RecursiveSplitExpr, ShinglesExpr, SimHashExpr, WinnowExpr}

/** SQL-surface registration of the library's custom Catalyst
  * expressions (the `SparkSessionExtensions` integration tier — set
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `.withExtensions(new GraftExtensions)`):
  *
  * {{{
  *   SELECT graft_simhash(tokens), graft_cosine(a, b),
  *          graft_winnow(text, 8, 4),
  *          graft_split_recursively(text, 200, 50, 20, 'markdown')
  * }}}
  *
  * Each function is the same Expression the Column API uses — one
  * implementation, two surfaces. Integer arguments must be literals
  * (they parameterize the expression, mirroring the reference's
  * build-time op specs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "_FUNC_(tokens) - 64-bit SimHash hex of a token array"),
      (args: Seq[Expression]) => SimHashExpr(args.head)))

    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "_FUNC_(tokens, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) =>
        ShinglesExpr(args(0), intLit(args(1), "n"))))

    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "_FUNC_(tokens, n, k) - k-element MinHash signature over n-gram shingles"),
      (args: Seq[Expression]) =>
        MinHashExpr(args(0), intLit(args(1), "n"), intLit(args(2), "k"))))

    ext.injectFunction((FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "_FUNC_(text, k, w) - winnowing fingerprints (k-gram rolling hash, window w)"),
      (args: Seq[Expression]) =>
        WinnowExpr(args(0), intLit(args(1), "k"), intLit(args(2), "w"))))

    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "_FUNC_(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "_FUNC_(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotExpr(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("graft_split_recursively"),
      info("graft_split_recursively",
        "_FUNC_(text, chunkSize[, minChunkSize, overlap, language]) - structure-aware recursive chunks"),
      (args: Seq[Expression]) => RecursiveSplitExpr(
        args(0), intLit(args(1), "chunkSize"),
        if (args.length > 2) intLit(args(2), "minChunkSize") else 1,
        if (args.length > 3) intLit(args(3), "overlap") else 0,
        if (args.length > 4) strLit(args(4), "language") else "plain")))

    ext.injectFunction((FunctionIdentifier("graft_token_offsets"),
      info("graft_token_offsets",
        "_FUNC_(text) - BM25 tokens with per-occurrence 1-based [start, end) offsets"),
      (args: Seq[Expression]) =>
        graft.functions.TokenOffsetsExpr(args.head, 3, dropStopwords = true)))

    ext.injectFunction((FunctionIdentifier("graft_hyperplane_sig"),
      info("graft_hyperplane_sig",
        "_FUNC_(vec, dim, nBits) - dyadic-LCG hyperplane LSH signature bits"),
      (args: Seq[Expression]) =>
        graft.functions.HyperplaneSigExpr(args(0),
          intLit(args(1), "dim"), intLit(args(2), "nBits"))))

    ext.injectFunction((FunctionIdentifier("graft_heading_blocks"),
      info("graft_heading_blocks",
        "_FUNC_(markdown) - array<struct<heading, body>> heading blocks, preamble merged"),
      (args: Seq[Expression]) =>
        graft.functions.HeadingBlocksExpr(args.head)))
  }
}
