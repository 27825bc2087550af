package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as native higher-order-function expressions
  * (codegen-friendly, no UDF boxing).
  *
  * Reference semantics: cosine top-k vector search
  * (app/services/search_service.py:56-117, qdrant_service.py:235-302)
  * re-expressed as a narrow scan + scalar expressions so Catalyst can
  * pipeline it into whole-stage codegen. All math in double for
  * deterministic, oracle-matchable results (float32 inputs widen
  * exactly to double; sequential left-to-right summation both sides).
  */
object VectorFunctions {

  /** Σ a_i·b_i, left-to-right in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖v‖₂ in double. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity; 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(0.0))
  }
}
