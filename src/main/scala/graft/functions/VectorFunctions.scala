package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math (reference: cosine top-k vector search,
  * app/services/search_service.py:56-117, qdrant_service.py:235-302).
  *
  * Backed by the imperative Catalyst expressions in [[NativeVector]]
  * (the HOF `aggregate(zip_with(...))` formulation computes identical
  * values but runs interpreted with per-element dispatch — the ANN
  * hot path is exactly where that overhead bites). All math in double
  * for deterministic, oracle-matchable results: float32 inputs widen
  * exactly to double; sequential left-to-right summation both sides.
  */
object VectorFunctions {

  /** Σ a_i·b_i, left-to-right in double. */
  def dot(a: Column, b: Column): Column = NativeVector.dotOf(a, b)

  /** ‖v‖₂ in double. */
  def l2Norm(v: Column): Column = sqrt(NativeVector.dotOf(v, v))

  /** Cosine similarity; 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = NativeVector.cosineOf(a, b)
}
