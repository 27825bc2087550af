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

  /** [[cosine]] with the two norms PRECOMPUTED as columns — for the
    * candidate-verify faces that join vectors onto a pair table: there
    * a row's norm is re-derived once per PAIR by [[cosine]] (the two
    * Σv² passes are 2/3 of the per-pair flops), where it can be
    * computed once per ROW in the vector projection ([[l2Norm]]) and
    * carried through the join.
    *
    * Bit-identical to [[cosine]]: dot is the same left fold,
    * [[l2Norm]] the same sqrt(Σv²) in the same order, and
    * d / (normA · normB) is the identical IEEE expression
    * CosineSimExpr evaluates. Semantics map 1:1 —
    *  - zero norm, null vector, null element, NaN norm → the guard is
    *    false/null → 0.0 (cosine's `when` arm);
    *  - guard true with a null dot (pure length mismatch between two
    *    valid vectors) → null, cosine's one null-producing case. */
  def cosineFromNorms(dotCol: Column, normA: Column, normB: Column): Column =
    when(normA > 0 && normB > 0, dotCol / (normA * normB))
      .otherwise(lit(0.0))
}
