package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Metadata filter model of the search API (reference
  * api/query.py:38-47 → qdrant_service.py:235-302: a filter dict
  * compiles to qdrant `MatchValue` (exact) / `MatchAny` (OR over
  * values) conditions, AND-composed, with dot-notation keys reaching
  * into the nested payload).
  *
  * Spark compilation: a dot-notation key resolves into a nested
  * struct column (`meta.category`) unless the ROOT column is a string
  * — then it is treated as a JSON payload and read with
  * `get_json_object` (the qdrant-payload analogue). Compiled
  * predicates are plain Catalyst comparisons, so struct-column
  * filters push down to the parquet scan like any other predicate.
  */
object Filters {

  sealed trait MetaFilter { def key: String }
  /** Exact match (qdrant MatchValue). */
  final case class MatchValue(key: String, value: Any) extends MetaFilter
  /** OR over values (qdrant MatchAny). */
  final case class MatchAny(key: String, values: Seq[Any]) extends MetaFilter

  /** (resolved column, isJsonPayload): JSON-payload values surface as
    * strings, so comparisons on that branch are stringified. Root
    * lookup is case-insensitive, matching Spark's default resolver —
    * a differently-cased key must take the same branch the resolver
    * would. */
  private def resolve(df: DataFrame, key: String): (Column, Boolean) = {
    val root = key.takeWhile(_ != '.')
    val rootField = df.schema.fields.find(_.name.equalsIgnoreCase(root))
    val isJsonPayload = root != key &&
      rootField.exists(_.dataType == StringType)
    if (isJsonPayload)
      (get_json_object(col(rootField.get.name),
        "$." + key.drop(root.length + 1)), true)
    else (col(key), false)
  }

  /** One AND-composed predicate over all filters (qdrant `must`). */
  def toPredicate(df: DataFrame, filters: Seq[MetaFilter]): Column =
    filters.map {
      case MatchValue(k, v) =>
        resolve(df, k) match {
          case (c, true) => c === lit(v).cast("string")
          case (c, false) => c === lit(v)
        }
      case MatchAny(k, vs) =>
        require(vs.nonEmpty, s"MatchAny($k) needs at least one value")
        resolve(df, k) match {
          case (c, true) => c.isin(vs.map(v => lit(v).cast("string")): _*)
          case (c, false) => c.isin(vs.map(lit): _*)
        }
    }.reduceOption(_ && _).getOrElse(lit(true))

  def apply(df: DataFrame, filters: Seq[MetaFilter]): DataFrame =
    df.where(toPredicate(df, filters))
}
