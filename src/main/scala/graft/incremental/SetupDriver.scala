package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative sink setup (reference setup/driver.rs + components.rs;
  * interface.rs:238-316): desired state is compared against existing
  * state, classified, and changes are applied idempotently.
  *
  *  - [[Compatible]]: existing schema already matches (nullability
  *    ignored — parquet round-trips widen it).
  *  - [[PartialCompatible]]: existing can evolve in place — desired
  *    adds columns (backfilled null) and/or drops columns; shared
  *    columns keep their types.
  *  - [[NotCompatible]]: a shared column changed type — the reference
  *    requires a drop-and-recreate, which `applySetup` only performs
  *    when `allowRecreate` (data loss is explicit, never silent).
  */
object SetupDriver {

  sealed trait Compat
  case object Compatible extends Compat
  case object PartialCompatible extends Compat
  case object NotCompatible extends Compat

  /** Nullability-normalized type (parquet round-trips widen it). */
  private def norm(dt: DataType): DataType = dt match {
    case StructType(fs) =>
      StructType(fs.map(f => f.copy(dataType = norm(f.dataType), nullable = true)))
    case ArrayType(et, _) => ArrayType(norm(et), containsNull = true)
    case MapType(k, v, _) => MapType(norm(k), norm(v), valueContainsNull = true)
    case other => other
  }

  private def normalized(s: StructType): Seq[(String, DataType)] =
    s.fields.map(f => f.name -> norm(f.dataType)).toSeq

  /** Classify desired vs existing (order-insensitive, nullability-
    * insensitive). */
  def classify(existing: StructType, desired: StructType): Compat = {
    val e = normalized(existing).toMap
    val d = normalized(desired).toMap
    val typeConflict = (e.keySet & d.keySet).exists(k => e(k) != d(k))
    if (typeConflict) NotCompatible
    else if (e == d) Compatible
    else PartialCompatible
  }

  final case class SetupResult(compat: Compat, action: String)

  /** Bring the parquet table at `path` to the `desired` schema.
    * Absent → create empty. Compatible → no-op. PartialCompatible →
    * in-place evolution (add nulls / drop extras), data preserved.
    * NotCompatible → recreate empty iff `allowRecreate`, else throw.
    */
  def applySetup(spark: SparkSession, path: String, desired: StructType,
      allowRecreate: Boolean = false): SetupResult = {
    def empty: DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], desired)
    ParquetSink.read(spark, path) match {
      case None =>
        ParquetSink.swapWrite(spark, path, empty)
        SetupResult(Compatible, "created")
      case Some(existing) =>
        classify(existing.schema, desired) match {
          case Compatible => SetupResult(Compatible, "noop")
          case PartialCompatible =>
            val have = existing.schema.fieldNames.toSet
            val evolved = existing.select(desired.fields.map { f =>
              if (have.contains(f.name)) col(f.name)
              else lit(null).cast(f.dataType).as(f.name)
            }.toIndexedSeq: _*)
            ParquetSink.swapWrite(spark, path, evolved)
            SetupResult(PartialCompatible, "evolved")
          case NotCompatible if allowRecreate =>
            ParquetSink.swapWrite(spark, path, empty)
            SetupResult(NotCompatible, "recreated")
          case NotCompatible =>
            throw new IllegalStateException(
              s"sink $path: incompatible schema change requires allowRecreate")
        }
    }
  }

  // ------------------------------------------------------------------
  // Declarations (reference spec.rs:524 `FlowInstanceSpec.declarations`;
  // python/cocoindex/targets.py:103-127 Neo4jDeclaration/KuzuDeclaration)
  // ------------------------------------------------------------------

  /** A target-side artifact declared by the flow but not owned by any
    * single export op — e.g. a graph node label with its primary key
    * and vector indexes. At Spark tier an "index" is layout metadata
    * (the physical analogue is a bucketed/sorted write or an IVF
    * centroid artifact); the declaration records the desired state the
    * setup driver converges the sink to.
    */
  final case class Declaration(kind: String, name: String,
      primaryKey: Seq[String], indexes: Seq[String] = Nil) {
    def key: String = s"$kind/$name"
  }

  final case class DeclarationAction(key: String, action: String)

  private val declSchema = StructType(Seq(
    StructField("kind", StringType), StructField("name", StringType),
    StructField("primary_key", ArrayType(StringType)),
    StructField("indexes", ArrayType(StringType))))

  /** Declarations currently tracked in the setup state at `statePath`. */
  def declaredState(spark: SparkSession, statePath: String): Seq[Declaration] =
    ParquetSink.read(spark, statePath).toSeq.flatMap(_.collect().map { r =>
      Declaration(r.getString(0), r.getString(1),
        r.getSeq[String](2), r.getSeq[String](3))
    })

  /** Converge tracked state to `desired` (reference setup/driver.rs
    * component diff): new key → created; same key with changed
    * primary key / indexes → updated; unchanged → noop; tracked key
    * absent from `desired` → dropped. Idempotent — a second apply of
    * the same `desired` is all-noop. The state itself is tiny
    * metadata; `collect()` here is setup-time, never per-row.
    */
  def applyDeclarations(spark: SparkSession, statePath: String,
      desired: Seq[Declaration]): Seq[DeclarationAction] = {
    require(desired.map(_.key).distinct.size == desired.size,
      "duplicate declaration keys")
    val existing = declaredState(spark, statePath).map(d => d.key -> d).toMap
    val actions = desired.map { d =>
      existing.get(d.key) match {
        case None => DeclarationAction(d.key, "created")
        case Some(e) if e == d => DeclarationAction(d.key, "noop")
        case Some(_) => DeclarationAction(d.key, "updated")
      }
    } ++ existing.keys.filterNot(desired.map(_.key).toSet)
      .map(DeclarationAction(_, "dropped"))
    import scala.jdk.CollectionConverters._
    val rows = desired.map(d => org.apache.spark.sql.Row(
      d.kind, d.name, d.primaryKey, d.indexes))
    ParquetSink.swapWrite(spark,
      statePath, spark.createDataFrame(rows.asJava, declSchema))
    actions
  }
}
