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
}
