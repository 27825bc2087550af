package graft.sinks

import java.sql.{DriverManager, Types}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.incremental.{ParquetSink, SetupDriver}

/** Pluggable export-target connector — the custom-target extension
  * surface (reference src/ops/interface.rs:238-316
  * `ExportTargetFactory`: apply_setup_change + apply_mutation
  * {upserts, deletes}; python custom targets subclass op.TargetSpec
  * and register a factory).
  *
  * A connector owns one target kind. `target` is the connector-scoped
  * address (a path for parquet, a table name for JDBC — connection
  * config travels in the connector instance, the AuthEntryReference
  * analogue). Every sink in the engine speaks this contract, so a
  * user-defined store plugs into `Flow.export` / incremental updates
  * without touching the pipeline.
  */
trait TargetConnector {
  def kind: String

  /** Converge the target's schema to `desired` (SetupDriver classify /
    * evolve semantics; destructive changes gated by `allowRecreate`).
    */
  def applySetup(spark: SparkSession, target: String, desired: StructType,
      allowRecreate: Boolean = false): SetupDriver.SetupResult

  /** One export mutation batch (interface.rs:306-309): upsert `rows`
    * on `primaryKey`, then drop `deletes` keys — deletes win over
    * same-batch upserts. */
  def applyMutation(spark: SparkSession, target: String, rows: DataFrame,
      primaryKey: Seq[String], deletes: Option[DataFrame]): Unit

  /** Current contents (None when the target doesn't exist yet). */
  def read(spark: SparkSession, target: String): Option[DataFrame]
}

/** Connector registry (the reference's registered factory map —
  * executor.rs export dispatch by target kind). */
object TargetRegistry {
  private val connectors = new ConcurrentHashMap[String, TargetConnector]()

  def register(c: TargetConnector): Unit = connectors.put(c.kind, c)

  def apply(kind: String): TargetConnector =
    Option(connectors.get(kind)).getOrElse(
      throw new IllegalArgumentException(
        s"no target connector registered for kind '$kind' " +
          s"(registered: ${registered.sorted.mkString(", ")})"))

  def registered: Seq[String] = {
    import scala.jdk.CollectionConverters._
    connectors.keySet().asScala.toSeq
  }

  register(ParquetConnector)
  // statement/request-generation tier by default; a deployment
  // re-registers with a Bolt-backed CypherSession / HTTP QdrantApi
  // (and, for qdrant, its named-vector declarations)
  register(Neo4jConnector(() => RecordingCypherSession("neo4j-default")))
  register(QdrantConnector(() => RecordingQdrantApi("qdrant-default"), Nil))
  register(KuzuConnector(() => RecordingCypherSession("kuzu-default")))
}

/** Path-addressed parquet target: the engine's default sink
  * (ParquetSink merge + SetupDriver schema evolution). */
object ParquetConnector extends TargetConnector {
  override def kind: String = "parquet"

  override def applySetup(spark: SparkSession, target: String,
      desired: StructType, allowRecreate: Boolean): SetupDriver.SetupResult =
    SetupDriver.applySetup(spark, target, desired, allowRecreate)

  override def applyMutation(spark: SparkSession, target: String,
      rows: DataFrame, primaryKey: Seq[String],
      deletes: Option[DataFrame]): Unit =
    ParquetSink.merge(spark, target, rows, primaryKey, deletes)

  override def read(spark: SparkSession, target: String): Option[DataFrame] =
    ParquetSink.read(spark, target)
}

/** Table-addressed JDBC target over [[JdbcSink]] (postgres.rs:18-791
  * tier): setup maps the desired StructType to DDL and classifies the
  * live table's metadata through the same SetupDriver rules.
  */
final case class JdbcConnector(url: String) extends TargetConnector {
  override def kind: String = "jdbc"

  private def sqlType(dt: DataType): String = dt match {
    case StringType => "VARCHAR(4096)"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case other => throw new IllegalArgumentException(
      s"JdbcConnector cannot map $other to a portable SQL type")
  }

  private def sparkType(jdbc: Int, name: String): DataType = jdbc match {
    case Types.VARCHAR | Types.LONGVARCHAR | Types.CHAR | Types.CLOB => StringType
    case Types.INTEGER => IntegerType
    case Types.BIGINT => LongType
    case Types.DOUBLE | Types.FLOAT => DoubleType
    case Types.REAL => FloatType
    case Types.BOOLEAN => BooleanType
    case Types.TIMESTAMP => TimestampType
    // fail loud: a silent StringType here would misclassify a live
    // compatible table as NotCompatible and steer callers toward a
    // destructive recreate
    case other => throw new IllegalArgumentException(
      s"jdbc column $name has unmapped JDBC type $other; " +
        "extend JdbcConnector.sparkType before managing this table")
  }

  /** Live schema via JDBC metadata; None when the table is absent.
    * The lookup pattern follows the store's declared identifier
    * folding (Derby/H2 fold unquoted names upper, Postgres lower), so
    * the same unquoted DDL round-trips everywhere. */
  private def liveSchema(target: String): Option[StructType] = {
    val conn = DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData
      val pattern =
        if (meta.storesUpperCaseIdentifiers) target.toUpperCase
        else if (meta.storesLowerCaseIdentifiers) target.toLowerCase
        else target
      val rs = meta.getColumns(null, null, pattern, null)
      val fields = Iterator.continually(rs)
        .takeWhile(_.next())
        .map { r =>
          val name = r.getString("COLUMN_NAME").toLowerCase
          StructField(name, sparkType(r.getInt("DATA_TYPE"), name))
        }
        .toArray
      if (fields.isEmpty) None else Some(StructType(fields))
    } finally conn.close()
  }

  private def execute(sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    } finally conn.close()
  }

  private def createSql(target: String, desired: StructType): String =
    s"CREATE TABLE $target (" +
      desired.fields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ") + ")"

  override def applySetup(spark: SparkSession, target: String,
      desired: StructType, allowRecreate: Boolean): SetupDriver.SetupResult = {
    // unquoted identifiers case-fold per store; lowercase names are the
    // engine convention and the only spelling that round-trips through
    // metadata on every store
    val mixed = desired.fieldNames.filter(n => n != n.toLowerCase)
    require(mixed.isEmpty,
      s"jdbc-managed columns must be lowercase (case-folding stores): ${mixed.mkString(", ")}")
    liveSchema(target) match {
      case None =>
        execute(createSql(target, desired))
        SetupDriver.SetupResult(SetupDriver.Compatible, "created")
      case Some(existing) =>
        SetupDriver.classify(existing, desired) match {
          case SetupDriver.Compatible =>
            SetupDriver.SetupResult(SetupDriver.Compatible, "noop")
          case SetupDriver.PartialCompatible =>
            val have = existing.fieldNames.toSet
            desired.fields.filterNot(f => have.contains(f.name)).foreach(f =>
              execute(s"ALTER TABLE $target ADD COLUMN ${f.name} ${sqlType(f.dataType)}"))
            // DROP COLUMN destroys live data, so it is gated exactly
            // like recreate; ungated setup only ADDS columns and keeps
            // (reports) the extras — "never drops data silently"
            val extras = existing.fieldNames.filterNot(desired.fieldNames.contains)
            val action =
              if (extras.isEmpty) "evolved"
              else if (allowRecreate) {
                extras.foreach(c => execute(s"ALTER TABLE $target DROP COLUMN $c"))
                s"evolved (dropped columns: ${extras.mkString(", ")})"
              } else
                s"evolved (kept extra columns: ${extras.mkString(", ")}; " +
                  "dropping requires allowRecreate)"
            SetupDriver.SetupResult(SetupDriver.PartialCompatible, action)
          case SetupDriver.NotCompatible if allowRecreate =>
            execute(s"DROP TABLE $target")
            execute(createSql(target, desired))
            SetupDriver.SetupResult(SetupDriver.NotCompatible, "recreated")
          case SetupDriver.NotCompatible =>
            throw new IllegalStateException(
              s"jdbc table $target: incompatible schema change requires allowRecreate")
        }
    }
  }

  override def applyMutation(spark: SparkSession, target: String,
      rows: DataFrame, primaryKey: Seq[String],
      deletes: Option[DataFrame]): Unit =
    JdbcSink.merge(url, target, rows, primaryKey, deletes)

  override def read(spark: SparkSession, target: String): Option[DataFrame] =
    liveSchema(target).map(_ =>
      spark.read.format("jdbc")
        .option("url", url).option("dbtable", target).load())
}
