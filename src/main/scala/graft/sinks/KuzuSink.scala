package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.incremental.SetupDriver

/** Kuzu-shaped export — the reference's fourth target
  * (src/ops/targets/kuzu.rs): the same property-graph mapping as
  * Neo4j, but Kuzu is SCHEMA-FUL (tables are declared) and its HTTP
  * API takes whole Cypher strings with INLINED literals (no Bolt
  * params — kuzu.rs builds literal key patterns), POSTed to
  * `/cypher`. Rendered statements flow through the same
  * [[CypherSession]] seam as Neo4j.
  *
  *  - setup → `CREATE NODE TABLE IF NOT EXISTS L (k T, …,
  *    __self_contained BOOL, PRIMARY KEY (k))` / `CREATE REL TABLE IF
  *    NOT EXISTS R (FROM S TO T, …)` (kuzu.rs:223-260);
  *  - upsert → `MERGE (n:L {k: <lit>}) SET n.__self_contained = true,
  *    n.v = <lit>;` (kuzu.rs:515-548) — literals render distributedly
  *    as one string projection per row;
  *  - delete → untag + conditional delete, then the per-table orphan
  *    sweep `MATCH (n:L) WITH n WHERE NOT (n)--() DELETE n;`
  *    (kuzu.rs:215-221, 630-660).
  */
object KuzuDdl {

  /** Spark type → Kuzu column type (kuzu.rs:100-152 basic mapping;
    * unmapped types fail loudly like JdbcConnector). */
  def kuzuType(dt: DataType): String = dt match {
    case StringType => "STRING"
    case IntegerType => "INT32"
    case LongType => "INT64"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case BooleanType => "BOOL"
    case TimestampType => "TIMESTAMP"
    case ArrayType(e, _) => s"${kuzuType(e)}[]"
    case other => throw new IllegalArgumentException(
      s"KuzuDdl cannot map $other to a Kuzu column type")
  }

  def createNodeTable(label: String, schema: StructType,
      keyCols: Seq[String]): String = {
    require(keyCols.nonEmpty)
    val cols = schema.fields
      .map(f => s"${f.name} ${kuzuType(f.dataType)}")
      .mkString(", ")
    s"CREATE NODE TABLE IF NOT EXISTS $label ($cols, " +
      s"${Neo4jCypher.SelfContainedTag} BOOL, " +
      s"PRIMARY KEY (${keyCols.mkString(", ")}));"
  }

  def createRelTable(relType: String, srcLabel: String, dstLabel: String,
      props: StructType): String = {
    val cols = props.fields
      .map(f => s", ${f.name} ${kuzuType(f.dataType)}")
      .mkString
    s"CREATE REL TABLE IF NOT EXISTS $relType (FROM $srcLabel TO $dstLabel$cols);"
  }

  def deleteOrphanedNodes(label: String): String =
    s"MATCH (n:$label) WITH n WHERE NOT (n)--() DELETE n;"

  /** Cypher literal of a column value, inlined (kuzu.rs literal key
    * patterns): strings escape backslash + quote; float/double arrays
    * render as `[x, y]`; numerics/bools as-is; null as `NULL`. */
  private[sinks] def cypherLit(c: Column, dt: DataType): Column = {
    val rendered = dt match {
      case StringType =>
        concat(lit("'"),
          regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "'", "\\\\'"),
          lit("'"))
      case ArrayType(_, _) =>
        concat(lit("["), array_join(transform(c, x => x.cast("string")), ", "), lit("]"))
      case _ => c.cast("string")
    }
    coalesce(rendered, lit("NULL"))
  }

  /** Render node upserts: one complete statement string per row. */
  def renderNodeUpserts(rows: DataFrame, label: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    val schema = rows.schema
    def litFor(name: String) = cypherLit(col(name), schema(name).dataType)
    // "{k1: <lit>, k2: <lit>}" and "SET n.v = <lit>, ..." pieces
    val keyParts: Seq[Column] = keyCols.zipWithIndex.flatMap { case (k, i) =>
      val prefix = if (i == 0) s"$k: " else s", $k: "
      Seq(lit(prefix), litFor(k))
    }
    val valueCols = rows.columns.toSeq.filterNot(keyCols.contains)
    val setParts: Seq[Column] =
      Seq(lit(s" SET n.${Neo4jCypher.SelfContainedTag} = true")) ++
        valueCols.flatMap(v => Seq(lit(s", n.$v = "), litFor(v)))
    rows.select(concat(
      Seq(lit(s"MERGE (n:$label {")) ++ keyParts ++ Seq(lit("})")) ++
        setParts ++ Seq(lit(";")): _*).as("cypher"))
  }

  /** Render node deletes: untag, then delete only if disconnected
    * (the Neo4j delete semantics in Kuzu dialect). */
  def renderNodeDeletes(keys: DataFrame, label: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    val schema = keys.schema
    val keyParts: Seq[Column] = keyCols.zipWithIndex.flatMap { case (k, i) =>
      val prefix = if (i == 0) s"$k: " else s", $k: "
      Seq(lit(prefix), cypherLit(col(k), schema(k).dataType))
    }
    keys.select(concat(
      Seq(lit(s"MATCH (n:$label {")) ++ keyParts ++
        Seq(lit(s"}) SET n.${Neo4jCypher.SelfContainedTag} = NULL " +
          "WITH n WHERE NOT (n)--() DELETE n;")): _*).as("cypher"))
  }
}

/** Kuzu [[TargetConnector]]: `target` addresses a node table; setup
  * declares the table DDL (schema-ful store — the keys travel in the
  * connector), mutations render literal-inlined statements through
  * the per-partition [[CypherSession]]. */
final case class KuzuConnector(mkSession: () => CypherSession,
    keyCols: Seq[String] = Seq("id")) extends TargetConnector {
  override def kind: String = "kuzu"

  override def applySetup(spark: SparkSession, target: String,
      desired: StructType, allowRecreate: Boolean): SetupDriver.SetupResult = {
    val session = mkSession()
    if (allowRecreate)
      session.run(CypherStatement(s"DROP TABLE IF EXISTS $target;", "{}"))
    session.run(CypherStatement(
      KuzuDdl.createNodeTable(target, desired, keyCols.filter(desired.fieldNames.contains) match {
        case Nil => desired.fieldNames.take(1).toSeq
        case ks => ks
      }), "{}"))
    val verb = if (allowRecreate) "recreated table" else "created table"
    SetupDriver.SetupResult(SetupDriver.Compatible, verb)
  }

  override def applyMutation(spark: SparkSession, target: String,
      rows: DataFrame, primaryKey: Seq[String],
      deletes: Option[DataFrame]): Unit = {
    val factory = mkSession
    def drive(stmts: DataFrame): Unit = {
      import stmts.sparkSession.implicits._
      stmts.as[String].foreachPartition { it: Iterator[String] =>
        val session = factory()
        it.foreach(c => session.run(CypherStatement(c, "{}")))
      }
    }
    val toUpsert = deletes match {
      case Some(d) =>
        rows.join(d.select(primaryKey.map(col): _*), primaryKey, "left_anti")
      case None => rows
    }
    drive(KuzuDdl.renderNodeUpserts(toUpsert, target, primaryKey))
    deletes.foreach { d =>
      drive(KuzuDdl.renderNodeDeletes(
        d.select(primaryKey.map(col): _*), target, primaryKey))
      factory().run(CypherStatement(KuzuDdl.deleteOrphanedNodes(target), "{}"))
    }
  }

  override def read(spark: SparkSession, target: String): Option[DataFrame] = None
}
