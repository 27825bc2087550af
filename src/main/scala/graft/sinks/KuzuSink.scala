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
  *    NOT EXISTS R (FROM S TO T, …)` (kuzu.rs:223-260); schema drift
  *    converges via `ALTER TABLE … DROP IF EXISTS/ADD`
  *    (kuzu.rs:263-283) when the session can introspect;
  *  - upsert → `MERGE (n:L {k: <lit>}) SET n.__self_contained = true,
  *    n.v = <lit>;` (kuzu.rs:515-548) — literals render distributedly
  *    as one string projection per row;
  *  - delete → untag + conditional delete per key (kuzu.rs:628-654).
  *    The table-wide orphan sweep is a SETUP-time action for endpoint
  *    tables of a dropped rel table only (kuzu.rs:1065-1088) — it is
  *    deliberately NOT part of the per-batch delete path, which would
  *    wipe disconnected self-contained nodes of a node-only export.
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
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case ArrayType(e, _) => s"${kuzuType(e)}[]"
    case other => throw new IllegalArgumentException(
      s"KuzuDdl cannot map $other to a Kuzu column type")
  }

  /** Declared (column, type) pairs for a node table: the exported
    * schema plus the ownership tag, in DDL order. */
  def nodeColumns(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.map(f => f.name -> kuzuType(f.dataType)) :+
      (Neo4jCypher.SelfContainedTag -> "BOOL")

  /** `PRIMARY KEY (k1, k2)` renders the joined key list exactly as
    * kuzu.rs:250-258 does (the store itself accepts single-property
    * keys today; parity keeps the reference's rendering). */
  def createNodeTable(label: String, schema: StructType,
      keyCols: Seq[String]): String = {
    require(keyCols.nonEmpty)
    // rendered from nodeColumns so the DDL and applySetup's
    // convergence diff can never drift apart
    val cols = nodeColumns(schema)
      .map { case (n, t) => s"$n $t" }
      .mkString(", ")
    s"CREATE NODE TABLE IF NOT EXISTS $label ($cols, " +
      s"PRIMARY KEY (${keyCols.mkString(", ")}));"
  }

  def createRelTable(relType: String, srcLabel: String, dstLabel: String,
      props: StructType): String = {
    val cols = props.fields
      .map(f => s", ${f.name} ${kuzuType(f.dataType)}")
      .mkString
    s"CREATE REL TABLE IF NOT EXISTS $relType (FROM $srcLabel TO $dstLabel$cols);"
  }

  /** SETUP-tier sweep for node tables that a dropped rel table
    * referenced (kuzu.rs:215-221, invoked only at kuzu.rs:1086-1088
    * after table drops, with self-exported labels excluded at
    * kuzu.rs:1077-1079). Never run this against a table the connector
    * itself exports: a node-only export has no relationships, so the
    * sweep would delete every node in it. */
  def deleteOrphanedNodes(label: String): String =
    s"MATCH (n:$label) WITH n WHERE NOT (n)--() DELETE n;"

  /** Cypher literal of a column value, inlined (kuzu.rs:292-380):
    * strings double-quote and escape backslash/quote/newline/CR/tab
    * (the reference also \uXXXX-escapes remaining control chars —
    * narrowing documented here); timestamps/dates render as
    * `TIMESTAMP("…")`/`DATE("…")` (kuzu.rs:346-349); arrays render
    * elements recursively (kuzu.rs:364-371) with `NULL` for null
    * elements; null itself renders `NULL`. */
  private[sinks] def cypherLit(c: Column, dt: DataType): Column = {
    val rendered = dt match {
      case StringType =>
        concat(lit("\""),
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
            "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t"),
          lit("\""))
      case TimestampType =>
        concat(lit("TIMESTAMP(\""), c.cast("string"), lit("\")"))
      case DateType =>
        concat(lit("DATE(\""), c.cast("string"), lit("\")"))
      case ArrayType(e, _) =>
        concat(lit("["),
          array_join(transform(c, x => cypherLit(x, e)), ", "),
          lit("]"))
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
    * (kuzu.rs:628-654 — the per-key delete carries its own orphan
    * check; no table-wide sweep follows). */
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
  * connector) and CONVERGES live schema drift when the session can
  * introspect (`CALL table_info` over the same HTTP API); mutations
  * render literal-inlined statements through the per-partition
  * [[CypherSession]]. */
final case class KuzuConnector(mkSession: () => CypherSession,
    keyCols: Seq[String] = Seq("id")) extends TargetConnector {
  override def kind: String = "kuzu"

  /** Converge the node table toward `desired` (kuzu.rs:223-283 setup
    * actions, keyed off the introspection tier):
    *  - no introspection → idempotent `CREATE … IF NOT EXISTS` only
    *    (drift undetectable through a write-only seam — reported);
    *  - missing → create; identical → noop;
    *  - changed/new value columns → `ALTER TABLE DROP IF EXISTS` +
    *    `ADD` (kuzu.rs:268-282 — upserted columns reset their values);
    *  - removed columns → dropped only under `allowRecreate` (data
    *    loss gate, same contract as JdbcConnector), else kept+reported;
    *  - key column drift → full recreate, gated by `allowRecreate`. */
  override def applySetup(spark: SparkSession, target: String,
      desired: StructType, allowRecreate: Boolean): SetupDriver.SetupResult = {
    require(keyCols.nonEmpty && keyCols.forall(desired.fieldNames.contains),
      s"kuzu table $target: key columns [${keyCols.mkString(", ")}] must " +
        s"all exist in the exported schema [${desired.fieldNames.mkString(", ")}]")
    val session = mkSession()
    val desiredCols = KuzuDdl.nodeColumns(desired)
    def create(): Unit = session.run(CypherStatement(
      KuzuDdl.createNodeTable(target, desired, keyCols), "{}"))
    session.tableInfo(target) match {
      case CypherSession.Unknown if allowRecreate =>
        // caller explicitly authorized destruction and the seam can't
        // diff — DROP+CREATE is the only way drift converges here
        session.run(CypherStatement(s"DROP TABLE IF EXISTS $target;", "{}"))
        create()
        SetupDriver.SetupResult(SetupDriver.NotCompatible,
          "recreated table (write-only session: drift undetectable)")
      case CypherSession.Unknown =>
        create()
        SetupDriver.SetupResult(SetupDriver.Compatible,
          "ensured table (write-only session: IF NOT EXISTS, drift undetectable)")
      case CypherSession.Missing =>
        create()
        SetupDriver.SetupResult(SetupDriver.Compatible, "created table")
      case CypherSession.Columns(live) if live.toSet == desiredCols.toSet =>
        SetupDriver.SetupResult(SetupDriver.Compatible, "noop")
      case CypherSession.Columns(live) =>
        val liveTypes = live.toMap
        val desiredTypes = desiredCols.toMap
        val keyDrift = keyCols.exists(k => liveTypes.get(k) != Some(desiredTypes(k)))
        if (keyDrift) {
          if (!allowRecreate)
            throw new IllegalStateException(
              s"kuzu table $target: key column change requires allowRecreate")
          session.run(CypherStatement(s"DROP TABLE IF EXISTS $target;", "{}"))
          create()
          SetupDriver.SetupResult(SetupDriver.NotCompatible, "recreated table")
        } else {
          val upserted = desiredCols.collect {
            case (n, t) if !keyCols.contains(n) && liveTypes.get(n) != Some(t) => (n, t)
          }
          val removed = live.collect {
            case (n, _) if !desiredTypes.contains(n) => n
          }
          upserted.foreach { case (n, t) =>
            session.run(CypherStatement(
              s"ALTER TABLE $target DROP IF EXISTS $n;", "{}"))
            session.run(CypherStatement(
              s"ALTER TABLE $target ADD $n $t;", "{}"))
          }
          if (removed.nonEmpty && allowRecreate)
            removed.foreach(n => session.run(CypherStatement(
              s"ALTER TABLE $target DROP IF EXISTS $n;", "{}")))
          val parts = Seq(
            if (upserted.nonEmpty)
              Some(s"upserted columns: ${upserted.map(_._1).mkString(", ")}")
            else None,
            if (removed.nonEmpty && !allowRecreate)
              Some(s"kept extra columns: ${removed.mkString(", ")} " +
                "(dropping requires allowRecreate)")
            else if (removed.nonEmpty)
              Some(s"dropped columns: ${removed.mkString(", ")}")
            else None).flatten
          SetupDriver.SetupResult(SetupDriver.PartialCompatible,
            s"evolved (${parts.mkString("; ")})")
        }
    }
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
    }
  }

  override def read(spark: SparkSession, target: String): Option[DataFrame] = None
}
