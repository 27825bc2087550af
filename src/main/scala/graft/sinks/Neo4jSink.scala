package graft.sinks

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.incremental.SetupDriver

/** Neo4j-shaped export: renders property-graph mutations as the
  * reference's parameterized Cypher statements
  * (src/ops/targets/neo4j.rs:292-430) — generate-the-statements tier,
  * no network. One TEMPLATE per element mapping (exactly the
  * reference's `insert_cypher` / `delete_cypher` strings, including
  * the `__self_contained` ownership tag and the orphan-cleanup clause
  * on relationship delete) plus one PARAMS object per row (the Bolt
  * payload, rendered as JSON).
  *
  * Scale shape: params render distributedly (a plain projection —
  * narrow, codegen'd); statement execution is per-partition through
  * the [[CypherSession]] boundary, the Bolt-driver seam a network
  * deployment fills in. [[RecordingCypherSession]] is the
  * deterministic default used by tests and local runs.
  */
object Neo4jCypher {

  /** Ownership tag distinguishing self-contained (explicitly exported)
    * nodes from endpoint stubs (neo4j.rs:290 SELF_CONTAINED_TAG). */
  val SelfContainedTag = "__self_contained"

  /** `{name: $prefix_i, ...}` key literal + its param names
    * (neo4j.rs:293-307 build_key_field_params_n_literal). */
  private def keyLiteral(prefix: String, fields: Seq[String]): String =
    fields.zipWithIndex
      .map { case (f, i) => s"$f: $$${prefix}_$i" }
      .mkString("{", ", ", "}")

  /** Node mapping: MERGE by key fields, value fields via `+= $props`. */
  final case class NodeMapping(label: String, keyFields: Seq[String],
      valueFields: Seq[String] = Nil) {
    require(keyFields.nonEmpty)

    /** neo4j.rs:322-333 delete_cypher: untag, then delete only if no
      * relationship still touches the node. */
    def deleteCypher: String =
      s"""OPTIONAL MATCH (old_node:$label ${keyLiteral("key", keyFields)})
         |WITH old_node
         |SET old_node.$SelfContainedTag = NULL
         |WITH old_node
         |WHERE NOT (old_node)--()
         |DELETE old_node
         |FINISH""".stripMargin

    /** neo4j.rs:335-345 insert_cypher. */
    def insertCypher: String = {
      val setProps =
        if (valueFields.nonEmpty) ", new_node += $props" else ""
      s"""MERGE (new_node:$label ${keyLiteral("key", keyFields)})
         |SET new_node.$SelfContainedTag = TRUE$setProps
         |FINISH""".stripMargin
    }
  }

  /** Relationship mapping: MERGE endpoints as stubs, then the rel
    * (neo4j.rs:395-430); delete cleans up orphaned non-self-contained
    * endpoints (neo4j.rs:361-374). */
  final case class RelMapping(relType: String, keyFields: Seq[String],
      valueFields: Seq[String],
      srcLabel: String, srcKeyFields: Seq[String],
      dstLabel: String, dstKeyFields: Seq[String]) {
    require(srcKeyFields.nonEmpty && dstKeyFields.nonEmpty)

    def deleteCypher: String =
      s"""OPTIONAL MATCH (old_src)-[old_rel:$relType ${keyLiteral("key", keyFields)}]->(old_tgt)
         |
         |DELETE old_rel
         |
         |WITH collect(old_src) + collect(old_tgt) AS nodes_to_check
         |UNWIND nodes_to_check AS node
         |WITH DISTINCT node
         |WHERE NOT COALESCE(node.$SelfContainedTag, FALSE)
         |  AND COUNT{ (node)--() } = 0
         |DELETE node
         |
         |FINISH""".stripMargin

    def insertCypher: String = {
      val setRelProps =
        if (valueFields.nonEmpty) "\nSET new_rel += $props" else ""
      s"""MERGE (new_src:$srcLabel ${keyLiteral("source_key", srcKeyFields)})
         |
         |MERGE (new_tgt:$dstLabel ${keyLiteral("target_key", dstKeyFields)})
         |
         |MERGE (new_src)-[new_rel:$relType ${keyLiteral("key", keyFields)}]->(new_tgt)$setRelProps
         |
         |FINISH""".stripMargin
    }
  }

  /** Key-constraint setup statement (neo4j.rs setup tier: node keys
    * become a uniqueness constraint; idempotent form). */
  def nodeKeyConstraint(label: String, keyFields: Seq[String]): String = {
    val props = keyFields.map(f => s"e.$f").mkString("(", ", ", ")")
    s"CREATE CONSTRAINT IF NOT EXISTS FOR (e:$label) REQUIRE $props IS UNIQUE"
  }

  private def paramsJson(keyPrefixed: Seq[(String, String)],
      props: Option[(String, Seq[String])]): org.apache.spark.sql.Column = {
    val keyCols = keyPrefixed.map { case (p, f) => col(f).as(p) }
    val propCols = props.toSeq.collect {
      case (name, fields) if fields.nonEmpty =>
        struct(fields.map(col): _*).as(name)
    }
    to_json(struct(keyCols ++ propCols: _*))
  }

  /** Render one node upsert batch → (cypher, params) rows. */
  def renderNodeUpserts(rows: DataFrame, m: NodeMapping): DataFrame =
    rows.select(
      lit(m.insertCypher).as("cypher"),
      paramsJson(
        m.keyFields.zipWithIndex.map { case (f, i) => (s"key_$i", f) },
        Some(("props", m.valueFields))).as("params"))

  /** Render one node delete batch (key rows) → (cypher, params). */
  def renderNodeDeletes(keys: DataFrame, m: NodeMapping): DataFrame =
    keys.select(
      lit(m.deleteCypher).as("cypher"),
      paramsJson(
        m.keyFields.zipWithIndex.map { case (f, i) => (s"key_$i", f) },
        None).as("params"))

  /** Render one relationship upsert batch → (cypher, params). */
  def renderRelUpserts(rows: DataFrame, m: RelMapping): DataFrame =
    rows.select(
      lit(m.insertCypher).as("cypher"),
      paramsJson(
        m.srcKeyFields.zipWithIndex.map { case (f, i) => (s"source_key_$i", f) } ++
          m.dstKeyFields.zipWithIndex.map { case (f, i) => (s"target_key_$i", f) } ++
          m.keyFields.zipWithIndex.map { case (f, i) => (s"key_$i", f) },
        Some(("props", m.valueFields))).as("params"))

  /** Render one relationship delete batch (key rows). */
  def renderRelDeletes(keys: DataFrame, m: RelMapping): DataFrame =
    keys.select(
      lit(m.deleteCypher).as("cypher"),
      paramsJson(
        m.keyFields.zipWithIndex.map { case (f, i) => (s"key_$i", f) },
        None).as("params"))
}

/** One parameterized statement as it would go over Bolt. */
final case class CypherStatement(cypher: String, params: String)

/** The Bolt-driver seam: a network deployment implements `run` with a
  * driver session; the engine only ever hands it rendered statements.
  * Implementations must be constructible per-partition (Serializable
  * factory), mirroring how JdbcSink opens per-partition connections. */
trait CypherSession extends Serializable {
  def run(st: CypherStatement): Unit

  /** Schema introspection for schema-ful stores (Kuzu answers
    * `CALL table_info(...)` over the same API that takes statements;
    * Neo4j is schemaless and leaves the default). [[CypherSession.Unknown]]
    * = this session cannot answer (write-only seam) — setup then falls
    * back to idempotent `IF NOT EXISTS` DDL with no convergence check. */
  def tableInfo(table: String): CypherSession.TableInfo = CypherSession.Unknown
}

object CypherSession {
  /** What a session knows about a table's live schema. */
  sealed trait TableInfo
  /** The seam cannot introspect (write-only deployment). */
  case object Unknown extends TableInfo
  /** The store answered: no such table. */
  case object Missing extends TableInfo
  /** The store answered: these (column, type) pairs, in DDL order. */
  final case class Columns(cols: Seq[(String, String)]) extends TableInfo
}

/** Deterministic recording session: statements land in a named
  * in-process BOUNDED log (test- and local-mode visible; oldest
  * entries drop past `maxStatements`, with the drop count kept, so a
  * long-lived process can never grow the log unboundedly). SINGLE-JVM
  * ONLY by design: on a real cluster the per-partition sessions run in
  * executor JVMs where a static log is invisible to the driver — a
  * deployment must register a Bolt-backed [[CypherSession]] instead.
  */
final case class RecordingCypherSession(logId: String) extends CypherSession {
  override def run(st: CypherStatement): Unit =
    RecordingCypherSession.append(logId, st)

  /** The recording fixture IS the store, so it answers introspection
    * from the DDL it has executed (tracked per log). */
  override def tableInfo(table: String): CypherSession.TableInfo =
    RecordingCypherSession.tableInfo(logId, table)
}

object RecordingCypherSession {
  /** Bound on retained statements per log (drop-oldest past it). */
  val maxStatements = 10000

  private val log = BoundedRecordingLog.registry[CypherStatement](maxStatements)

  // Live node-table schemas per (logId, table), maintained by applying
  // the canonical DDL forms KuzuDdl renders — the deterministic twin of
  // a schema-ful store's catalog. Statements that match no form (all of
  // Neo4j's, Kuzu MERGE/MATCH, rel tables) leave the catalog untouched.
  private val tables =
    new ConcurrentHashMap[(String, String), Seq[(String, String)]]()
  private val CreateNode =
    """(?s)CREATE NODE TABLE IF NOT EXISTS (\w+) \((.*), PRIMARY KEY \([^)]*\)\);\s*""".r
  private val DropTable = """DROP TABLE IF EXISTS (\w+);\s*""".r
  private val AlterDrop = """ALTER TABLE (\w+) DROP IF EXISTS (\w+);\s*""".r
  private val AlterAdd = """ALTER TABLE (\w+) ADD (\w+) (\S+);\s*""".r

  private def applyDdl(id: String, cypher: String): Unit = cypher match {
    case CreateNode(t, cols) =>
      // IF NOT EXISTS: an existing table is left untouched
      tables.putIfAbsent((id, t), cols.split(", ").toSeq.map { c =>
        val i = c.indexOf(' '); (c.substring(0, i), c.substring(i + 1))
      })
    case DropTable(t) => tables.remove((id, t))
    case AlterDrop(t, c) =>
      tables.computeIfPresent((id, t), (_, cols) => cols.filterNot(_._1 == c))
    case AlterAdd(t, c, ty) =>
      tables.computeIfPresent((id, t), (_, cols) =>
        cols.filterNot(_._1 == c) :+ (c, ty))
    case _ => ()
  }

  private[sinks] def tableInfo(id: String, table: String): CypherSession.TableInfo =
    Option(tables.get((id, table)))
      .map(CypherSession.Columns.apply)
      .getOrElse(CypherSession.Missing)

  private[sinks] def append(id: String, st: CypherStatement): Unit = {
    log(id).add(st)
    applyDdl(id, st.cypher)
  }
  def statements(id: String): Seq[CypherStatement] = log(id).items
  /** Statements evicted by the bound since the last clear. */
  def dropped(id: String): Long = log(id).dropped
  def clear(id: String): Unit = {
    log(id).clear()
    tables.keySet.removeIf(_._1 == id)
  }
}

/** Neo4j [[TargetConnector]]: `target` addresses a node label;
  * `applyMutation` renders the reference's upsert/delete Cypher for
  * the batch and drives it through the session boundary per
  * partition. Property graphs are schemaless, so `applySetup` ensures
  * the key constraint at mutation time (idempotent CREATE CONSTRAINT)
  * rather than evolving columns; `read` reports absent — the graph
  * lives behind Bolt, not in a scannable table (use PropertyGraph's
  * parquet frames for the queryable tier).
  */
final case class Neo4jConnector(mkSession: () => CypherSession)
    extends TargetConnector {
  override def kind: String = "neo4j"

  override def applySetup(spark: SparkSession, target: String,
      desired: StructType, allowRecreate: Boolean): SetupDriver.SetupResult =
    SetupDriver.SetupResult(SetupDriver.Compatible,
      "noop (schemaless store; key constraint ensured per mutation batch)")

  override def applyMutation(spark: SparkSession, target: String,
      rows: DataFrame, primaryKey: Seq[String],
      deletes: Option[DataFrame]): Unit = {
    val m = Neo4jCypher.NodeMapping(target, primaryKey,
      rows.columns.filterNot(primaryKey.contains).toSeq)
    val factory = mkSession
    factory().run(CypherStatement(
      Neo4jCypher.nodeKeyConstraint(target, primaryKey), "{}"))
    def drive(batch: DataFrame): Unit =
      batch.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val session = factory()
        it.foreach(r => session.run(CypherStatement(r.getString(0), r.getString(1))))
      }
    // deletes win over same-batch upserts (connector contract)
    val toUpsert = deletes match {
      case Some(d) => rows.join(d.select(primaryKey.map(col): _*), primaryKey, "left_anti")
      case None => rows
    }
    drive(Neo4jCypher.renderNodeUpserts(toUpsert, m))
    deletes.foreach(d => drive(Neo4jCypher.renderNodeDeletes(
      d.select(primaryKey.map(col): _*), m)))
  }

  override def read(spark: SparkSession, target: String): Option[DataFrame] = None
}
