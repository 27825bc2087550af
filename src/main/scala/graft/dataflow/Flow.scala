package graft.dataflow

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative dataflow: `import → transform → collect → export`.
  *
  * Spark re-expression of the reference engine's structural operators
  * (src/base/spec.rs:280-384, src/execution/evaluator.rs:345-481):
  *  - Import (spec.rs:280-295): bind a keyed DataFrame into the flow;
  *    sources MUST carry a key column (analyzer.rs:671-675).
  *  - Transform (spec.rs:305-308): define ONE new write-once field per
  *    call (spec.rs:33-37) — schema checked at build time, exactly as
  *    the reference infers schemas statically (analyzer.rs:1015-1130);
  *    here Catalyst is the analyzer.
  *  - ForEach (spec.rs:328-350): open a child scope per element of a
  *    nested-array field; realized as `posexplode` with the parent key
  *    carried through (the "scope up level" reference semantics —
  *    parent columns stay addressable).
  *  - Collect (spec.rs:354-384): append a projected struct to a named
  *    collector; collectors union across collect sites. Optional
  *    stable auto-UUID derived from the collected content fingerprint
  *    (memoization.rs:213-233) so re-evaluations reuse identities.
  *  - Export: sink a collector to parquet with primary-key merge
  *    (graft.incremental.ParquetSink; Delta/JDBC MERGE at cluster
  *    scale).
  *
  * The flow stays fully lazy: collectors are logical plans, nothing
  * runs until `export`/`collector` is acted on — Catalyst sees the
  * whole pipeline and prunes/pushes down across it.
  */
final class Flow(val spark: SparkSession) {
  private val collectors = mutable.LinkedHashMap[String, mutable.ListBuffer[DataFrame]]()
  private val declared = mutable.ListBuffer[graft.incremental.SetupDriver.Declaration]()

  /** Import a keyed source (Import op). */
  def importSource(df: DataFrame, keyCol: String): Scope = {
    require(df.columns.contains(keyCol),
      s"source must produce a keyed table; missing key column '$keyCol'")
    new Scope(this, df, Seq(keyCol))
  }

  private[dataflow] def addToCollector(name: String, rows: DataFrame): Unit =
    collectors.getOrElseUpdate(name, mutable.ListBuffer()) += rows

  /** Materialized view of a collector: union of all collect sites. */
  def collector(name: String): DataFrame = {
    val frames = collectors.getOrElse(name,
      throw new IllegalArgumentException(s"unknown collector '$name'"))
    frames.reduce(_ unionByName _)
  }

  def collectorNames: Seq[String] = collectors.keys.toSeq

  /** Export a collector to a parquet path, merging on primary key.
    * The export name follows the identifier rules (flow.py:396). */
  def export(name: String, path: String, primaryKey: Seq[String]): Unit = {
    Naming.validateTargetName(name)
    graft.incremental.ParquetSink.merge(
      spark, path, collector(name), primaryKey,
      deletes = None)
  }

  /** Export a collector through a registered target connector
    * (interface.rs:238-316 dispatch-by-kind — the custom-target
    * extension point: any [[graft.sinks.TargetConnector]] plugs in).
    */
  def exportTo(name: String, kind: String, target: String,
      primaryKey: Seq[String]): Unit = {
    Naming.validateTargetName(name)
    graft.sinks.TargetRegistry(kind)
      .applyMutation(spark, target, collector(name), primaryKey, deletes = None)
  }

  /** Declaration op (spec.rs:524 `declarations`): register a
    * target-side artifact — a label/table plus primary key and index
    * metadata — owned by the flow rather than any single export.
    */
  def declare(d: graft.incremental.SetupDriver.Declaration): Flow = {
    declared += d; this
  }

  def declarations: Seq[graft.incremental.SetupDriver.Declaration] =
    declared.toSeq

  /** Converge the setup state at `statePath` to this flow's
    * declarations (create/update/drop — SetupDriver diff semantics).
    */
  def applyDeclarations(statePath: String)
      : Seq[graft.incremental.SetupDriver.DeclarationAction] =
    graft.incremental.SetupDriver.applyDeclarations(spark, statePath, declared.toSeq)
}

object Flow {
  def apply(spark: SparkSession): Flow = new Flow(spark)

  /** Stable content-derived UUID (UUIDv5-style shape over md5 of the
    * field fingerprint — memoization.rs:213-233 reuse semantics):
    * identical collected content ⇒ identical id across runs.
    *
    * Fields hash null-flagged and length-prefixed (r18 review pass 9
    * — the Memo.fingerprint law): concat_ws SKIPS null columns, so
    * the bare form gave (null, "x") and ("x", null) the SAME uuid —
    * and a value embedding the separator aliased a column boundary —
    * and a primary-key merge on that uuid silently collapses distinct
    * rows. The reference's fingerprinter frames values with
    * type/length information (utils/fingerprint.rs) and cannot
    * collide either way. FORMAT BREAK, one-time: auto-UUIDs
    * persisted by pre-r18 exports re-key on the first re-run at
    * this version (identical content gets a NEW id once, so a
    * primary-key merge inserts rather than updates) — rotate or
    * recreate uuid-keyed sinks across this upgrade, exactly the
    * Memo "graft-memo-v2" migration note. */
  def stableUuid(cols: Column*): Column = {
    val tagged = cols.map { c =>
      val s = c.cast("string")
      when(s.isNull, lit("0"))
        .otherwise(concat(lit("1"), length(s), lit(":"), s))
    }
    val h = md5(concat_ws("", tagged: _*))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }
}

/** One scope of the flow: a DataFrame plus the key columns that
  * identify a row of this scope (root key + ForEach element indexes).
  */
final class Scope private[dataflow] (
    flow: Flow, val df: DataFrame, val keyCols: Seq[String]) {

  /** Transform op: define one NEW field (write-once enforced; name
    * checked against the identifier rules, flow.py:311-313). */
  def transform(field: String, value: Column): Scope = {
    Naming.validateFieldName(field)
    require(!df.columns.contains(field),
      s"field '$field' already defined in scope (fields are write-once)")
    new Scope(flow, df.withColumn(field, value), keyCols)
  }

  /** ForEach op over an array field: child scope with one row per
    * element; parent columns remain in scope ("scope up" references).
    * The element index joins the key (KTable/LTable row identity).
    */
  def forEach(arrayField: String, elemName: String): Scope = {
    require(df.columns.contains(arrayField), s"no such field '$arrayField'")
    val idxName = s"${elemName}_index"
    val exploded = df.select(col("*"),
        posexplode(col(arrayField)).as(Seq(idxName, elemName)))
      .drop(arrayField)
    new Scope(flow, exploded, keyCols :+ idxName)
  }

  /** Collect op: project fields into a named collector. With
    * `autoUuidField`, prepend a stable content-derived UUID.
    */
  def collect(collectorName: String, fields: Seq[(String, Column)],
      autoUuidField: Option[String] = None): Scope = {
    val projected = df.select(fields.map { case (n, c) => c.as(n) }: _*)
    val out = autoUuidField match {
      case Some(uuidName) =>
        projected.select(
          Flow.stableUuid(fields.map { case (n, _) => col(n) }: _*).as(uuidName) +:
            fields.map { case (n, _) => col(n) }: _*)
      case None => projected
    }
    flow.addToCollector(collectorName, out)
    this
  }
}
