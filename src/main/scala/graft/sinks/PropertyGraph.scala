package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.incremental.ParquetSink

/** Property-graph export mapping (reference shared/property_graph.rs:
  * 6-154 + neo4j.rs:280-1145 / kuzu.rs — Cypher/Kuzu MERGE replaced by
  * key-merged nodes/relationships DataFrames on a sink path).
  *
  * Semantics carried over:
  *  - rows → `Nodes(label)`: key fields + property fields, MERGE by
  *    (label, key) (neo4j.rs:333-340);
  *  - rows → `Relationships(rel_type, source, target)`: the rel MERGE
  *    also upserts its endpoint nodes as key-only stubs
  *    (neo4j.rs:395-401) — stubs never overwrite a full node;
  *  - delete + orphan cleanup: removing rels removes endpoint stubs
  *    that no longer touch any rel, while explicitly-exported nodes
  *    stay (neo4j.rs:321-369, 888-890).
  *
  * Graph traversals over the result are plain joins
  * (graft.operators.Entities.nHop); at cluster scale the two frames
  * are Delta tables MERGEd in foreachBatch.
  */
object PropertyGraph {

  private val keySep = "\u0001"

  /** Canonical node frame: (label, node_key, properties, stub). */
  def nodeRows(rows: DataFrame, label: String, keyCols: Seq[String],
      propCols: Seq[String] = Nil): DataFrame =
    rows.select(
        lit(label).as("label"),
        concat_ws(keySep, keyCols.map(c => col(c).cast("string")): _*).as("node_key"),
        to_json(struct((keyCols ++ propCols).map(col): _*)).as("properties"),
        lit(false).as("stub"))
      .dropDuplicates("label", "node_key")

  /** Canonical relationship frame keyed by
    * (rel_type, src_label, src_key, dst_label, dst_key). */
  def relRows(rows: DataFrame, relType: String,
      srcLabel: String, srcKeyCols: Seq[String],
      dstLabel: String, dstKeyCols: Seq[String],
      propCols: Seq[String] = Nil): DataFrame =
    rows.select(
        lit(relType).as("rel_type"),
        lit(srcLabel).as("src_label"),
        concat_ws(keySep, srcKeyCols.map(c => col(c).cast("string")): _*).as("src_key"),
        lit(dstLabel).as("dst_label"),
        concat_ws(keySep, dstKeyCols.map(c => col(c).cast("string")): _*).as("dst_key"),
        to_json(struct(propCols.map(col): _*)).as("properties"))
      .dropDuplicates("rel_type", "src_label", "src_key", "dst_label", "dst_key")

  /** Key-only endpoint stubs implied by a relationship frame. */
  def endpointStubs(rels: DataFrame): DataFrame =
    rels.select(col("src_label").as("label"), col("src_key").as("node_key"))
      .unionByName(rels.select(col("dst_label").as("label"), col("dst_key").as("node_key")))
      .distinct()
      .select(col("label"), col("node_key"), lit("{}").as("properties"),
        lit(true).as("stub"))

  private def nodesPath(dir: String) = s"$dir/nodes"
  private def relsPath(dir: String) = s"$dir/rels"
  private val nodeKey = Seq("label", "node_key")
  private val relKey = Seq("rel_type", "src_label", "src_key", "dst_label", "dst_key")

  /** MERGE nodes + rels (+ implied endpoint stubs) into `dir`.
    * A stub never replaces an existing full node: incoming stubs are
    * filtered against both the existing nodes and this batch's full
    * nodes before the merge.
    */
  def upsert(spark: SparkSession, dir: String, nodes: DataFrame,
      rels: DataFrame): Unit = {
    val stubs = endpointStubs(rels)
      .join(nodes.select(nodeKey.map(col): _*), nodeKey, "left_anti")
    val existingFull = ParquetSink.read(spark, nodesPath(dir))
      .map(_.where(!col("stub")).select(nodeKey.map(col): _*))
    val newStubs = existingFull match {
      case Some(full) => stubs.join(full, nodeKey, "left_anti")
      case None => stubs
    }
    ParquetSink.merge(spark, nodesPath(dir), nodes.unionByName(newStubs),
      nodeKey, deletes = None)
    ParquetSink.merge(spark, relsPath(dir), rels, relKey, deletes = None)
  }

  /** Delete relationships by key, then drop orphaned stubs (stub nodes
    * no remaining rel touches — neo4j.rs:888-890). */
  def deleteRels(spark: SparkSession, dir: String, relKeys: DataFrame): Unit = {
    ParquetSink.read(spark, relsPath(dir)).foreach { rels =>
      ParquetSink.merge(spark, relsPath(dir),
        rels.limit(0), relKey, deletes = Some(relKeys))
      orphanCleanup(spark, dir)
    }
  }

  /** Remove stub nodes with no incident relationship. */
  def orphanCleanup(spark: SparkSession, dir: String): Unit =
    for {
      nodes <- ParquetSink.read(spark, nodesPath(dir))
      rels <- ParquetSink.read(spark, relsPath(dir))
    } {
      val referenced = endpointStubs(rels).select(nodeKey.map(col): _*)
      val keep = nodes.where(!col("stub"))
        .unionByName(nodes.where(col("stub"))
          .join(referenced, nodeKey, "left_semi"))
      ParquetSink.swapWrite(spark, nodesPath(dir), keep)
    }

  def nodes(spark: SparkSession, dir: String): Option[DataFrame] =
    ParquetSink.read(spark, nodesPath(dir))
  def rels(spark: SparkSession, dir: String): Option[DataFrame] =
    ParquetSink.read(spark, relsPath(dir))
}
