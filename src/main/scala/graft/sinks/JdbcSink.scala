package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}

/** JDBC relational sink tier (src/ops/targets/postgres.rs:18-791):
  * primary-key upsert + key deletes, chunked and transactional.
  *
  * The reference binds value tuples into one multi-VALUES
  * `INSERT ... ON CONFLICT (keys) DO UPDATE` per BIND_LIMIT chunk
  * (postgres.rs:227-270) and deletes row-by-row (:272-300), all inside
  * one transaction per export batch. `ON CONFLICT` is Postgres-only,
  * so this uses the portable equivalent — batched DELETE-then-INSERT
  * on the key inside a single transaction per partition — which has
  * identical visible semantics under the reference's single-writer
  * export model and runs on any JDBC store (tests use embedded Derby,
  * the one JDBC engine shipped with Spark).
  *
  * Spark shape: `foreachPartition` — one connection + one transaction
  * per partition, statements batched `batchSize` at a time. Executors
  * write in parallel, each its own transaction, exactly how
  * distributed JDBC export scales; per-partition commit gives the same
  * at-least-once/idempotent contract as the reference's
  * precommit/commit protocol (upserts are idempotent by key).
  *
  * Identifiers are passed through unquoted — use plain lowercase
  * names (the engine's column convention) and let the store fold case.
  */
object JdbcSink {

  /** Upsert all rows of `df` into `table` keyed by `keyCols`. */
  def upsert(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], batchSize: Int = 500): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    require(keyCols.forall(cols.contains), s"key columns $keyCols must be in ${cols}")
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val deleteSql =
      s"DELETE FROM $table WHERE ${keyCols.map(k => s"$k = ?").mkString(" AND ")}"
    val keyIdx = keyCols.map(schema.fieldIndex)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(deleteSql)
          val ins = conn.prepareStatement(insertSql)
          it.grouped(batchSize).foreach { chunk =>
            chunk.foreach { r =>
              keyIdx.zipWithIndex.foreach { case (ki, i) =>
                del.setObject(i + 1, r.get(ki))
              }
              del.addBatch()
            }
            del.executeBatch()
            chunk.foreach { r =>
              cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
              ins.addBatch()
            }
            ins.executeBatch()
          }
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  /** Delete rows whose key appears in `keys` (postgres.rs:272-300,
    * batched instead of row-by-row). */
  def deleteKeys(keys: DataFrame, url: String, table: String,
      keyCols: Seq[String], batchSize: Int = 500): Unit = {
    val schema = keys.schema
    val deleteSql =
      s"DELETE FROM $table WHERE ${keyCols.map(k => s"$k = ?").mkString(" AND ")}"
    val keyIdx = keyCols.map(schema.fieldIndex)
    keys.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(deleteSql)
          it.grouped(batchSize).foreach { chunk =>
            chunk.foreach { r =>
              keyIdx.zipWithIndex.foreach { case (ki, i) =>
                del.setObject(i + 1, r.get(ki))
              }
              del.addBatch()
            }
            del.executeBatch()
          }
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  /** ParquetSink.merge-shaped entry (the export mutation of
    * interface.rs:306-309): upsert `rows`, then drop `deletes` keys —
    * deletes win over same-batch upserts, matching ParquetSink. */
  def merge(url: String, table: String, rows: DataFrame,
      primaryKey: Seq[String], deletes: Option[DataFrame]): Unit = {
    upsert(rows, url, table, primaryKey)
    deletes.foreach(d => deleteKeys(
      d.select(primaryKey.map(org.apache.spark.sql.functions.col): _*),
      url, table, primaryKey))
  }
}
