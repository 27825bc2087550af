package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.incremental.SetupDriver

/** One Qdrant REST call as it would go over HTTP. */
final case class QdrantRequest(method: String, path: String, body: String)

/** The Qdrant client seam (qdrant.rs ExportContext's `qdrant_client`):
  * a real deployment implements `send` with an HTTP/gRPC client; the
  * default records deterministically. Constructible per partition. */
trait QdrantApi extends Serializable {
  def send(req: QdrantRequest): Unit
}

/** Bounded in-process recording API (single-JVM only, like
  * [[RecordingCypherSession]] — executors' statics are invisible to
  * the driver on a real cluster). */
final case class RecordingQdrantApi(logId: String) extends QdrantApi {
  override def send(req: QdrantRequest): Unit =
    RecordingQdrantApi.append(logId, req)
}

object RecordingQdrantApi {
  val maxRequests = 10000
  private val log = BoundedRecordingLog.registry[QdrantRequest](maxRequests)
  private[sinks] def append(id: String, req: QdrantRequest): Unit =
    log(id).add(req)
  def requests(id: String): Seq[QdrantRequest] = log(id).items
  def dropped(id: String): Long = log(id).dropped
  def clear(id: String): Unit = log(id).clear()
}

/** Qdrant-shaped export — renders collection setup and point
  * mutations as the REST request bodies the reference's client calls
  * produce (src/ops/targets/qdrant.rs:156-300), generate-the-requests
  * tier, no network:
  *
  *  - setup → `PUT /collections/{name}` with named vector params
  *    (size + metric per vector field; qdrant.rs:216-244
  *    apply_create), `DELETE /collections/{name}` for teardown;
  *  - upsert → `PUT /collections/{name}/points?wait=true` with
  *    `{"points":[{id, vector:{name:[..]}, payload:{..}}]}` — point id
  *    from the key (string or integer, key_to_point_id qdrant.rs:
  *    291-300), vector-shaped fields under named vectors (null vector
  *    skipped), every other field as typed JSON payload
  *    (values_to_payload qdrant.rs:303-341);
  *  - delete → `POST /collections/{name}/points/delete?wait=true`
  *    with the id list (qdrant.rs:276-287).
  *
  * Scale shape: point JSON renders distributedly (to_json projection,
  * codegen'd — null fields drop exactly like the reference skips null
  * vectors); requests batch per partition (`batchSize` points per
  * call) through the per-partition [[QdrantApi]].
  */
object QdrantPoints {

  /** Named vector declaration: Qdrant needs the size at collection
    * create time (the schema's array type doesn't carry it). */
  final case class VectorField(name: String, size: Int, metric: String = "Cosine")

  def createCollectionRequest(collection: String,
      vectors: Seq[VectorField]): QdrantRequest = {
    val cfg = vectors
      .map(v => s""""${v.name}":{"size":${v.size},"distance":"${v.metric}"}""")
      .mkString("{", ",", "}")
    QdrantRequest("PUT", s"/collections/$collection", s"""{"vectors":$cfg}""")
  }

  def deleteCollectionRequest(collection: String): QdrantRequest =
    QdrantRequest("DELETE", s"/collections/$collection", "")

  /** Render one upsert batch → one JSON point object per row:
    * `{"id":…,"vector":{…},"payload":{…}}` via a single to_json
    * projection. `vectorCols` become named vectors; the rest of the
    * columns (minus the key) are payload; null fields drop from the
    * JSON exactly like the reference skips null vectors. */
  def renderPoints(rows: DataFrame, keyCol: String,
      vectorCols: Seq[String]): DataFrame = {
    val payloadCols = rows.columns.toSeq
      .filterNot(c => c == keyCol || vectorCols.contains(c))
    val fields = Seq(requiredId(rows, keyCol)) ++
      (if (vectorCols.nonEmpty) Seq(struct(vectorCols.map(col): _*).as("vector")) else Nil) ++
      (if (payloadCols.nonEmpty) Seq(struct(payloadCols.map(col): _*).as("payload")) else Nil)
    rows.select(to_json(struct(fields: _*)).as("point"))
  }

  // a null key would render an id-less point (to_json drops nulls) or
  // a malformed delete body — fail the job loudly instead
  private def requiredId(rows: DataFrame, keyCol: String): org.apache.spark.sql.Column =
    when(col(keyCol).isNotNull, col(keyCol))
      .otherwise(raise_error(lit(s"qdrant point id ($keyCol) must not be null")))
      .as("id")

  /** Wrap rendered points into upsert request bodies, `batchSize`
    * points per call, one API client per partition. */
  def sendUpserts(points: DataFrame, collection: String,
      mkApi: () => QdrantApi, batchSize: Int = 256): Unit = {
    val spark = points.sparkSession
    import spark.implicits._
    points.as[String].foreachPartition { it: Iterator[String] =>
      val api = mkApi()
      it.grouped(batchSize).foreach { batch =>
        api.send(QdrantRequest("PUT", s"/collections/$collection/points?wait=true",
          batch.mkString("""{"points":[""", ",", "]}")))
      }
    }
  }

  /** Wrap delete keys into points/delete bodies. */
  def sendDeletes(keys: DataFrame, collection: String, keyCol: String,
      mkApi: () => QdrantApi, batchSize: Int = 256): Unit = {
    val spark = keys.sparkSession
    import spark.implicits._
    val ids = keys.select(to_json(struct(requiredId(keys, keyCol))).as("j"))
      .select(expr("substr(j, 7, length(j) - 7)").as("id")) // strip {"id": and }
    ids.as[String].foreachPartition { it: Iterator[String] =>
      val api = mkApi()
      it.grouped(batchSize).foreach { batch =>
        api.send(QdrantRequest("POST", s"/collections/$collection/points/delete?wait=true",
          batch.mkString("""{"points":[""", ",", "]}")))
      }
    }
  }
}

/** Qdrant [[TargetConnector]]: `target` addresses a collection;
  * vector-shaped columns are declared up front (sizes travel in the
  * connector, the AuthEntryReference analogue). `read` reports absent
  * — points live behind the API; the engine's columnar vector tier
  * (SimilaritySearch over parquet) is the queryable path, per
  * SURVEY §1.4. */
final case class QdrantConnector(mkApi: () => QdrantApi,
    vectors: Seq[QdrantPoints.VectorField]) extends TargetConnector {
  override def kind: String = "qdrant"

  /** A stateless request renderer cannot inspect the live store, so
    * setup EMITS the converge sequence rather than diffing: with
    * allowRecreate a DELETE precedes the create (the gated destructive
    * converge — dim/metric changes need it); without it only the
    * create goes out, and a live Qdrant rejecting that PUT for an
    * existing incompatible collection surfaces the NotCompatible case
    * to the caller instead of being masked here. */
  override def applySetup(spark: SparkSession, target: String,
      desired: StructType, allowRecreate: Boolean): SetupDriver.SetupResult = {
    val declared = vectors.filter(v => desired.fieldNames.contains(v.name))
    val api = mkApi()
    if (allowRecreate) api.send(QdrantPoints.deleteCollectionRequest(target))
    api.send(QdrantPoints.createCollectionRequest(target, declared))
    val desc = declared.map(v => s"${v.name}[${v.size}], ${v.metric}")
      .mkString("; ")
    val verb = if (allowRecreate) "recreated collection" else "created collection"
    SetupDriver.SetupResult(SetupDriver.Compatible,
      if (desc.isEmpty) verb else s"$verb with vectors: $desc")
  }

  override def applyMutation(spark: SparkSession, target: String,
      rows: DataFrame, primaryKey: Seq[String],
      deletes: Option[DataFrame]): Unit = {
    require(primaryKey.size == 1,
      "qdrant point ids are scalar: exactly one primary-key column")
    val key = primaryKey.head
    // only declared vectors the batch actually carries (applySetup
    // filters by schema the same way — partial frames must not crash)
    val vecCols = vectors.map(_.name).filter(rows.columns.contains)
    // deletes win over same-batch upserts (connector contract)
    val toUpsert = deletes match {
      case Some(d) => rows.join(d.select(col(key)), Seq(key), "left_anti")
      case None => rows
    }
    QdrantPoints.sendUpserts(
      QdrantPoints.renderPoints(toUpsert, key, vecCols),
      target, mkApi)
    deletes.foreach(d =>
      QdrantPoints.sendDeletes(d.select(col(key)), target, key, mkApi))
  }

  override def read(spark: SparkSession, target: String): Option[DataFrame] = None
}
