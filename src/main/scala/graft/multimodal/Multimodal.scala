package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (reference: document_images with OCR /
  * caption / visual vectors, image_intelligence_service.py:98-539;
  * ColPali multi-vector embeds, functions.py:168-233).
  *
  * Media are opaque `binary` columns with typed metadata. The
  * Spark-side machinery — schema, partition spreading, once-per-
  * partition model init, batched feature extraction, multi-vector
  * output — is real and tested; the actual image/audio DECODE is
  * stubbed deterministically (no codec libraries in this environment):
  * `decodeStub` hashes the payload into a fixed-dim feature vector, so
  * ranks and norms are reproducible (and SQL-checkable).
  *
  * At 100 TB: payloads stay distributed (never collected); feature
  * extraction is a narrow mapPartitions stage sized by
  * `spark.sql.files.maxPartitionBytes`; downstream ANN reuses
  * graft.operators.SimilaritySearch.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      metadata: String)
  case class FeatureRow(media_id: Long, kind: String, n_bytes: Int,
      features: Array[Float])

  /** Wrap a text column as a binary media table (stand-in ingest: in
    * production the payload comes from binaryFile sources).
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String,
      kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      to_json(struct(length(col(textCol)).as("n_chars"))).as("metadata"))

  /** Deterministic "decode + embed" stub: md5 chains over the payload
    * seed a dim-length [0,1) feature vector. Replaces the model
    * forward pass; byte-identical across engines/runs.
    */
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val md = mdLocal.get()
    val out = new Array[Float](dim)
    var k = 0
    while (k < dim) {
      md.reset()
      md.update(payload)
      md.update((48 + k).toByte) // ascii '0'+k: reproducible as chr() in SQL
      val d = md.digest()
      // first 3 bytes -> 24-bit uint -> [0,1)
      val v = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
      out(k) = (v.toDouble / (1 << 24)).toFloat
      k += 1
    }
    out
  }

  /** Batched feature extraction: model "loaded" once per partition
    * (GPU-executor reuse semantics, op.py:309-362), rows mapped in
    * place. Returns (media_id, kind, n_bytes, features[dim]).
    */
  def extractFeatures(media: DataFrame, dim: Int): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // model init happens HERE once per partition in production
        it.map { case (id, kind, payload) =>
          FeatureRow(id, kind, payload.length, decodeStub(payload, dim))
        }
      }
  }

  /** Multi-vector (ColPali-style) stub: one vector per fixed-size
    * payload patch — `Vector[Vector[f32]]` shape (functions.py:168-233).
    */
  def extractMultiVector(media: DataFrame, dim: Int, patchBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val patches = payload.grouped(patchBytes).map(p => decodeStub(p, dim)).toArray
          (id, patches)
        }
      }
      .toDF("media_id", "patch_vectors")
  }

  case class FrameRow(media_id: Long, frame_index: Int, offset: Int,
      n_bytes: Int, features: Array[Float])

  /** Frame sampling (video-style tier): fixed-stride byte windows of
    * the payload, each decoded (stub) to a feature vector. `stride` <
    * `frameBytes` gives overlapping frames. A resize is the same
    * pipeline at a different `dim` — the decode stub is the only stage
    * a real codec would replace (in PySpark the identical batch shape
    * runs as a pandas_udf over mapInPandas).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int,
      dim: Int): Dataset[FrameRow] = {
    require(frameBytes > 0 && stride > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          Iterator.from(0).map(_ * stride).takeWhile(_ < payload.length)
            .zipWithIndex.map { case (off, idx) =>
              val frame = payload.slice(off, math.min(off + frameBytes, payload.length))
              FrameRow(id, idx, off, frame.length, decodeStub(frame, dim))
            }
        }
      }
  }

  /** Late-interaction MaxSim score (ColPali query scoring,
    * functions.py:236-298): sum over query vectors of the max dot
    * product against any patch vector.
    */
  def maxSim(queryVecs: Array[Array[Float]])(docVecs: Seq[Seq[Float]]): Double =
    if (docVecs.isEmpty) 0.0
    else queryVecs.map { q =>
      docVecs.map(d => q.zip(d).map { case (a, b) => a.toDouble * b.toDouble }.sum).max
    }.sum

  case class AudioSegmentRow(media_id: Long, segment_index: Int,
      start_ms: Long, end_ms: Long, n_bytes: Int, rms: Double,
      features: Array[Float])

  /** Audio tier: time-windowed segmentation of an opaque PCM payload —
    * the audio analogue of [[sampleFrames]]. Segments are hopMs-spaced
    * windowMs windows over the sample stream; per segment the stub
    * decode stands in for the codec/model pass and `rms` is the
    * deterministic loudness proxy a VAD / silence-trim stage would
    * threshold on. PCM layouts: 1 byte/sample unsigned (centered at
    * 128) or 2 bytes/sample little-endian signed. The tail segment is
    * truncated, matching frame sampling.
    */
  def segmentAudio(media: DataFrame, sampleRate: Int, bytesPerSample: Int,
      windowMs: Int, hopMs: Int, dim: Int): Dataset[AudioSegmentRow] = {
    require(sampleRate > 0 && windowMs > 0 && hopMs > 0)
    require(bytesPerSample == 1 || bytesPerSample == 2,
      "PCM layouts: 1 (u8) or 2 (s16le) bytes per sample")
    val winSamples = sampleRate * windowMs / 1000
    val hopSamples = sampleRate * hopMs / 1000
    require(winSamples > 0 && hopSamples > 0,
      "window/hop shorter than one sample at this rate")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val totalSamples = payload.length / bytesPerSample
          Iterator.from(0).map(_.toLong * hopSamples)
            .takeWhile(_ < totalSamples).zipWithIndex.map { case (sOff, idx) =>
              val n = math.min(winSamples.toLong, totalSamples - sOff).toInt
              val bytes = payload.slice((sOff * bytesPerSample).toInt,
                ((sOff + n) * bytesPerSample).toInt)
              var sq = 0.0
              var k = 0
              while (k < n) {
                val v =
                  if (bytesPerSample == 1) ((bytes(k) & 0xff) - 128).toDouble
                  else ((bytes(2 * k) & 0xff) | (bytes(2 * k + 1) << 8)).toShort.toDouble
                sq += v * v
                k += 1
              }
              AudioSegmentRow(id, idx,
                sOff * 1000L / sampleRate, (sOff + n) * 1000L / sampleRate,
                bytes.length, if (n == 0) 0.0 else math.sqrt(sq / n),
                decodeStub(bytes, dim))
            }
        }
      }
  }
}
