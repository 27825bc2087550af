package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File sources (LocalFile, local_file.rs:12-126; AmazonS3/AzureBlob
  * are the same reader over `s3a://` / `abfss://` URIs,
  * amazon_s3.rs:23-31 / azure_blob.rs:15-58).
  *
  * Output is the engine's source contract: a KTable keyed by filename
  * with an int64 micros ordinal (interface.rs:16-49) and a content
  * hash — directly consumable by graft.incremental.Incremental.
  */
object FileSource {

  /** Binary file listing: (source_key=path, ordinal=mtime micros,
    * content, content_hash, length).
    *
    * @param includeGlob  e.g. "*.md" (pathGlobFilter — pushed into
    *                     the file index, not a post-filter)
    * @param excludeRegex dropped paths (reference exclude globs)
    */
  def binary(spark: SparkSession, dir: String,
      includeGlob: Option[String] = None,
      excludeRegex: Option[String] = None,
      recursive: Boolean = true): DataFrame = {
    var reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", recursive.toString)
    includeGlob.foreach(g => reader = reader.option("pathGlobFilter", g))
    val df = reader.load(dir)
    val filtered = excludeRegex match {
      case Some(re) => df.where(!col("path").rlike(re))
      case None => df
    }
    filtered.select(
      col("path").as("source_key"),
      unix_micros(col("modificationTime")).as("ordinal"),
      col("content"),
      sha2(col("content"), 256).as("content_hash"),
      col("length"))
  }

  /** Text file variant: content decoded as UTF-8. */
  def text(spark: SparkSession, dir: String,
      includeGlob: Option[String] = None,
      excludeRegex: Option[String] = None): DataFrame =
    binary(spark, dir, includeGlob, excludeRegex)
      .withColumn("content", decode(col("content"), "UTF-8"))
      .withColumn("content_hash", sha2(col("content"), 256))

  /** JSON-lines document source (the SupabaseDocumentSource shape,
    * app/flows/sources.py:138-217, re-expressed as a landed export):
    * one document per line, keyed by `idCol`, ordinal from
    * `updatedAtCol` (epoch micros of a timestamp column — the
    * incremental predicate column), content-hashed on the whole row's
    * canonical JSON so ANY field change reprocesses. */
  def jsonl(spark: SparkSession, path: String, idCol: String,
      updatedAtCol: String): DataFrame = {
    val df = spark.read.json(path)
    df.select(
      col(idCol).cast("string").as("source_key"),
      unix_micros(col(updatedAtCol).cast("timestamp")).as("ordinal"),
      to_json(struct(df.columns.sorted.map(col): _*)).as("content"),
      col("*"))
      .withColumn("content_hash", sha2(col("content"), 256))
  }

  /** CSV source with the same KTable contract; header + explicit
    * schema inference off by default at scale (pass a DDL string). */
  def csv(spark: SparkSession, path: String, idCol: String,
      updatedAtCol: String, schemaDdl: Option[String] = None): DataFrame = {
    var reader = spark.read.option("header", "true")
    schemaDdl match {
      case Some(ddl) => reader = reader.schema(ddl)
      case None => reader = reader.option("inferSchema", "true")
    }
    val df = reader.csv(path)
    df.select(
      col(idCol).cast("string").as("source_key"),
      unix_micros(col(updatedAtCol).cast("timestamp")).as("ordinal"),
      to_json(struct(df.columns.sorted.map(col): _*)).as("content"),
      col("*"))
      .withColumn("content_hash", sha2(col("content"), 256))
  }
}
