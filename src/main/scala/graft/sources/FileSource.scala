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
}
