package graft

import org.apache.spark.sql.SparkSession

/** Recommended SparkSession setup for this library.
  *
  * Local mode mirrors the cluster posture: AQE on (runtime coalescing
  * + skew-join handling), UTC, nanosecond-parquet readability for the
  * events table, and the graft_* SQL functions registered. On a real
  * cluster the same builder applies with `master` unset and
  * shuffle.partitions sized to ~2-3× total cores (AQE coalesces the
  * excess); `spark.sql.files.maxPartitionBytes` stays default 128 MB
  * so a 100 TB scan yields ~800k input splits.
  */
object Sessions {

  def localBuilder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  def local(cores: Int): SparkSession = {
    val s = localBuilder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
