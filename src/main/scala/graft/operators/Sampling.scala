package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines (beyond-reference scale operators): membership is a pure
  * function of (salt, id) — reproducible across runs, clusters, and
  * engines, with NO shuffle (a narrow filter/projection that predicate
  * pushdown can reach) and no RDD-level sampler state.
  *
  * The mechanism: the first 8 hex chars of md5("{salt}:{id}") are a
  * uniform 32-bit draw; LOWERCASE fixed-width hex compares
  * lexicographically exactly as it does numerically, so thresholds are
  * hex-string literals baked into the plan — the DuckDB oracle
  * replays the identical comparison with no float in sight. */
object Sampling {

  /** The per-row draw: first 8 hex of md5("{salt}:{id}"). Total on
    * null ids: a null keys as the empty string, so every null-id row
    * shares ONE deterministic draw — it stays in a 100% sample and
    * lands in one consistent split band, rather than vanishing from
    * the filter while still drawing a split. */
  def hashSlice(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"),
      coalesce(id.cast("string"), lit("")))), 1, 8)

  /** A fraction as an 8-hex threshold: a draw d is IN iff
    * d < threshold. fraction >= 1 maps to a sentinel above every hex
    * digit ("g" > "f"), fraction <= 0 to one below (the empty
    * threshold ""). A fraction within 2^-33 of 1 would ROUND to 2^32
    * — a 9-char hex that lexicographic comparison misreads — so the
    * rounded value clamps into the sentinel arm. */
  def thresholdHex(fraction: Double): String =
    if (fraction >= 1.0) "g"
    else if (fraction <= 0.0) ""
    else {
      val v = math.round(fraction * 4294967296.0)
      if (v >= 4294967296L) "g" else f"$v%08x"
    }

  /** Keep a deterministic `fraction` of rows, keyed on `idCol`. */
  def sample(df: DataFrame, idCol: String, fraction: Double,
      salt: String): DataFrame =
    df.filter(hashSlice(col(idCol), salt) < lit(thresholdHex(fraction)))

  /** Per-stratum fractions (a training-mix downsample): each stratum
    * value takes its own fraction, anything unlisted takes
    * `defaultFraction`. The fraction ladder is a literal CASE — no
    * join, still one narrow scan. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double,
      salt: String): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(thresholdHex(defaultFraction))) {
        case ((value, frac), rest) =>
          when(col(strataCol) === value,
            lit(thresholdHex(frac))).otherwise(rest)
      }
    df.filter(hashSlice(col(idCol), salt) < threshold)
  }

  /** Train/validation/test assignment from the same draw: bands
    * [0, train), [train, train+validation), rest. Disjoint and
    * exhaustive by construction; reproducible anywhere the salt and
    * ids travel. */
  def assignSplit(df: DataFrame, idCol: String, salt: String,
      trainFraction: Double, validationFraction: Double): DataFrame = {
    val d = hashSlice(col(idCol), salt)
    df.withColumn("split",
      when(d < lit(thresholdHex(trainFraction)), lit("train"))
        .when(d < lit(thresholdHex(trainFraction + validationFraction)),
          lit("validation"))
        .otherwise(lit("test")))
  }
}
