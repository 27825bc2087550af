package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Entities
import graft.functions.SeqMatcher

/** Quantifies the tieredSim divergence (normalized Levenshtein base in
  * place of SequenceMatcher.ratio) on the part-name corpus, upgrading
  * the documented substitution from "chosen" to "measured". */
class SequenceMatcherParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("port matches difflib.SequenceMatcher.ratio bit-for-bit on fixtures") {
    // expected values generated with CPython 3 difflib
    val cases = Seq(
      ("pressure sensor", "pressure sensors", 0.967741935483871),
      ("isopropyl alcohol", "isopropil alcohol", 0.9411764705882353),
      ("nc-2056", "nc2056", 0.9230769230769231),
      ("sensor", "sensor calibration unit", 0.41379310344827586),
      ("abcdef", "fedcba", 0.16666666666666666),
      ("aluminum bracket", "aluminium bracket", 0.9696969696969697),
      ("quality control", "quality assurance", 0.5625),
      ("", "", 1.0),
      ("a", "", 0.0),
      ("spring steel wire", "steel spring wire", 0.6470588235294118),
      ("xyzzy", "zzyxx", 0.6))
    cases.foreach { case (a, b, want) =>
      assert(SeqMatcher.ratio(a, b) === want, s"ratio($a, $b)")
    }
  }

  test("tieredSim's Levenshtein base vs SequenceMatcher over part names: measured divergence") {
    // all unblocked pairs of distinct match-normalized part names —
    // the same comparison population the reference scores
    // (entity_deduplication.py:274-369 compares within candidate
    // groups without prefix blocking)
    val names = Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select(Entities.normalizeForMatch(col("p_name")).as("name"))
      .where(length(col("name")) > 0).distinct()
      .withColumn("exp", Entities.expandAbbreviations(col("name")))
    val a = names.select(col("name").as("na"), col("exp").as("ea"))
    val b = names.select(col("name").as("nb"), col("exp").as("eb"))
    val smBase = udf((na: String, nb: String, ea: String, eb: String) =>
      Seq(SeqMatcher.ratio(na, nb), SeqMatcher.ratio(ea, eb),
        SeqMatcher.ratio(na, eb), SeqMatcher.ratio(ea, nb)).max)
    def floors(base: org.apache.spark.sql.Column) =
      when(col("na") === col("nb"), lit(1.0))
        .when(Entities.pluralEq(col("na"), col("nb")), lit(0.98))
        .when(col("ea") === col("eb"), lit(0.95))
        .otherwise(greatest(base,
          when(instr(col("nb"), col("na")) > 0 || instr(col("na"), col("nb")) > 0,
            lit(0.85)).otherwise(lit(0.0)),
          when(Entities.variantEq(col("na"), col("nb")), lit(0.9))
            .otherwise(lit(0.0))))
    val levBase = greatest(
      lit(1.0) - levenshtein(col("na"), col("nb")).cast("double") /
        greatest(length(col("na")), length(col("nb"))).cast("double"),
      lit(1.0) - levenshtein(col("ea"), col("eb")).cast("double") /
        greatest(length(col("ea")), length(col("eb"))).cast("double"),
      lit(1.0) - levenshtein(col("na"), col("eb")).cast("double") /
        greatest(length(col("na")), length(col("eb"))).cast("double"),
      lit(1.0) - levenshtein(col("ea"), col("nb")).cast("double") /
        greatest(length(col("ea")), length(col("nb"))).cast("double"))
    val scored = a.crossJoin(b).where(col("na") < col("nb"))
      .withColumn("lev", floors(levBase))
      .withColumn("sm", floors(smBase(col("na"), col("nb"), col("ea"), col("eb"))))
    val (nPairs, maxDiff, meanDiff, nDisagree) = scored.select(
      count(lit(1)),
      max(abs(col("lev") - col("sm"))),
      avg(abs(col("lev") - col("sm"))),
      sum(when((col("lev") >= 0.85) =!= (col("sm") >= 0.85), 1L).otherwise(0L)))
      .as[(Long, Double, Double, Long)].head()
    val disagreePct = 100.0 * nDisagree / nPairs
    info(f"pairs=$nPairs maxDiff=$maxDiff%.4f meanDiff=$meanDiff%.4f " +
      f"grouping@0.85 disagreement=$nDisagree ($disagreePct%.3f%%)")
    // Measured on this corpus (1,891 pairs of 62 distinct normalized
    // part names): max |lev - sm| = 0.3750, mean = 0.1013, grouping
    // disagreement at the reference's 0.85 threshold = 0 pairs (0%).
    // The divergence concentrates far BELOW the grouping threshold
    // (SequenceMatcher rewards out-of-order common blocks that
    // Levenshtein charges for; near-duplicates agree), which is why
    // grouping is unaffected. Bounds = measurement + headroom; a
    // regression past them means the substitution stopped being benign.
    assert(nPairs > 1500L)
    assert(maxDiff < 0.45, f"max |lev-sm| = $maxDiff%.4f")
    assert(meanDiff < 0.13, f"mean |lev-sm| = $meanDiff%.4f")
    assert(disagreePct < 0.5, f"grouping disagreement = $disagreePct%.3f%%")
  }
}
