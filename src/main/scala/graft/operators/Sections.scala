package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document preprocessing + markdown section extraction
  * (app/services/document_processor.py:204-252).
  *
  * [[sections]] is deliberately DIFFERENT from
  * graft.functions.HeadingBlocks (two_tier_chunker.py semantics):
  * here text before the first header is DROPPED, every header level
  * 1-6 opens a section carrying its numeric level, and the title is
  * the raw remainder of the header line — the extract_sections API
  * contract, not the chunker's preamble-merging one.
  *
  * Scale shape: one posexplode + one per-document window + one
  * groupBy — the window partitions by document (never global), and
  * body lines re-assemble via a null-skipping collect_list sorted by
  * position, so no per-row Python-style scan exists anywhere. */
object Sections {

  /** Whitespace-collapse + special-character cleanup
    * (preprocess_text, document_processor.py:204-212): runs of
    * whitespace become one space, then every character outside
    * `[\w\s.,;:!?\-()"'/]` drops ((?U) keeps Python's unicode `\w`),
    * then trim. */
  def preprocessText(c: Column): Column =
    trim(regexp_replace(
      // (?U) on the collapse too: Python's \s is unicode (NBSP etc.)
      regexp_replace(c, "(?U)\\s+", " "),
      "(?U)[^\\w\\s.,;:!?\\-()\"'/]", ""))

  // (?d) pins Java to Python's line semantics: `.` excludes only \n
  // and `$` matches before a final \n — so a CRLF line's title keeps
  // its trailing \r exactly like re.match (and RE2 in the oracle);
  // (?U) makes \s unicode like Python's (an NBSP after the hashes
  // still delimits a header)
  private val headerPattern = "(?dU)^(#{1,6})\\s+(.+)$"

  /** Extract markdown sections: one row per section of each document,
    * (idCol, section_index, title, level, content). Preamble lines
    * (before the first header) are dropped; content is the lines up
    * to the next header, newline-joined and stripped; documents with
    * no headers contribute no rows (extract_sections returns []). */
  def sections(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("_hashes", regexp_extract(col("line"), headerPattern, 1))
      .withColumn("_title", regexp_extract(col("line"), headerPattern, 2))
      .withColumn("_is_hdr", length(col("_hashes")) > 0)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    lines
      .withColumn("section_index",
        sum(when(col("_is_hdr"), 1).otherwise(0)).over(w))
      .where(col("section_index") > 0)
      .groupBy(col(idCol), col("section_index"))
      .agg(
        max(when(col("_is_hdr"), col("_title"))).as("title"),
        max(when(col("_is_hdr"), length(col("_hashes")))).as("level"),
        // body lines, in position order (collect_list skips the
        // header row's null), '\n'-joined then Python-strip'd
        trim(concat_ws("\n", transform(
          array_sort(collect_list(
            when(!col("_is_hdr"), struct(col("pos"), col("line"))))),
          x => x.getField("line"))), " \t\n\r\f\u000B").as("content"))
  }
}
