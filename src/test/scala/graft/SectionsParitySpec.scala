package graft

import java.util.regex.Pattern

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sections

/** Verbatim ports of document_processor.py:204-252 compared against
  * the Spark implementations over generated adversarial markdown. */
object PySections {

  // re.sub(r'\s+', ' ') + re.sub(r'[^\w\s...]', '') + strip, with
  // Python's unicode classes
  def preprocess(text: String): String = {
    val collapsed = Pattern.compile("\\s+", Pattern.UNICODE_CHARACTER_CLASS)
      .matcher(text).replaceAll(" ")
    Pattern.compile("[^\\w\\s.,;:!?\\-()\"'/]",
        Pattern.UNICODE_CHARACTER_CLASS)
      .matcher(collapsed).replaceAll("").trim
  }

  // extract_sections: sequential scan, preamble dropped, '\n' join,
  // Python strip on content; UNIX_LINES = Python's `.`/`$` semantics,
  // UNICODE_CHARACTER_CLASS = Python's unicode \s (NBSP delimits)
  private val header = Pattern.compile("^(#{1,6})\\s+(.+)$",
    Pattern.UNIX_LINES | Pattern.UNICODE_CHARACTER_CLASS)

  def sections(content: String): Seq[(String, Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)]
    var current: Option[(String, Int)] = None
    val body = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(): Unit = current.foreach { case (t, l) =>
      out += ((t, l, body.mkString("\n").trim))
    }
    content.split("\n", -1).foreach { line =>
      val m = header.matcher(line)
      if (m.matches()) {
        flush()
        current = Some((m.group(2), m.group(1).length))
        body.clear()
      } else body += line
    }
    flush()
    out.toSeq
  }
}

class SectionsParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(20260813L)
  private val linePool = Seq(
    "plain body line", "", "   ", "# Top", "## Second  ", "### Third",
    "###### Deep", "####### seven hashes", "#nospace", "#", "# ",
    "body with # inline", "\ttab lead", "trail  ", "# Dup", "## Dup",
    "mixed CASE Body", "a # b # c", "#### Four four", "##### Five",
    "## NBSP header") // unicode \s after the hashes still delimits

  private def genDoc(): String =
    Seq.fill(1 + rng.nextInt(14))(
      linePool(rng.nextInt(linePool.size))).mkString("\n")

  test("sections matches the verbatim port on 250 generated documents") {
    val docs = (1L to 250L).map(i => (i, genDoc()))
    val got = Sections.sections(docs.toDF("id", "text"), "id", "text")
      .select(col("id"), col("section_index"), col("title"), col("level"),
        col("content"))
      .as[(Long, Long, String, Int, String)].collect()
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq }
    docs.foreach { case (id, text) =>
      val expected = PySections.sections(text)
      val spark = got.getOrElse(id, Nil)
      assert(spark === expected, s"\ndoc $id:\n$text\n---")
    }
  }

  test("preprocess matches the verbatim port on generated content") {
    val rows = (1 to 200).map(_ => genDoc() + " @#$% café  +=| tail")
    val got = rows.toDF("t")
      .select(Sections.preprocessText(col("t")).as("p"))
      .as[String].collect()
    rows.zip(got).foreach { case (in, sp) =>
      assert(sp === PySections.preprocess(in), s"\nin='$in'")
    }
  }
}
