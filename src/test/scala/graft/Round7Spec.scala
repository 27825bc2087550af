package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcConnector

/** Round-7 additions: destructive-change gating on the JDBC setup
  * path (column drops are data loss in a live store, so they are
  * gated exactly like recreate). */
class JdbcDropGatingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val url = s"jdbc:derby:memory:dropgate;create=true"

  test("column drops are gated behind allowRecreate and reported") {
    val conn = JdbcConnector(url)
    val v1 = StructType(Seq(StructField("id", LongType),
      StructField("payload", StringType), StructField("extra", StringType)))
    assert(conn.applySetup(spark, "gate_t", v1).action === "created")
    conn.applyMutation(spark, "gate_t",
      Seq((1L, "a", "x")).toDF("id", "payload", "extra"), Seq("id"), None)

    // ungated: the narrowing setup keeps (and reports) the extra
    // column — no silent data loss
    val v2 = StructType(Seq(StructField("id", LongType),
      StructField("payload", StringType)))
    val kept = conn.applySetup(spark, "gate_t", v2)
    assert(kept.action ===
      "evolved (kept extra columns: extra; dropping requires allowRecreate)")
    val live = conn.read(spark, "gate_t").get
    assert(live.schema.fieldNames.map(_.toLowerCase).contains("extra"))
    assert(live.count() === 1)

    // gated: the drop applies and is reported
    val dropped = conn.applySetup(spark, "gate_t", v2, allowRecreate = true)
    assert(dropped.action === "evolved (dropped columns: extra)")
    val after = conn.read(spark, "gate_t").get
    assert(!after.schema.fieldNames.map(_.toLowerCase).contains("extra"))
    assert(after.select("id").as[Long].collect().toSeq === Seq(1L))
  }
}

/** Line-ending parity for the heading-block split: CRLF and lone-\r
  * documents split identically to their LF twins (Python splitlines
  * semantics), instead of gluing a \r-terminated heading to its body. */
class HeadingBlocksCrlfSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.functions.HeadingBlocks

  private def blocks(text: String): Seq[(String, String)] =
    Seq(Tuple1(text)).toDF("t")
      .select(HeadingBlocks.headingBlocksOf(col("t")).as("b"))
      .selectExpr("inline(b)")
      .as[(String, String)].collect().toSeq

  test("CRLF and lone-CR documents split like their LF twin") {
    val lf = "intro\n# One\nbody a\nbody b\n# Two\nbody c"
    val want = blocks(lf)
    assert(want === Seq(
      ("# One", "intro\n\nbody a\nbody b"),
      ("# Two", "body c")))
    assert(blocks(lf.replace("\n", "\r\n")) === want)
    assert(blocks(lf.replace("\n", "\r")) === want)
    // CRLF bodies re-join with \n (no \r retained anywhere)
    assert(want.forall { case (h, b) => !h.contains('\r') && !b.contains('\r') })
  }
}
