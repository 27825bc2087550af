package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MetadataStateStore, StateMachine}

/** The metadata-embedded transition store
  * (state_manager_simple.py:41-74, 165-243): same validation as the
  * table-backed manager, history round-trips through the document's
  * own metadata JSON. */
class MetadataStateStoreSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs(rows: (String, String)*) =
    rows.toSeq.toDF("id", "status")
      .withColumn("metadata",
        MetadataStateStore.initialMetadata(lit(null).cast("map<string,string>")))

  private def reqs(rows: (String, String, Option[String], Option[String])*) =
    rows.toSeq.toDF("id", "to_status", "user_id", "reason")

  test("two-batch round trip matches the table-backed audit exactly") {
    val d0 = docs("d1" -> "discovered", "d2" -> "discovered",
      "d3" -> "pending_review")
    val r1 = reqs(("d1", "processing", Some("u1"), None),
      ("d2", "approved", None, None), // invalid from discovered
      ("d3", "approved", Some("u9"), Some("lgtm")))
    val r2 = reqs(("d1", "pending_review", None, Some("auto")),
      ("d3", "ingested", None, None))

    // table-backed: two applications on the SAME document_state.py
    // map the metadata store defaults to, audits accumulated
    val t1 = StateMachine.applyTransitions(
      d0.select("id", "status"), r1.select("id", "to_status"),
      allowedMap = StateMachine.simpleAllowed)
    val t2 = StateMachine.applyTransitions(t1.updated,
      r2.select("id", "to_status"),
      allowedMap = StateMachine.simpleAllowed)
    val tableAudit = t1.auditLog.unionByName(t2.auditLog)
      .select("id", "from_status", "to_status")
      .as[(String, String, String)].collect().toSet

    // metadata-embedded: same sequence, audit re-read from metadata
    val m1 = MetadataStateStore.transition(d0, r1, lit("T1"))
    val m2 = MetadataStateStore.transition(m1.updated, r2, lit("T2"))
    val metaAudit = m2.auditLog
      .select("id", "from_status", "to_status")
      .as[(String, String, String)].collect().toSet
    assert(metaAudit === tableAudit)
    // same final statuses
    val tStatus = t2.updated.as[(String, String)].collect().toSet
    val mStatus = m2.updated.select("id", "status")
      .as[(String, String)].collect().toSet
    assert(mStatus === tStatus)
    // same rejections
    assert(m1.rejectedRequests.select("id", "from_status", "to_status")
      .as[(String, String, String)].collect().toSet ===
      t1.rejectedRequests.select("id", "from_status", "to_status")
        .as[(String, String, String)].collect().toSet)
    // and the timestamps/users round-tripped through the JSON
    val d3 = m2.auditLog.where(col("id") === "d3")
      .select("to_status", "timestamp", "user_id", "reason")
      .as[(String, String, Option[String], Option[String])].collect().toSet
    assert(d3 === Set(("approved", "T1", Some("u9"), Some("lgtm")),
      ("ingested", "T2", None, None)))
  }

  test("the maps are the reference's, verbatim") {
    // document_state.py:25-32
    assert(StateMachine.simpleAllowed.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap === Map(
      "discovered" -> Set("processing", "failed"),
      "processing" -> Set("pending_review", "failed"),
      "pending_review" -> Set("approved", "rejected", "failed"),
      "approved" -> Set("ingested", "failed"),
      "failed" -> Set("discovered", "processing"),
      "rejected" -> Set("discovered")))
    // document.py:26-39
    assert(StateMachine.appAllowed.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap === Map(
      "discovered" -> Set("processing", "failed"),
      "processing" -> Set("pending_review", "failed"),
      "pending_review" -> Set("approved", "rejected", "processing"),
      "approved" -> Set("publishing", "ingested", "failed"),
      "rejected" -> Set("processing", "discovered"),
      "ingested" -> Set("processing"),
      "failed" -> Set("processing", "discovered"),
      "publishing" -> Set("published", "publish_failed"),
      "published" -> Set("processing"),
      "publish_failed" -> Set("approved", "publishing")))
  }

  test("transitions into failed bump error_count; others leave it") {
    val d0 = docs("d1" -> "processing", "d2" -> "processing")
    val got = MetadataStateStore.transition(d0,
      reqs(("d1", "failed", None, None),
        ("d2", "pending_review", None, None)), lit("T1"))
    val metas = got.updated.collect()
      .map(r => r.getAs[String]("id") ->
        r.getAs[Map[String, String]]("metadata")).toMap
    assert(metas("d1")("error_count") === "1")
    assert(metas("d2")("error_count") === "0")
    // a second failure keeps counting
    val again = MetadataStateStore.transition(
      got.updated.withColumn("status",
        when(col("id") === "d1", "processing").otherwise(col("status"))),
      reqs(("d1", "failed", None, None)), lit("T2"))
    assert(again.updated.where(col("id") === "d1").collect().head
      .getAs[Map[String, String]]("metadata")("error_count") === "2")
  }

  test("initialMetadata merges caller keys under the state keys") {
    val got = spark.range(1).select(MetadataStateStore.initialMetadata(
      map(lit("filename"), lit("a.pdf"), lit("error_count"), lit("9"))))
      .as[Map[String, String]].collect().head
    assert(got === Map("filename" -> "a.pdf",
      "state_transitions" -> "[]", "error_count" -> "0"))
  }

  test("stamps: processed_at/approved_at, approved_by_user replacement") {
    val d0 = docs("d1" -> "pending_review")
      .withColumn("metadata", map_concat(col("metadata"),
        map(lit("approved_by_user"), lit("old-user"),
          lit("keep"), lit("me"))))
    val got = MetadataStateStore.transition(d0,
      reqs(("d1", "approved", Some("new-user"), None)), lit("T5"))
      .updated.collect().head
    val meta = got.getAs[Map[String, String]]("metadata")
    assert(meta("approved_by_user") === "new-user")
    assert(meta("keep") === "me")
    assert(meta("error_count") === "0") // untouched
    assert(got.getAs[String]("approved_at") === "T5")
    assert(got.getAs[String]("updated_at") === "T5")
    assert(got.getAs[String]("processed_at") === null)
    // processing stamps processed_at, not approved_at
    val p = MetadataStateStore.transition(docs("d2" -> "discovered"),
      reqs(("d2", "processing", None, None)), lit("T6")).updated.collect().head
    assert(p.getAs[String]("processed_at") === "T6")
    assert(p.getAs[String]("approved_at") === null)
  }

  test("string-surgery append preserves unknown record fields") {
    val seeded = Seq(("d1", "processing")).toDF("id", "status")
      .withColumn("metadata", map(lit("state_transitions"),
        lit("""[{"from_state":"discovered","to_state":"processing","custom":"x"}]""")))
    val got = MetadataStateStore.transition(seeded,
      reqs(("d1", "failed", None, None)), lit("T7")).updated.collect().head
    val raw = got.getAs[Map[String, String]]("metadata")("state_transitions")
    assert(raw.contains(""""custom":"x"""")) // survived verbatim
    assert(raw.contains(""""to_state":"failed""""))
    assert(raw.startsWith("[{") && raw.endsWith("}]"))
    // and the parsed history sees both records
    val hist = MetadataStateStore.transition(seeded,
      reqs(("d1", "failed", None, None)), lit("T7"))
      .auditLog.select("from_status", "to_status")
      .as[(String, String)].collect().toSeq
    assert(hist === Seq("discovered" -> "processing", "processing" -> "failed"))
  }

  test("non-canonical empty logs ('[ ]', trailing newline) append clean") {
    for (oldLog <- Seq("[ ]", "[]\n", " []")) {
      val d0 = Seq(("d1", "discovered")).toDF("id", "status")
        .withColumn("metadata", map(lit("state_transitions"), lit(oldLog)))
      val got = MetadataStateStore.transition(d0,
        reqs(("d1", "processing", None, None)), lit("T1"))
      // the empty guard keys on the PARSED size, so no "[ ,{...}]"
      // corruption: exactly one clean record round-trips
      assert(got.auditLog.count() === 1, s"oldLog=${oldLog}")
    }
  }

  test("pretty-printed history survives surgery; null metadata audits") {
    val pretty = Seq(("d1", "processing")).toDF("id", "status")
      .withColumn("metadata", map(lit("state_transitions"),
        lit("""[ {"from_state":"discovered","to_state":"processing","custom":"x"} ]""")))
    val got = MetadataStateStore.transition(pretty,
      reqs(("d1", "failed", None, None)), lit("T1"))
    assert(got.auditLog.count() === 2) // old record + new, both parse
    val raw = got.updated.collect().head
      .getAs[Map[String, String]]("metadata")("state_transitions")
    assert(raw.contains(""""custom":"x"""")) // untouched by surgery
    // a doc ingested with NULL metadata still records its transition
    val nullMeta = Seq(("d2", "discovered")).toDF("id", "status")
      .withColumn("metadata", lit(null).cast("map<string,string>"))
    val got2 = MetadataStateStore.transition(nullMeta,
      reqs(("d2", "processing", None, None)), lit("T1"))
    assert(got2.auditLog.count() === 1)
    assert(got2.updated.select("status").as[String].collect().head ===
      "processing")
  }

  test("null metadata: requested doc gains a map, bystanders keep NULL") {
    val d0 = Seq(("d1", "discovered"), ("d2", "discovered"))
      .toDF("id", "status")
      .withColumn("metadata", lit(null).cast("map<string,string>"))
    val got = MetadataStateStore.transition(d0,
      reqs(("d1", "processing", None, None)), lit("T1"))
      .updated.collect().map(r => r.getAs[String]("id") ->
        r.getAs[Map[String, String]]("metadata")).toMap
    assert(got("d1") !== null)
    assert(got("d1").contains("state_transitions"))
    // the reference only writes the requested document — d2's NULL
    // metadata must survive untouched, not normalize to {}
    assert(got("d2") === null)
  }

  test("error_count writes back on every valid transition (0 default)") {
    // a doc that never had the key gains "0" on a non-failed hop,
    // exactly as the manager writes state_info.error_count each time
    val d0 = Seq(("d1", "discovered")).toDF("id", "status")
      .withColumn("metadata", map(lit("keep"), lit("me")))
    val got = MetadataStateStore.transition(d0,
      reqs(("d1", "processing", None, None)), lit("T1"))
      .updated.collect().head.getAs[Map[String, String]]("metadata")
    assert(got("error_count") === "0")
    assert(got("keep") === "me")
  }

  test("malformed history parses empty, keeps transitioning") {
    val bad = Seq(("d1", "failed")).toDF("id", "status")
      .withColumn("metadata", map(lit("state_transitions"), lit("not-json")))
    val got = MetadataStateStore.transition(bad,
      reqs(("d1", "processing", None, None)), lit("T8"))
    assert(got.updated.select("status").as[String].collect().head ===
      "processing")
    assert(got.auditLog.count() === 1) // the malformed log reads empty
  }
}
