package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bridge

/** API-bridge fetch projections (app/api/bridge.py). */
class BridgeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("documentChunks renames, derives chunk_size, sorts by chunk_number") {
    val chunks = Seq(
      ("d1", 1L, "second", 150L, 156L),
      ("d1", 0L, "first chunk", 0L, 11L),
      ("d2", 0L, "", 0L, 0L))
      .toDF("doc", "idx", "txt", "s", "e")
    val got = Bridge.documentChunks(chunks, "doc", "idx", "txt", "s", "e")
    assert(got.columns.toSeq === Seq("document_id", "chunk_number",
      "chunk_text", "chunk_size", "start_position", "end_position"))
    val rows = got.as[(String, Long, String, Int, Long, Long)].collect()
    // sorted by (document_id, chunk_number); chunk_size = len(text)
    assert(rows.toSeq === Seq(
      ("d1", 0L, "first chunk", 11, 0L, 11L),
      ("d1", 1L, "second", 6, 150L, 156L),
      ("d2", 0L, "", 0, 0L, 0L)))
  }

  test("documentEntities applies the endpoint's record.get defaults") {
    val edges = Seq(
      ("d1", 10L, Some("Pump"), Some("COMPONENT"), Some(0.9),
        Some("HAS_ENTITY"), Some(0.8)),
      ("d1", 11L, None, None, None, None, None))
      .toDF("doc", "eid", "name", "etype", "conf", "rtype", "rconf")
    val got = Bridge.documentEntities(edges, "doc", "eid", "name", "etype",
        "conf", "rtype", "rconf")
      .as[(Long, String, String, String, Double, String, Double)]
      .collect().toSeq
    // null name -> "", type -> Unknown, confidences -> 0.0,
    // relationship -> MENTIONS (bridge.py:159-166)
    assert(got.contains((11L, "", "Unknown", "d1", 0.0, "MENTIONS", 0.0)))
    assert(got.contains((10L, "Pump", "COMPONENT", "d1", 0.9, "HAS_ENTITY", 0.8)))
    // ORDER BY entity_type, entity_name puts COMPONENT before Unknown
    assert(got.map(_._1) === Seq(10L, 11L))
  }

  test("documentRelationships: either-end match, id dedup, score default") {
    val mentions = Seq(
      ("d1", Some(1L)), ("d1", Some(2L)), ("d1", Some(1L)), // dup id
      ("d1", None),                                         // null skipped
      ("d2", Some(9L)))
      .toDF("doc", "cid")
    val rels = Seq(
      // both ends mentioned in d1 -> must appear ONCE for d1
      ("r1", 1L, 2L, "USES", Some(0.7), "2024-01-02"),
      // only target mentioned
      ("r2", 5L, 1L, "PART_OF", None, "2024-01-01"),
      // matches nothing
      ("r3", 7L, 8L, "CAUSES", Some(0.5), "2024-01-03"))
      .toDF("rid", "src", "dst", "rtype", "score", "created")
    val got = Bridge.documentRelationships(mentions, rels, "doc", "cid",
        "rid", "src", "dst", "rtype", "score", "created")
      .as[(String, String, Long, Long, String, Double, String)]
      .collect().toSeq
    // d1 sees r1 once (not twice) and r2 with the 0.0 null-score arm,
    // sorted by created_at; d2's id 9 matches nothing
    assert(got === Seq(
      ("d1", "r2", 5L, 1L, "PART_OF", 0.0, "2024-01-01"),
      ("d1", "r1", 1L, 2L, "USES", 0.7, "2024-01-02")))
  }

  private def proposalFixtures = {
    val mentions = Seq(
      ("d1", Some(1L)), ("d1", Some(2L)), ("d1", None),
      ("d2", Some(1L)), ("d2", Some(2L)), ("d2", Some(3L)))
      .toDF("doc", "cid")
    val rels = Seq(
      ("r0", 1L, 2L, Some("USES"), Some(0.8), false),
      ("r1", 1L, 3L, Some("USES"), Some(0.6), false), // e3 only in d2
      ("r2", 2L, 1L, None: Option[String], None: Option[Double], false),
      ("r3", 1L, 2L, Some("USES"), Some(0.9), true), // validated
      ("r4", 1L, 9L, Some("USES"), Some(0.95), false)) // e9 nowhere
      .toDF("rid", "src", "dst", "rtype", "score", "validated")
    (mentions, rels)
  }

  test("relationshipProposals: both ends in doc, unvalidated, min_conf=0 falsy") {
    val (mentions, rels) = proposalFixtures
    val got = Bridge.relationshipProposals(mentions, rels, "doc", "cid",
        "rid", "src", "dst", "rtype", "score", "validated")
      .orderBy("document_id", "id")
      .as[(String, String, Long, Long, Option[String], Option[Double])]
      .collect().toSeq
    // d1: r0 + the null-typed null-scored r2 (min_conf=0.0 applies NO
    // filter — Python `if min_conf:`); r1 needs e3, r3 is validated,
    // r4's target is mentioned nowhere. d2 adds r1.
    assert(got === Seq(
      ("d1", "r0", 1L, 2L, Some("USES"), Some(0.8)),
      ("d1", "r2", 2L, 1L, None, None),
      ("d2", "r0", 1L, 2L, Some("USES"), Some(0.8)),
      ("d2", "r1", 1L, 3L, Some("USES"), Some(0.6)),
      ("d2", "r2", 2L, 1L, None, None)))
  }

  test("relationshipProposals: type filter is case-insensitive, null is 'None'") {
    val (mentions, rels) = proposalFixtures
    val uses = Bridge.relationshipProposals(mentions, rels, "doc", "cid",
        "rid", "src", "dst", "rtype", "score", "validated",
        typeFilter = Some("uses"), minConf = 0.7)
      .orderBy("document_id", "id")
      .as[(String, String, Long, Long, Option[String], Option[Double])]
      .collect().toSeq
    // min_conf=0.7 drops r1 (0.6); the type filter drops r2
    assert(uses === Seq(
      ("d1", "r0", 1L, 2L, Some("USES"), Some(0.8)),
      ("d2", "r0", 1L, 2L, Some("USES"), Some(0.8))))
    val noneTyped = Bridge.relationshipProposals(mentions, rels, "doc",
        "cid", "rid", "src", "dst", "rtype", "score", "validated",
        typeFilter = Some("none"))
      .select("id").distinct().as[String].collect().toSeq
    // str(None).upper() == "NONE": the stored-null rows match "none"
    assert(noneTyped === Seq("r2"))
  }

  test("documentListing: filter order, post-limit source filter, offset, counts") {
    val docs = (1 to 10).map { i =>
      (i.toLong, s"n$i", if (Set(4, 6, 10)(i)) "s1" else "s2",
        if (i % 2 == 0) "ok" else "no", i.toLong,
        if (i == 4) "  " else "t", if (i == 6) "a" else "a")
    }.toDF("id", "name", "source_type", "status", "created_at", "mt", "ma")
    val chunks = Seq.fill(3)(6L).toDF("document_id")
    val mentions = Seq(6L, 4L, 4L).toDF("document_id")
    val got = Bridge.documentListing(docs, chunks, mentions,
        Seq("mt", "ma"), statusFilter = Some("ok"),
        sourceFilter = Some("s1"), limit = 4, offset = 1)
      .orderBy(col("id").desc)
      .as[(Long, String, String, String, String, Boolean, Long, Long)]
      .collect().toSeq
    // status 'ok' keeps evens; top-4 by created_at desc = {10,8,6,4};
    // the source filter runs AFTER the limit so it shrinks the page
    // to {10,6,4} (8 drops; 2 was never in the page); offset 1 drops
    // 10. id=4 has no chunks (zero-count LEFT arm) and a
    // whitespace-only mt (incomplete).
    assert(got === Seq(
      (6L, "n6", "n6", "s1", "ok", true, 3L, 1L),
      (4L, "n4", "n4", "s1", "ok", false, 0L, 2L)))
  }

  test("graph search: one lowest-id root, min distance, null type kept") {
    val spark2 = spark
    import spark2.implicits._
    val nodes = Seq(
      ("e1", "Big Pump", "COMPONENT"), ("e2", "pump seal", "COMPONENT"),
      ("e3", "Motor", null.asInstanceOf[String]), ("e4", "Valve", "COMPONENT"),
      ("e9", "Unrelated", "OTHER"))
      .toDF("id", "name", "type")
    // e1 -> e3 -> e4, e1 -> e4 (two paths to e4: distances 1 and 2)
    val edges = Seq(("e1", "e3"), ("e3", "e4"), ("e1", "e4"))
      .toDF("src", "dst")
    val queries = Seq(("q1", "PUMP")).toDF("query_id", "entity_name")
    val got = Bridge.graphSearch(nodes, edges, queries, 2, 50)
      .orderBy("distance", "id")
      .select("id", "name", "type", "distance")
      .as[(String, String, String, Int)].collect().toSeq
    // both e1 and e2 contain "pump" (case-insensitive); lowest id e1
    // is the single root; e4 keeps its MINIMUM distance (1, not 2);
    // e3's null type stays null — the reference's .get(...,"Unknown")
    // default never fires because the Cypher RETURN always binds the key
    assert(got === Seq(
      ("e1", "Big Pump", "COMPONENT", 0),
      ("e3", "Motor", null, 1),
      ("e4", "Valve", "COMPONENT", 1)))
  }

  test("vector search shape: >= threshold cut and payload defaults") {
    val spark2 = spark
    import spark2.implicits._
    val results = Seq(
      (1L, Some("d1"), Some("text"), 0.7, Some(3)),   // exactly at cut
      (2L, Some("d2"), Some("t"), 0.699, Some(1)),    // below: drops
      (3L, None: Option[String], None: Option[String], 0.9,
        None: Option[Int]))                            // defaults fill
      .toDF("id", "document_id", "text", "score", "chunk_number")
    val got = Bridge.vectorSearchShape(results, 0.7)
      .orderBy("id")
      .select("id", "document_id", "text", "score", "chunk_number")
      .as[(String, String, String, Double, Int)].collect().toSeq
    // bridge.py:277: `score >= threshold` keeps the boundary; :279-284
    // default document_id/text to "" and chunk_number to 0
    assert(got === Seq(
      ("1", "d1", "text", 0.7, 3),
      ("3", "", "", 0.9, 0)))
  }

  test("weighted hybrid: max-score vector dedup + synthetic graph docs") {
    val spark2 = spark
    import spark2.implicits._
    val vector = Seq(
      ("q1", "d1", 0.9, "best text"), ("q1", "d1", 0.5, "worse text"),
      ("q1", "d2", 0.6, "t2"), ("q1", "", 0.99, "dropped"))
      .toDF("query_id", "document_id", "score", "text")
    val graph = Seq(
      ("q1", "e7", "Pump", 0), ("q1", "e8", "Seal", 1))
      .toDF("query_id", "id", "name", "distance")
    val got = Bridge.weightedHybrid(vector, graph, 0.7, 0.3, 3)
      .orderBy(col("score").desc)
      .select("document_id", "score", "vector_score", "graph_score", "text")
      .as[(String, Double, Double, Double, String)].collect().toSeq
    // d1 dedups to max 0.9 keeping its best text; empty document_id
    // rows drop (bridge.py:404); graph mints doc_e7 at 1/(1+0)=1.0
    assert(got(0) === ("d1", 0.9 * 0.7, 0.9, 0.0, "best text"))
    assert(got(1) === ("d2", 0.6 * 0.7, 0.6, 0.0, "t2"))
    assert(got(2) === ("doc_e7", 0.3, 0.0, 1.0, "Entity: Pump"))
    // limit 3 cut doc_e8 (1/(1+1)*0.3 = 0.15)
    assert(got.length === 3)
  }
}
