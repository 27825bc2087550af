package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards for the round's new gate queries: the taxonomy
  * merge and section extraction must stay narrow (no join, no
  * corpus-wide exchange beyond the section groupBy's per-doc hash). */
class NewQueryPlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("q85 tag merge plans as a pure narrow projection: no exchange, no join") {
    val plan = SparkEntry.queries("q85_tag_merge")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q91 sections shuffles at most twice (doc-keyed window + agg), never globally") {
    val plan = SparkEntry.queries("q91_md_sections")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q101/q106 entity curation: broadcast roster, ONE doc-keyed shuffle") {
    for (q <- Seq("q101_entity_dup_groups", "q106_entity_dedup_census")) {
      val plan = planOf(q)
      // the 10-row roster broadcasts onto the documents scan; the only
      // shuffle is the groupByKey(document_id) feeding the per-doc
      // greedy loop
      assert(plan.contains("BroadcastNestedLoopJoin BuildRight, Cross"), plan)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"$q: expected 1 exchange, got $exchanges")
      assert(!plan.contains("SortMergeJoin"), plan)
    }
  }

  test("q103 chunk split: broadcast split requests, one window shuffle") {
    val plan = planOf("q103_chunk_split")
    assert(plan.contains("BroadcastHashJoin"), plan) // splits side
    // TWO exchanges since r19: the chunk-side window shuffle (the one
    // that matters at scale) plus the duplicate-request collapse
    // aggregate on the CURATION-SIZED split frame (bounded by the
    // human-review request batch, never corpus-sized)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, s"expected 2 exchanges (window + " +
      s"request-side dedup), got $exchanges")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q104 chunk merge: every join broadcast, shuffles only on group stats") {
    val plan = planOf("q104_chunk_merge")
    // group/member joins all broadcast (the groups frame is
    // curation-sized); the remaining exchanges are the group-key /
    // per-doc aggregations, never a global repartition
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q105 relationship proposals: both-end membership via hash joins") {
    val plan = planOf("q105_rel_proposals")
    // the LEFT SEMI target-end check must stay a hash join (the
    // OR-join alternative would be a nested loop over the corpus)
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q107 document listing: top-K scan, broadcast page onto the count tables") {
    val plan = planOf("q107_document_listing")
    // the global created_at-desc LIMIT must plan as a top-K, never a
    // full sort; the <=100-row page broadcasts into the semi prunes
    // and count joins, so the corpus-sized chunk/mention tables are
    // never shuffled on the join key
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q113 jobs listing: filters reach the scan under a top-K, no global sort") {
    val plan = planOf("q113_jobs_listing")
    // both endpoint filters precede the bounded created_at-desc page:
    // the plan must be filter -> TakeOrderedAndProject, never a full
    // Sort + global exchange
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q111 review status: counts aggregate before the doc join") {
    val plan = planOf("q111_review_status")
    // both count sides reduce to per-doc rows BEFORE joining the
    // document frame — the HashAggregate partial/final pair sits
    // under the join, and nothing plans a SinglePartition exchange
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q114/q115 metadata store: the 12-edge map broadcasts") {
    for (q <- Seq("q114_metadata_transitions", "q115_reset_census")) {
      val plan = planOf(q)
      // the transition map is a 12-row broadcast against the doc
      // frame — it must never shuffle the corpus on (status, to).
      // (q115's final outcome census is a FULL OUTER join, which
      // Spark correctly plans as a sort-merge of two id-keyed sides —
      // endpoint-batch-sized, not corpus-shaped, so it's allowed.)
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
      assert(!plan.contains("Exchange SinglePartition"), s"$q:\n$plan")
    }
  }

  test("q108/q109 curation: rosters broadcast, the corpus side never shuffles") {
    for (q <- Seq("q108_rel_curation", "q109_doc_detail_entities")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q:\n$plan")
      // the only permitted shuffle is the roster-dedup inside bulkHit
      // (keyed _rid) — the corpus-sized rels/mentions side must never
      // hash-partition
      val badExchanges = "Exchange hashpartitioning\\((\\w+)#".r
        .findAllMatchIn(plan).map(_.group(1)).filterNot(_ == "_rid").toSeq
      assert(badExchanges.isEmpty, s"$q shuffles on $badExchanges:\n$plan")
    }
  }

  test("q117 chunk context: one doc-keyed join, content never duplicated") {
    val plan = planOf("q117_chunk_context")
    // chunks and documents co-partition on document_id; nothing plans
    // a global sort or single-partition exchange
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("q118/q119 chunk update/delete: requests broadcast, one window shuffle") {
    for (q <- Seq("q118_chunk_update", "q119_chunk_delete")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q:\n$plan")
      assert(!plan.contains("Exchange SinglePartition"), s"$q:\n$plan")
    }
  }

  test("q121 entity listing: one count shuffle + one window, no global sort") {
    val plan = planOf("q121_entity_listing")
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("q128 process admission: docs semi-reduced then broadcast, never shuffled") {
    val plan = planOf("q128_process_admission")
    // the big docs frame semi-joins down to the request ids and the
    // bounded result broadcasts — no sort-merge join anywhere
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q126 quick search: the top-10 fused page broadcasts onto the corpus") {
    val plan = planOf("q126_quick_search")
    // the bounded result side must be the broadcast build; the
    // documents scan joins without shuffling on doc_id
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q132 graph search: bounded per-hop joins, no cartesian") {
    val plan = planOf("q132_bridge_graph_search")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q136 metadata update: doc lookup broadcast, merge stays narrow") {
    val plan = planOf("q136_metadata_update")
    // the docs frame semi-reduces to the request ids and broadcasts
    // back; the map merge itself is per-row projection work
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q137 supabase twins: roster broadcast, no corpus shuffle") {
    val plan = planOf("q137_supabase_chunks")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q138-q141 route projections stay join-free and narrow") {
    // pure per-row arm logic over the request fixture — any join or
    // corpus-wide exchange appearing here is a regression
    for (q <- Seq("q138_sources_scan", "q141_search_health",
        "q143_llamaparse_wire", "q144_rel_canonicalize",
        "q145_app_health", "q146_compat_scan")) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q:\n$plan")
      assert(!plan.contains("Exchange"), s"$q:\n$plan")
    }
    // the two status projections join request-sized frames only —
    // broadcast hash, never sort-merge
    for (q <- Seq("q139_celery_status", "q140_tracker_status")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q:\n$plan")
    }
  }

  test("q172/q173 CLI projections stay join-free and narrow") {
    // both gates are per-row column ladders over one documents scan —
    // any join or exchange appearing here is a regression
    for (q <- Seq("q172_cli_ls_eval", "q173_cli_stats_line")) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q:\n$plan")
      assert(!plan.contains("Exchange"), s"$q:\n$plan")
    }
  }

  test("q147 relationship cleanup: ONE group-key window shuffle, no join") {
    val plan = planOf("q147_rel_cleanup")
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange (window), got $exchanges\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q148 canonical backfill: broadcast store probes, no corpus sort-merge") {
    val plan = planOf("q148_backfill_canonical")
    // the canonical store probes and the vocabulary-sized group frame
    // all broadcast; the mention side is never sort-merge-shuffled
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q149/q150/q157 script projections stay join-free and narrow") {
    for (q <- Seq("q149_rel_type_migrate", "q150_reset_stuck",
        "q157_fix_entity_types")) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q:\n$plan")
      assert(!plan.contains("Exchange"), s"$q:\n$plan")
    }
  }

  test("q152 capped jaccard: no cartesian, no single-partition exchange") {
    val plan = planOf("q152_jaccard_capped")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q142 service init: boot-keyed summary join, never global") {
    val plan = planOf("q142_service_init")
    // the census/summary join keys on boot_id — one keyed exchange
    // pair at worst, never a cartesian or a single-partition collapse
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q179-q181/q186 battery queries stay narrow: no join, no " +
      "exchange — the filters run inside the scan stage") {
    for (q <- Seq("q179_quality_signals", "q180_c4_clean",
        "q181_pii_redact", "q186_url_normalize")) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q:\n$plan")
      assert(!plan.contains("Exchange"), s"$q:\n$plan")
    }
  }

  test("q187 pipeline: keyed joins only — no cartesian; the ONLY " +
      "single-partition exchange is the k-row n_min aggregate of the " +
      "in-plan mix (vocabulary-sized, benign at any corpus size)") {
    val plan = planOf("q187_training_pipeline")
    assert(!plan.contains("CartesianProduct"), plan)
    val singles = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1, s"expected <=1 single-partition exchange " +
      s"(the k-row n_min agg), got $singles\n$plan")
  }

  test("q224 keep-best: the representative window stays keyed by " +
      "component (never an unpartitioned corpus window); keyed " +
      "equi-joins only") {
    val plan = planOf("q224_keep_best")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("hashpartitioning(component"),
      s"the keep window must partition by component:\n$plan")
  }

  test("q225 split-leakage audit: two id-keyed equi-joins over the " +
      "pair frame — no cartesian, no nested loop") {
    val plan = planOf("q225_split_leakage")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q192 semdedup: no cartesian — pairs only via the cluster-key " +
      "join; the centroid side broadcasts") {
    val plan = planOf("q192_semdedup")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"),
      s"centroid join must broadcast (index-cardinality side):\n$plan")
  }

  test("q200 span removal: keyed equi-joins only (the 1:1 owner join " +
      "and the per-doc coverage join) — no cartesian") {
    val plan = planOf("q200_remove_spans")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q203 snapshot near-dup: candidates only via the " +
      "(band, bucket) equi-join — no cartesian anywhere") {
    val plan = planOf("q203_snapshot_neardup")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q205 CMS: the probe side cross-joins ONLY the broadcast " +
      "1-row counter frame; the token aggregate is map-side partial") {
    val plan = planOf("q205_cms_counts")
    // the 1-row counters frame is the only nested-loop side — benign
    // by cardinality; the corpus-sized token stream must not be
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"only the 1-row counter broadcast:\n$plan")
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), plan)
  }

  test("q206 manifest: one shard-keyed aggregation, no join at all") {
    val plan = planOf("q206_shard_manifest")
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"one shard shuffle expected:\n$plan")
  }

  test("q208 release manifest keeps the q187 pipeline's shape: no " +
      "cartesian, still at most one single-partition exchange (the " +
      "k-row n_min agg), plus only the one extra manifest roll-up") {
    val plan = planOf("q208_release_manifest")
    assert(!plan.contains("CartesianProduct"), plan)
    val singles = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1, s"expected <=1 single-partition exchange:\n$plan")
  }

  test("q209 sequence index: ONE shard-keyed exchange (the packing " +
      "window), generate stays narrow, no join anywhere") {
    val plan = planOf("q209_sequence_index")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"one packing-window shuffle expected:\n$plan")
  }

  test("q210 fertility: the encode dictionary join and the lang join " +
      "both broadcast (vocab-sized symtab / 2-col docs projection) — " +
      "never sort-merge, never cartesian") {
    val plan = planOf("q210_bpe_fertility")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }

  test("q211 boilerplate lines: the df-capped convicted-line frame " +
      "broadcasts onto the line stream; no corpus-sized join back — " +
      "totals and rebuild ride ONE doc-keyed aggregate") {
    val plan = planOf("q211_boilerplate_lines")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastHashJoin .*LeftOuter".r.findFirstIn(plan).nonEmpty,
      plan)
    // line-df countDistinct is two-phase (2 exchanges) + the one
    // doc-keyed rebuild aggregate — never more
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <=3 exchanges:\n$plan")
  }

  test("q212 decontamination: benchmark grams reduce to a DISTINCT " +
      "set that semi-joins the train occurrences — no owner " +
      "aggregate, no cartesian, no pair term") {
    val plan = planOf("q212_decontaminate")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("LeftSemi"), plan)
  }

  test("q213 blocklist: suffix chain joins the broadcast blocklist; " +
      "only hits reach the id-keyed arg-max; the verdict join " +
      "broadcasts back — never sort-merge, never cartesian") {
    val plan = planOf("q213_domain_blocklist")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"blocklist dedup + hits agg only:\n$plan")
  }

  test("q214 budget select: the ONLY per-doc window is keyed by the " +
      "boundary band — the corpus never crosses a single-partition " +
      "window; band running totals ride the |bands|-row frame") {
    val plan = planOf("q214_budget_select")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("hashpartitioning(band"),
      s"boundary window must be band-keyed:\n$plan")
  }

  test("q216 simhash hamming: candidates only via the (band, bucket) " +
      "equi-join — no cartesian, no nested loop; the fold verifies " +
      "candidates, never all pairs") {
    val plan = planOf("q216_simhash_hamming")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q219 curation capstone: the whole chain keeps its stages' " +
      "shapes — no cartesian beyond the 1-row NB totals frame, no " +
      "unpartitioned corpus window") {
    val plan = planOf("q219_curation_capstone")
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop side is the broadcast 1-row NB totals
    // frame (the q205/q215 counter posture)
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"only the 1-row totals broadcast:\n$plan")
    // the NB totals reduce (vocab frame -> 1 row) is the only
    // single-partition exchange the chain may carry
    val singles = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1, s"only the totals reduce:\n$plan")
  }

  test("q221 NB-banded selection: no cartesian; every nested loop is " +
      "the 1-row totals cross; both windows stay keyed (lang decile, " +
      "band prefix) — the corpus never crosses an unkeyed window") {
    val plan = planOf("q221_nb_budget_select")
    assert(!plan.contains("CartesianProduct"), plan)
    val bnlj = "BroadcastNestedLoopJoin BuildRight, Cross"
      .r.findAllIn(plan).size
    assert(bnlj === "BroadcastNestedLoopJoin".r.findAllIn(plan).size,
      s"every nested loop must be the benign totals cross:\n$plan")
    assert(plan.contains("hashpartitioning(lang"), plan)
    assert(plan.contains("hashpartitioning(band"), plan)
  }

  test("q246 contrastive capstone: no cartesian; every nested loop is " +
      "a benign broadcast cross (the bounded anchor pool and the " +
      "1-row report aggregates) — LSH candidates stay an equi-join") {
    val plan = planOf("q246_contrastive_capstone")
    assert(!plan.contains("CartesianProduct"), plan)
    // build side may be either (the 1-row report frames cross in both
    // directions; the anchor cross carries the self-exclusion cond)
    val benign = "BroadcastNestedLoopJoin Build(Left|Right), Cross"
      .r.findAllIn(plan).size
    assert(benign === "BroadcastNestedLoopJoin".r.findAllIn(plan).size,
      s"every nested loop must be a benign broadcast cross:\n$plan")
  }

  test("r20 q248 snapshot mining: candidates only via the (band, " +
      "bucket) equi-join against the stored index — no cartesian, no " +
      "corpus re-hash on the snapshot side") {
    val plan = planOf("q248_mining_snapshot")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("r20 q250 batch composition: two keyed window exchanges " +
      "(label, then wave), NEVER a single-partition pass — the " +
      "composite-batch-key design's whole point") {
    val plan = planOf("q250_inbatch_batches")
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 keyed exchanges, got $exchanges\n$plan")
  }

  test("r20 asOfStored over the writeForAsOf layout PRUNES fully-" +
      "closed-day partitions at the FileIndex level (r19 verdict item " +
      "3's plan lock) and matches the frame-law asOf row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    import graft.operators.History
    val tmp = java.nio.file.Files.createTempDirectory("asofp").toString
    val log = Seq(
      (1L, "2024-01-01 00:00:00", 0L, "A"),  // closes on day 2
      (1L, "2024-01-02 00:00:00", 1L, "B"),  // closes on day 3
      (1L, "2024-01-03 00:00:00", 2L, "C"),  // open
      (2L, "2024-01-01 06:00:00", 3L, "X"),  // closes on day 1
      (2L, "2024-01-01 18:00:00", 4L, "Y"))  // open
      .toDF("key", "t", "seq", "payload")
      .selectExpr("key", "CAST(t AS TIMESTAMP) AS t", "seq", "payload")
    val h = History.scd2(log, "key", "t", Seq("payload"), Seq("seq"))
    History.writeForAsOf(h, s"$tmp/h")
    // layout: _vt_day ∈ {2024-01-01, 2024-01-02, 2024-01-03, open}
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    val df = History.asOfStored(spark, s"$tmp/h", cut)
    val scan = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "the _vt_day predicate must reach the scan as a partition filter")
    val kept = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).length
    assert(kept === 3,
      s"day-01 closed wholly before the cut day and must prune: $kept of 4")
    // behavioral parity with the frame law (day-02's same-day closing
    // survives pruning but row-filters out)
    assert(df.collect().map(_.toString).sorted.toSeq ===
      History.asOf(h, cut).collect().map(_.toString).sorted.toSeq)
  }
}
