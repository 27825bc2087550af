package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ContrastiveMining

/** The contrastive-mining tier (q236-q238): the label law (NULL never
  * mines), self-exclusion, tie-breaks, inner-triplet semantics, the
  * margin arithmetic, and the LSH posture's exact-agreement on a
  * clustered fixture. */
class ContrastiveMiningSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // dim-4 fixture: two tight clusters + a null-label row + a
  // wrong-width row. Cosine structure: ids 1,2 (label 0) near +x;
  // ids 3,4 (label 1) near +y; id 5 (label 0) near +y — so 3 and 4's
  // hardest negative is 5, and 1's hardest negative is ~orthogonal.
  private def fixture: DataFrame = Seq(
    (1L, Seq(1.0f, 0.02f, 0f, 0f), Some(0)),
    (2L, Seq(0.99f, 0.05f, 0f, 0f), Some(0)),
    (3L, Seq(0.02f, 1.0f, 0f, 0f), Some(1)),
    (4L, Seq(0.05f, 0.98f, 0f, 0f), Some(1)),
    (5L, Seq(0.0f, 0.97f, 0.05f, 0f), Some(0)),
    (6L, Seq(1.0f, 0f, 0f, 0f), None), // null label: never mines
    (7L, Seq(1.0f, 0f), Some(1))       // wrong width: never mines
  ).toDF("vec_id", "embedding", "label")

  test("hardNegatives: label law — null-label and wrong-width rows " +
      "appear neither as anchors nor as neighbors") {
    val out = ContrastiveMining.hardNegatives(
      fixture, "vec_id", "embedding", "label", fixture, 4, 10)
    val anchors = out.select("anchor_id").as[Long].collect().toSet
    val neighbors = out.select("neighbor_id").as[Long].collect().toSet
    assert(!anchors.contains(6L) && !anchors.contains(7L))
    assert(!neighbors.contains(6L) && !neighbors.contains(7L))
  }

  test("hardNegatives: per-anchor ranking is cosine desc with " +
      "neighbor_id asc tie-break; only different labels surface") {
    val out = ContrastiveMining.hardNegatives(
        fixture, "vec_id", "embedding", "label",
        fixture.where($"vec_id" === 3L), 4, 3)
      .orderBy("rnk").collect()
    // anchor 3 (label 1, +y): negatives are label-0 rows 1, 2, 5;
    // 5 is nearly parallel → rank 1; 2 (y-component 0.05) beats
    // 1 (y-component 0.02)
    assert(out.map(_.getLong(1)).toSeq === Seq(5L, 2L, 1L))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2, 3))
  }

  test("triplets: self excluded from positives; inner semantics drop " +
      "an anchor whose label has no other member") {
    // make label 2 a singleton: its anchor has no positive leg
    val withSingleton = fixture.unionByName(
      Seq((8L, Seq(0.5f, 0.5f, 0f, 0f), Some(2))).toDF("vec_id", "embedding", "label"))
    val out = ContrastiveMining.triplets(
      withSingleton, "vec_id", "embedding", "label",
      withSingleton.where($"vec_id".isin(1L, 8L)), 4)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(8L), "singleton-label anchor has no positive leg")
    val a1 = rows(1L)
    assert(a1.getLong(1) === 2L, "hardest positive of 1 is its cluster twin 2")
    // the diagonal singleton 8 (label 2) IS a valid negative for 1 —
    // and at 45° it's the hardest one
    assert(a1.getLong(3) === 8L)
  }

  test("triplets: margin = round(round(pos,6) - round(neg,6), 6)") {
    val out = ContrastiveMining.triplets(
        fixture, "vec_id", "embedding", "label",
        fixture.where($"vec_id" === 1L), 4)
      .collect().head
    val pos = out.getDouble(2); val neg = out.getDouble(4)
    val expected =
      BigDecimal(pos - neg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.getDouble(5) - expected) < 1e-9,
      s"margin=${out.getDouble(5)} expected=$expected")
  }

  test("hardNegativesLshAuto: the sizing law lands on the fixed face " +
      "at gate-corpus scale (500 -> 3 bits) and grows at the decades " +
      "(20k -> 8 bits) — the q242/q238 shared-oracle premise") {
    assert(graft.operators.Dedup.lshSizing(500L, 12, 0.5) === 3)
    assert(graft.operators.Dedup.lshSizing(20000L, 12, 0.5) === 8)
    val auto = ContrastiveMining.hardNegativesLshAuto(
      fixture, "vec_id", "embedding", "label", 4, 3,
      rowCount = Some(500L))
    val fixed = ContrastiveMining.hardNegativesLsh(
      fixture, "vec_id", "embedding", "label", 4, 3)
    assert(auto.collect().map(_.toString).sorted.toSeq ===
      fixed.collect().map(_.toString).sorted.toSeq)
  }

  test("recallAudit: standard recall@k — a pair found at approx rank r " +
      "counts for every k >= r; denominators grow with k") {
    val exact = ContrastiveMining.hardNegatives(
      fixture, "vec_id", "embedding", "label", fixture, 4, 3)
    // approx = only each anchor's rank-1 negative
    val approx = exact.where($"rnk" === 1)
    val out = ContrastiveMining.recallAudit(exact, approx, 3)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val nAnchors = exact.where($"rnk" === 1).count()
    assert(out(1) === ((nAnchors, nAnchors, 1.0)),
      "every rank-1 pair is found at k=1")
    assert(out(2)._2 === nAnchors && out(2)._1 > nAnchors,
      "at k=2 only the rank-1 pairs are found; denominator grows")
    assert(out(3)._3 < out(2)._3 && out(2)._3 < out(1)._3,
      "recall strictly falls as k grows when approx carries only rank 1")
  }

  test("sampledNegatives: seeded md5 draw is deterministic, respects " +
      "the label law, changes with the seed, and never repeats a " +
      "neighbor within an anchor") {
    val anchors = fixture.where($"vec_id".isin(1L, 3L))
    def draw(seed: String) = ContrastiveMining.sampledNegatives(
        fixture, "vec_id", "label", anchors, 2, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val s1 = draw("s1"); val s1again = draw("s1"); val s2 = draw("s2")
    assert(s1 === s1again, "same seed, same sample")
    assert(s1 !== s2, "different seed must reshuffle some rank")
    assert(s1.forall { case (_, n, _) => n != 6L },
      "null-label never sampled; note 7L (labeled, wrong-width) IS " +
        "samplable — sampling is label-driven, width-independent")
    // null-ID rows are out on both sides: a pair without ids can't
    // be cited, and the engines' concat semantics diverge on NULL
    val withNullId = fixture.unionByName(
      Seq((Option.empty[Long], Seq(9f, 9f, 9f, 9f), Some(0)))
        .toDF("vec_id", "embedding", "label"))
    val s3 = ContrastiveMining.sampledNegatives(
        withNullId, "vec_id", "label",
        withNullId.where($"vec_id".isin(3L) || $"vec_id".isNull), 10, "s1")
      .collect()
    assert(s3.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "null-id rows neither sample nor are sampled")
    val perAnchor = s1.groupBy(_._1).values
    assert(perAnchor.forall(g => g.map(_._2).size === g.size),
      "no repeated neighbor within an anchor")
  }

  test("hardNegativesLshAuto sizes on the MINING population (labeled, " +
      "dim-valid), not the raw corpus — a mostly-unlabeled corpus " +
      "keeps the small-population band width") {
    // 2 labeled rows + 698 null-label fillers: raw-count sizing gives
    // lshSizing(700)=4 bits, labeled-count sizing gives floor 1 bit
    // pair chosen (searched against the plane law) to collide under
    // 1-bit bands but share NO full 4-bit band — so the two widths
    // produce different candidate sets and the arm can't go vacuous
    val labeled2 = Seq(
      (1L, Seq(1.0f, 0.1f, 0f, 0f), Some(0)),
      (2L, Seq(-0.64f, 0.16f, 0.28f, -0.26f), Some(1)))
    val fillers = (100L until 798L).map(i =>
      (i, Seq(1.0f, 0f, 0f, 0f), None: Option[Int]))
    val corpus = (labeled2 ++ fillers).toDF("vec_id", "embedding", "label")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val auto = rows(ContrastiveMining.hardNegativesLshAuto(
      corpus, "vec_id", "embedding", "label", 4, 3))
    val oneBit = rows(ContrastiveMining.hardNegativesLsh(
      corpus, "vec_id", "embedding", "label", 4, 3, bandBits = 1))
    val fourBit = rows(ContrastiveMining.hardNegativesLsh(
      corpus, "vec_id", "embedding", "label", 4, 3, bandBits = 4))
    assert(auto === oneBit)
    assert(oneBit !== fourBit,
      "fixture must distinguish the widths or the arm is vacuous")
  }

  test("hardNegativesLsh: deterministic on a fixed fixture, agrees " +
      "with exact mining on band-colliding cluster pairs, no cartesian") {
    val df = ContrastiveMining.hardNegativesLsh(
      fixture, "vec_id", "embedding", "label", 4, 3)
    assert(!df.queryExecution.executedPlan.toString.contains("Cartesian"))
    val lsh = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = ContrastiveMining.hardNegatives(
        fixture, "vec_id", "embedding", "label", fixture, 4, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // subset law: every LSH-mined negative is a true label-mismatched
    // pair with the exact cosine (rank may differ — candidates are
    // restricted to band collisions)
    assert(lsh.nonEmpty)
    assert(lsh.forall { case (a, n, s) => exact.contains((a, n, s)) })
  }

  test("lshRecallSizing: the defaults solve to (1 bit, 4 bands) — " +
      "pEff = p(0.35) − 0.15 ≈ 0.464 < 1/2 makes every extra bit a " +
      "net cost, and 4 half-space bands clear the 0.9 target") {
    val plan = ContrastiveMining.lshRecallSizing()
    assert(plan.bandBits === 1 && plan.bands === 4)
    assert(plan.met)
    assert(plan.collisionFrac === 4 * 0.5)
    // recall at pEff: 1 - (1-pEff)^4 with pEff = 1 - acos(0.35)/π - 0.15
    val pEff = 1.0 - math.acos(0.35) / math.Pi - 0.15
    assert(plan.predictedRecall === 1.0 - math.pow(1.0 - pEff, 4))
    assert(plan.predictedRecall >= 0.9 &&
      1.0 - math.pow(1.0 - pEff, 3) < 0.9,
      "4 must be the SMALLEST feasible band count at 1 bit")
  }

  test("lshRecallSizing: a high cosine floor (pEff > 1/2) buys wide " +
      "bands and a geometrically smaller collision fraction; the " +
      "plan's fraction is exactly bands·2^-bits") {
    val plan = ContrastiveMining.lshRecallSizing(
      targetRecall = 0.9, atCosine = 0.9, dispersion = 0.15)
    assert(plan.met)
    assert(plan.bandBits >= 8, s"expected wide bands, got $plan")
    assert(plan.collisionFrac ===
      plan.bands * math.pow(0.5, plan.bandBits))
    assert(plan.collisionFrac < 0.1,
      s"high-floor mining must be far from exhaustive: $plan")
    assert(plan.predictedRecall >= 0.9)
  }

  test("lshRecallSizing: the n-aware objective (rowCount) weighs " +
      "signature dots against verifies and picks narrower bands at " +
      "small corpora; the n-free default (the q247 gate law) is " +
      "unchanged; the pick provably minimizes the stated objective") {
    val free = ContrastiveMining.lshRecallSizing(atCosine = 0.8)
    val aware = ContrastiveMining.lshRecallSizing(atCosine = 0.8,
      rowCount = Some(20000L))
    assert(aware.bandBits < free.bandBits,
      s"at 20k rows the signature term must bite: $free vs $aware")
    assert(aware.predictedRecall >= 0.9 && free.predictedRecall >= 0.9)
    // optimality replay: every feasible (b, smallest-r) scored by the
    // stated objective — the pick must be its argmin
    val pEff = 1.0 - math.acos(0.8) / math.Pi - 0.15
    val costs = (1 to 32).flatMap { b =>
      val x = math.pow(pEff, b)
      (1 to 512).find(r => 1.0 - math.pow(1.0 - x, r) >= 0.9)
        .map(r => (b, r, r.toDouble * b + r * math.pow(0.5, b) * 20000L))
    }
    val best = costs.minBy(c => (c._3, c._1))
    assert((aware.bandBits, aware.bands) === ((best._1, best._2)))
    assert(ContrastiveMining.lshRecallSizing() ===
      ContrastiveMining.lshRecallSizing(rowCount = None))
  }

  test("lshRecallSizing: an unreachable target falls back to " +
      "(1, bandsCap) with met = false instead of silently under-" +
      "delivering") {
    // pEff = 1 - acos(-0.9)/π - 0.14 ≈ 0.0036: even 512 half-space
    // bands can't reach 0.9
    val plan = ContrastiveMining.lshRecallSizing(
      targetRecall = 0.9, atCosine = -0.9, dispersion = 0.14)
    assert(!plan.met)
    assert(plan.bandBits === 1 && plan.bands === 512)
    assert(plan.predictedRecall < 0.9)
  }

  test("hardNegativesLshRecall: the defaults mine with the solved " +
      "(1, 4) geometry — row-identical to hardNegativesLsh at that " +
      "geometry") {
    def rows(df: DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(ContrastiveMining.hardNegativesLshRecall(
        fixture, "vec_id", "embedding", "label", 4, 3)) ===
      rows(ContrastiveMining.hardNegativesLsh(
        fixture, "vec_id", "embedding", "label", 4, 3,
        bandBits = 1, bands = 4)))
  }

  test("recallAuditSampled: the seeded lexicographic-hex draw is " +
      "deterministic, audits ONLY the sampled anchors, and equals the " +
      "manual composition (sampled exact side vs the approx frame " +
      "semi-joined to the sample)") {
    import org.apache.spark.sql.functions.{concat, md5, lit => flit}
    val approx = ContrastiveMining.hardNegativesLsh(
      fixture, "vec_id", "embedding", "label", 4, 3)
    // widen the draw so the 5-row fixture keeps some anchors
    val out = ContrastiveMining.recallAuditSampled(
      fixture, "vec_id", "embedding", "label", approx, 4, 3,
      seed = "s1", maxPrefix = "c")
    val sampledIds = fixture
      .where($"vec_id".isNotNull &&
        md5(concat($"vec_id".cast("string"), flit(":"), flit("s1"))) < flit("c"))
      .select($"vec_id").as[Long].collect().toSet
    assert(sampledIds.nonEmpty && sampledIds.size < 5,
      s"fixture draw must be a proper subset: $sampledIds")
    val manualExact = ContrastiveMining.hardNegatives(
      fixture, "vec_id", "embedding", "label",
      fixture.where($"vec_id".isin(sampledIds.toSeq: _*)), 4, 3)
    val manual = ContrastiveMining.recallAudit(
      manualExact, approx.where($"anchor_id".isin(sampledIds.toSeq: _*)), 3)
    assert(out.collect().map(_.toString).sorted.toSeq ===
      manual.collect().map(_.toString).sorted.toSeq)
    // n_exact reads over the sample only
    val nExact = out.where($"k" === 3).select($"n_exact").as[Long].head()
    assert(nExact <= sampledIds.size * 3L)
  }

  test("tripletsLsh: both legs come from band collisions — on the " +
      "clustered fixture (everything collides) it equals the exact " +
      "face with all labeled rows as anchors; inner semantics hold") {
    def rows(df: DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val lsh = ContrastiveMining.tripletsLsh(
      fixture, "vec_id", "embedding", "label", 4, bandBits = 1, bands = 4)
    val exact = ContrastiveMining.triplets(
      fixture, "vec_id", "embedding", "label", fixture, 4)
    // 1-bit bands over a 5-vector fixture: every labeled pair collides
    // in some band, so the approximate face reproduces the exact law
    assert(rows(lsh) === rows(exact))
    assert(lsh.count() > 0)
    // subset law at the gate geometry: every LSH triplet's legs are
    // true pairs with the exact cosine (legs may differ where a
    // harder pair never collides)
    val g = ContrastiveMining.tripletsLsh(
      fixture, "vec_id", "embedding", "label", 4)
    val exactPairs = ContrastiveMining.hardNegatives(
        fixture, "vec_id", "embedding", "label", fixture, 4, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    g.collect().foreach { r =>
      assert(exactPairs.contains((r.getLong(0), r.getLong(3), r.getDouble(4))),
        "the negative leg must be a true different-label pair")
    }
  }

  test("inBatchNegativeBatches: no batch carries a label twice (at " +
      "ANY batchSize), slots stay under the cap, every labeled row is " +
      "assigned exactly once, null ids/labels are out") {
    val rows = (1L to 37L).map(i => (i, Some((i % 5).toInt))) ++
      Seq((100L, None), (101L, Some(9)))
    val df = (rows :+ ((102L, Some(9)))).toDF("vec_id", "label")
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], Some(1)))
        .toDF("vec_id", "label"))
    for (b <- Seq(2, 3, 8)) {
      val out = ContrastiveMining.inBatchNegativeBatches(df, "vec_id", "label", b)
        .collect()
      assert(out.length === 39, "37 mod-5 rows + 2 label-9 rows; the null-label and null-id rows are out")
      val byBatch = out.groupBy(r => (r.getLong(2), r.getLong(3)))
      byBatch.foreach { case (k, rs) =>
        assert(rs.map(_.getInt(1)).distinct.length === rs.length,
          s"batch $k repeats a label at B=$b")
        assert(rs.length <= b, s"batch $k exceeds B=$b")
        assert(rs.map(_.getLong(4)).sorted.toSeq === (0L until rs.length),
          s"batch $k slots must be dense from 0")
      }
      assert(out.map(_.getLong(0)).distinct.length === 39,
        "every row assigned exactly once")
    }
  }

  test("hardNegativesAgainstSnapshot: with batch = corpus and the " +
      "persisted bucket index built over the labeled corpus, the " +
      "output equals the fixed LSH face; a DELTA batch equals the " +
      "full face filtered to its anchors (the miner is anchor-local)") {
    import graft.operators.Dedup
    def rows(df: DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val lab = fixture.where($"label".isNotNull && size($"embedding") === 4)
    val buckets = Dedup.bandedBuckets(
      lab.select($"vec_id", $"embedding"), "vec_id", "embedding", 4, 3, 12)
    val full = ContrastiveMining.hardNegativesLsh(
      fixture, "vec_id", "embedding", "label", 4, 3)
    assert(rows(ContrastiveMining.hardNegativesAgainstSnapshot(
        fixture, fixture, "vec_id", "embedding", "label",
        buckets, "vec_id", 4, 3)) === rows(full))
    val delta = fixture.where($"vec_id".isin(3L, 5L))
    assert(rows(ContrastiveMining.hardNegativesAgainstSnapshot(
        delta, fixture, "vec_id", "embedding", "label",
        buckets, "vec_id", 4, 3)) ===
      rows(full.where($"anchor_id".isin(3L, 5L))))
  }
}
