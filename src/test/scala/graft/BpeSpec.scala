package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.operators.Bpe

/** BPE tokenizer training (operators.Bpe — q201/q202's operator,
  * Sennrich et al. 2016): merge order on a hand-computed corpus, the
  * greedy non-overlap law on repeated symbols, the pinned tie-break,
  * pair exhaustion, and OOV replay ≡ dictionary join. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def learn(texts: Seq[String], m: Int) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Bpe.learnMerges(Bpe.wordFreqs(df, "text"), m)
  }

  test("hand corpus: merges follow weighted pair counts, and later " +
      "rounds merge previously-merged symbols") {
    // freq: low×3, lowest×2 → pairs: (l,o)=5 (o,w</w>)=3 (o,w)=2
    // (w,e)=2 (e,s)=2 (s,t</w>)=2 ... round 1: (l,o) count 5.
    // round 2 ties at 3: (lo,w</w>) vs nothing else — "low" is now
    // [lo, w</w>]; "lowest" is [lo, w, e, s, t</w>].
    val (ms, symtab) = learn(Seq("low low low lowest lowest"), 3)
    try {
      assert(ms.map(m => (m.lhs, m.rhs, m.cnt)).take(2) ===
        Seq(("l", "o", 5L), ("lo", "w</w>", 3L)))
      assert(ms(2).lhs === "lo" || ms(2).cnt === 2L)
      val syms = symtab.where(col("word") === "low")
        .select("syms").head().getSeq[String](0)
      assert(syms === Seq("low</w>"))
    } finally symtab.unpersist()
  }

  test("greedy left-to-right non-overlap: 'aaaa' under merge (a,a) " +
      "becomes [aa, aa, ...], never re-consuming a merged right") {
    val (ms, symtab) = learn(Seq("aaaa aaaa aaaa"), 1)
    try {
      assert((ms.head.lhs, ms.head.rhs) === ("a", "a"))
      // symbols of "aaaa": a a a a</w> → pairs (a,a)x2 + (a,a</w>)
      // merge (a,a): greedy → [aa, aa</w>]? no — last symbol is
      // a</w>, so → [aa, a, a</w>]
      val syms = symtab.select("syms").head().getSeq[String](0)
      assert(syms === Seq("aa", "a", "a</w>"))
    } finally symtab.unpersist()
  }

  test("tie-break is deterministic: equal counts resolve by " +
      "lexicographic (lhs, rhs) ascending") {
    // "zy" and "ab" each once → pairs (z,y</w>)=1, (a,b</w>)=1;
    // round 1 must pick (a,b</w>)
    val (ms, symtab) = learn(Seq("zy ab"), 1)
    try assert((ms.head.lhs, ms.head.rhs) === ("a", "b</w>"))
    finally symtab.unpersist()
  }

  test("pair exhaustion stops early instead of looping") {
    // single 1-char word → zero adjacent pairs ever
    val (ms, symtab) = learn(Seq("a a a"), 5)
    try assert(ms.isEmpty)
    finally symtab.unpersist()
  }

  test("OOV replay (replaySymbols) equals the dictionary path on " +
      "every in-vocab word of a real slice") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    val (ms, symtab) = Bpe.learnMerges(Bpe.wordFreqs(docs, "text"), 8)
    try {
      val replayed = symtab.select(col("word"), col("syms"),
        Bpe.replaySymbols(col("word"), ms).as("replay"))
      val diff = replayed.where(col("syms") =!= col("replay")).count()
      assert(diff === 0L, "runtime-fold replay must equal the table")
    } finally symtab.unpersist()
  }

  test("encode composes into packing (the q204 law): subword-budgeted " +
      "chop boundaries are exact on a hand corpus") {
    val df = Seq((0L, "low low lowest"), (2L, "low lowest lowest"),
      (4L, "lowest")).toDF("doc_id", "text")   // one shard (all even)
    val (_, symtab) = graft.operators.Bpe.learnMerges(
      graft.operators.Bpe.wordFreqs(df, "text"), 2)
    try {
      // freqs low×3 lowest×4 → round 1 (l,o)=7; round 2 ties at 4
      // and lex-asc picks (e,s): low=[lo,w</w>]=2, lowest=[lo,w,es,t</w>]=4
      val out = graft.operators.Packing.concatChop(
          graft.operators.Bpe.encode(df, "doc_id", "text", symtab),
          "doc_id", "n_subwords", pmod(col("doc_id"), lit(2)), 8L)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      // doc 0: 2+2+4=8 subwords at start 0 → tokens 0..7, seqs 0..0
      // doc 2: 2+4+4=10 at start 8 → tokens 8..17, seqs 1..2
      // doc 4: 4 at start 18 → tokens 18..21, seqs 2..2
      assert(out(0L) === ((0L, 0L, 0L)))
      assert(out(2L) === ((8L, 1L, 2L)))
      assert(out(4L) === ((18L, 2L, 2L)))
    } finally symtab.unpersist()
  }

  test("fertility roll-up (the q210 law): per-language subwords/word " +
      "is exact on the hand corpus") {
    val df = Seq((0L, "low low lowest", "aa"),
      (2L, "low lowest lowest", "bb"), (4L, "lowest", "aa"))
      .toDF("doc_id", "text", "lang")
    val (_, symtab) = graft.operators.Bpe.learnMerges(
      graft.operators.Bpe.wordFreqs(df, "text"), 2)
    try {
      // low = 2 subwords, lowest = 4 (freqs 3/4 → merges (l,o),(e,s))
      val f = graft.operators.Bpe.encode(df, "doc_id", "text", symtab)
        .join(df.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang")
        .agg(org.apache.spark.sql.functions.sum("n_subwords").as("sw"),
          org.apache.spark.sql.functions.sum("n_words").as("w"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      assert(f("aa") === ((12L, 4L)))   // docs 0 (8/3) + 4 (4/1)
      assert(f("bb") === ((10L, 3L)))   // doc 2: 2+4+4
    } finally symtab.unpersist()
  }

  test("encode: per-doc subword/word totals are exact on a hand corpus") {
    val df = Seq((1L, "low low lowest"), (2L, "low"))
      .toDF("doc_id", "text")
    val (_, symtab) = Bpe.learnMerges(Bpe.wordFreqs(df, "text"), 2)
    try {
      // after (l,o) and (lo,w</w>): low → [low</w>] (1 subword),
      // lowest → [lo, w, e, s, t</w>] (5 subwords)
      val out = Bpe.encode(df, "doc_id", "text", symtab)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(out(1L) === ((1L + 1L + 5L, 3L)))
      assert(out(2L) === ((1L, 1L)))
    } finally symtab.unpersist()
  }

  test("r17 pass-9 regressions: empty-word symbols are EMPTY (no " +
      "phantom </w>), the open-text encode overload replays OOV " +
      "words instead of dropping them, and the replay law is " +
      "single-pass-per-rank (the documented external-table " +
      "divergence)") {
    // empty word: no ["", "</w>"] phantom
    val init = Seq(Tuple1("")).toDF("w")
      .select(Bpe.initSymbols(col("w")).as("s"))
      .collect().head.getSeq[String](0)
    assert(init.isEmpty)
    // OOV fallback: train on "aa", encode "aa zz" — the dictionary
    // face drops zz (documented in-vocab contract), the merges face
    // counts it via replay
    val words = Seq(("aa", 5L)).toDF("word", "freq")
    val (merges, symtab) = Bpe.learnMerges(words, 2)
    try {
      val docs = Seq((1L, "aa zz"), (2L, "zz zz")).toDF("id", "t")
      val dict = Bpe.encode(docs, "id", "t", symtab)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      assert(dict === Map(1L -> ((1L, 1L)))) // doc 2 vanished: all-OOV
      val open = Bpe.encode(docs, "id", "t", symtab, merges)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      // "zz" replays to [z, z</w>] (no zz merge learned): 2 subwords
      assert(open === Map(1L -> ((1L + 2L, 2L)), 2L -> ((4L, 2L))))
    } finally symtab.unpersist()
    // single-pass law: external table [(1: ab+c), (2: a+b)] on "abcd"
    // stops at [ab, c, d</w>] — the reference loop would reach
    // [abc, d</w>]; the divergence is pinned, not hidden
    val replayed = Seq(Tuple1("abcd")).toDF("w")
      .select(Bpe.replaySymbols(col("w"), Seq(
        Bpe.Merge(1, "ab", "c", "abc", 1L),
        Bpe.Merge(2, "a", "b", "ab", 1L))).as("s"))
      .collect().head.getSeq[String](0)
    assert(replayed === Seq("ab", "c", "d</w>"))
  }
}
