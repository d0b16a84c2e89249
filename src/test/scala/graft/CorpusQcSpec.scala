package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusQc

class CorpusQcSpec extends SparkSpec {
  import spark.implicits._

  test("jsBySource: identical sources score 0; partial overlap hand-computed") {
    val same = Seq(("s1", "x y z"), ("s2", "x y z")).toDF("source", "text")
    val r0 = graft.operators.CorpusQc.jsBySource(same, "source", "text").head
    assert(r0.getAs[Long]("n_tokens_common") == 3L)
    assert(r0.getAs[Double]("js_div") == 0.0)
    // a: {x:2, y:1}, b: {x:1, z:1} -> only x co-occurs
    val mixed = Seq(("a", "x x y"), ("b", "x z")).toDF("source", "text")
    val r = graft.operators.CorpusQc.jsBySource(mixed, "source", "text").head
    assert(r.getAs[Long]("n_tokens_common") == 1L)
    def g6(v: Double) = math.floor(v * 1e6) / 1e6
    val (c1, c2) = (2.0 * 2.0, 1.0 * 3.0)
    val ln2 = 0.6931471805599453
    val want = 0.5 * (g6(2.0 / 3.0 * math.log(2.0 * c1 / (c1 + c2))) + ln2 * (1.0 - 2.0 / 3.0)) +
      0.5 * (g6(1.0 / 2.0 * math.log(2.0 * c2 / (c1 + c2))) + ln2 * (1.0 - 1.0 / 2.0))
    assert(math.abs(r.getAs[Double]("js_div") - want) < 1e-12)
    // disjoint vocabularies never join: the pair is absent (JS = ln 2
    // by definition — the caller reads absence as "nothing shared")
    val disjoint = Seq(("a", "x"), ("b", "y")).toDF("source", "text")
    assert(graft.operators.CorpusQc.jsBySource(disjoint, "source", "text").count() == 0L)
  }

  test("repetitionStats: fractions over non-distinct bigrams, short docs zeroed") {
    val docs = Seq(
      (1L, "a a a a"),         // bigram "a a" x3 -> top 1.0, dup 1.0
      (2L, "w x y z"),         // 3 distinct bigrams -> top 1/3, dup 0
      (3L, "q"),               // no bigrams -> zero fractions, kept
      (4L, "p r p r p"))       // "p r" x2, "r p" x2 -> top 0.5, dup 1.0
      .toDF("doc_id", "text")
    val got = CorpusQc.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.length == 4)
    val r1 = got(0)
    assert(r1.getLong(2) == 3 && r1.getDouble(4) == 1.0 && r1.getDouble(5) == 1.0
      && r1.getBoolean(6))
    val r2 = got(1)
    assert(r2.getLong(2) == 3 && r2.getLong(3) == 3
      && math.abs(r2.getDouble(4) - 1.0 / 3) < 1e-15 && r2.getDouble(5) == 0.0)
    val r3 = got(2)
    assert(r3.getLong(2) == 0 && r3.getDouble(4) == 0.0 && !r3.getBoolean(6))
    val r4 = got(3)
    assert(r4.getDouble(4) == 0.5 && r4.getDouble(5) == 1.0 && r4.getBoolean(6))
  }

  test("contaminationPairs: shared n-gram count, threshold, short-doc fallback") {
    val train = Seq(
      (1L, "one two three four five six seven eight nine ten eleven twelve"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "tiny doc")) // < n tokens -> whole-text gram
      .toDF("doc_id", "text")
    val evalSet = Seq(
      // shares the 12-token run with train 1: 5 distinct 8-grams
      (10L, "one two three four five six seven eight nine ten eleven twelve"),
      (11L, "tiny doc"),
      (12L, "unrelated words only here nothing shared at all whatsoever truly"))
      .toDF("doc_id", "text")
    val got = CorpusQc.contaminationPairs(train, evalSet, "doc_id", "text",
      n = 8, minShared = 5).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 10L && r.getLong(2) == 5L
      && r.getLong(3) == 5L && r.getDouble(4) == 1.0)
    // dropping the threshold surfaces the whole-text fallback pair
    val loose = CorpusQc.contaminationPairs(train, evalSet, "doc_id", "text",
      n = 8, minShared = 1).collect()
    assert(loose.exists(r => r.getLong(0) == 3L && r.getLong(1) == 11L && r.getLong(2) == 1L))
    assert(!loose.exists(r => r.getLong(1) == 12L))
  }

  test("contaminationPairs: df-cap drops hot grams from both sides symmetrically") {
    // the same short text in 3 train + 2 eval docs -> combined df 5 > cap 4
    val train = (1L to 3L).map(i => (i, "common run of words")).toDF("doc_id", "text")
    val evalSet = Seq((10L, "common run of words"), (11L, "common run of words"))
      .toDF("doc_id", "text")
    val got = CorpusQc.contaminationPairs(train, evalSet, "doc_id", "text",
      n = 8, minShared = 1, maxDf = 4).collect()
    assert(got.isEmpty) // the only gram is capped away on both sides
  }

  test("freqFamiliarity: exact integer partials, one division") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // freq: a=2 b=2 c=1, total=5
    val got = CorpusQc.freqFamiliarity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 3 && got(0).getDouble(2) == 6.0 / 15 && got(0).getDouble(3) == 2.0 / 5)
    assert(got(1).getLong(1) == 2 && got(1).getDouble(2) == 3.0 / 10 && got(1).getDouble(3) == 1.0 / 5)
  }

  test("pmiBigrams: exclusive pair outranks marginal-diluted pair; count floor binds") {
    // (zx,qv): exclusive marginals 5/5 -> PMI ln(5T/25).
    // (aa,bb): aa also pairs with cc, marginal 10 -> PMI ln(5T/50),
    // exactly ln(2) lower. (rare,once): n_pair=1 < 5 -> floored out.
    val docs = ((1L to 5L).map(i => (i, "zx qv")) ++
      (6L to 10L).map(i => (i, "aa bb")) ++
      (11L to 15L).map(i => (i, "aa cc")) ++
      Seq((16L, "rare once"))).toDF("doc_id", "text")
    val got = CorpusQc.pmiBigrams(docs, "text", minCount = 5, topN = 10).collect()
    val byPair = got.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(byPair(("zx", "qv")) == (5L, 5L, 5L,
      math.floor(math.log(5.0 * 16 / 25) * 1e4) / 1e4))
    assert(byPair(("aa", "bb")) == (5L, 10L, 5L,
      math.floor(math.log(5.0 * 16 / 50) * 1e4) / 1e4))
    assert(!byPair.keySet.exists(_._1 == "rare"))
    // top row is the max-PMI pair under the total order
    assert((got.head.getString(0), got.head.getString(1)) == ("zx", "qv"))
  }

  test("bigramEntropy: deterministic chain -> 0 bits, known split -> ln 2") {
    // "x y x y ..." — every token has exactly ONE continuation:
    // conditional entropy 0, unigram entropy ln 2 (x and y equal mass)
    val chain = Seq((1L, "x y x y x y x y x")).toDF("doc_id", "text")
    val c = CorpusQc.bigramEntropy(chain, "text").collect().head
    assert(c.getAs[Long]("n_bigrams") == 8L &&
      c.getAs[Long]("n_distinct_pairs") == 2L)
    assert(c.getAs[Double]("cond_entropy_nats") == 0.0)
    val q = math.floor(math.log(2.0) * 1e6) / 1e6
    assert(c.getAs[Double]("unigram_entropy_nats") == q)
    assert(c.getAs[Double]("predictability_ratio") == 0.0)
    // "p q"/"p r" split 50/50: H(W2|p) = ln 2; only one w1 -> unigram 0
    val split = Seq((1L, "p q"), (2L, "p q"), (3L, "p r"), (4L, "p r"))
      .toDF("doc_id", "text")
    val s = CorpusQc.bigramEntropy(split, "text").collect().head
    assert(s.getAs[Double]("cond_entropy_nats") == q)
    assert(s.getAs[Double]("unigram_entropy_nats") == 0.0)
    assert(s.isNullAt(s.fieldIndex("predictability_ratio")))
  }

  test("readability: hand-counted panels, degenerate docs NULL out") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),      // 6 words, 2 sentences
      (2L, "no terminator here"),              // unterminated = 1 run-on sentence
      (3L, "..."),                             // no sentences -> NULL score
      (4L, "Why wait? Try density now."))
      .toDF("doc_id", "text")
    val got = CorpusQc.readability(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Int]("n_words") == 6 && r1.getAs[Int]("n_sentences") == 2)
    // vowel groups: e,a,a,e,o,a = 6 (one per word here)
    assert(r1.getAs[Int]("n_syllables") == 6)
    assert(r1.getAs[Double]("flesch") ==
      206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6))
    assert(got(2L).getAs[Int]("n_sentences") == 1 &&
      !got(2L).isNullAt(got(2L).fieldIndex("flesch")))
    // "..." is one non-blank whitespace token but zero sentences
    assert(got(3L).getAs[Int]("n_words") == 1 &&
      got(3L).getAs[Int]("n_sentences") == 0 &&
      got(3L).isNullAt(got(3L).fieldIndex("flesch")))
    // y counts as a vowel: "why"=1, "wait"=1, "try"=1, "density"=3, "now"=1
    val r4 = got(4L)
    assert(r4.getAs[Int]("n_sentences") == 2 && r4.getAs[Int]("n_syllables") == 7)
  }

  test("zipfFit: exact 1/rank law recovers slope -1; ties rank deterministically") {
    // counts 60/k for ranks k=1..4 -> ln(cnt) = ln 60 - 1*ln(rank):
    // a perfect power law, so OLS slope is -1 up to grid noise
    val text = (Seq.fill(60)("aa") ++ Seq.fill(30)("bb") ++
      Seq.fill(20)("cc") ++ Seq.fill(15)("dd")).mkString(" ")
    val got = CorpusQc.zipfFit(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .collect().head
    assert(got.getAs[Long]("n_types") == 4L)
    assert(math.abs(got.getAs[Double]("zipf_slope") - (-1.0)) < 1e-3)
    assert(math.abs(got.getAs[Double]("intercept") - math.log(60.0)) < 1e-3)
  }

  test("bpeTopPairs: frequency-weighted char pairs, deterministic top-N boundary") {
    val docs = Seq((1L, "ab ab abc"), (2L, "xy")).toDF("doc_id", "text")
    // vocab: ab(wf 2) -> {ab:2}; abc(1) -> {ab:1, bc:1}; xy(1) -> {xy:1}
    val got = CorpusQc.bpeTopPairs(docs, "text", topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("ab", 3L), ("bc", 1L), ("xy", 1L))) // ties break on pair asc
    val top1 = CorpusQc.bpeTopPairs(docs, "text", topN = 1).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "ab")
  }

  test("chunkTokens: stride layout, trailing partial kept, no-new-token window skipped") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // n=10: starts 0,3,6
      (2L, "s1 s2"),                          // n < size: one whole chunk
      (3L, "u1 u2 u3 u4"))                    // start 3 would only re-cover the overlap tail
      .toDF("doc_id", "text")
    val got = CorpusQc.chunkTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_seq").collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getInt(2)).toSeq == Seq(0, 3, 6))
    assert(d1.map(_.getString(4)).toSeq ==
      Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.map(_.getInt(3)).toSeq == Seq(4, 4, 4))
    val d2 = got.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getString(4) == "s1 s2" && d2(0).getInt(3) == 2)
    val d3 = got.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3(0).getString(4) == "u1 u2 u3 u4")
    // every token of every doc appears in at least one chunk
    val covered = CorpusQc.chunkTokens(docs, "doc_id", "text", 4, 1)
      .select($"doc_id", explode(split($"chunk_text", " ")).as("tok"))
      .distinct().count()
    assert(covered == 16)
  }

  test("unigramSurprisal: add-one model replayed op-for-op; rare tokens raise the score") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = CorpusQc.unigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // corpus: a×3, b×1, c×1 -> N=5, V=3; p(a)=4/8, p(b)=p(c)=2/8
    def lq(cnt: Long) = math.floor(math.log((cnt + 1.0) / 8.0) * 1e4) / 1e4
    def term(tf: Long, l: Double) = math.floor(tf * l * 1e6) / 1e6
    val s1 = BigDecimal(term(2, lq(3))) + BigDecimal(term(1, lq(1)))
    val s2 = BigDecimal(term(1, lq(3))) + BigDecimal(term(1, lq(1)))
    assert(got(0)._2 == 3 && got(0)._3 == s1.toDouble
      && got(0)._4 == -s1.toDouble / 3)
    assert(got(1)._2 == 2 && got(1)._3 == s2.toDouble)
    // doc 2 is all-rare-heavy per token: higher nats/token than doc 1
    assert(got(1)._4 > got(0)._4)
  }

  test("bigramNovelty: hand-computed novel counts and MLE continuation shares") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: (a b)x2, (b a)
      (2L, "a b c"),     // (a b), (b c)
      (3L, "z z"),       // (z z)
      (4L, "solo"))      // one token -> no bigram row
      .toDF("doc_id", "text")
    val got = CorpusQc.bigramNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    // corpus: "a b"->3, "b a"->1, "b c"->1, "z z"->1; prefixes a->3, b->2, z->1
    assert(got(1L)._1 == 3 && got(1L)._2 == 1)  // "b a" is doc 1's alone
    assert(got(2L)._1 == 2 && got(2L)._2 == 1)  // "b c" novel
    assert(got(3L)._1 == 1 && got(3L)._2 == 1)  // "z z" novel
    // doc 1: (1.0 + 1.0 + 0.5) / 3; doc 2: (1.0 + 0.5) / 2; doc 3: 1/1
    assert(math.abs(got(1L)._3 - 2.5 / 3) < 1e-12)
    assert(got(2L)._3 == 0.75 && got(3L)._3 == 1.0)
  }

  test("bpeTrainMerges: greedy merges with lexicographic ties and leftmost non-overlap") {
    // vocab: the -> 3, then -> 1. Round 1: (t,h) and (h,e) both score
    // 4 -> tie goes to ("h","e"). Round 2: (t,he) 4. Round 3: (the,n) 1.
    val docs = Seq((1L, "the the the then")).toDF("doc_id", "text")
    val got = CorpusQc.bpeTrainMerges(docs, "text", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "h", "e", "he", 4L),
      (2, "t", "he", "the", 4L),
      (3, "the", "n", "then", 1L)))
    // leftmost non-overlap: "aaa" merges its FIRST (a,a); the second
    // round then merges (aa,a) — never an overlapping double-count
    val rep = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val got2 = CorpusQc.bpeTrainMerges(rep, "text", rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(got2.toSeq == Seq((1, "aa", 4L), (2, "aaa", 2L)))
    // encode applies the learned merges: every 'the' collapses to ONE
    // symbol and 'then' to one after round 3 — 4 tokens, 4 symbols
    val enc = CorpusQc.bpeEncode(docs, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq == Seq((1L, 4L, 4L)))
  }

  test("decontaminateMinhash: planted contamination found exactly, clean docs silent") {
    val leaked = (1 to 40).map(i => s"tok$i").mkString(" ")
    val clean = (100 to 140).map(i => s"zed$i").mkString(" ")
    val other = (200 to 240).map(i => s"oth$i").mkString(" ")
    val train = Seq((1L, leaked), (2L, clean)).toDF("doc_id", "text")
    val evalSet = Seq((10L, leaked), (11L, other)).toDF("doc_id", "text")
    val got = CorpusQc.decontaminateMinhash(train, evalSet, "doc_id", "text",
        n = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length == 1)
    val (tid, eid, j) = got.head
    assert(tid == 1L && eid == 10L && j == 1.0)
    // agreement with the exact sweep on the planted pair
    val exact = CorpusQc.contaminationPairs(train, evalSet, "doc_id", "text",
        n = 8, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 10L)))
  }

  test("charDiversity: integer-exact Simpson index, degenerate and mixed docs") {
    val docs = Seq(
      (1L, "aaaa"),   // one char: diversity 0, top share 1
      (2L, "abab"),   // two chars evenly: 1 - 8/16 = 0.5
      (3L, "abcd"),   // all distinct: 1 - 4/16 = 0.75
      (4L, ""),       // empty: dropped
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = CorpusQc.charDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((4L, 1L, 0.0, 1.0)))
    assert(got(2L) == ((4L, 2L, 0.5, 0.5)))
    assert(got(3L) == ((4L, 4L, 0.75, 0.25)))
    // counted chars == string length: no split artifact leaks in
    assert(got.values.forall(_._1 == 4L))
  }

  test("qualityEnsemble: per-group percentile calibration, ties share, singleton pins 0") {
    val docs = Seq(
      (1L, "s1", 1.0, 10L),
      (2L, "s1", 2.0, 40L),
      (3L, "s1", 2.0, 20L),
      (4L, "s1", 4.0, 30L),
      (5L, "solo", 9.9, 99L)) // single-row group -> 0.0, engine-pinned
      .toDF("doc_id", "source", "q", "nt")
    val got = CorpusQc.qualityEnsemble(docs, "doc_id", "source", Seq("q", "nt"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // q ranks in s1: 1,2,2,4 -> pct 0, 1/3, 1/3, 1 (ties share)
    assert(got(1L)._1 == 0.0 && got(4L)._1 == 1.0)
    assert(got(2L)._1 == got(3L)._1 && math.abs(got(2L)._1 - 1.0 / 3) < 1e-15)
    // nt ranks: 10,20,30,40 -> 0, 1, 2, 3 over 3
    assert(got(1L)._2 == 0.0 && got(2L)._2 == 1.0 &&
      math.abs(got(3L)._2 - 1.0 / 3) < 1e-15 && math.abs(got(4L)._2 - 2.0 / 3) < 1e-15)
    // ensemble = left-assoc mean of the calibrated ranks
    got.foreach { case (id, (p1, p2, e)) =>
      assert(e == (p1 + p2) / 2, s"doc $id") }
    assert(got(5L) == ((0.0, 0.0, 0.0)))
  }

  test("scriptProfile: explicit codepoint classes, residual, dominant precedence") {
    val docs = Seq(
      (1L, "Hello, World 42"),
      (2L, "你好世界"),      // CJK only
      (3L, "Привет"), // Cyrillic only
      (4L, "1234 ..."),                      // digits/punct: no letters
      (5L, "ab一二"),                // latin == cjk -> latin wins ties
      (6L, ""))
      .toDF("doc_id", "text")
    val got = CorpusQc.scriptProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def counts(id: Long) = {
      val r = got(id)
      (r.getAs[Int]("n_latin"), r.getAs[Int]("n_digit"), r.getAs[Int]("n_space"),
        r.getAs[Int]("n_punct"), r.getAs[Int]("n_cjk"), r.getAs[Int]("n_cyrillic"),
        r.getAs[Int]("n_other"), r.getAs[String]("dominant_script"))
    }
    assert(counts(1L) == ((10, 2, 2, 1, 0, 0, 0, "latin")))
    assert(counts(2L) == ((0, 0, 0, 0, 4, 0, 0, "cjk")))
    assert(counts(3L) == ((0, 0, 0, 0, 0, 6, 0, "cyrillic")))
    assert(counts(4L) == ((0, 4, 1, 3, 0, 0, 0, "none")))
    assert(counts(5L) == ((2, 0, 0, 0, 2, 0, 0, "latin")))
    assert(counts(6L) == ((0, 0, 0, 0, 0, 0, 0, "none")))
    // classes + residual tile the string exactly
    got.values.foreach { r =>
      assert(r.getAs[Int]("n_chars_calc") ==
        r.getAs[Int]("n_latin") + r.getAs[Int]("n_digit") + r.getAs[Int]("n_space")
          + r.getAs[Int]("n_punct") + r.getAs[Int]("n_cjk")
          + r.getAs[Int]("n_cyrillic") + r.getAs[Int]("n_other"))
    }
  }

  test("bm25TopK: idf/tf/length behavior, absent non-matches, replayed score") {
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spark alpha beta gamma"),
      (3L, "alpha beta"),           // no query term -> absent
      (4L, "join spark"))
      .toDF("doc_id", "text")
    val got = CorpusQc.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "join", "window"), topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 4L))
    assert(got(1L)._1 == 1 && got(2L)._1 == 1 && got(4L)._1 == 2)
    // replay doc 1's score with the operator's exact arithmetic:
    // N=4 docs, spark df=3, avgdl = 11/4
    val idfSpark = math.floor(math.log((4 - 3 + 0.5) / (3 + 0.5) + 1.0) * 1e4) / 1e4
    val avgdl = 11.0 / 4.0
    val ts1 = math.floor(idfSpark * (3.0 * 2.2) /
      (3.0 + 1.2 * (0.25 + 0.75 * (3.0 / avgdl))) * 1e6) / 1e6
    assert(got(1L)._2 == ts1)
    // two matched terms (one of them rare) outrank any single match
    assert(got(4L)._2 > got(1L)._2 && got(4L)._2 > got(2L)._2)
  }

  test("lengthHistogram: bit-length buckets with exact power-of-2 boundaries") {
    val docs = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"),
        (4L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val got = CorpusQc.lengthHistogram(docs, "doc_id", "text")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 1 token -> bucket 1 [1,1]; 2 and 3 -> bucket 2 [2,3]; 8 -> bucket 4 [8,15]
    assert(got == Map(
      1 -> ((1L, 1L, 1L, 1L)),
      2 -> ((2L, 3L, 2L, 5L)),
      4 -> ((8L, 15L, 1L, 8L))))
  }

  test("piiProfile: planted signals counted, clean docs silent, URL outside the gate") {
    val docs = Seq(
      (1L, "contact bob@example.com or alice.smith+x@test.org today"),
      (2L, "hosts 10.0.0.1 and 192.168.1.255 respond"),
      (3L, "card 12345678901234 on file"),
      (4L, "see https://example.com/a?b=1 and http://x.y/z"),
      (5L, "a perfectly clean sentence with nothing sensitive"))
      .toDF("doc_id", "text")
    val got = CorpusQc.piiProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ipv4"),
          r.getAs[Int]("n_digit_runs"), r.getAs[Int]("n_urls"),
          r.getAs[Boolean]("has_pii"))).toMap
    assert(got(1L) == ((2, 0, 0, 0, true)))
    assert(got(2L) == ((0, 2, 0, 0, true)))
    assert(got(3L) == ((0, 0, 1, 0, true)))
    assert(got(4L) == ((0, 0, 0, 2, false))) // URLs reported, not gated
    assert(got(5L) == ((0, 0, 0, 0, false)))
  }

  test("compressionRatio: repetition compresses far below diverse text; empty is NULL") {
    val rep = Seq.fill(200)("spam").mkString(" ")
    val div = (1 to 200).map(i => s"w${i * 7919}").mkString(" ")
    val df = Seq((1L, rep), (2L, div), (3L, "")).toDF("doc_id", "text")
    val got = CorpusQc.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val rRep = got(1L); val rDiv = got(2L)
    assert(rRep.getAs[Long]("n_bytes") == rep.getBytes("UTF-8").length.toLong)
    // the repeated token collapses to a tiny fraction; diverse tokens don't
    assert(rRep.getAs[Double]("compression_ratio") <
      rDiv.getAs[Double]("compression_ratio") / 2)
    assert(rDiv.getAs[Double]("compression_ratio") > 0.2)
    assert(rRep.getAs[Long]("n_compressed") > 0L)
    // empty doc: 0 bytes, NULL ratio — never a division error
    assert(got(3L).getAs[Long]("n_bytes") == 0L)
    assert(got(3L).isNullAt(got(3L).fieldIndex("compression_ratio")))
    // deterministic across partitionings (fixed JDK zlib, fixed level)
    val again = CorpusQc.compressionRatio(df.repartition(3), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_compressed")).toMap
    assert(again(1L) == rRep.getAs[Long]("n_compressed"))
  }

  test("heapsFit: cumulative curve conserves counts; repeats grow tokens but not types") {
    // 40 docs: half pure repetition of one shared word, half one
    // unique word each — vocab grows sublinearly in tokens
    val docs = (1L to 40L).map { i =>
      if (i % 2 == 0) (i, "common common common common")
      else (i, s"common uniq$i")
    }
    val got = CorpusQc.heapsFit(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("bucket").collect()
    val cumToks = got.map(_.getAs[Long]("cum_tokens"))
    val cumTypes = got.map(_.getAs[Long]("cum_types"))
    // cumulation really is the prefix sum of the per-bucket panel
    assert(cumToks.last == got.map(_.getAs[Long]("n_tokens")).sum)
    assert(cumTypes.last == got.map(_.getAs[Long]("n_new_types")).sum)
    assert(cumToks.zip(cumToks.tail).forall { case (a, b) => a <= b })
    // total types = 'common' + 20 uniq words; total tokens = 20*4+20*2
    assert(cumTypes.last == 21L)
    assert(cumToks.last == 120L)
    // vocabulary grows but sublinearly: 0 < beta < 1
    val beta = got.head.getAs[Double]("heaps_beta")
    assert(beta > 0.0 && beta < 1.0)
    // the fit columns broadcast identically onto every bucket row
    assert(got.forall(_.getAs[Double]("heaps_beta") == beta))
    // deterministic under repartition
    val again = CorpusQc.heapsFit(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text")
      .orderBy("bucket").collect().map(_.getAs[Long]("cum_types"))
    assert(again.toSeq == cumTypes.toSeq)
  }

  test("unigramViterbi: max-log-prob segmentation, score ties break on seg ASC") {
    val words = Seq(("abc", 1L)).toDF("word", "wf")
    // 'a bc' and 'ab c' both score -2.0; the seg-ASC tie-break picks
    // 'a bc' (leading-space form ' a bc' < ' ab c')
    val vocab = Seq("a", "b", "c", "ab", "bc").map((_, -1.0))
      .toDF("piece", "log_prob")
    val got = CorpusQc.unigramViterbi(words, vocab, maxPieceLen = 4)
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(got.toSeq == Seq(("abc", "a bc")))
    // a cheaper 3-piece path never beats a 2-piece path at equal logp,
    // but a HIGH-prob char route must beat a low-prob long piece
    val vocab2 = Seq(("a", -0.1), ("b", -0.1), ("c", -0.1), ("abc", -9.0))
      .toDF("piece", "log_prob")
    val got2 = CorpusQc.unigramViterbi(words, vocab2, 4)
      .collect().map(_.getString(2))
    assert(got2.toSeq == Seq("a b c"))
  }

  test("unigramTrain: hard-EM prunes to used pieces, keeps the char inventory") {
    val docs = Seq((1L, "abab abab abab cd")).toDF("doc_id", "text")
    val got = CorpusQc.unigramTrain(docs, "text")
      .orderBy("piece").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // Viterbi picks whole-word pieces ('abab' ln(3/33) beats 'ab'+'ab'
    // = 2·ln(6/33)); M-step keeps them plus the zero-usage char
    // inventory. Laplace totals: 4·1 + (3+1) + (1+1) = 10.
    def grid(x: Double) = math.floor(x * 1e6) / 1e6
    assert(got.toSeq == Seq(
      ("a", 0L, grid(math.log(0.1))),
      ("abab", 3L, grid(math.log(0.4))),
      ("b", 0L, grid(math.log(0.1))),
      ("c", 0L, grid(math.log(0.1))),
      ("cd", 1L, grid(math.log(0.2))),
      ("d", 0L, grid(math.log(0.1)))))
    // encode: every token segments to ONE piece -> 4 tokens, 4 symbols
    val enc = CorpusQc.unigramEncode(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq == Seq((1L, 4L, 4L)))
  }

  test("unigramViterbi: optimal vs brute-force enumeration on random vocabularies") {
    // the DP must pick EXACTLY the (max score, then lexicographically
    // smallest seg) segmentation a full enumeration picks — including
    // bit-level double ties, since both sides fold scores left to
    // right over the same gridded log-probs
    val rnd = new scala.util.Random(7)
    val words = (1 to 40)
      .map(_ => (1 to (1 + rnd.nextInt(6))).map(_ => "abc" (rnd.nextInt(3))).mkString)
      .distinct
    val subs = words.flatMap(w =>
      for { s <- 1 to w.length; l <- 1 to math.min(3, w.length - s + 1) }
        yield w.substring(s - 1, s - 1 + l)).distinct.sorted
    val vocab = subs.filter(p => p.length == 1 || rnd.nextBoolean())
      .map(p => (p, math.floor(math.log(0.05 + rnd.nextDouble()) * 1e6) / 1e6))
    val vmap = vocab.toMap
    def enum(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(3, w.length)).flatMap { k =>
        val p = w.substring(0, k)
        if (vmap.contains(p)) enum(w.substring(k)).map(p :: _) else Nil
      }
    val expected = words.map { w =>
      val cands = enum(w).map(ps =>
        (ps.foldLeft(0.0)((s, p) => s + vmap(p)), ps.mkString(" ")))
      // maxBy keeps the FIRST maximal element, so seg-ascending order
      // makes ties resolve to the smallest seg — the DP's total order
      w -> cands.sortBy(_._2).maxBy(_._1)._2
    }.toMap
    val got = CorpusQc.unigramViterbi(
        words.map((_, 1L)).toDF("word", "wf"),
        vocab.toDF("piece", "log_prob"), maxPieceLen = 3)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got.keySet == words.toSet)
    words.foreach(w => assert(got(w) == expected(w),
      s"word '$w': dp='${got(w)}' brute='${expected(w)}'"))
  }

  test("tokenizerCompare: per-tokenizer totals reconcile with the three encoders") {
    val docs = Seq((1L, "the the the then"), (2L, "aa bb aa"))
      .toDF("doc_id", "text")
    val got = CorpusQc.tokenizerCompare(docs, "doc_id", "text", bpeRounds = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == Set("bpe", "unigram", "wordpiece"))
    def totals(df: org.apache.spark.sql.DataFrame) = {
      val rs = df.collect()
      (rs.length.toLong, rs.map(_.getLong(1)).sum, rs.map(_.getLong(2)).sum)
    }
    val (bd, bt, bs) = totals(CorpusQc.bpeEncode(docs, "doc_id", "text", 3))
    val (ud, ut, us) = totals(CorpusQc.unigramEncode(docs, "doc_id", "text"))
    val (wd, wt, ws) = totals(CorpusQc.wordpieceEncode(docs, "doc_id", "text", 3))
    assert(got("bpe") == ((bd, bt, bs,
      math.floor(bs.toDouble / bt.toDouble * 1e6) / 1e6)))
    assert(got("unigram") == ((ud, ut, us,
      math.floor(us.toDouble / ut.toDouble * 1e6) / 1e6)))
    assert(got("wordpiece") == ((wd, wt, ws,
      math.floor(ws.toDouble / wt.toDouble * 1e6) / 1e6)))
    // all tokenizers compress this corpus below char-splitting: the
    // ratio is >= 1 piece per token and finite
    got.values.foreach { case (_, _, _, r) => assert(r >= 1.0 && r < 10.0) }
  }

  test("wordpieceTrainMerges: likelihood score prefers rare-symbol pairs over raw frequency") {
    // (a,b) occurs 4x but a and b are everywhere (12 weighted uses
    // each -> score 4/144); (x,y) occurs 2x over symbols that occur
    // nowhere else (score 2/4 = 0.5) -> WordPiece merges xy first,
    // while raw-frequency BPE merges ab first on the SAME corpus
    val docs = Seq((1L, ("ab " * 4) + ("a " * 8) + ("b " * 8) + ("xy " * 2)))
      .toDF("doc_id", "text")
    val wp = CorpusQc.wordpieceTrainMerges(docs, "text", rounds = 1).collect().head
    assert(wp.getAs[String]("merge_left") == "x" &&
      wp.getAs[String]("merge_right") == "y")
    assert(wp.getAs[Long]("n_pair") == 2L &&
      wp.getAs[Long]("n_left") == 2L && wp.getAs[Long]("n_right") == 2L)
    assert(wp.getAs[Double]("score") == 0.5)
    val bpe = CorpusQc.bpeTrainMerges(docs, "text", rounds = 1).collect().head
    assert(bpe.getAs[String]("merge_left") == "a" &&
      bpe.getAs[String]("merge_right") == "b")
  }

  test("wordpieceEncode: greedy longest match with role-keyed continuations") {
    // round 1 merges (a,b) (score tie with (c,a), pair-asc tie-break);
    // 'ab' is then ONE initial piece, and 'cab' is c + ##ab — the
    // interior 'ab' matches only because the merged 'cab'
    // symbolization donated the ## continuation role
    val docs = Seq((1L, "ab ab ab ab cab")).toDF("doc_id", "text")
    val got = CorpusQc.wordpieceEncode(docs, "doc_id", "text", rounds = 1)
      .collect().head
    assert(got.getAs[Long]("n_tokens") == 5L)
    assert(got.getAs[Long]("n_symbols") == 6L) // 4x'ab'=1 piece, 'cab'=2
    // enough rounds fuse a whole word: every token one piece
    val whole = Seq((1L, "abcd abcd")).toDF("doc_id", "text")
    val w = CorpusQc.wordpieceEncode(whole, "doc_id", "text", rounds = 3)
      .collect().head
    assert(w.getAs[Long]("n_tokens") == 2L && w.getAs[Long]("n_symbols") == 2L)
  }

  test("wordpieceEncode: greedy walk equals a brute-force reimplementation on random corpora") {
    // the distributed jump-table + fold must emit EXACTLY the piece
    // counts a sequential longest-match-first walk over the same
    // role-keyed vocabulary produces
    val rnd = new scala.util.Random(11)
    val words = (1 to 30)
      .map(_ => (1 to (1 + rnd.nextInt(6))).map(_ => "abc" (rnd.nextInt(3))).mkString)
    val text = words.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rounds = 3
    val got = CorpusQc.wordpieceEncode(docs, "doc_id", "text", rounds)
      .collect().head
    val merges = CorpusQc.wordpieceTrainMerges(docs, "text", rounds).collect()
      .sortBy(_.getAs[Int]("round"))
      .map(r => (r.getAs[String]("merge_left"), r.getAs[String]("merge_right")))
    // leftmost non-overlapping merge replay (the ' l  r ' replace rule)
    def symbolize(w: String): List[String] = {
      var sym = w.map(_.toString).toList
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
            out += l + r; i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.toList
      }
      sym
    }
    val keys = scala.collection.mutable.Set[(Boolean, String)]()
    words.distinct.foreach { w =>
      symbolize(w).zipWithIndex.foreach { case (p, i) =>
        keys += ((i == 0) -> p) }
    }
    val chars = words.flatMap(_.take(12).map(_.toString)).toSet
    chars.foreach { c => keys += (true -> c); keys += (false -> c) }
    def greedy(w0: String): Int = {
      val w = w0.take(12)
      var pos = 0; var cnt = 0
      while (pos < w.length) {
        var l = w.length - pos
        var found = 0
        while (l >= 1 && found == 0) {
          if (keys((pos == 0, w.substring(pos, pos + l)))) found = l else l -= 1
        }
        pos += found; cnt += 1
      }
      cnt
    }
    assert(got.getAs[Long]("n_tokens") == words.length.toLong)
    assert(got.getAs[Long]("n_symbols") == words.map(greedy).sum.toLong)
  }

  test("wordpieceEncode: '#'-bearing tokens never alias the continuation role") {
    // corpus "ab ab ab ##ab": likelihood scoring merges the RARE pair
    // (#,#) first (score 1/4 beats (a,b)'s 4/16 on the '#'<'a'
    // tie-break), so the trained pieces are initial {'a','##'} and
    // continuations {'a','b'}. Under role-keyed (is-initial, piece)
    // lookups, '##ab' encodes '##','a','b' = 3 and 'ab' encodes
    // 'a','b' = 2 -> 9 symbols total. A '##'-STRING-prefix vocab
    // would let the word-initial substring '##a' alias continuation
    // 'a' (stored as the string "##a") and jump 3 -> 8 symbols: the
    // exact collision this pins against.
    val docs = Seq((1L, "ab ab ab ##ab")).toDF("doc_id", "text")
    val wp = CorpusQc.wordpieceTrainMerges(docs, "text", rounds = 1).collect().head
    assert(wp.getAs[String]("merge_left") == "#" &&
      wp.getAs[String]("merge_right") == "#")
    val got = CorpusQc.wordpieceEncode(docs, "doc_id", "text", rounds = 1)
      .collect().head
    assert(got.getAs[Long]("n_tokens") == 4L)
    assert(got.getAs[Long]("n_symbols") == 9L)
  }

  test("bpe/wordpiece training stops at merge exhaustion instead of wiping the vocabulary") {
    // 'ab' fully fuses after one merge; asking for 4 rounds must
    // return ONE merge row and keep encoding under the learned merge
    // (a blind empty-winner cross join would wipe the vocab relation)
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val wp = CorpusQc.wordpieceTrainMerges(docs, "text", rounds = 4).collect()
    assert(wp.length == 1 && wp.head.getAs[String]("merged") == "ab")
    val wpe = CorpusQc.wordpieceEncode(docs, "doc_id", "text", rounds = 4)
      .collect().head
    assert(wpe.getAs[Long]("n_tokens") == 3L && wpe.getAs[Long]("n_symbols") == 3L)
    val bpe = CorpusQc.bpeTrainMerges(docs, "text", rounds = 4).collect()
    assert(bpe.length == 1 && bpe.head.getAs[String]("merged") == "ab")
    val enc = CorpusQc.bpeEncode(docs, "doc_id", "text", rounds = 4)
      .collect().head
    assert(enc.getAs[Long]("n_tokens") == 3L && enc.getAs[Long]("n_symbols") == 3L)
  }

  test("unigramTrain: words truncate to the lcap DP horizon, never drop") {
    // 16-char token truncates to 12 chars for segmentation; it still
    // trains and encodes (12 singles at worst, fewer once merged)
    val docs = Seq((1L, "abcdefghijklmnop zz")).toDF("doc_id", "text")
    val enc = CorpusQc.unigramEncode(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.length == 1 && enc.head._2 == 2L)
    assert(enc.head._3 >= 2L && enc.head._3 <= 13L)
  }
}
