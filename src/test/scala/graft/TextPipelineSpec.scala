package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.TextDedup

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox jumps over the lazy cat", "en"), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup of 1
    (4L, "completely different words entirely here now", "en"),
    (5L, "ab", "en")) // shorter than one shingle
    .toDF("doc_id", "text", "lang")

  test("exact dedup keeps smallest id and counts copies") {
    val got = TextDedup.exact(docs, "text", "doc_id")
      .select("doc_id", "n_copies").orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("shingles: distinct 3-gram windows; short docs yield one shingle") {
    val got = docs.select($"doc_id",
      TextOps.shingles(TextOps.tokens($"text"), 3).as("shs"))
      .orderBy("doc_id").collect()
    val s1 = got(0).getSeq[String](1)
    assert(s1.head == "the quick brown" && s1.size == 7)
    assert(got(4).getSeq[String](1) == Seq("ab"))
  }

  test("jaccard pairs via inverted index: dup=1.0, near-dup high, rest absent") {
    val got = TextDedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.4)
      .orderBy("doc_a", "doc_b").collect()
    val pairs = got.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(pairs((1L, 3L)) == 1.0)
    assert(pairs((1L, 2L)) > 0.4 && pairs((1L, 2L)) < 1.0)
    assert(pairs.contains((2L, 3L)) && !pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("dedupRateCurve: removal monotonically shrinks as the threshold rises") {
    val got = TextDedup.dedupRateCurve(docs, "doc_id", "text",
        thresholds = Seq(0.5, 0.9))
      .collect().map(r => r.getAs[Double]("threshold") -> r).toMap
    assert(got.size == 2)
    val (lo, hi) = (got(0.5), got(0.9))
    // every row sees the full 5-doc corpus
    assert(lo.getAs[Long]("n_docs") == 5L && hi.getAs[Long]("n_docs") == 5L)
    // tau=0.5 catches the exact dup (1,3) and the near-dup pairs;
    // losers are {2, 3} -> 2 removed; tau=0.9 keeps only jaccard-1.0
    // pairs -> loser {3} only
    assert(lo.getAs[Long]("n_docs_removed") == 2L)
    assert(hi.getAs[Long]("n_docs_removed") == 1L)
    assert(lo.getAs[Long]("n_pairs") > hi.getAs[Long]("n_pairs"))
    assert(lo.getAs[Double]("pct_removed") == 0.4)
    assert(hi.getAs[Double]("pct_removed") == 0.2)
  }

  test("prefixFilterPairs: exact pair set, equals uncapped jaccardPairs") {
    // Same output as the df-capped generator when the cap doesn't bind
    // — here on the fixture, and by construction the complete set.
    val pf = TextDedup.prefixFilterPairs(docs, "doc_id", "text", n = 3, threshold = 0.4)
      .orderBy("doc_a", "doc_b").collect()
    val jp = TextDedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.4,
      maxDf = Int.MaxValue).orderBy("doc_a", "doc_b").collect()
    assert(pf.map(_.toSeq).toSeq == jp.map(_.toSeq).toSeq && pf.nonEmpty)
    val pairs = pf.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(pairs((1L, 3L)) == 1.0 && pairs((1L, 2L)) > 0.4)
  }

  test("prefixFilterPairs: finds pairs the df-cap heuristic drops") {
    // 12 documents sharing one boilerplate shingle vocabulary: with a
    // tiny maxDf the capped generator goes blind (every shingle is
    // capped away); the prefix filter has no cap to bind and still
    // emits the complete exact pair set.
    val boiler = (1L to 12L).map(i => (i, "shared boilerplate header text repeated verbatim"))
      .toDF("doc_id", "text")
    val capped = TextDedup.jaccardPairs(boiler, "doc_id", "text", n = 3,
      threshold = 0.5, maxDf = 5)
    assert(capped.count() == 0L)
    val pf = TextDedup.prefixFilterPairs(boiler, "doc_id", "text", n = 3, threshold = 0.5)
    assert(pf.count() == 12L * 11 / 2)
    assert(pf.filter($"jaccard" =!= 1.0).count() == 0L)
  }

  test("lang_confusion: per-label shares sum to 1, match flag consistent") {
    val got = SparkEntry.queries("lang_confusion")(spark, sf).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val tot = rows.head.getLong(3)
      assert(rows.map(_.getLong(2)).sum == tot)   // counts partition the label
      assert(rows.forall(_.getLong(3) == tot))
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    }
    got.foreach(r =>
      assert(r.getBoolean(5) == (r.getString(0) == r.getString(1))))
  }

  test("containmentPairs: an embedded short doc scores 1.0 where jaccard fails") {
    val short = "one two three four five"
    val long = s"intro words before the body $short and then a very long tail " +
      "of completely unrelated trailing content keeps the union large here"
    val d = Seq((1L, short), (2L, long), (3L, "nothing shared at all whatsoever truly"))
      .toDF("doc_id", "text")
    val got = TextDedup.containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(5), r.getDouble(6)))).toMap
    // every shingle of doc 1 appears in doc 2 -> containment_a = 1.0
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L))._1 == 1.0 && got((1L, 2L))._2 < 0.5)
    // symmetric jaccard on the same pair is far below any dedup bar
    val j = TextDedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.0)
      .filter($"doc_a" === 1L && $"doc_b" === 2L)
      .select("jaccard").as[Double].head()
    assert(j < 0.25, s"jaccard $j unexpectedly high")
  }

  test("editDistancePairs verifies candidates by chars: edits pass, reorders fail") {
    val h1 = "alpha beta gamma delta epsilon zeta"
    val h2 = "omicron pi rho sigma tau upsilon"
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // 3-char edit
      (3L, s"$h1 $h2"),
      (4L, s"$h2 $h1")) // same halves swapped: shingle-similar, char-distant
      .toDF("doc_id", "text")
    val got = TextDedup.editDistancePairs(d, "doc_id", "text",
      candidateThreshold = 0.3, minSim = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got.keySet == Set((1L, 2L))) // the reorder pair is candidate but fails verify
    assert(got((1L, 2L)) == 3)
    // the reorder pair WAS a candidate (high shingle overlap)
    val cands = TextDedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((3L, 4L)))
  }

  test("jaccard df-cap: stop shingles leave postings and sizes symmetrically") {
    // "x common y" appears in every doc -> df 3; pair shingles df <= 2.
    val capped = Seq(
      (1L, "x common y alpha beta gamma"),
      (2L, "x common y alpha beta delta"),
      (3L, "x common y epsilon zeta eta"))
      .toDF("doc_id", "text")
    // cap binds at maxDf=2: the universal shingles drop, Jaccard is
    // exact over the remaining space and (1,2) still pairs via
    // "y alpha beta" etc.
    val got = TextDedup.jaccardPairs(capped, "doc_id", "text", n = 3,
      threshold = 0.1, maxDf = 2).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      // sizes count only kept shingles: 6 tokens -> 4 shingles total,
      // "x common y"(df 3) and "common y alpha"/"y epsilon..."-style
      // df<=2 survivors leave n_sh < 4
      assert(r.getAs[Long]("n_sh_a") < 4 && r.getAs[Long]("n_sh_b") < 4)
    }
    // stop-shingle log: exactly the df-3 shingle is reported
    val dropped = TextDedup.stopShingles(capped, "doc_id", "text", n = 3, maxDf = 2)
      .collect()
    assert(dropped.length == 1 && dropped.head.getAs[Long]("df") == 3L)
    // a non-binding cap reproduces the uncapped result exactly
    val loose = TextDedup.jaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.4, maxDf = 1000).orderBy("doc_a", "doc_b").collect()
    val tight = TextDedup.jaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.4, maxDf = 5).orderBy("doc_a", "doc_b").collect()
    assert(loose.map(_.toSeq).toSeq == tight.map(_.toSeq).toSeq)
  }

  test("minhash-lsh finds the same dup/near-dup candidates, verified") {
    val got = TextDedup.minhashLsh(docs, "doc_id", "text", threshold = 0.4)
      .orderBy("doc_a", "doc_b").collect()
    val m = got.map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(m((1L, 3L))._1 == 8L && m((1L, 3L))._2 == 1.0) // identical: all bands agree
    assert(m.contains((1L, 2L)))
  }

  test("simhash: identical docs at hamming 0; 60-bit planes honor the banding contract") {
    val got = TextDedup.simhashPairs(docs, "doc_id", "text", maxHamming = 60)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // exact duplicates agree on every band and sit at distance 0
    assert(got((1L, 3L)) == 0)
    // fingerprints are 60-bit md5 planes: no distance can exceed 60
    assert(got.values.forall(h => h >= 0 && h <= 60))
    // beyond the pigeonhole bound surfacing is band luck, documented:
    // (1,2) sits at Hamming 11 on md5 planes and collides in no
    // 15-bit band — candidates-only regime, deterministically absent
    assert(!got.contains((1L, 2L)))
    // the guarantee itself (<= 3 differing bits -> >= 1 identical
    // 15-bit band): synthetic fingerprints differing in exactly 3
    // bits spread over three bands MUST pair
    val close = Seq((10L, 5L), (11L, 5L ^ (1L << 2) ^ (1L << 17) ^ (1L << 32)))
      .toDF("doc_id", "h")
    val pairs = TextDedup.hammingPairs64(close, "doc_id", "h",
      maxHamming = 3, bandBits = 15).collect()
    assert(pairs.length == 1 && pairs.head.getInt(2) == 3)
  }

  test("language id: stopword scores + CJK gate") {
    val df = Seq(
      (1L, "the cat is in the hat and it is big"),
      (2L, "der hund und die katze und das haus ist ein traum"),
      (3L, "el perro y la casa de que un dia los gatos"),
      (4L, "中文文本 很短"),
      (5L, "le chat et les chiens des villes un peu du pain"))
      .toDF("doc_id", "text")
    val toks = TextOps.tokens($"text")
    val scores = TextOps.langScores(toks).map { case (c, n) => c.as(n) }
    val got = df.select($"doc_id" +: size(toks).as("n_tokens") +: scores :+
        TextOps.cjkCount($"text").as("cjk_n"): _*)
      .withColumn("p", TextOps.predictedLang(
        $"en_n", $"de_n", $"es_n", $"fr_n", $"cjk_n", $"n_tokens"))
      .orderBy("doc_id").select("p").as[String].collect()
    assert(got.toSeq == Seq("en", "de", "es", "zh", "fr"))
  }

  test("text stats: ratios and quality score on a crafted doc") {
    val df = Seq((1L, "Hello, world! the end.")).toDF("doc_id", "text")
    val toks = TextOps.tokens($"text")
    val r = df.select(
      length($"text").as("n_chars"),
      size(toks).as("n_tokens"),
      TextOps.punctCount($"text").as("punct"),
      TextOps.stopwordCountEn(toks).as("stop")).head()
    assert(r.getInt(0) == 22)
    assert(r.getInt(1) == 4)
    assert(r.getInt(2) == 3) // , ! .
    assert(r.getInt(3) == 1) // "the"
  }

  test("incremental dedup: exact corpus/batch dups and near-dups classified first-match") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "an entirely unrelated corpus document lives here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),  // exact corpus dup
      (101L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 10
      (102L, "novel content appears only in this new batch"), // genuinely new
      (103L, "novel content appears only in this new batch"), // in-batch exact dup of 102
      (104L, "nothing like anything else whatsoever at all")) // new, unique
      .toDF("doc_id", "text")
    val got = TextDedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(100L) == ((false, "EXACT_DUP_CORPUS", 10L)))
    assert(got(101L) == ((false, "NEAR_DUP_CORPUS", 10L)))
    assert(got(102L) == ((true, "KEPT", -1L)))
    assert(got(103L) == ((false, "EXACT_DUP_BATCH", 102L)))
    assert(got(104L) == ((true, "KEPT", -1L)))
    assert(got.size == 5)
  }

  test("indexed incremental dedup: equals the fresh derivation; refresh and asOf honored") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_idx_spec").toString
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "an entirely unrelated corpus document lives here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the quick brown fox jumps over the lazy cat"),
      (102L, "novel content appears only in this new batch"),
      (104L, "nothing like anything else whatsoever at all"))
      .toDF("doc_id", "text")
    def decisions(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val v0 = TextDedup.buildDedupIndex(corpus, "doc_id", "text", dir)
    val viaIndex = decisions(
      TextDedup.incrementalDedupIndexed(spark, dir, batch, "doc_id", "text"))
    val fresh = decisions(
      TextDedup.incrementalDedup(corpus, batch, "doc_id", "text"))
    assert(viaIndex == fresh)
    assert(viaIndex(102L) == ((true, "KEPT", -1L)))
    // REFRESH: commit a grown corpus (now containing 102's text); the
    // probe over the refreshed index must see it — and the asOf probe
    // over the ORIGINAL version must still report the old decision
    val grown = corpus.unionByName(
      Seq((12L, "novel content appears only in this new batch"))
        .toDF("doc_id", "text"))
    val v1 = TextDedup.buildDedupIndex(grown, "doc_id", "text", dir)
    assert(v1 == v0 + 1)
    val refreshed = decisions(
      TextDedup.incrementalDedupIndexed(spark, dir, batch, "doc_id", "text"))
    assert(refreshed(102L) == ((false, "EXACT_DUP_CORPUS", 12L)))
    assert(refreshed(104L) == ((true, "KEPT", -1L)))
    val pinned = decisions(TextDedup.incrementalDedupIndexed(
      spark, dir, batch, "doc_id", "text", asOf = Some(v0)))
    assert(pinned == viaIndex)
  }

  test("connected components: chains merge, separate components stay apart") {
    // 1-2-3 chained (1-2, 2-3), {10,11} pair, 20 isolated (no pairs)
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = TextDedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: a 12-node chain converges over multiple rounds") {
    // path graph 0-1-2-...-11: worst diameter per node count, needs
    // several propagation rounds; everything must label to 0
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = TextDedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 12 && got.forall(_._2 == 0L))
    // and an un-converged run must fail loudly, not return split clusters
    intercept[IllegalStateException] {
      TextDedup.connectedComponents(pairs, "doc_a", "doc_b", maxRounds = 1)
    }
  }

  test("doc quality gate: first-match reasons on crafted documents") {
    val df = Seq(
      (1L, "en", "too short"),
      (2L, "en", "a perfectly reasonable document with the usual words in it for sure"),
      (3L, "en", "!!! ??? ### $$$ %%% &&& *** ((( ))) @@@ ;;; ::: ,,, ... !!!"))
      .toDF("doc_id", "lang", "text")
    val q = SparkEntry.queries("doc_quality_gate")
    // drive the same expressions through a temp parquet lake
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    df.write.parquet(s"$dir/documents.parquet")
    val got = q(spark, dir).select("doc_id", "reason_code")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("TOO_SHORT"))
    assert(got(2L).isEmpty)
    assert(got(3L).contains("HIGH_PUNCT"))
  }

  test("text redact: emails and long digit runs masked, counts reconcile with markers") {
    val df = Seq(
      (1L, "contact bob.smith+x@example.org or call 5551234567 now"),
      (2L, "no pii here"),
      (3L, "mail user1234567@example.com today")) // digits INSIDE the email
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_docs2").toString
    df.write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_redact")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) == ((1, 1, "contact <EMAIL> or call <NUM> now")))
    assert(got(2L) == ((0, 0, "no pii here")))
    // a digit run swallowed by the email mask is NOT a phantom number:
    // n_long_numbers must equal the <NUM> markers actually emitted
    assert(got(3L) == ((1, 0, "mail <EMAIL> today")))
  }

  test("tf-idf top terms: rational idf ranks distinctive terms first") {
    val df = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "apple"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    df.write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_tfidf_topn")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("term_rank")) ->
        ((r.getAs[String]("token"), r.getAs[Double]("tfidf")))).toMap
    // banana: tf 2, df 1 -> 2*(3-1+0.5)/1.5 = 3.333333; apple: df 3 -> 0.5/3.5
    assert(got((1L, 1)) == (("banana", 3.333333)))
    assert(got((1L, 2)) == (("apple", 0.142857)))
    assert(got((2L, 1))._1 == "cherry")
    assert(got((3L, 1)) == (("apple", 0.142857)))
  }

  test("corpus keep: best-quality survivor per cluster, uniques pass, dups dropped") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about boats and rivers today"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_keep").toString
    d.write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_corpus_keep")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // identical pair (1,2): equal quality -> doc_id tie-break keeps 1;
    // near-dup pair (4,5): 5 has more tokens -> higher quality score,
    // so the LATER doc survives; 3 shares no shingle -> UNIQUE
    assert(got == Map(1L -> "BEST_OF_CLUSTER", 3L -> "UNIQUE", 5L -> "BEST_OF_CLUSTER"))
  }

  test("curation pipeline: staged first-match drops — exact dup, gate, near-dup") {
    val d = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog again and again"),
      // whitespace/case variant of 1 -> canonical EXACT_DUP
      (2L, "en", "  The   Quick  Brown fox jumps over the lazy dog again and again "),
      (3L, "en", "hi there"), // TOO_SHORT
      // near-dup of 1 (one token appended): best-of-cluster decides
      (4L, "en", "the quick brown fox jumps over the lazy dog again and again extra"),
      (5L, "en", "completely different content about boats and rivers today"))
      .toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    d.write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("corpus_curation_pipeline")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3), r.getBoolean(4))).toMap
    assert(got.size == 5) // EVERY input doc gets a row
    assert(got(2L) == (("EXACT_DUP", false)))
    assert(got(3L) == (("TOO_SHORT", false)))
    assert(got(5L) == ((null, true)))
    // the near-dup pair resolves to exactly one survivor (4 has more
    // tokens -> higher quality score -> it wins)
    assert(got(4L) == ((null, true)) && got(1L) == (("NEAR_DUP", false)))
  }

  test("curation pipeline: greedy token budget cuts the quality-ranked prefix") {
    // six 10001-token fillers (quality 1.0 each, lang xx dodges the
    // stopword gate): 4 x 10001 fit the 50000 budget, the 5th
    // breaches it, and the greedy prefix cut drops 5 AND 6
    val filler = (1 to 6).map { k =>
      (k.toLong, "xx", (0 until 10001).map(i => s"w${k}x$i").mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeb").toString
    filler.toDF("doc_id", "lang", "text").write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("corpus_curation_pipeline")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    assert((1L to 4L).forall(got(_) == null), got.toString)
    assert(got(5L) == "OVER_BUDGET" && got(6L) == "OVER_BUDGET")
  }

  test("cluster-size stats: the dup-mass panel over connected components") {
    import org.apache.spark.sql.functions._
    val clusters = TextDedup.connectedComponents(
      TextDedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.4),
      "doc_a", "doc_b")
    val sizes = clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    val stats = sizes.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .crossJoin(broadcast(nDocs))
      .select(col("cluster_size"), col("n_clusters"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_removable"),
        ((col("cluster_size") * col("n_clusters")).cast("double")
          / col("__n_docs").cast("double")).as("corpus_share"))
      .collect()
    // docs 1,2,3 form one >=0.4-Jaccard cluster of size 3; 4 and 5 are
    // singletons (not in the pair graph at all)
    assert(stats.length == 1)
    val r = stats(0)
    assert(r.getAs[Long]("cluster_size") == 3L && r.getAs[Long]("n_clusters") == 1L)
    assert(r.getAs[Long]("n_removable") == 2L)
    assert(r.getAs[Double]("corpus_share") == 3.0 / 5.0)
  }

  test("dedupRecallEval: minhash finds the exact pairs on this fixture; panel consistent") {
    val got = TextDedup.dedupRecallEval(docs, "doc_id", "text", threshold = 0.4)
      .collect().map(r => r.getAs[String]("method") ->
        (r.getAs[Long]("n_truth"), r.getAs[Long]("n_found"),
          r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))).toMap
    assert(got.keySet == Set("minhash_lsh", "simhash"))
    // truth = the exact >= 0.4 pairs: (1,2), (1,3), (2,3)
    assert(got.values.forall(_._1 == 3L))
    // panel consistency: hits bounded by both sides, recall = hit/truth
    assert(got.values.forall { case (t, f, h, r) =>
      h <= t && h <= f && r == h.toDouble / t })
    // near-identical docs: minhash banding must surface all of them
    assert(got("minhash_lsh")._4 == 1.0)
    // an exact duplicate has Hamming 0 — simhash can never miss it
    assert(got("simhash")._3 >= 1L)
    // deterministic across layouts (hashed tiers, seeded)
    val again = TextDedup.dedupRecallEval(docs.repartition(5), "doc_id", "text", 0.4)
      .collect().map(r => r.getAs[String]("method") -> r.getAs[Long]("n_hit")).toMap
    assert(again == got.view.mapValues(_._3).toMap)
  }

  test("fingerprints: deterministic, content-sensitive, within prime range") {
    val got = docs.select($"doc_id",
      TextOps.rollingFingerprint(TextOps.tokens($"text")).as("fp"),
      TextOps.minShingleFingerprint(TextOps.tokens($"text"), 3).as("fpm"))
      .orderBy("doc_id").collect()
    val fps = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fps(0)._2 == fps(2)._2 && fps(0)._3 == fps(2)._3) // dup docs agree
    assert(fps(0)._2 != fps(3)._2) // different docs differ
    assert(fps.forall(f => f._2 >= 0 && f._2 < 1000000007L))
  }
  test("removeDupSpans: exact-substring dedup keeps first occurrence, rebuilds docs") {
    def mk(pfx: String, a: Int, b: Int) = (a to b).map(i => s"$pfx$i").mkString(" ")
    val corpus = Seq(
      (1L, mk("t", 1, 12)),                              // 12 tokens, the original
      (2L, "x1 x2 " + mk("t", 1, 10) + " x3"),           // contains t1..t10 at pos 3
      (3L, "s1 s2 s3 s4 s5"),                            // < 10 tokens: no spans
      (4L, mk("r", 1, 10) + " " + mk("r", 1, 10)),       // within-doc repeat at pos 11
      (5L, mk("t", 1, 12)))                              // full copy of doc 1
      .toDF("doc_id", "text")
    val got = TextDedup.removeDupSpans(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) == (12, 12, mk("t", 1, 12)))          // keeper: untouched
    assert(got(2L) == (13, 3, "x1 x2 x3"))               // dup span excised, unique kept
    assert(got(3L) == (5, 5, "s1 s2 s3 s4 s5"))          // short doc passes through
    assert(got(4L) == (20, 10, mk("r", 1, 10)))          // second in-doc copy removed
    assert(got(5L) == (12, 0, ""))                       // fully duplicated -> empty
  }
  test("exactCanonical: reformattings collapse, raw-variant count reports the tier's work") {
    val corpus = Seq(
      (1L, "The Quick  Brown Fox"),
      (2L, "the quick brown fox"),          // case+spacing variant of 1
      (3L, "  the   QUICK brown fox  "),    // trim+collapse variant of 1
      (4L, "the quick brown fox"),          // raw-exact dup of 2
      (5L, "something else entirely"))
      .toDF("doc_id", "text")
    val got = TextDedup.exactCanonical(corpus, "text", "doc_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 2)
    // 4 docs, 3 distinct raw forms, one canonical group, keeper = min id
    assert(got("the quick brown fox") == (1L, 4L, 3L))
    assert(got("something else entirely") == (5L, 1L, 1L))
  }
}
