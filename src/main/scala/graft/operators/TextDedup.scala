package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.Kernels
import graft.functions.TextOps

/** Document deduplication at corpus scale.
  *
  * All four strategies share one scale rule: NEVER form the n² pair
  * space. Exact dedup is a single map-side-combined aggregate on a
  * content digest; near-dup candidates come from inverted-index /
  * band-bucket joins whose shuffle is proportional to the number of
  * colliding pairs, not documents².
  */
object TextDedup {

  /** Ordered candidate pairs (doc_a < doc_b) from a posting relation
    * (key columns + doc_id): group each key's postings into a sorted
    * list and explode its ordered pairs. One shuffle over the posting
    * relation — a self-join would shuffle it twice (once per side) and
    * hash-probe 8-byte keys to produce the same pairs. Singleton
    * postings are dropped before pair generation (they cannot pair).
    * The quadratic per-key work is the problem's output size; keys are
    * the discriminative shingle/band buckets, bounded by construction.
    */
  private def postingPairs(postings: DataFrame, keyCols: Seq[String]): DataFrame =
    postings.groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1), j ->
          |  transform(slice(ids, 1, j), x ->
          |    struct(x AS doc_a, element_at(ids, j + 1) AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))

  /** Exact dedup: one surviving row (smallest id) per distinct content
    * value, plus the duplicate count. Grouping key is the sha-256
    * digest so the shuffle sorts/compares 32-byte keys instead of
    * whole documents; `min_by` keeps it a partial-aggregable single
    * shuffle (no window sort, no skew-prone full-text partitioning).
    */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val cols = df.columns.toSeq
    val digest = TempCol("digest", df)
    val row = TempCol("row", df)
    df.groupBy(sha2(col(contentCol).cast("string"), 256).as(digest))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as(row),
        count(lit(1)).as("n_copies"))
      .select(cols.map(c => col(s"$row.$c")) :+ col("n_copies"): _*)
  }

  /** CANONICALIZED exact dedup — the tier between raw exact and
    * near-dup: documents are grouped on a normalized form (trimmed,
    * whitespace collapsed to single spaces, lowercased), so trivial
    * reformattings (case, indentation, line-wrap churn) collapse into
    * one group that byte-exact dedup treats as distinct. Per group:
    * the canonical text, the kept id (smallest), the copy count, and
    * how many RAW variants the group absorbed (1 = raw-exact would
    * have caught it too; >1 = this tier did real work).
    *
    * Same scale shape as [[exact]]: the grouping key is the sha-256
    * of the canonical form (32-byte shuffle keys, never full text);
    * the count-distinct over raw text is the standard two-phase
    * distinct aggregate.
    */
  def exactCanonical(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // explicit whitespace class, NOT \s: Java's \s matches vertical
    // tab \x0B while RE2's (DuckDB's) does not — a \x0B in a document
    // would canonicalize differently per engine and split the group.
    val norm = lower(regexp_replace(trim(col(textCol)), "[ \\t\\n\\r\\f\\x0B]+", " "))
    df.groupBy(sha2(norm, 256).as("__digest"))
      .agg(min(norm).as("canonical_text"),
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col(textCol)).as("n_raw_variants"))
      .select("canonical_text", "keep_id", "n_copies", "n_raw_variants")
  }

  /** Exact n-gram Jaccard similarity pairs above `threshold`, via a
    * shingle inverted index with a document-frequency cap: explode
    * distinct shingles, drop "stop shingles" appearing in more than
    * `maxDf` documents, self-join the survivors on the shingle
    * (shuffle ∝ posting-list pairs), count common shingles per pair,
    * then Jaccard from the per-doc KEPT-shingle counts. No crossJoin
    * anywhere.
    *
    * The df-cap is the scale bound: without it one stop shingle in
    * 1M documents yields ~5·10¹¹ join pairs; with it the self-join's
    * worst case is `maxDf²/2` pairs per shingle. The cap is applied
    * symmetrically — dropped shingles leave BOTH the posting relation
    * and the per-doc sizes — so the reported Jaccard is exact over
    * the stop-shingle-filtered shingle space (the standard stop-word
    * removal semantics, mirrored verbatim by the DuckDB oracle).
    * Dropped shingles are observable via [[stopShingles]] — persist
    * it next to the pairs output for the pipeline's run log.
    *
    * Singleton postings (df = 1) are also excluded from the join
    * input — they cannot pair — but still count toward union sizes,
    * keeping Jaccard exact.
    */
  /** Dedup-rate curve — how much of the corpus a near-dup pass would
    * remove AT EACH candidate Jaccard threshold: per threshold τ, the
    * surviving-pair count, the documents removed under the
    * keep-lowest-id rule (the loser is `greatest(doc_a, doc_b)` —
    * [[jaccardPairs]]' canonical orientation), and the removed share
    * of the corpus. THE panel a curation run reads before committing
    * to a threshold: too low eats paraphrases, too high keeps
    * boilerplate, and the knee is data-dependent.
    *
    * Scale shape: ONE [[jaccardPairs]] pass at the lowest threshold
    * (checkpointed slim), each pair fanned out to the ≤-thresholds it
    * clears via an array-literal filter+explode (no join against the
    * pair set), a ≤-thresholds aggregate, and 1-row corpus-size
    * panel. `thresholds` must all be ≥ the 0.5 base — pairs below the
    * base never materialize. The removed share is one raw IEEE
    * quotient per panel row.
    */
  def dedupRateCurve(df: DataFrame, idCol: String, textCol: String,
                     thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9),
                     n: Int = 3, maxDf: Int = 1000): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(t => t >= 0.5 && t <= 1.0),
      s"thresholds must sit in [0.5, 1]: $thresholds")
    val pairs = jaccardPairs(df, idCol, textCol, n, 0.5, maxDf)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .localCheckpoint(true)
    val hits = pairs
      .select(col("doc_a"), col("doc_b"),
        explode(filter(typedlit(thresholds.toArray),
          t => t <= col("jaccard"))).as("threshold"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(greatest(col("doc_a"), col("doc_b"))).as("n_docs_removed"))
    val spark = df.sparkSession
    import spark.implicits._
    val thrPanel = thresholds.toDF("threshold")
    val total = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .agg(countDistinct(col(idCol)).as("n_docs"))
    thrPanel.join(broadcast(hits), Seq("threshold"), "left")
      .crossJoin(broadcast(total))
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_removed"), lit(0L)).as("n_docs_removed"),
        col("n_docs"),
        (coalesce(col("n_docs_removed"), lit(0L)).cast("double") /
          col("n_docs").cast("double")).as("pct_removed"))
  }

  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDf: Int = 1000): DataFrame = {
    // Posting lists keyed by the shingle's 64-bit hash, not the string:
    // every downstream shuffle/probe compares 8-byte keys instead of
    // n-token text (xxhash64 collisions are ~|shingle vocabulary|²/2^65
    // — negligible against the exact-count semantics).
    // The kept-posting relation is consumed three times (per-doc sizes
    // + both self-join sides); materialize it ONCE (localCheckpoint —
    // the PrefixSum convention) so tokenization + shingle hashing +
    // the df join never re-run per consumer. In a persisted lake this
    // relation is the stored inverted-index intermediate.
    val kept = keptPostings(df, idCol, textCol, n, maxDf).localCheckpoint(true)
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // Pair generation via hash self-join: shingle posting lists are
    // short and numerous, where the join's codegen'd probe beats the
    // grouped-list explode (the opposite holds for band buckets — see
    // postingPairs in minhashLsh). `kept` comes out of the df join
    // already partitioned by sh, so the self-join adds no exchange.
    val joinable = kept.filter(col("df") >= 2)
    val pairs = joinable.as("a").join(joinable.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_sh_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_sh_b")), "doc_b")
      .withColumn("jaccard",
        col("n_common") / (col("n_sh_a") + col("n_sh_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_sh_a", "n_sh_b", "n_common", "jaccard")
  }

  /** Asymmetric CONTAINMENT near-dup pairs — the subset detector
    * symmetric Jaccard is structurally blind to: a short document
    * embedded whole in a long one scores
    * `|A∩B|/|A∪B| ≈ |A|/|B| → 0` on Jaccard however exact the
    * inclusion, but `|A∩B|/|A| = 1` on containment (quotes,
    * templates wrapping a body, page boilerplate around an article).
    * Emits both directions; a pair survives when EITHER direction
    * clears `threshold`.
    *
    * Same df-capped inverted-index machinery as [[jaccardPairs]]
    * (one materialized posting relation, hash self-join on 8-byte
    * shingle keys, never all-pairs); shingle sets are distinct per
    * doc, so containment is shared-distinct / own-distinct — one
    * division per direction, engine-replayable.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.8,
                       maxDf: Int = 1000): DataFrame = {
    val kept = keptPostings(df, idCol, textCol, n, maxDf).localCheckpoint(true)
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val joinable = kept.filter(col("df") >= 2)
    val pairs = joinable.as("a").join(joinable.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_sh_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_sh_b")), "doc_b")
      .withColumn("containment_a", col("n_common") / col("n_sh_a"))
      .withColumn("containment_b", col("n_common") / col("n_sh_b"))
      .filter(greatest(col("containment_a"), col("containment_b")) >= threshold)
      .select("doc_a", "doc_b", "n_sh_a", "n_sh_b", "n_common",
        "containment_a", "containment_b")
  }

  /** EXACT all-pairs Jaccard join via PREFIX FILTERING (AllPairs /
    * PPJoin family) — the candidate generator that needs NO df cap and
    * still never forms the n² pair space. [[jaccardPairs]] buys its
    * join bound by DROPPING shingles above `maxDf` (a recall
    * heuristic: two documents overlapping only on capped shingles are
    * invisible). Prefix filtering gets the bound from the threshold
    * itself and loses NOTHING: output is the complete exact-Jaccard
    * pair set at `threshold`.
    *
    * The filter: order every document's shingle set by one global
    * total order (document frequency ascending, hash tie-break —
    * rarest first), and keep only each document's first
    * `|S| - ceil(t·|S|) + 1` shingles as its PREFIX. If
    * `J(A,B) ≥ t` then `|A∩B| ≥ t·|A|` (and `≥ t·|B|`), so the
    * FIRST common shingle in global order sits within both prefixes —
    * a prefix×prefix join finds every qualifying pair. Common
    * shingles rank LAST in the global order, so the join fans out on
    * rare shingles only; the df cap's job happens for free, exactly.
    * Candidates also pass the length filter
    * (`min(|A|,|B|) ≥ t·max(|A|,|B|)`, necessary for `J ≥ t`) before
    * exact verification against the full posting lists. At 100 TB the
    * verify cost is `|candidates| × set size`, and candidates are
    * threshold-bounded, not vocabulary-shaped.
    *
    * Output schema/semantics: [[jaccardPairs]] with an UNCAPPED
    * vocabulary — `n_sh_*` count full distinct-shingle sets.
    */
  def prefixFilterPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Full posting relation, consumed four times (df counts, prefix
    // build, both verify probes). Materialized TWICE, each copy
    // PRE-PARTITIONED on its consumers' key (localCheckpoint
    // preserves the physical partitioning in the LogicalRDD): the
    // sh-keyed copy feeds the df count, the df join and the prefix
    // self-join exchange-free; the doc-keyed copy feeds sizes and
    // both verify probes (hash partitioning on doc_id is a valid
    // distribution for the (doc, sh) join keys too). Before r14 one
    // unpartitioned checkpoint was re-shuffled by every consumer —
    // 4-5 full exchanges of the posting relation, the measured
    // second-decade spill driver at the 100x replica (§6: postings
    // past page cache draining through one local disk per exchange).
    // The doc-keyed copy derives FROM the sh-keyed checkpoint, not
    // from the raw lineage: the shingle kernel (tokenize + n-gram +
    // md5 per posting) runs ONCE, and the second copy is a single
    // exchange of already-materialized 8-byte rows — strictly cheaper
    // than a recompute at every scale (r14 follow-up: the two-copy
    // form re-ran the kernel per copy, ~2x the dedup-family constant
    // at the sf0.1 gate for the same final layouts).
    val shRaw = hashedShingles(df, idCol, textCol, n)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
    val shS = shRaw.repartition(col("sh")).localCheckpoint(true)
    val shD = shS.repartition(col("doc_id")).localCheckpoint(true)
    val dfc = shS.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val sizes = shD.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // Global order (df asc, sh asc) is a TOTAL order: positions are
    // deterministic, so the prefix is well-defined per document.
    val ranked = shS.join(dfc, "sh")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .join(sizes, "doc_id")
    // df = 1 prefix shingles cannot collide — they leave the candidate
    // join entirely (usually most of the vocabulary) but MUST stay in
    // the rank window above: dropping them before ranking would shift
    // every position and redefine the prefix.
    val prefix = ranked
      .filter(col("pos") <= col("n_sh") - ceil(col("n_sh") * threshold) + 1)
      .filter(col("df") >= 2)
      .select(col("doc_id"), col("sh"), col("n_sh"))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n_sh"), col("b.n_sh")) >=
            greatest(col("a.n_sh"), col("b.n_sh")) * threshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Exact verification: intersect the candidates' FULL shingle sets.
    val common = cands
      .join(shD.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(shD.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_sh_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_sh_b")), "doc_b")
      .withColumn("jaccard",
        col("n_common") / (col("n_sh_a") + col("n_sh_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_sh_a", "n_sh_b", "n_common", "jaccard")
  }

  /** Edit-distance-verified near-dup pairs: inverted-index candidates
    * (the df-capped Jaccard join at a LOW recall threshold) verified
    * by exact character-level Levenshtein — the check a pipeline runs
    * when token-set Jaccard is too coarse (reorderings score high on
    * Jaccard; edit distance catches them). Never all-pairs: candidate
    * volume is the inverted index's, and the O(len²)-per-pair
    * Levenshtein runs only on candidates. `edit_sim` is
    * `1 − lev/max(len)` — one division, engine-replayable (Levenshtein
    * is an integer; both engines implement the standard
    * unit-cost recurrence).
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, candidateThreshold: Double = 0.3,
                        minSim: Double = 0.8, maxDf: Int = 1000): DataFrame = {
    val cand = jaccardPairs(df, idCol, textCol, n, candidateThreshold, maxDf)
      .select(col("doc_a"), col("doc_b"))
    val tx = df.select(col(idCol), col(textCol))
    cand
      .join(tx.select(col(idCol).as("doc_a"), col(textCol).as("__ta")), "doc_a")
      .join(tx.select(col(idCol).as("doc_b"), col(textCol).as("__tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("__ta"), col("__tb")).as("edit_dist"),
        length(col("__ta")).as("len_a"), length(col("__tb")).as("len_b"))
      .withColumn("edit_sim",
        lit(1.0) - col("edit_dist") / greatest(col("len_a"), col("len_b")).cast("double"))
      .filter(col("edit_sim") >= minSim)
  }

  /** EXACT-SUBSTRING deduplication: every duplicated n-token span —
    * across documents OR repeated within one — is removed from all
    * occurrences except the globally first (min (doc_id, position)),
    * and each document is rebuilt from its surviving tokens. This is
    * the span-level dedup step (licenses, templates, injected
    * boilerplate) that whole-document dedup cannot reach and
    * [[graft.operators.CorpusQc.dupSpanStats]] only measures.
    *
    * Output: (doc_id, n_tokens_orig, n_tokens_kept, text_clean).
    * Docs shorter than `n` tokens have no spans and pass unchanged;
    * a fully-duplicated doc collapses to an empty string, never a
    * NULL.
    *
    * Scale shape: the positioned span relation (doc, pos, 8-byte span
    * hash) is one explode; first-occurrence + occurrence-count is ONE
    * span-keyed partial-agg shuffle (min-struct + count — no window);
    * covered positions re-aggregate per doc; the rebuild is a
    * position-indexed lambda filter over the token array. Never
    * all-pairs, no driver loops, and the span hash keeps every
    * shuffle key at 8 bytes. Span hashes are distinct by POSITION
    * (not distinct-per-doc) — within-doc repeats are real duplicates
    * here.
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 10): DataFrame = {
    require(n >= 2, s"span length n=$n must be >= 2")
    // toks is consumed by the span pass and the rebuild — materialize
    // once (the keptPostings convention). It is also the attribute the
    // per-index lambdas below reference, which keeps CollapseProject
    // from inlining tokenization into the lambda body (SURVEY §4).
    val base = df.select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .localCheckpoint(true)
    val spans = base.filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(toks) - ${n - 1}), i ->
           |  struct(i AS pos, xxhash64(concat_ws(' ', slice(toks, i, $n))) AS sh))"""
          .stripMargin)).as("s"))
      .select(col("doc_id"), col("s.pos"), col("s.sh"))
    val firsts = spans.groupBy(col("sh")).agg(
      min(struct(col("doc_id"), col("pos"))).as("keeper"),
      count(lit(1)).as("cnt"))
    val removed = spans.join(firsts, "sh")
      .filter(col("cnt") >= 2 &&
        !(col("doc_id") === col("keeper.doc_id") && col("pos") === col("keeper.pos")))
    val covered = removed
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .groupBy(col("doc_id")).agg(collect_set(col("p")).as("cov"))
    base.join(covered, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), array().cast("array<int>")))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens_orig"),
        expr("size(filter(toks, (x, i) -> NOT array_contains(cov, i + 1)))")
          .as("n_tokens_kept"),
        expr("concat_ws(' ', filter(toks, (x, i) -> NOT array_contains(cov, i + 1)))")
          .as("text_clean"))
  }

  /** Posting relation (doc_id, sh, df) restricted to shingles with
    * document frequency ≤ maxDf.
    */
  private def keptPostings(df: DataFrame, idCol: String, textCol: String,
                           n: Int, maxDf: Int): DataFrame = {
    // Both the df-count aggregate and the df join consume the exploded
    // posting relation; materialize it once (localCheckpoint) so the
    // tokenize + shingle-hash + explode scan runs exactly once — this
    // relation is the inverted-index build's staged intermediate.
    val sh = hashedShingles(df, idCol, textCol, n)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .localCheckpoint(true)
    val dfCounts = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    sh.join(dfCounts, "sh")
  }

  /** (doc_id, shs: array<long>) via the native shingle-hash kernel —
    * one tight loop per row instead of the interpreted
    * sequence/slice/concat/distinct lambda chain (which was ~7 s of
    * an 11 s pipeline at sf0.1). Element-for-element identical to the
    * declarative `transform(TextOps.shingles(toks, n), xxhash64)`
    * (spec-pinned in KernelExprSpec).
    */
  private[graft] def hashedShingles(df: DataFrame, idCol: String, textCol: String,
                             n: Int, md5: Boolean = false): DataFrame =
    df.select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), Kernels.shingleHashes(col("toks"), n, md5).as("shs"))

  /** INCREMENTAL corpus dedup — the operational shape at 100 TB: a
    * new batch is deduped AGAINST the standing corpus (plus exactly
    * within itself) without ever re-pairing the corpus with itself.
    * Cost scales with |batch| × collision rate, not |corpus|².
    *
    * Per batch document, first-match decision:
    *  - `EXACT_DUP_CORPUS` — its sha-256 digest exists in the corpus
    *    (match_id = the smallest matching corpus id);
    *  - `EXACT_DUP_BATCH` — an earlier (smaller-id) batch document
    *    has the same digest (match_id = that representative — which
    *    may itself have been dropped for a corpus match; match_id
    *    names the digest group's representative, not a kept row);
    *  - `NEAR_DUP_CORPUS` — n-gram Jaccard ≥ `threshold` against some
    *    corpus document (match_id = the best match: max Jaccard, tie
    *    min id);
    *  - `KEPT` otherwise.
    *
    * Near-dup semantics mirror [[jaccardPairs]]: stop shingles (df >
    * maxDf IN THE CORPUS — the side whose frequencies are known and
    * stable) leave both sides' postings and sizes symmetrically, so
    * Jaccard is exact over the filtered shingle space. Within-batch
    * NEAR-dups are out of scope here (that is [[jaccardPairs]] +
    * clusters over the batch); exact within-batch dups are caught.
    *
    * Scale shape: one digest join (co-keyed), one corpus-postings df
    * pass, one batch⋈corpus shingle join (shuffle ∝ common-shingle
    * collisions), window over per-batch-doc candidates only.
    */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.5,
                       maxDf: Int = 1000): DataFrame = {
    val (corpDig, stop, cKept, cSizes) =
      corpusIndexRelations(corpus, idCol, textCol, n, maxDf)
    dedupAgainstIndex(corpDig, stop, cKept, cSizes, batch, idCol, textCol,
      n, threshold)
  }

  /** The four corpus-side relations every incremental-dedup probe
    * needs — derived fresh by [[incrementalDedup]], PERSISTED by
    * [[buildDedupIndex]] so the 100-TB corpus is scanned once per
    * refresh instead of once per batch.
    */
  private def corpusIndexRelations(corpus: DataFrame, idCol: String,
                                   textCol: String, n: Int, maxDf: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val corpDig = corpus
      .groupBy(sha2(col(textCol).cast("string"), 256).as("digest"))
      .agg(min(col(idCol)).as("corp_match"))
    val cSh = hashedShingles(corpus, idCol, textCol, n)
      .select(col("doc_id").as("c_id"), explode(col("shs")).as("sh"))
    val stop = cSh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("sh"))
    val cKept = cSh.join(stop, Seq("sh"), "left_anti")
    val cSizes = cKept.groupBy(col("c_id")).agg(count(lit(1)).as("n_c"))
    (corpDig, stop, cKept, cSizes)
  }

  /** The shared decision tail of [[incrementalDedup]] and
    * [[incrementalDedupIndexed]] — ONE implementation, so the stored
    * index provably carries the same decision surface as the fresh
    * derivation (the spec pins equality, this makes it structural).
    */
  private def dedupAgainstIndex(corpDig: DataFrame, stop: DataFrame,
                                cKept: DataFrame, cSizes: DataFrame,
                                batch: DataFrame, idCol: String,
                                textCol: String, n: Int,
                                threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digest = (c: Column) => sha2(c.cast("string"), 256)
    val firstW = Window.partitionBy(col("digest"))
    val b2 = batch.select(col(idCol).as("doc_id"), digest(col(textCol)).as("digest"))
      .withColumn("batch_first", min(col("doc_id")).over(firstW))
    val bSh = hashedShingles(batch, idCol, textCol, n)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
    val bKept = bSh.join(stop, Seq("sh"), "left_anti")
    val bSizes = bKept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_b"))
    val common = bKept.join(cKept, "sh")
      .groupBy(col("doc_id"), col("c_id")).agg(count(lit(1)).as("n_common"))
    val near = common.join(bSizes, "doc_id").join(cSizes, "c_id")
      .withColumn("jaccard",
        col("n_common") / (col("n_b") + col("n_c") - col("n_common")))
      .filter(col("jaccard") >= threshold)
    val bestW = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("c_id"))
    val best = near.withColumn("__graft_r", row_number().over(bestW))
      .filter(col("__graft_r") === 1)
      .select(col("doc_id"), col("c_id").as("near_match"))
    // best is ≤ 1 row per near-dup batch doc (window-rank filtered) —
    // a bounded build side whose size the optimizer can't see past
    // the window; steer to shuffled-hash so the plan never degrades
    // to a sort-merge (the Cdc.snapshotDiff steering)
    b2.join(corpDig, Seq("digest"), "left")
      .join(best.hint("shuffle_hash"), Seq("doc_id"), "left")
      .withColumn("reason",
        when(col("corp_match").isNotNull, "EXACT_DUP_CORPUS")
          .when(col("doc_id") =!= col("batch_first"), "EXACT_DUP_BATCH")
          .when(col("near_match").isNotNull, "NEAR_DUP_CORPUS")
          .otherwise("KEPT"))
      .withColumn("match_id",
        when(col("reason") === "EXACT_DUP_CORPUS", col("corp_match"))
          .when(col("reason") === "EXACT_DUP_BATCH", col("batch_first"))
          .when(col("reason") === "NEAR_DUP_CORPUS", col("near_match")))
      .withColumn("keep", col("reason") === "KEPT")
      .select(col("doc_id"), col("keep"), col("reason"), col("match_id"))
  }

  /** BUILD the persisted corpus dedup index — the operational shape
    * at 100 TB, where the standing corpus is ~1000× every batch:
    * [[incrementalDedup]] re-digests and re-shingles the corpus on
    * EVERY batch, so the per-batch cost is corpus-sized; this commits
    * the four corpus-side relations once per corpus refresh as
    * versioned tables (the A18 machinery — atomic manifest publish,
    * time travel, history) under `dir`:
    *
    *  - `digests`  (digest, corp_match) — the exact-dup probe,
    *  - `stops`    (sh) — df > `maxDf` shingles (the batch side must
    *    drop them symmetrically for exact Jaccard),
    *  - `postings` (sh, c_id) — the df-capped inverted index,
    *  - `sizes`    (c_id, n_c) — per-doc kept-shingle counts,
    *  - `manifest` (digests_v, stops_v, postings_v, sizes_v, n,
    *    max_df) — committed LAST, so the refresh flips atomically:
    *    a build that dies after some table commits leaves the
    *    manifest untouched and probes keep reading the previous
    *    CONSISTENT version set (the data tables' own version counters
    *    may drift apart after such a failure — the manifest, not
    *    version-number equality, is the lockstep).
    *
    * The manifest also pins the SHINGLE PARAMETERS (`n`, `maxDf`):
    * a probe must shingle its batch exactly the way the index was
    * built or near-dup counts are silently zero, so the probe reads
    * `n` from the manifest instead of trusting a caller. Returns the
    * manifest version — the `asOf` handle for time travel across
    * refreshes.
    */
  def buildDedupIndex(corpus: DataFrame, idCol: String, textCol: String,
                      dir: String, n: Int = 3, maxDf: Int = 1000): Long = {
    import graft.sources.VersionedTable
    val spark = corpus.sparkSession
    val (corpDig, stop, cKept, cSizes) =
      corpusIndexRelations(corpus, idCol, textCol, n, maxDf)
    val dv = VersionedTable.commit(corpDig, s"$dir/digests", overwrite = true)
    val sv = VersionedTable.commit(stop, s"$dir/stops", overwrite = true)
    val zv = VersionedTable.commit(cSizes, s"$dir/sizes", overwrite = true)
    val pv = VersionedTable.commit(cKept, s"$dir/postings", overwrite = true)
    import spark.implicits._
    val manifest = Seq((dv, sv, pv, zv, n, maxDf))
      .toDF("digests_v", "stops_v", "postings_v", "sizes_v", "n", "max_df")
    VersionedTable.commit(manifest, s"$dir/manifest", overwrite = true)
  }

  /** Incremental dedup of a batch AGAINST THE STORED INDEX — the
    * probe side of [[buildDedupIndex]]: identical decision surface to
    * [[incrementalDedup]] (same shared tail, spec-pinned equal), but
    * the corpus is never rescanned — the batch joins the persisted
    * digest/stop/posting/size tables, so per-batch cost is
    * |batch| × collision rate regardless of corpus size. The manifest
    * supplies both the four tables' pinned versions (a half-finished
    * refresh is never observable) and the shingle width `n` the index
    * was built with. `asOf` is a MANIFEST version (the value
    * [[buildDedupIndex]] returned) — time travel across refreshes.
    */
  def incrementalDedupIndexed(spark: org.apache.spark.sql.SparkSession,
                              dir: String, batch: DataFrame,
                              idCol: String, textCol: String,
                              threshold: Double = 0.5,
                              asOf: Option[Long] = None): DataFrame = {
    import graft.sources.VersionedTable
    val m = VersionedTable.read(spark, s"$dir/manifest", asOf).head()
    def tbl(name: String, v: Long) =
      VersionedTable.read(spark, s"$dir/$name", Some(v))
    dedupAgainstIndex(
      tbl("digests", m.getAs[Long]("digests_v")),
      tbl("stops", m.getAs[Long]("stops_v")),
      tbl("postings", m.getAs[Long]("postings_v")),
      tbl("sizes", m.getAs[Long]("sizes_v")),
      batch, idCol, textCol, m.getAs[Int]("n"), threshold)
  }

  /** Connected components over a near-dup pair set — the step every
    * dedup pipeline needs AFTER pair generation: transitively-linked
    * documents form one duplicate cluster, and the survivor policy
    * (keep min id) applies per cluster, not per pair.
    *
    * Pregel-style iterative min-label propagation: every node starts
    * labeled with its own id; each round joins labels across edges
    * and keeps the minimum; stops when a round changes nothing. The
    * driver only controls the loop (one scalar changed-count per
    * round) — the data never leaves the cluster. O(component
    * diameter) rounds, each one join + one partial-aggregable
    * shuffle on the node id; near-dup components are shallow (dup
    * groups link densely), so rounds stay single-digit in practice.
    * Each round's result is localCheckpoint-ed: lineage would
    * otherwise double per round and recompute the whole history at
    * every action.
    *
    * Per-round cost is trimmed two ways, both exact: duplicate edges
    * are NOT distinct-ed away (min is idempotent — a duplicate edge
    * changes nothing but a distinct costs a full shuffle of the pair
    * set), and change detection carries the previous label THROUGH
    * the min-aggregate (labels ride the union tagged as their own
    * prior, so "changed" is a filter-count on the checkpointed round
    * output — no per-round join against the previous state).
    *
    * Output: (doc_id, cluster_id) for every document appearing in a
    * pair, cluster_id = the component's minimum doc id.
    *
    * Throws IllegalStateException if the fixpoint is not reached
    * within `maxRounds` (a component with diameter > maxRounds —
    * pathological for near-dup graphs, whose components are dense):
    * silently returning half-propagated labels would split one
    * duplicate cluster into several and KEEP duplicates. Raise
    * `maxRounds` (rounds are O(diameter), each one join + shuffle)
    * if a lake legitimately chains that deep.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 64): DataFrame = {
    val fwd = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id")).localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val viaEdges = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id")), "dst")
        .select(col("src").as("doc_id"), col("cluster_id"),
          lit(Long.MaxValue).as("__graft_prev"))
      // each node's own row carries its prior label; after the min-agg
      // the round's delta is visible IN the output, no join needed
      val step = viaEdges
        .unionAll(labels.select(col("doc_id"), col("cluster_id"),
          col("cluster_id").as("__graft_prev")))
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"),
          min(col("__graft_prev")).as("__graft_prev"))
        .localCheckpoint(true)
      changed = step.filter(col("cluster_id") =!= col("__graft_prev")).count()
      labels = step.select(col("doc_id"), col("cluster_id"))
      round += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          s"($changed labels still changing) — a component deeper than " +
          "maxRounds; raise maxRounds")
    labels
  }

  /** The shingles [[jaccardPairs]] dropped under its df-cap, with
    * their document frequencies — the "logged drop" for the run log.
    * Empty whenever the cap did not bind.
    */
  def stopShingles(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, maxDf: Int = 1000): DataFrame =
    hashedShingles(df, idCol, textCol, n)
      .select(explode(col("shs")).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)

  private val MinhashPrime = 1000000007L

  /** One base hash per shingle, reduced mod a 31-bit prime so the
    * per-slot affine re-hashes below stay overflow-free in 64 bits.
    * Materialize this as its own column: the signature references it
    * `numHashes` times, which stops CollapseProject from inlining the
    * (expensive) shingle construction into a per-slot lambda — inlined,
    * the shingle array would be rebuilt once PER SLOT per row, a
    * measured ~30x slowdown.
    */
  def shingleHashes(shs: Column): Column =
    transform(shs, s => pmod(xxhash64(s), lit(MinhashPrime)))

  /** MinHash signature from the base hashes: slot i is the minimum of
    * the affine family (a_i·h + b_i) mod p — one string hash per
    * shingle TOTAL (not per slot), then cheap integer arithmetic per
    * slot. Coefficients derive from a fixed seed: deterministic across
    * runs, executors and clusters. Built as a Scala-side array of
    * per-slot expressions (not a Catalyst lambda over the slot index)
    * so the base-hash column is a multiply-referenced attribute.
    */
  def minhashSignature(hashes: Column, numHashes: Int, seed: Long = 42L): Column = {
    val rnd = new java.util.Random(seed)
    def coef(): Long = 1L + rnd.nextInt(Int.MaxValue - 1)
    array((0 until numHashes).map { _ =>
      val (a, b) = (coef(), coef())
      array_min(transform(hashes, h => pmod(h * a + b, lit(MinhashPrime))))
    }: _*)
  }

  /** Engine-replayable band bucket for a minhash signature column:
    * md5Long60 of the band's `rows` slot values joined on '|' — the
    * murmur3 `hash(slice(sig, …))` bucket of the pre-r14 tier was the
    * one non-replayable step left once signatures moved to
    * md5-register base hashes; with this bucket the ENTIRE banded
    * relation is a SQL relation DuckDB recomputes (§5.1 conversion,
    * the D75 hllOverlapReplayable recipe).
    */
  private[operators] def md5BandStructs(bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band_id"),
        Sampling.md5Long60((0 until rows).map(i =>
          col("sig").getItem(b * rows + i))).as("bucket"))): _*)

  /** MinHash-LSH near-dup candidates: band the signature, bucket-join
    * on (band, bucket) — the only pairs ever materialized are those
    * agreeing on at least one full band — then verify each candidate
    * with the exact shingle-set Jaccard (array intersect/union on the
    * already-joined pair, no extra shuffle fan-out).
    *
    * Hashing is md5-register end to end (shingle base hashes
    * md5Long60 → affine slot family → md5Long60 band buckets), so the
    * signature AND banding relations replay as SQL in any engine —
    * the oracle recomputes them verbatim (one md5 per shingle TOTAL;
    * the affine slot family stays cheap integer arithmetic).
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    // The shingle set is built ONCE, as 60-bit md5 hashes: the
    // signature kernel consumes the hashed array directly, the verify
    // joins shuffle 8-byte elements instead of n-token strings, and
    // set intersection compares longs.
    // docs is consumed three times (banding + both verify probes) —
    // deliberately NOT checkpointed: materializing corpus-wide
    // shingle ARRAYS is the big-object memory shape at scale, the r14
    // 100x sweep measured recompute-avoidance neutral here (banded
    // pair volume binds, not signature compute), and the extra
    // checkpoint job showed at the sf0.1 gate. Measured, not guessed.
    val docs = hashedShingles(df, idCol, textCol, n, md5 = true)
      .withColumn("sig", Kernels.minhashSig(col("shs"), numHashes))
    // Band structs via a Scala-side loop: `sig` is referenced `bands`
    // times, keeping it a materialized attribute (see shingleHashes).
    val banded = docs.select(col("doc_id"), explode(md5BandStructs(bands, rows)).as("bb"))
      .select(col("doc_id"), col("bb.band_id"), col("bb.bucket"))
    val cands = postingPairs(banded, Seq("band_id", "bucket"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("shs_a"), col("shs_b"))) /
          size(array_union(col("shs_a"), col("shs_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_bands", "jaccard")
  }

  /** Recall panel of the approximate near-dup tiers against the EXACT
    * Jaccard pair truth — the ANN recall-panel discipline applied to
    * text dedup: per method (minhash_lsh / simhash), how many of the
    * exact-threshold pairs the approximate tier surfaced, and the
    * surplus it emits beyond them. Maintained next to the tiers so a
    * band/width parameter change shows its recall cost immediately —
    * and the simhash row honestly measures how far Hamming proximity
    * diverges from set-Jaccard on this corpus (a different metric, so
    * its "recall" is an ALIGNMENT number, not an error).
    *
    * Truth = [[prefixFilterPairs]] (the no-recall-loss exact tier);
    * both evaluated sides and the truth read one checkpointed source
    * projection. Panel math joins pair relations on (doc_a, doc_b) —
    * pair-sized, nothing corpus-shaped at the driver.
    */
  def dedupRecallEval(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.5): DataFrame = {
    val src = df.select(col(idCol), col(textCol)).localCheckpoint(true)
    // truth + the two method-found relations are independent chains
    // over the shared src checkpoint, each with eager internal
    // materializations (pair checkpoint + count gate) — overlap their
    // construction (Par.seq, guide §2.6); each is a pure deterministic
    // function of src, so the panel is bit-identical to the
    // sequential build.
    def foundOf(found: DataFrame): (DataFrame, Long) = {
      val f = found.select(col("doc_a"), col("doc_b")).distinct()
        .localCheckpoint(true)
      (f, f.count())
    }
    val built = Par.seq[AnyRef](Seq(
      () => prefixFilterPairs(src, idCol, textCol, threshold = threshold)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint(true),
      () => foundOf(minhashLsh(src, idCol, textCol, threshold = threshold)),
      () => foundOf(simhashPairs(src, idCol, textCol))))
    val truth = built(0).asInstanceOf[DataFrame]
    def row(method: String, built: (DataFrame, Long)): DataFrame = {
      val (f, nFound) = built
      // count-gated broadcast (shared Prejoin.broadcastIfSmall): the
      // found-pair relation is checkpointed (stats unknown to the
      // planner), so without the gate this left join plans a
      // SortMergeJoin even when f is panel-sized; at near-dup-mass
      // scale the gate falls back to the shuffle join
      val hits = truth.join(
          Prejoin.broadcastIfSmall(f.withColumn("__hit", lit(1L)), nFound),
          Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_truth"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      hits.crossJoin(broadcast(f.agg(count(lit(1)).as("n_found"))))
        .select(lit(method).as("method"), col("n_truth"), col("n_found"),
          col("n_hit"),
          (col("n_hit").cast("double") / col("n_truth").cast("double"))
            .as("recall"))
    }
    row("minhash_lsh", built(1).asInstanceOf[(DataFrame, Long)])
      .unionByName(row("simhash", built(2).asInstanceOf[(DataFrame, Long)]))
  }

  /** 64-bit SimHash from a pre-hashed token column (one xxhash64 per
    * token TOTAL): per-bit majority vote, assembled with bitwise OR
    * (no overflow under ANSI arithmetic). The 64 bit-votes are
    * Scala-side expressions over the shared hash column — a Catalyst
    * lambda over the bit index would get the token hashing inlined
    * and re-evaluated once per bit (measured ~15x slowdown).
    */
  def simhash64(hashesCol: String): Column =
    (0 until 64).map { j =>
      val vote = aggregate(col(hashesCol), lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** SimHash near-dup candidates: split the 60-bit md5-register
    * fingerprint into four 15-bit bands (pigeonhole: any pair within
    * Hamming distance 3 of each other agrees on at least one band),
    * bucket-join on the band value, then filter by exact Hamming
    * distance. The md5 planes make the fingerprint a SQL relation
    * (60 per-bit majority votes over `md5Long60(token)` — the oracle
    * recomputes fingerprint, bands and distances verbatim).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 8): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("simhash", Kernels.simhash64(col("toks"), md5 = true))
      .select("doc_id", "simhash")
    hammingPairs64(docs, "doc_id", "simhash", maxHamming, bandBits = 15)
  }

  /** Banded near-pair generation over ANY 64-bit hash column
    * (pigeonhole: ≤ maxHamming ≤ 15 differing bits ⇒ at least one of
    * the four 16-bit bands is identical) — shared by the text SimHash
    * tier and the image average-hash tier. Candidates come only from
    * band-bucket collisions; the exact hamming distance verifies each.
    */
  def hammingPairs64(hashes: DataFrame, idCol: String, hashCol: String,
                     maxHamming: Int, bandBits: Int = 16): DataFrame = {
    // recall is GUARANTEED only for maxHamming <= 15 (pigeonhole over
    // four bands); larger thresholds still work but return banded
    // candidates only — callers inspecting the full distance spectrum
    // (diagnostics, specs) accept that deliberately
    require(maxHamming >= 0, s"negative hamming threshold: $maxHamming")
    // both join sides band off this relation — the checkpoint (doc-
    // count rows of 16 bytes) computes the upstream fingerprint (60
    // md5-derived per-token votes per doc for simhash) once, not once
    // per join side
    val base = hashes.select(col(idCol).as("doc_id"), col(hashCol).as("h64"))
      .localCheckpoint(true)
    val bandMask = (1L << bandBits) - 1
    val bandStructs = array((0 until 4).map(b =>
      struct(lit(b).as("band_id"),
        shiftright(col("h64"), b * bandBits).bitwiseAND(lit(bandMask)).as("bucket"))): _*)
    val banded = base.select(col("doc_id"), col("h64"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("h64"), col("bb.band_id"), col("bb.bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.h64").bitwiseXOR(col("b.h64"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
