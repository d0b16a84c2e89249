package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perf-harness main: derive an N× scaled replica of a driver testdata
  * directory for THROUGHPUT-SLOPE measurement (sf0.1 → sf1.0 without a
  * driver-generated sf1.0). NOT correctness input — the oracle gate
  * always runs on the driver's own parquet; this exists solely so the
  * §6 scale claims are measured, not asserted.
  *
  * Replication preserves each table's internal distribution while
  * keeping replicas structurally INDEPENDENT — the way a corpus
  * actually grows — so pair/candidate spaces scale linearly, not
  * quadratically, and calendar-bounded panels stay bounded:
  *
  *  - region/nation copy as-is (dims stay bounded at 100 TB too);
  *  - star keys shift per replica by (max+1) with FKs moved in
  *    lockstep, so each replica is a disjoint key universe;
  *  - events keep their calendar (by-day panels must NOT grow with
  *    corpus size — that is the §4 design claim under test) and shift
  *    event/user ids;
  *  - documents shift doc_id and suffix every token per replica —
  *    replicas share ZERO shingles, so the near-dup pair structure
  *    (pairs per doc) is scale-invariant instead of exploding into
  *    10-deep exact-dup cliques no real corpus has. KNOWN SKEW: the
  *    suffix changes token CONTENT (stopword/langid hits vanish in
  *    replicas ≥ 1, tokens grow ~3 chars), so slopes are meaningful
  *    for structure-driven costs (shingling, pair joins, counts) —
  *    the heavy tail under measurement — not for content-conditioned
  *    selectivity (language-id hit rates and the like);
  *  - embeddings shift vec_id and ROTATE the vector per replica (a
  *    fixed dimension permutation preserves norms and the coordinate
  *    distribution while decorrelating replicas — 10 identical copies
  *    of every vector would make every ANN/near-dup query quadratic
  *    in the replica count). Rotation offsets must stay distinct, so
  *    `factor` is capped at the embedding dimension (beyond it the
  *    offsets wrap to 0 and replicas become exact copies — the
  *    clique explosion the rotation exists to prevent).
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> [factor=10]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor >= 1, s"factor=$factor")
    val spark = GraftSession.get()

    def t(name: String): DataFrame = Tables(spark, src, name)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    // cast BEFORE aggregating: an INT32-typed key column in a future
    // data drop would otherwise surface as an opaque ClassCastException
    // from getLong
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head().getLong(0)
    /** Union of `factor` replicas of `df`, transformed per replica. */
    def reps(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => f(df, r)).reduce(_ unionByName _)
    def shift(c: String, span: Long, r: Int) =
      (col(c) + lit(span * r)).as(c)

    write(t("region"), "region")
    write(t("nation"), "nation")

    val cust = t("customer").localCheckpoint(true)
    val custSpan = maxOf(cust, "c_custkey") + 1
    write(reps(cust)((df, r) => df.withColumn("c_custkey",
      shift("c_custkey", custSpan, r))), "customer")

    val supp = t("supplier").localCheckpoint(true)
    val suppSpan = maxOf(supp, "s_suppkey") + 1
    write(reps(supp)((df, r) => df.withColumn("s_suppkey",
      shift("s_suppkey", suppSpan, r))), "supplier")

    val part = t("part").localCheckpoint(true)
    val partSpan = maxOf(part, "p_partkey") + 1
    write(reps(part)((df, r) => df.withColumn("p_partkey",
      shift("p_partkey", partSpan, r))), "part")

    val ord = t("orders").localCheckpoint(true)
    val ordSpan = maxOf(ord, "o_orderkey") + 1
    write(reps(ord)((df, r) => df
      .withColumn("o_orderkey", shift("o_orderkey", ordSpan, r))
      .withColumn("o_custkey", shift("o_custkey", custSpan, r))), "orders")

    val li = t("lineitem").localCheckpoint(true)
    write(reps(li)((df, r) => df
      .withColumn("l_orderkey", shift("l_orderkey", ordSpan, r))
      .withColumn("l_partkey", shift("l_partkey", partSpan, r))
      .withColumn("l_suppkey", shift("l_suppkey", suppSpan, r))), "lineitem")

    val ev = t("events").localCheckpoint(true)
    val evSpan = maxOf(ev, "event_id") + 1
    val userSpan = ev.agg(max(col("user_id"))).head().getLong(0) + 1
    write(reps(ev)((df, r) => df
      .withColumn("event_id", shift("event_id", evSpan, r))
      .withColumn("user_id", shift("user_id", userSpan, r))), "events")

    val docs = t("documents").localCheckpoint(true)
    val docSpan = maxOf(docs, "doc_id") + 1
    write(reps(docs)((df, r) => df
      .withColumn("doc_id", shift("doc_id", docSpan, r))
      .withColumn("text",
        if (r == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1_r$r"))
      .withColumn("n_chars", length(col("text")).cast("long"))), "documents")

    val emb = t("embeddings").localCheckpoint(true)
    val vecSpan = maxOf(emb, "vec_id") + 1
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    require(factor <= d,
      s"factor=$factor exceeds the embedding dimension $d: rotation " +
        "offsets would wrap to 0 and replicas become exact vector " +
        "copies, making every ANN/near-dup slope quadratic in the " +
        "replica count instead of linear")
    write(reps(emb)((df, r) => df
      .withColumn("vec_id", shift("vec_id", vecSpan, r))
      .withColumn("embedding",
        if (r == 0) col("embedding")
        else concat(
          slice(col("embedding"), r + 1, d - r),
          slice(col("embedding"), 1, r)))), "embeddings")

    println(s"""{"scaled": "$out", "factor": $factor}""")
    spark.stop()
  }
}
