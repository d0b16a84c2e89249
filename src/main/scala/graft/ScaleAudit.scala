package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Work-volume audit for the §6 slope evidence: computes the exact
  * CANDIDATE-PAIR volumes of the steepest queries analytically (one
  * aggregation per relation — `Σ c·(c−1)/2` over the blocking key's
  * group sizes), WITHOUT materializing any pair. This separates the
  * two possible causes of a wall-clock slope: if the pair volume
  * grows ∝ data (it must, by the cap/disjoint-replica design) while
  * a fixed-size host's wall grows faster, the residual is resource
  * pressure (page cache, shuffle spill) that a cluster scaling with
  * the data absorbs — a plan audited linear stays linear.
  *
  * Usage: runMain graft.ScaleAudit <sfDir>
  */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.get()

    def pairs2(grouped: DataFrame): Long =
      grouped.agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)

    // recsys: within-user ordered pair volume after the cap (the
    // exact row count coOccurrenceCounts enumerates)
    val inter = graft.operators.Recsys.interactions(
      Tables(spark, sfDir, "lineitem").join(Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey")),
      "o_custkey", "l_partkey", userCap = 1000).localCheckpoint(false)
    val recsysPairs = pairs2(inter.groupBy(col("user_id")).agg(count(lit(1)).as("c")))
    val nInter = inter.count()

    // prefix filter: candidate volume = Σ over prefix shingles of
    // (df_prefix choose 2) — the exact size of the candidate join's
    // raw output before the size-ratio filter and distinct
    val docs = Tables(spark, sfDir, "documents")
    val sh = graft.operators.TextDedup
      .hashedShingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .localCheckpoint(false)
    val dfc = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val prefix = sh.join(dfc, "sh")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .join(sizes, "doc_id")
      .filter(col("pos") <= col("n_sh") - ceil(col("n_sh") * 0.5) + 1)
      .filter(col("df") >= 2)
    val prefixCand = pairs2(prefix.groupBy(col("sh")).agg(count(lit(1)).as("c")))
    val nPostings = sh.count()

    println(s"""{"sf_dir": "$sfDir", "recsys_interactions": $nInter, """ +
      s""""recsys_pair_volume": $recsysPairs, "shingle_postings": $nPostings, """ +
      s""""prefix_candidate_volume": $prefixCand}""")
  }
}
