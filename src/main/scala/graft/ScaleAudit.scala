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

    // ER blocking: exact candidate volume of er_candidate_pairs /
    // er_best_match — Σ (block_n choose 2) over the capped last-token
    // blocks of the part-name entity relation (mirrors
    // Linkage.blocked: distinct normalized names, block = last name
    // token, blocks past blockCap dropped), plus the dropped hot-block
    // mass for the honesty log. Never materializes a pair.
    val ents = Tables(spark, sfDir, "part")
      .groupBy(upper(trim(col("p_name"))).as("name_norm"))
      .agg(min(col("p_partkey")).as("ent_id"))
      .filter(col("name_norm").isNotNull && length(col("name_norm")) > 0)
      .withColumn("block", element_at(split(col("name_norm"), " "), -1))
    val blockSizes = ents.groupBy(col("block")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val nEntities = ents.count()
    val erCand = pairs2(blockSizes.filter(col("c") <= 1000))
    val erDroppedBlocks = blockSizes.filter(col("c") > 1000).count()

    // Graph family: the triangles / link-prediction / clustering
    // queries run over the NATION-level flow graph — a DIM-BOUNDED
    // derived graph (≤ |nation|² directed edges however large the
    // fact is). The wedge volume Σ deg·(deg−1)/2 over the undirected
    // support is the exact common-neighbor candidate count of the
    // triangle/AA joins; fact rows feeding the flow aggregation are
    // the linear component. Expected evidence: flow_fact_rows grows
    // ∝ data, distinct edges and wedge volume stay ~constant — the
    // pair-generating stage is scale-free by construction.
    val nation = Tables(spark, sfDir, "nation")
    val flowsRaw = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("__ok"),
        col("n_name").as("src"))), col("s_nationkey") === col("__ok"))
      .join(broadcast(nation.select(col("n_nationkey").as("__dk"),
        col("n_name").as("dst"))), col("c_nationkey") === col("__dk"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val flowFactRows = flowsRaw.count()
    val und = flowsRaw
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct().localCheckpoint(false)
    val nFlowEdges = und.count()
    val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("c"))
    val wedges = pairs2(deg)

    println(s"""{"sf_dir": "$sfDir", "recsys_interactions": $nInter, """ +
      s""""recsys_pair_volume": $recsysPairs, "shingle_postings": $nPostings, """ +
      s""""prefix_candidate_volume": $prefixCand, """ +
      s""""er_entities": $nEntities, "er_block_candidate_volume": $erCand, """ +
      s""""er_dropped_hot_blocks": $erDroppedBlocks, """ +
      s""""flow_fact_rows": $flowFactRows, "flow_graph_edges": $nFlowEdges, """ +
      s""""flow_wedge_volume": $wedges}""")
  }
}
