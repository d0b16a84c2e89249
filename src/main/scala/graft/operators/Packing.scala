package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data sequence packing: assign documents to fixed-budget
  * token bins — the standard "concat then chunk" packing an LLM data
  * pipeline runs before tokenized-shard writing.
  *
  * Documents are sharded deterministically (key mod nShards — real
  * pipelines pack per shard so packing parallelizes), then laid out
  * contiguously in key order within the shard: a document's bin is
  * the bin its START offset falls into (`floor(prefix_sum/budget)`),
  * its offset-in-bin the remainder. Pure window algebra — assignment
  * is a function of (key order, token counts) alone, replayable by
  * any engine, stable across partition layouts and re-runs.
  *
  * Scale shape: ONE shard-keyed sort window over the corpus; no
  * global order, no driver state. nShards bounds the per-task sort;
  * at 100 TB raise nShards with the cluster (each shard's run length
  * is corpus/nShards).
  */
object Packing {

  def packGreedy(docs: DataFrame, key: String, tokenCol: String,
                 budget: Int, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, s"budget=$budget nShards=$nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(key))
    docs
      .withColumn("shard", pmod(col(key), lit(nShards)).cast("int"))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .withColumn("bin_id",
        floor((col("cum_tokens") - col(tokenCol)) / budget))
      .withColumn("bin_offset",
        (col("cum_tokens") - col(tokenCol)) % budget)
  }
}
