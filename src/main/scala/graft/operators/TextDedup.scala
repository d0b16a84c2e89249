package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Exact n-gram Jaccard similarity pairs above `threshold`, via a
    * shingle inverted index: explode distinct shingles, self-join on
    * the shingle (shuffle ∝ posting-list pairs), count common
    * shingles per pair, then Jaccard from the per-doc shingle-set
    * sizes. No crossJoin anywhere.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
      TextOps.shingles(TextOps.tokens(col(textCol)), n).as("shs"))
    val sh = docs.select(col("doc_id"), explode(col("shs")).as("sh"))
    val sizes = docs.select(col("doc_id"), size(col("shs")).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
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

  /** MinHash signature column: `numHashes` independent hash slots,
    * each the minimum of a seeded xxhash64 over the shingle set.
    */
  def minhashSignature(shs: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shs, s => xxhash64(i, s))))

  /** MinHash-LSH near-dup candidates: band the signature, bucket-join
    * on (band, bucket) — the only pairs ever materialized are those
    * agreeing on at least one full band — then verify each candidate
    * with the exact shingle-set Jaccard (array intersect/union on the
    * already-joined pair, no extra shuffle fan-out).
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    val docs = df.select(col(idCol).as("doc_id"),
        TextOps.shingles(TextOps.tokens(col(textCol)), n).as("shs"))
      .withColumn("sig", minhashSignature(col("shs"), numHashes))
    val banded = docs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band_id"),
            hash(slice(col("sig"), b * rows + 1, lit(rows))).as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bb.band_id"), col("bb.bucket"))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
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

  /** 64-bit SimHash of the token stream: per-bit majority vote over
    * the token hashes, assembled with bitwise OR (no overflow under
    * ANSI arithmetic). Expressed in SQL because shiftright with a
    * *column* shift amount has no Scala DSL binding.
    */
  def simhash64(toksCol: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 63), j ->
       |    if(aggregate(transform($toksCol, t -> xxhash64(t)), 0L,
       |         (acc, h) -> acc + if((shiftright(h, j) & 1) = 1, 1L, -1L)) >= 0,
       |       shiftleft(1L, j), 0L)),
       |  0L, (a, b) -> a | b)""".stripMargin)

  /** SimHash near-dup candidates: split the 64-bit fingerprint into
    * four 16-bit bands (pigeonhole: any pair within Hamming distance 3
    * of each other agrees on at least one band), bucket-join on the
    * band value, then filter by exact Hamming distance.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 8): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("simhash", simhash64("toks"))
      .select("doc_id", "simhash")
    val banded = docs.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), b -> " +
          "struct(b AS band_id, shiftright(simhash, b * 16) & 65535 AS bucket))")).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band_id"), col("bb.bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
