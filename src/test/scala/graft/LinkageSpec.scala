package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

/** Entity-resolution semantics + the Jaro–Winkler kernel's parity
  * pins. The kernel's reference values below are DuckDB
  * `jaro_winkler_similarity` outputs (the oracle engine), captured
  * verbatim — the kernel must stay bit-exact against them, including
  * the byte-based (not codepoint) treatment of multibyte input and
  * the 0.0-for-empty convention.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def jwOf(pairs: Seq[(String, String)]): Seq[Double] =
    pairs.toDF("a", "b")
      .select(Linkage.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq

  test("jaroWinkler kernel is bit-exact vs captured DuckDB values") {
    val got = jwOf(Seq(
      ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
      ("SMA RING", "SMALL RING"), ("αβγ", "αβδ")))
    assert(got == Seq(
      0.9611111111111111, 0.8400000000000001, 0.8133333333333332,
      0.9533333333333333, 0.9333333333333333))
  }

  test("jaroWinkler empties score 0.0 (DuckDB convention), nulls propagate") {
    assert(jwOf(Seq(("", "x"), ("", ""), ("x", "x"))) == Seq(0.0, 0.0, 1.0))
    val r = Seq((Option.empty[String], Option("x")))
      .toDF("a", "b")
      .select(Linkage.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("jaroWinkler interpreted eval agrees with the codegen'd path") {
    val pairs = Seq(("MARTHA", "MARHTA"), ("abcdefgh", "abcdxxxx"), ("ab", "ba"))
    val codegen = jwOf(pairs)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interpreted = pairs.map { case (a, b) =>
      graft.expressions.JaroWinklerExpr(Literal(a), Literal(b))
        .eval(null).asInstanceOf[Double]
    }
    assert(codegen == interpreted)
  }

  private def entities = Seq(
    (1L, "small ring"), (2L, "smal ring"), (3L, "red ring"),
    (4L, "small widget"), (5L, "smol widget"), (6L, "blue bolt"))
    .toDF("ent_id", "ent_name")

  test("candidatePairs: within-block pairs only, threshold + canonical order") {
    val got = Linkage.candidatePairs(entities, "ent_id", "ent_name", 0.9)
      .select("rec_id_a", "rec_id_b").as[(Long, Long)].collect().toSet
    // cross-block pairs (ring vs widget vs bolt) never score;
    // (1,2) "SMALL RING"/"SMAL RING" and (4,5) clear 0.9, (1,3) does not.
    assert(got.contains((1L, 2L)))
    assert(!got.contains((1L, 3L)))
    assert(got.forall { case (a, b) => a < b })
    val all = Linkage.candidatePairs(entities, "ent_id", "ent_name", 0.0)
      .select("rec_id_a", "rec_id_b").as[(Long, Long)].collect()
    assert(all.length == 3 + 1 + 0) // C(3,2) ring + C(2,2->1) widget + bolt alone
  }

  test("candidatePairs: hot blocks above the cap drop, observable via hotBlocks") {
    val capped = Linkage.candidatePairs(entities, "ent_id", "ent_name",
      threshold = 0.0, blockCap = 2)
    // RING block (3 entities) exceeds cap=2 -> its 3 pairs vanish
    assert(capped.select("rec_id_a", "rec_id_b").as[(Long, Long)]
      .collect().toSet == Set((4L, 5L)))
    val hot = Linkage.hotBlocks(entities, "ent_id", "ent_name", blockCap = 2)
      .as[(String, Long)].collect().toMap
    assert(hot == Map("RING" -> 3L))
  }

  test("bestMatch: argmax with (score desc, ref id) tie-break; below-threshold stays NULL") {
    val ref = Seq((10L, "small ring"), (11L, "small rang"), (12L, "blue gear"))
      .toDF("ent_id", "ent_name")
    val left = Seq((1L, "small ring"), (2L, "zzzz gear")).toDF("ent_id", "ent_name")
    val got = Linkage.bestMatch(left, "ent_id", "ent_name",
      ref, "ent_id", "ent_name", threshold = 0.8)
      .collect().map(r => r.getAs[Long]("rec_id") ->
        (if (r.isNullAt(r.fieldIndex("ref_id"))) None
         else Some(r.getAs[Long]("ref_id")))).toMap
    // exact match (jw 1.0) outranks the near-match; 10 < 11 never needed
    assert(got(1L) == Some(10L))
    // "ZZZZ GEAR" vs "BLUE GEAR" scores ~0.56 < 0.8 -> unmatched row kept
    assert(got(2L) == None)
  }

  test("blockingStats: exact pair arithmetic, hot-block flag, reduction ratio") {
    import spark.implicits._
    import graft.operators.Linkage
    // blocks by last token: GEAR{a,b,c} (3 -> 3 pairs), BOLT{d,e}
    // (2 -> 1 pair), NUT{f} (1 -> 0): 6 records, 4 candidate pairs,
    // all-pairs 15, reduction 1 - 4/15
    val df = Seq((1L, "red gear"), (2L, "blue gear"), (3L, "green gear"),
      (4L, "big bolt"), (5L, "small bolt"), (6L, "lone nut"))
      .toDF("id", "name")
    val r = Linkage.blockingStats(df, "id", "name", blockCap = 2).collect().head
    assert(r.getAs[Long]("n_records") == 6L)
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Long]("max_block") == 3L)
    assert(r.getAs[Long]("n_blocks_over_cap") == 1L) // GEAR exceeds cap 2
    assert(r.getAs[Long]("candidate_pairs") == 4L)
    assert(r.getAs[Long]("all_pairs") == 15L)
    assert(math.abs(r.getAs[Double]("reduction_ratio") - (1.0 - 4.0 / 15)) < 1e-12)
  }
}
