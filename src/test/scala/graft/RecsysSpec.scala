package graft

import org.apache.spark.sql.functions._

import graft.operators.Recsys

/** Item-item CF semantics: exact co-occurrence counts, cosine
  * normalization, cap discipline, and the serving-time
  * recommendation join. The oracle gate pins full values at sf; these
  * pin the arithmetic the hash alone would not explain.
  */
class RecsysSpec extends SparkSpec {
  import spark.implicits._

  // u1:{A,B,C} u2:{A,B} u3:{A,D} -> n(A)=3 n(B)=2 n(C)=1 n(D)=1
  // n(A,B)=2 n(A,C)=1 n(B,C)=1 n(A,D)=1
  private def raw = Seq(
    ("u1", "A"), ("u1", "B"), ("u1", "C"), ("u1", "A"), // dup A collapses
    ("u2", "A"), ("u2", "B"),
    ("u3", "A"), ("u3", "D"))
    .toDF("user_id", "item_id")

  test("itemCosineTopK: exact counts and cosine, symmetric lists, tie-break") {
    val got = Recsys.itemCosineTopK(raw, "user_id", "item_id", k = 3, minSupport = 1)
      .collect().map(r => (r.getAs[String]("item_id"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("neighbor_id"), r.getAs[Long]("n_both"),
          r.getAs[Double]("cosine"))).toMap
    def q6(x: Double) = math.floor(x * 1e6) / 1e6
    // cos(A,B) = 2/sqrt(3*2); cos(A,C) = 1/sqrt(3); cos(A,D) = 1/sqrt(3)
    assert(got(("A", 1)) == (("B", 2L, q6(2.0 / math.sqrt(6.0)))))
    // C before D on equal cosine (neighbor id tie-break)
    assert(got(("A", 2))._1 == "C" && got(("A", 3))._1 == "D")
    // symmetric: B's list leads with A at the same cosine
    assert(got(("B", 1)) == (("A", 2L, q6(2.0 / math.sqrt(6.0)))))
    // cos(B,C) = 1/sqrt(2) > cos(B,A)? 1/sqrt(2)=.707 vs 2/sqrt(6)=.816 -> A first
    assert(got(("B", 2))._1 == "C")
  }

  test("default support floor drops singleton co-occurrence") {
    // only (A,B) has n_both = 2; every other pair is a single shared
    // user and must vanish at the default minSupport = 2
    val got = Recsys.itemCosineTopK(raw, "user_id", "item_id", k = 5)
      .select("item_id", "neighbor_id").as[(String, String)].collect().toSet
    assert(got == Set(("A", "B"), ("B", "A")))
  }

  test("per-user cap bounds the pair fan-out deterministically") {
    // cap=2 keeps each user's 2 smallest item ids: u1:{A,B} u2:{A,B} u3:{A,D}
    val got = Recsys.itemCosineTopK(raw, "user_id", "item_id", k = 5, userCap = 2,
      minSupport = 1)
      .select("item_id", "neighbor_id").as[(String, String)].collect().toSet
    assert(got == Set(("A", "B"), ("B", "A"), ("A", "D"), ("D", "A")))
  }

  test("recommendTopN: seen items excluded, scores sum over neighbor links") {
    val got = Recsys.recommendTopN(raw, "user_id", "item_id", n = 3, k = 3,
      minSupport = 1)
      .collect().map(r => (r.getAs[String]("user_id"), r.getAs[String]("rec_item")) ->
        (r.getAs[Long]("n_links"), r.getAs[Double]("score"))).toMap
    // u2 has {A,B}; candidates from neighbor lists: C (via A and B), D (via A)
    def q6(x: Double) = math.floor(x * 1e6) / 1e6
    val cAC = q6(1.0 / math.sqrt(3.0))   // cos(A,C)
    val cBC = q6(1.0 / math.sqrt(2.0))   // cos(B,C)
    val cAD = q6(1.0 / math.sqrt(3.0))   // cos(A,D)
    // the operator sums on a 6dp DECIMAL, not on doubles — mirror that
    // exactly (a plain double add can differ in the last ulp)
    val sumCD = (BigDecimal(cAC).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      + BigDecimal(cBC).setScale(6, BigDecimal.RoundingMode.HALF_UP)).toDouble
    assert(got(("u2", "C")) == ((2L, sumCD)))
    assert(got(("u2", "D")) == ((1L, cAD)))
    // nothing recommends an already-seen item
    assert(!got.contains(("u2", "A")) && !got.contains(("u2", "B")))
  }

  test("recommendationCoverage: catalog share and exposure Gini off the recs panel") {
    val got = Recsys.recommendationCoverage(raw, "user_id", "item_id",
      n = 3, k = 3, minSupport = 1).collect().head
    // catalog = {A,B,C,D}; recs (k=3, n=3, minSupport 1):
    //   u1 -> D; u2 -> C, D; u3 -> B, C  (5 rec rows over items {B,C,D})
    assert(got.getAs[Long]("n_users_total") == 3L)
    assert(got.getAs[Long]("n_users_served") == 3L)
    assert(got.getAs[Long]("n_items_catalog") == 4L)
    assert(got.getAs[Long]("n_items_recommended") == 3L)
    assert(math.abs(got.getAs[Double]("catalog_coverage") - 0.75) < 1e-12)
    // exposure x = (B:1, C:2, D:2) sorted asc with id tie-break:
    // ranks B=1, C=2, D=3 -> wsum = 1 + 4 + 6 = 11, n=3, tot=5
    // gini = (2*11 - 4*5) / (3*5) = 2/15
    assert(math.abs(got.getAs[Double]("exposure_gini") - 2.0 / 15) < 1e-12)
    // a uniform-exposure panel ginis to 0: every item equally served
    val uniform = Seq(("u1", "A"), ("u1", "B"), ("u2", "A"), ("u2", "B"))
      .toDF("user_id", "item_id")
    val u = Recsys.recommendationCoverage(uniform, "user_id", "item_id",
      n = 2, k = 2, minSupport = 1).collect().head
    // every user has seen everything -> nothing to recommend
    assert(u.getAs[Long]("n_items_recommended") == 0L)
    assert(u.isNullAt(u.fieldIndex("exposure_gini")))
  }

  test("evalRankingLoo: identical-taste corpus scores perfect, disjoint corpus scores zero") {
    import graft.operators.Recsys
    // 10 users with the identical 5-item basket: whatever item the
    // deterministic LOO holds out, the other four items' neighbor
    // lists all point at it and it is the ONLY unseen candidate —
    // rank 1 for every user, so every metric is exactly 1
    val rows = for (u <- 1L to 10L; i <- 1L to 5L) yield (u, i)
    val perfect = Recsys.evalRankingLoo(rows.toDF("user_id", "item_id"),
      "user_id", "item_id", n = 5, k = 10).collect().head
    assert(perfect.getAs[Long]("n_users_evaluated") == 10L)
    assert(perfect.getAs[Long]("n_hits") == 10L)
    assert(perfect.getAs[Double]("hit_rate") == 1.0)
    assert(perfect.getAs[Double]("mrr") == 1.0)
    assert(perfect.getAs[Double]("ndcg") == 1.0)
    // disjoint baskets: no co-occurrence, no recommendations, zero
    // metrics — but both users still EVALUATED (the denominator is
    // the holdout, not the served set)
    val disjoint = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L))
      .toDF("user_id", "item_id")
    val zero = Recsys.evalRankingLoo(disjoint, "user_id", "item_id",
      n = 5, k = 10).collect().head
    assert(zero.getAs[Long]("n_users_evaluated") == 2L)
    assert(zero.getAs[Long]("n_hits") == 0L)
    assert(zero.getAs[Double]("hit_rate") == 0.0)
    assert(zero.getAs[Double]("mrr") == 0.0 && zero.getAs[Double]("ndcg") == 0.0)
    // single-interaction users are excluded from evaluation entirely
    val single = Seq((1L, 1L), (2L, 1L), (2L, 2L)).toDF("user_id", "item_id")
    val s1 = Recsys.evalRankingLoo(single, "user_id", "item_id",
      n = 5, k = 10).collect().head
    assert(s1.getAs[Long]("n_users_evaluated") == 1L)
  }
}
