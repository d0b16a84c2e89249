package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def frame(old: Seq[Double], nw: Seq[Double]) =
    (old.map((_, 0)) ++ nw.map((_, 1))).toDF("value", "is_new")

  test("chi2Histogram: identical distributions score exactly zero") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0)
    val r = Drift.chi2Histogram(frame(vals, vals), "value", "is_new").collect()(0)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("tv_dist") == 0.0)
    assert(r.getAs[Long]("n_buckets_skipped") == 0L)
    assert(r.getAs[Long]("tot_old") == 10L && r.getAs[Long]("tot_new") == 10L)
  }

  test("chi2Histogram: shifted mass scores positive; old-empty buckets skip χ² but not TV") {
    // old mass in [0,10], new mass adds a far cluster at 100 — the
    // 100-bucket has n_old = 0: excluded from χ², visible in TV
    val old = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val nw = Seq(1.0, 2.0, 100.0, 100.0, 100.0)
    val r = Drift.chi2Histogram(frame(old, nw), "value", "is_new").collect()(0)
    assert(r.getAs[Double]("chi2") > 0.0)
    assert(r.getAs[Double]("tv_dist") > 0.0)
    assert(r.getAs[Long]("n_buckets_skipped") >= 1L)
  }

  test("psiHistogram: identical distributions score exactly zero") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0)
    val r = Drift.psiHistogram(frame(vals, vals), "value", "is_new").collect()(0)
    assert(r.getAs[Double]("psi") == 0.0)
    assert(r.getAs[Long]("n_buckets_skipped") == 0L)
    assert(r.getAs[Long]("tot_old") == 10L && r.getAs[Long]("tot_new") == 10L)
  }

  test("psiHistogram: reweighted mass scores positive; one-side-empty buckets skip") {
    // both sides occupy buckets 0 and 19, but with opposite weights —
    // every term is finite and the reweighting must score > 0
    val old = Seq(1.0, 1.1, 1.2, 1.3, 100.0)
    val nw = Seq(1.0, 100.0, 100.1, 100.2, 100.3)
    val r = Drift.psiHistogram(frame(old, nw), "value", "is_new").collect()(0)
    assert(r.getAs[Double]("psi") > 0.0)
    assert(r.getAs[Long]("n_buckets_used") == 2L)
    // disjoint clusters: new mass where old had none is SKIPPED (the
    // appeared-mass signal lives in chi2Histogram's tv_dist)
    val disj = Drift.psiHistogram(
      frame(Seq(1.0, 2.0, 3.0), Seq(100.0, 101.0)), "value", "is_new").collect()(0)
    assert(disj.getAs[Long]("n_buckets_skipped") >= 2L)
  }

  test("jsHistogram: zero on identical, symmetric, finite on disjoint, ≤ ln 2") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0)
    val same = Drift.jsHistogram(frame(vals, vals), "value", "is_new").collect()(0)
    assert(same.getAs[Double]("js_div") == 0.0)
    // symmetric in the two slices (PSI is too, but JS must also be
    // FINITE on fully disjoint support — its defining property)
    val old = Seq(1.0, 2.0, 3.0)
    val nw = Seq(100.0, 101.0)
    val ab = Drift.jsHistogram(frame(old, nw), "value", "is_new").collect()(0)
    val ba = Drift.jsHistogram(frame(nw, old), "value", "is_new").collect()(0)
    assert(math.abs(ab.getAs[Double]("js_div") - ba.getAs[Double]("js_div")) < 1e-9)
    // disjoint support: JS = ln 2 exactly (up to the 1e-6 term grid)
    assert(math.abs(ab.getAs[Double]("js_div") - math.log(2)) < 1e-5)
    assert(ab.getAs[Double]("js_div") <= math.log(2) + 1e-12)
    assert(ab.getAs[Long]("n_buckets") >= 2L)
  }

  test("psiHistogram: hand-computed two-bucket value") {
    // k=2 over values {0,10}: bucket 0 gets old 3/4, new 1/4; bucket 1
    // gets old 1/4, new 3/4. PSI = 2 * (0.5 * ln(3)) with each term
    // floor-quantized to the 1e-6 grid before summation.
    val old = Seq(0.0, 1.0, 2.0, 10.0)
    val nw = Seq(0.0, 8.0, 9.0, 10.0)
    val r = Drift.psiHistogram(frame(old, nw), "value", "is_new", k = 2).collect()(0)
    def g6(x: Double) = math.floor(x * 1e6) / 1e6
    val lnUp = g6(math.log(3.0))      // p 0.25 -> 0.75
    val lnDn = g6(math.log(1.0 / 3.0)) // p 0.75 -> 0.25
    val expected = g6(0.5 * lnUp) + g6(-0.5 * lnDn)
    assert(math.abs(r.getAs[Double]("psi") - expected) < 1e-12)
    assert(r.getAs[Long]("n_buckets_used") == 2L)
  }

  test("cvmStatistic: hand-computed disjoint case; identical samples score zero") {
    // old {1,2}, new {3,4}: gaps 0.5,1,0.5,0 squared -> sum 1.5,
    // scale (2*2)/(4*4) = 0.25 -> T = 0.375 exactly (grid-exact terms)
    val r = Drift.cvmStatistic(frame(Seq(1.0, 2.0), Seq(3.0, 4.0)),
      "value", "is_new").collect()(0)
    assert(r.getAs[Double]("cvm_stat") == 0.375)
    assert(r.getAs[Double]("sum_sq_weighted") == 1.5)
    assert(r.getAs[Long]("n_distinct_values") == 4L)
    val same = Drift.cvmStatistic(frame(Seq(2.0, 5.0, 9.0), Seq(2.0, 5.0, 9.0)),
      "value", "is_new").collect()(0)
    assert(same.getAs[Double]("cvm_stat") == 0.0)
  }

  test("ksStatistic: disjoint samples reach D = 1 at the old sample's max") {
    val r = Drift.ksStatistic(frame(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      "value", "is_new").collect()(0)
    assert(r.getAs[Double]("d_stat") == 1.0)
    assert(r.getAs[Double]("at_value") == 3.0)
    assert(r.getAs[Long]("n_distinct_values") == 6L)
  }

  test("ksStatistic: identical samples score zero, tie-break lands on the smallest value") {
    val vals = Seq(2.0, 5.0, 9.0)
    val r = Drift.ksStatistic(frame(vals, vals), "value", "is_new").collect()(0)
    assert(r.getAs[Double]("d_stat") == 0.0)
    assert(r.getAs[Double]("at_value") == 2.0)
  }

  test("ksStatistic: layout-stable under repartition (distributed prefix sum)") {
    val df = frame(Seq(1.0, 3.0, 5.0, 7.0, 11.0), Seq(2.0, 3.0, 8.0, 13.0))
    val a = Drift.ksStatistic(df, "value", "is_new").collect()(0)
    val b = Drift.ksStatistic(df.repartition(7), "value", "is_new").collect()(0)
    assert(a.getAs[Double]("d_stat") == b.getAs[Double]("d_stat"))
    assert(a.getAs[Double]("at_value") == b.getAs[Double]("at_value"))
  }

  test("wassersteinW1: identical samples score zero; uniform shift scores the shift") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0)
    val same = Drift.wassersteinW1(frame(vals, vals), "value", "is_new").collect()(0)
    assert(same.getAs[Double]("w1_distance") == 0.0)
    assert(same.getAs[Long]("n_old") == 4L && same.getAs[Long]("n_new") == 4L)
    // every point moved +10: W1 = 10 exactly — KS on the same pair
    // saturates at 1.0 and cannot say HOW FAR the mass moved
    val shifted = Drift.wassersteinW1(
      frame(vals, vals.map(_ + 10.0)), "value", "is_new").collect()(0)
    assert(shifted.getAs[Double]("w1_distance") == 10.0)
    val ks = Drift.ksStatistic(
      frame(vals, vals.map(_ + 10.0)), "value", "is_new").collect()(0)
    assert(ks.getAs[Double]("d_stat") == 1.0)
  }

  test("wassersteinW1: hand-computed partial overlap") {
    // old {0, 4}, new {0, 8}: ECDF diff is 0 on [0,4) and 1/2 on
    // [4,8) -> W1 = 0.5 * 4 = 2
    val r = Drift.wassersteinW1(frame(Seq(0.0, 4.0), Seq(0.0, 8.0)),
      "value", "is_new").collect()(0)
    assert(r.getAs[Double]("w1_distance") == 2.0)
    assert(r.getAs[Long]("n_distinct_values") == 3L)
  }

  test("wassersteinW1: single shared point is zero; empty side is NULL; layout-stable") {
    val one = Drift.wassersteinW1(frame(Seq(5.0), Seq(5.0)), "value", "is_new")
      .collect()(0)
    assert(one.getAs[Double]("w1_distance") == 0.0)
    val empty = Drift.wassersteinW1(frame(Seq(1.0, 2.0), Seq()), "value", "is_new")
      .collect()(0)
    assert(empty.isNullAt(empty.fieldIndex("w1_distance")))
    val df = frame(Seq(1.0, 3.0, 5.0, 7.0, 11.0), Seq(2.0, 3.0, 8.0, 13.0))
    val a = Drift.wassersteinW1(df, "value", "is_new").collect()(0)
    val b = Drift.wassersteinW1(df.repartition(7), "value", "is_new").collect()(0)
    assert(a.getAs[Double]("w1_distance") == b.getAs[Double]("w1_distance"))
  }

  test("mmdPolynomial: hand-computed kernel blocks, diagonal excluded") {
    import spark.implicits._
    // X = {(1,0),(0,1)}, Y = {(2,0),(0,2)}, dim 2:
    // k(u,v) = (1 + <u,v>/2)^2 -> term_xx = term_yy = 1 (cross pairs
    // only, k=1), term_xy = (4+1+1+4)/4 = 2.5, mmd2 = -3
    val df = Seq(
      (1L, Seq(1.0, 0.0), false), (2L, Seq(0.0, 1.0), false),
      (3L, Seq(2.0, 0.0), true), (4L, Seq(0.0, 2.0), true))
      .toDF("vec_id", "embedding", "is_new")
    val r = Drift.mmdPolynomial(df, "vec_id", "embedding", "is_new").collect()(0)
    assert(r.getAs[Long]("m") == 2L && r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("term_xx") == 1.0)
    assert(r.getAs[Double]("term_yy") == 1.0)
    assert(r.getAs[Double]("term_xy") == 2.5)
    assert(r.getAs[Double]("mmd2") == -3.0)
  }

  test("mmdPolynomial: the cap keeps the lowest ids per side, deterministically") {
    import spark.implicits._
    // an extra far-away vector on each side with a HIGHER id must be
    // ignored at cap=2 regardless of layout
    val df = Seq(
      (1L, Seq(1.0, 0.0), false), (2L, Seq(0.0, 1.0), false),
      (9L, Seq(100.0, 100.0), false),
      (3L, Seq(2.0, 0.0), true), (4L, Seq(0.0, 2.0), true),
      (8L, Seq(-50.0, 7.0), true))
      .toDF("vec_id", "embedding", "is_new")
    val r = Drift.mmdPolynomial(df, "vec_id", "embedding", "is_new", cap = 2)
      .collect()(0)
    val r2 = Drift.mmdPolynomial(df.repartition(5), "vec_id", "embedding",
      "is_new", cap = 2).collect()(0)
    assert(r.getAs[Double]("mmd2") == -3.0)
    assert(r2.getAs[Double]("mmd2") == -3.0)
  }

  test("distributionFit: exponential data picks exponential; a tight gaussian picks normal") {
    // inverse-CDF exponential draws (deterministic grid, mean 2)
    val expo = (1 to 400).map(i => -2.0 * math.log(i / 401.0)).toDF("value")
    val e = Drift.distributionFit(expo, "value")
      .collect().map(r => r.getAs[String]("dist_name") -> r).toMap
    assert(e.size == 3)
    assert(e("exponential").getAs[Boolean]("is_best"),
      s"exp data best=${e.filter(_._2.getAs[Boolean]("is_best")).keys}")
    assert(math.abs(e("exponential").getAs[Double]("param1") - 0.5) < 0.05)
    assert(e("exponential").getAs[Double]("ks_distance") <
      e("normal").getAs[Double]("ks_distance"))
    // gaussian-ish grid around 50, sd ~2 (all positive): normal wins
    val gs = (1 to 400).map { i =>
      val u = i / 401.0
      50.0 + 2.0 * math.log(u / (1 - u)) / 1.702
    }.toDF("value")
    val g = Drift.distributionFit(gs, "value")
      .collect().map(r => r.getAs[String]("dist_name") -> r).toMap
    assert(g("normal").getAs[Boolean]("is_best"))
    assert(math.abs(g("normal").getAs[Double]("param1") - 50.0) < 0.5)
    // exponential's param2 is undefined (one-parameter family)
    assert(e("exponential").isNullAt(e("exponential").fieldIndex("param2")))
  }
}
