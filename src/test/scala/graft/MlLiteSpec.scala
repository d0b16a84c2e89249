package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusQc, MlLite, Profiling, Serving}

/** Round-12 additions: in-engine classical ML (naive Bayes, OLS),
  * count-min sketch, feature hashing, grid-density hotspot clustering.
  */
class MlLiteSpec extends SparkSpec {

  import spark.implicits._

  // ── naive Bayes ───────────────────────────────────────────────────

  private def nbFixture = Seq(
    (1L, "der hund und die katze", "de"),
    (2L, "die katze und der vogel", "de"),
    (3L, "der vogel und die maus", "de"),
    (4L, "the cat and the dog", "en"),
    (5L, "the dog and the bird", "en"),
    (6L, "the bird and the mouse", "en"),
    (7L, "die katze und der hund", "de"),
    (8L, "the mouse and the cat", "en")
  ).toDF("doc_id", "text", "lang")

  test("naiveBayes: separable two-language corpus classifies perfectly") {
    val got = MlLite.naiveBayes(nbFixture, "doc_id", "text", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("true_label"), r.getAs[String]("pred_label"),
          r.getAs[Boolean]("is_correct"), r.getAs[Double]("margin"))).toMap
    assert(got.size == 8)
    got.foreach { case (id, (truth, pred, ok, margin)) =>
      assert(pred == truth, s"doc $id predicted $pred, wanted $truth")
      assert(ok)
      assert(margin > 0.0, s"doc $id margin must be positive, got $margin")
    }
  }

  test("naiveBayes: unseen-token doc falls back to the prior majority") {
    // doc 9's tokens appear in NO class: every match_sum is zero, so
    // the score reduces to prior - |d|·log_denom; 'en' has both the
    // larger prior (5 docs vs 4) and the smaller denominator penalty
    // cannot flip it on a symmetric vocabulary of this size.
    val docs = nbFixture.unionByName(
      Seq((9L, "zzz qqq xxx", "en")).toDF("doc_id", "text", "lang"))
    val got = MlLite.naiveBayes(docs, "doc_id", "text", "lang")
      .filter($"doc_id" === 9L).collect().head
    assert(got.getAs[String]("pred_label") == "en")
  }

  test("naiveBayes: scores are permutation-stable (decimal partials)") {
    val a = MlLite.naiveBayes(nbFixture.repartition(7), "doc_id", "text", "lang")
      .orderBy("doc_id").collect().map(_.getAs[Double]("score")).toSeq
    val b = MlLite.naiveBayes(nbFixture.repartition(2), "doc_id", "text", "lang")
      .orderBy("doc_id").collect().map(_.getAs[Double]("score")).toSeq
    assert(a == b)
  }

  test("naiveBayesKFold: folds partition the corpus; separable classes stay separable held-out") {
    // 40 docs, 2 classes with disjoint vocabularies and enough
    // redundancy that every fold's complement still contains both
    // vocabularies → held-out accuracy 1.0 everywhere
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "der hund katze vogel", "de")
      else (i.toLong, "the dog cat bird", "en")
    }.toDF("doc_id", "text", "lang")
    val got = MlLite.naiveBayesKFold(docs, "doc_id", "text", "lang", folds = 4)
      .collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum == 40L)
    got.foreach { r =>
      assert(r.getAs[Double]("accuracy") == 1.0,
        s"fold ${r.getAs[Int]("fold_id")} accuracy ${r.getAs[Double]("accuracy")}")
      assert(r.getAs[Long]("n_correct") == r.getAs[Long]("n_docs"))
    }
    // determinism under re-partitioning
    val again = MlLite.naiveBayesKFold(docs.repartition(7), "doc_id", "text",
      "lang", folds = 4).collect()
    assert(again.map(r => r.getAs[Int]("fold_id") -> r.getAs[Long]("n_docs")).toMap ==
      got.map(r => r.getAs[Int]("fold_id") -> r.getAs[Long]("n_docs")).toMap)
  }

  // ── two-feature OLS ───────────────────────────────────────────────

  test("olsTwoFeature: recovers an exact linear relationship, r2 = 1") {
    // y = 2 + 3·x1 - 0.5·x2, exact on the 1e-6 grid
    val rows = for (x1 <- 0 to 9; x2 <- 0 to 6)
      yield (2.0 + 3.0 * x1 - 0.5 * x2, x1.toDouble, x2.toDouble)
    val got = MlLite.olsTwoFeature(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().head
    assert(got.getAs[Long]("n") == 70L)
    assert(math.abs(got.getAs[Double]("beta0") - 2.0) < 1e-9)
    assert(math.abs(got.getAs[Double]("beta1") - 3.0) < 1e-9)
    assert(math.abs(got.getAs[Double]("beta2") + 0.5) < 1e-9)
    assert(math.abs(got.getAs[Double]("r2") - 1.0) < 1e-9)
  }

  test("olsInference: betas/SEs/t-stats match an independent normal-equation solve") {
    // grid-exact noisy data: y = 2 + 3·x1 - x2 + e
    val es = Seq(0.5, -0.5, 0.25, -0.25, 0.5, -0.5, 0.125, -0.125)
    val rows = (0 until 8).map { i =>
      val (x1, x2) = (i.toDouble, (i % 2).toDouble)
      (2.0 + 3.0 * x1 - x2 + es(i), x1, x2)
    }
    val got = MlLite.olsInference(rows.toDF("y", "x1", "x2"), "y", "x1", "x2").head
    // independent reference: explicit 3x3 inverse of X'X
    val n = rows.size.toDouble
    val xs = rows.map { case (y, a, b) => Array(1.0, a, b) }
    val ys = rows.map(_._1)
    val xtx = Array.tabulate(3, 3)((i, j) => xs.map(r => r(i) * r(j)).sum)
    val xty = Array.tabulate(3)(i => xs.zip(ys).map { case (r, y) => r(i) * y }.sum)
    def cof(m: Array[Array[Double]], i: Int, j: Int): Double = {
      val r = (0 to 2).filter(_ != i); val c = (0 to 2).filter(_ != j)
      val s = m(r(0))(c(0)) * m(r(1))(c(1)) - m(r(0))(c(1)) * m(r(1))(c(0))
      if ((i + j) % 2 == 0) s else -s
    }
    val det = (0 to 2).map(j => xtx(0)(j) * cof(xtx, 0, j)).sum
    val inv = Array.tabulate(3, 3)((i, j) => cof(xtx, j, i) / det)
    val beta = Array.tabulate(3)(i => (0 to 2).map(j => inv(i)(j) * xty(j)).sum)
    val sse = xs.zip(ys).map { case (r, y) =>
      val e = y - (0 to 2).map(j => beta(j) * r(j)).sum; e * e }.sum
    val s2 = sse / (n - 3.0)
    val se = Array.tabulate(3)(i => math.sqrt(s2 * inv(i)(i)))
    assert(got.getAs[Long]("n") == 8L)
    Seq("beta0" -> beta(0), "beta1" -> beta(1), "beta2" -> beta(2),
      "sigma2" -> s2, "se0" -> se(0), "se1" -> se(1), "se2" -> se(2),
      "t0" -> beta(0) / se(0), "t1" -> beta(1) / se(1), "t2" -> beta(2) / se(2))
      .foreach { case (c, want) =>
        assert(math.abs(got.getAs[Double](c) - want) < 1e-8, s"$c: ${got.getAs[Double](c)} vs $want")
      }
    assert(got.getAs[Boolean]("x1_significant_5pct"))
  }

  test("logLogElasticity: exact power law recovers its exponent; non-positives drop") {
    // qty = 16 / price^2 -> elasticity exactly -2 (up to the ln grid)
    val rows = Seq(("B1", 16.0, 1.0), ("B1", 4.0, 2.0), ("B1", 1.0, 4.0),
      ("B1", -1.0, 3.0), ("B1", 5.0, 0.0))
    val got = MlLite.logLogElasticity(rows.toDF("brand", "qty", "price"),
      "brand", "qty", "price").head
    assert(got.getAs[Long]("n") == 3L)
    assert(math.abs(got.getAs[Double]("elasticity") - (-2.0)) < 1e-4)
    assert(math.abs(got.getAs[Double]("corr") - (-1.0)) < 1e-6)
    assert(math.abs(got.getAs[Double]("intercept") - math.log(16.0)) < 1e-4)
  }

  test("olsInference: a perfect fit yields ~zero sigma2 and exact betas") {
    val rows = for (x1 <- 0 to 9; x2 <- 0 to 6)
      yield (2.0 + 3.0 * x1 - 0.5 * x2, x1.toDouble, x2.toDouble)
    val got = MlLite.olsInference(rows.toDF("y", "x1", "x2"), "y", "x1", "x2").head
    assert(math.abs(got.getAs[Double]("beta1") - 3.0) < 1e-9)
    assert(math.abs(got.getAs[Double]("sigma2")) < 1e-9)
  }

  test("olsTwoFeature: constant regressand has r2 = 0 by convention") {
    val rows = for (x1 <- 0 to 5; x2 <- 0 to 5)
      yield (7.0, x1.toDouble, x2.toDouble)
    val got = MlLite.olsTwoFeature(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().head
    assert(got.getAs[Double]("r2") == 0.0)
    assert(math.abs(got.getAs[Double]("beta1")) < 1e-9)
    assert(math.abs(got.getAs[Double]("beta0") - 7.0) < 1e-9)
  }

  test("olsTwoFeature: a degenerate design (constant x2) surfaces as NULL betas") {
    // x2 constant → centered a22 = 0, det = 0: the operator surfaces
    // the singular system as NULL (the NULLIF convention) rather than
    // fabricating a fit or raising an ANSI divide-by-zero.
    val rows = for (x1 <- 0 to 9) yield (1.0 + 2.0 * x1, x1.toDouble, 3.0)
    val r = MlLite.olsTwoFeature(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("beta1")))
    assert(r.isNullAt(r.fieldIndex("beta0")))
  }

  // ── logistic regression ───────────────────────────────────────────

  test("logisticRegression: separable data pushes the weight the right way") {
    // y = 1 exactly when x1 is high: after 6 rounds the x1 weight must
    // be positive and the fit must beat the majority-class baseline.
    val rows = (0 until 200).map { i =>
      val x1 = (i % 10) / 10.0
      val y = if (x1 >= 0.5) 1.0 else 0.0
      (y, x1, 0.5, 0.25)
    }
    val got = MlLite.logisticRegression(rows.toDF("y", "x1", "x2", "x3"),
      "y", Seq("x1", "x2", "x3"), lr = 0.5, rounds = 6).collect().head
    assert(got.getAs[Long]("n") == 200L)
    assert(got.getAs[Double]("w1") > 0.0)
    assert(got.getAs[Double]("accuracy") >= 0.5)
  }

  test("logisticRegression: weights are partitioning-invariant (grid + decimal partials)") {
    val rows = (0 until 300).map { i =>
      val x1 = (i % 24) / 24.0
      val x2 = (i % 7) / 7.0
      val x3 = (i % 13) / 13.0
      val y = if ((i * 2654435761L) % 97 < 30) 1.0 else 0.0
      (y, math.floor(x1 * 1e6) / 1e6, math.floor(x2 * 1e6) / 1e6,
        math.floor(x3 * 1e6) / 1e6)
    }
    val df = rows.toDF("y", "x1", "x2", "x3")
    val a = MlLite.logisticRegression(df.repartition(7), "y",
      Seq("x1", "x2", "x3"), lr = 0.5, rounds = 4).collect().head
    val b = MlLite.logisticRegression(df.repartition(2), "y",
      Seq("x1", "x2", "x3"), lr = 0.5, rounds = 4).collect().head
    Seq("w0", "w1", "w2", "w3", "accuracy").foreach { c =>
      assert(a.getAs[Double](c) == b.getAs[Double](c), s"column $c diverged")
    }
  }

  test("logisticPrCurve: confusion counts conserve and recall is monotone in threshold") {
    val rows = (0 until 300).map { i =>
      val x1 = (i % 10) / 10.0
      (if (x1 >= 0.5) 1.0 else 0.0, math.floor(x1 * 1e6) / 1e6, 0.5, 0.25)
    }
    val got = MlLite.logisticPrCurve(rows.toDF("y", "x1", "x2", "x3"),
      "y", Seq("x1", "x2", "x3"), lr = 0.5, rounds = 4,
      thresholds = Seq(0.2, 0.4, 0.6, 0.8))
      .orderBy("threshold").collect()
    assert(got.length == 4)
    val nPos = 150L
    got.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == nPos)
      val p = r.getAs[Double]("precision"); val rc = r.getAs[Double]("recall")
      assert(p >= 0.0 && p <= 1.0 && rc >= 0.0 && rc <= 1.0)
    }
    // raising the threshold can only lose positives
    val recalls = got.map(_.getAs[Double]("recall")).toSeq
    assert(recalls == recalls.sorted.reverse, recalls.toString)
  }

  test("infoGain: a perfectly predictive feature gains H(Y); an independent one gains ~0") {
    // y == f1 exactly (gain = H(Y) = ln 2 for a balanced label);
    // f2 cycles independently of y (gain ~ 0)
    val rows = (0 until 240).map { i =>
      val y = i % 2
      (y.toLong, y.toLong, (i % 3).toLong)
    }
    val got = MlLite.infoGain(rows.toDF("y", "f1", "f2"), "y", Seq("f1", "f2"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    val g1 = got("f1")
    assert(math.abs(g1.getAs[Double]("info_gain") - math.log(2)) < 1e-4)
    assert(math.abs(g1.getAs[Double]("cond_entropy")) < 1e-9)
    assert(g1.getAs[Long]("n_values") == 2L)
    val g2 = got("f2")
    assert(math.abs(g2.getAs[Double]("info_gain")) < 1e-4)
    assert(math.abs(g2.getAs[Double]("entropy_y") - math.log(2)) < 1e-4)
  }

  test("decisionStump: picks the predictive split with pure leaves and perfect accuracy") {
    // y = 1 exactly when f1 <= 3; f2 is noise — the stump must pick
    // (f1, 3) with left_pred 1 / right_pred 0 and accuracy 1
    val rows = (0 until 200).map { i =>
      val f1 = (i % 10).toLong
      (if (f1 <= 3) 1L else 0L, f1, (i % 7).toLong)
    }
    val got = MlLite.decisionStump(rows.toDF("y", "f1", "f2"), "y", Seq("f1", "f2"))
      .collect().head
    assert(got.getAs[String]("feature") == "f1")
    assert(got.getAs[Long]("threshold") == 3L)
    assert(got.getAs[Long]("left_pred") == 1L)
    assert(got.getAs[Long]("right_pred") == 0L)
    assert(got.getAs[Double]("accuracy") == 1.0)
    assert(math.abs(got.getAs[Double]("info_gain") -
      (-(0.4 * math.log(0.4) + 0.6 * math.log(0.6)))) < 1e-4)
  }

  test("adaboostStumps: boosting beats the best single stump on a two-feature XOR-ish target") {
    // y = (f1 <= 4) with an exception pocket (f2 = 0 flips the left
    // side): the first stump leaves the pocket wrong, later rounds
    // upweight and fix it — a symmetric XOR would stall at eps = 0.5
    val rows = (0 until 400).map { i =>
      val f1 = (i % 10).toLong
      val f2 = ((i / 10) % 4).toLong
      val y = if (f1 <= 4) (if (f2 == 0) 0L else 1L) else 0L
      (y, f1, f2, 0L)
    }
    val got = MlLite.adaboostStumps(rows.toDF("y", "f1", "f2", "f3"),
      "y", Seq("f1", "f2", "f3"), rounds = 4)
      .orderBy("round").collect()
    assert(got.length == 4)
    got.foreach { r =>
      val eps = r.getAs[Double]("epsilon")
      assert(eps > 0.0 && eps < 0.5, s"round ${r.getAs[Int]("round")} eps $eps")
      assert(r.getAs[Double]("alpha") > 0.0)
    }
    val accs = got.map(_.getAs[Double]("ensemble_accuracy"))
    assert(accs.last >= accs.head, accs.mkString(","))
    assert(accs.last > 0.8)
    // determinism under re-partitioning
    val again = MlLite.adaboostStumps(
      rows.toDF("y", "f1", "f2", "f3").repartition(7),
      "y", Seq("f1", "f2", "f3"), rounds = 4).orderBy("round").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("ridgeTwoFeature: lambda shrinks slopes toward zero; lambda 0 equals OLS") {
    val rows = for (x1 <- 0 to 9; x2 <- 0 to 6)
      yield (2.0 + 3.0 * x1 - 0.5 * x2, x1.toDouble, x2.toDouble)
    val df = rows.toDF("y", "x1", "x2")
    val ols = MlLite.olsTwoFeature(df, "y", "x1", "x2").collect().head
    val zero = MlLite.ridgeTwoFeature(df, "y", "x1", "x2", lambda = 0.0)
      .collect().head
    assert(ols.getAs[Double]("beta1") == zero.getAs[Double]("beta1"))
    val heavy = MlLite.ridgeTwoFeature(df, "y", "x1", "x2", lambda = 1000.0)
      .collect().head
    assert(math.abs(heavy.getAs[Double]("beta1")) < math.abs(ols.getAs[Double]("beta1")))
    assert(math.abs(heavy.getAs[Double]("beta2")) < math.abs(ols.getAs[Double]("beta2")))
    assert(heavy.getAs[Double]("r2") < ols.getAs[Double]("r2") + 1e-12)
    assert(heavy.getAs[Double]("r2") >= 0.0)
  }

  // ── k-NN classification + SQ8 quantization ────────────────────────

  test("knnClassify: cluster structure classifies; vote ties break to the smaller label") {
    import graft.operators.Ann
    // two tight clusters on orthogonal axes; queries 0 and 1 sit in
    // cluster 0 and 1 respectively (labels follow clusters)
    val rows = Seq(
      (0L, Seq(1.0, 0.0, 0.05), 0),
      (1L, Seq(0.0, 1.0, 0.05), 1),
      (2L, Seq(0.9, 0.1, 0.0), 0),
      (3L, Seq(1.0, 0.05, 0.0), 0),
      (4L, Seq(0.95, 0.0, 0.1), 0),
      (5L, Seq(0.1, 0.9, 0.0), 1),
      (6L, Seq(0.05, 1.0, 0.0), 1),
      (7L, Seq(0.0, 0.95, 0.1), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Ann.knnClassify(rows, "vec_id", "embedding", "label",
      nQueries = 2, k = 3)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("pred_label"), r.getAs[Boolean]("is_correct"),
          r.getAs[Long]("votes"))).toMap
    assert(got(0L) == ((0L, true, 3L)))
    assert(got(1L) == ((1L, true, 3L)))
  }

  test("sq8ErrorPanel: exact-grid vector reconstructs losslessly; zero vector is safe") {
    import graft.operators.Ann
    // components are exact multiples of max/127 → codes reconstruct
    // exactly → mse 0, norm_ratio 1; the zero vector takes scale 0
    // and the code-0 guard
    val grid = Seq(0L -> Seq(127.0, 64.0, -127.0, 0.0),
      1L -> Seq(0.0, 0.0, 0.0, 0.0)).toDF("vec_id", "embedding")
    val got = Ann.sq8ErrorPanel(grid, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    val g0 = got(0L)
    assert(g0.getAs[Long]("dim") == 4L)
    assert(g0.getAs[Double]("scale") == 1.0)
    assert(g0.getAs[Double]("mse") == 0.0)
    assert(g0.getAs[Double]("max_abs_err") == 0.0)
    assert(g0.getAs[Double]("norm_ratio") == 1.0)
    val g1 = got(1L)
    assert(g1.getAs[Double]("scale") == 0.0)
    assert(g1.getAs[Double]("mse") == 0.0 && g1.getAs[Double]("norm_ratio") == 0.0)
  }

  test("sq8ErrorPanel: error bounded by half a quantization step") {
    import graft.operators.Ann
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 20L).map(i =>
      i -> Seq.fill(16)(rnd.nextDouble() * 2 - 1)).toDF("vec_id", "embedding")
    Ann.sq8ErrorPanel(vecs, "vec_id", "embedding").collect().foreach { r =>
      val halfStep = r.getAs[Double]("scale") / 2.0
      assert(r.getAs[Double]("max_abs_err") <= halfStep + 1e-12)
      assert(r.getAs[Double]("norm_ratio") > 0.95 && r.getAs[Double]("norm_ratio") < 1.05)
    }
  }

  // ── Mann–Whitney U ────────────────────────────────────────────────

  test("mannWhitney: hand-computed U on disjoint groups") {
    import graft.operators.AnalyticsPack
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b"))
      .toDF("v", "g")
    val r = AnalyticsPack.mannWhitney(df, "v", $"g" === "a").collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("u_a") == 0.0)   // every A below every B
    assert(r.getAs[Double]("u_b") == 4.0)   // U_a + U_b = n_a·n_b
    assert(r.getAs[Double]("r_a") == 3.0)   // ranks 1 + 2
    assert(r.getAs[Double]("z") < 0.0)
  }

  test("mannWhitney: cross-group tie produces the half-integer midrank U") {
    import graft.operators.AnalyticsPack
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b"))
      .toDF("v", "g")
    val r = AnalyticsPack.mannWhitney(df, "v", $"g" === "a").collect().head
    // sorted 1, 2, 2, 3 → midranks 1, 2.5, 2.5, 4; R_A = 3.5
    assert(r.getAs[Double]("r_a") == 3.5)
    assert(r.getAs[Double]("u_a") == 0.5)
    assert(r.getAs[Double]("u_b") == 3.5)
  }

  test("mannWhitney: identical distributions give symmetric U and z = 0") {
    import graft.operators.AnalyticsPack
    val df = (1 to 50).flatMap(i => Seq((i.toDouble, "a"), (i.toDouble, "b")))
      .toDF("v", "g")
    val r = AnalyticsPack.mannWhitney(df, "v", $"g" === "a").collect().head
    assert(r.getAs[Double]("u_a") == r.getAs[Double]("u_b"))
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("logisticCalibration: bins partition the rows and mean_p sits inside each bin") {
    val rows = (0 until 400).map { i =>
      val x1 = (i % 20) / 20.0
      val y = if (i % 3 == 0) 1.0 else 0.0
      (y, math.floor(x1 * 1e6) / 1e6, 0.25, 0.5)
    }
    val got = MlLite.logisticCalibration(rows.toDF("y", "x1", "x2", "x3"),
      "y", Seq("x1", "x2", "x3"), lr = 0.5, rounds = 4, bins = 10).collect()
    assert(got.map(_.getAs[Long]("n_rows")).sum == 400L)
    got.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val mp = r.getAs[Double]("mean_p")
      assert(mp >= bin / 10.0 - 1e-9 && mp <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin mean_p $mp outside its bounds")
      val rate = r.getAs[Double]("pos_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  // ── count-min sketch ──────────────────────────────────────────────

  private def tokenFrame(rows: Seq[(String, Int)]) =
    rows.flatMap { case (tok, n) => Seq.fill(n)(tok) }.toDF("item")

  test("countMinTopN: estimate never undercounts and a wide sketch is exact") {
    val items = tokenFrame(Seq("a" -> 50, "b" -> 30, "c" -> 10, "d" -> 5, "e" -> 1))
    val got = Profiling.countMinTopN(items, "item", d = 4, w = 4096, topN = 10)
      .collect().map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"))).toMap
    assert(got("a") == ((50L, 50L))) // w >> items: no collisions
    assert(got("e") == ((1L, 1L)))
    got.values.foreach { case (exact, est) => assert(est >= exact) }
  }

  test("countMinTopN: collisions only inflate; rank order follows exact counts") {
    val items = tokenFrame((1 to 200).map(i => s"tok$i" -> i))
    val got = Profiling.countMinTopN(items, "item", d = 3, w = 16, topN = 5)
      .orderBy("rank").collect()
    assert(got.length == 5)
    assert(got.map(_.getAs[String]("item")).toSeq ==
      Seq("tok200", "tok199", "tok198", "tok197", "tok196"))
    got.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L)
      assert(r.getAs[Long]("n_est") >=  r.getAs[Long]("n_exact"))
    }
  }

  // ── feature hashing ───────────────────────────────────────────────

  test("featureHash: bucket fold conserves token mass and L2-normalizes") {
    val docs = Seq(
      (1L, "a b c a b a"),
      (2L, "x y"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = CorpusQc.featureHash(docs, "doc_id", "text", dim = 64)
    val byDoc = got.groupBy("doc_id")
      .agg(sum($"tf").as("mass"), sum($"weight" * $"weight").as("l2sq"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("mass"), r.getAs[Double]("l2sq"))).toMap
    assert(byDoc(1L)._1 == 6L)
    assert(byDoc(2L)._1 == 2L)
    assert(byDoc(3L)._1 == 1L)
    // quantized weights: ‖w‖² lands within the 1e-6-grid slack of 1
    byDoc.values.foreach { case (_, l2) => assert(math.abs(l2 - 1.0) < 1e-4) }
    got.collect().foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b < 64L)
    }
  }

  test("featureHash: same token always lands in the same bucket across docs") {
    val docs = Seq((1L, "shared unique1"), (2L, "shared unique2")).toDF("doc_id", "text")
    val got = CorpusQc.featureHash(docs, "doc_id", "text", dim = 32).collect()
    // 'shared' hashes identically for both docs → bucket sets intersect
    val b1 = got.filter(_.getAs[Long]("doc_id") == 1L).map(_.getAs[Long]("bucket")).toSet
    val b2 = got.filter(_.getAs[Long]("doc_id") == 2L).map(_.getAs[Long]("bucket")).toSet
    assert((b1 intersect b2).nonEmpty)
  }

  test("filteredTopK: predicate cuts the corpus before ranking; full k survives") {
    import graft.operators.Ann
    // 1 query (vec 0) + 6 corpus vectors; only even labels rankable.
    // The nearest odd-label vector must NOT appear even though it
    // would win an unfiltered ranking.
    val rows = Seq(
      (0L, Seq(1.0, 0.0), 0),
      (1L, Seq(0.99, 0.1), 1),   // closest — but odd label
      (2L, Seq(0.8, 0.3), 2),
      (3L, Seq(0.5, 0.6), 4),
      (4L, Seq(0.0, 1.0), 6),
      (5L, Seq(-1.0, 0.0), 8)
    ).toDF("vec_id", "embedding", "label")
    val got = Ann.filteredTopK(rows, "vec_id", "embedding",
      $"label" % 2 === 0, nQueries = 1, k = 3)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L, 4L))
  }

  test("sentenceStats: exact counts on a hand fixture") {
    import graft.operators.CorpusQc
    val docs = Seq(
      (1L, "One two three. Four five! Six?"),
      (2L, "Single sentence only")
    ).toDF("doc_id", "text")
    val got = CorpusQc.sentenceStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Long]("n_sentences") == 3L)
    assert(got(1L).getAs[Double]("avg_sentence_tokens") == 6.0 / 3)
    assert(got(1L).getAs[Int]("max_sentence_chars") == 13)
    assert(got(2L).getAs[Long]("n_sentences") == 1L)
    assert(got(2L).getAs[Double]("avg_sentence_tokens") == 3.0)
  }

  test("reciprocity: two-way pair counts once each way, one-way edges dilute") {
    import graft.operators.Graph
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"), ("d", "d"))
      .toDF("s", "t")
    val r = Graph.reciprocity(edges, "s", "t").collect().head
    assert(r.getAs[Long]("n_edges") == 4L)        // self-loop dropped
    assert(r.getAs[Long]("n_reciprocated") == 2L) // a→b and b→a
    assert(r.getAs[Double]("reciprocity") == 0.5)
  }

  // ── RRF fusion + incremental join view ────────────────────────────

  test("rrfFuse: shared docs outrank single-list docs; missing list contributes zero") {
    import graft.operators.CorpusQc
    val lex = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("doc_id", "rank")
    val sem = Seq((11L, 1), (13L, 2)).toDF("doc_id", "rank")
    val got = CorpusQc.rrfFuse(lex, sem, "doc_id", kConst = 60, topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("rank"), r.getAs[Double]("rrf_score"))).toMap
    // 11 appears in both lists → rank 1 overall
    assert(got(11L)._1 == 1)
    assert(got(11L)._2 == 1.0 / 62 + 1.0 / 61)
    assert(got(10L)._2 == 1.0 / 61)
    assert(got(13L)._2 == 1.0 / 62)
    assert(got.size == 4)
  }

  test("maintainJoinView: incremental result equals the full recompute under both-side deltas") {
    import graft.operators.Merge
    val aOld = Seq((1L, 100L, "o1"), (2L, 200L, "o2"), (3L, 300L, "o3"))
      .toDF("pk", "jk", "payload")
    val aDelta = Seq((4L, 100L, "o4"), (2L, 200L, "o2v2")).toDF("pk", "jk", "payload")
    val bOld = Seq((100L, "dA"), (200L, "dB"), (300L, "dC")).toDF("jk", "dim")
    val bDelta = Seq((300L, "dC2")).toDF("jk", "dim")
    val view = aOld.join(bOld, Seq("jk")).select($"jk", $"pk", $"payload", $"dim")
    val got = Merge.maintainJoinView(view, aOld, aDelta, Seq("pk"),
      bOld, bDelta, "jk")
      .collect().map(r => r.getAs[Long]("pk") ->
        (r.getAs[String]("payload"), r.getAs[String]("dim"))).toMap
    // full recompute truth: upserted A {1,3,4 old payloads; 2 → o2v2}
    // joined to upserted B {100 dA, 200 dB, 300 dC2}
    assert(got == Map(
      1L -> (("o1", "dA")), 2L -> (("o2v2", "dB")),
      3L -> (("o3", "dC2")), 4L -> (("o4", "dA"))))
  }

  test("maintainJoinView: untouched partitions are carried, not recomputed") {
    import graft.operators.Merge
    val aOld = Seq((1L, 100L, "o1"), (2L, 200L, "o2")).toDF("pk", "jk", "payload")
    val aDelta = Seq((3L, 200L, "o3")).toDF("pk", "jk", "payload")
    val bOld = Seq((100L, "dA"), (200L, "dB")).toDF("jk", "dim")
    val bDelta = spark.emptyDataFrame.select(lit(0L).as("jk"), lit("x").as("dim")).limit(0)
    // poison the stored view's untouched row: if the operator
    // recomputed it, the poison would be overwritten
    val view = Seq((100L, 1L, "o1", "POISON"), (200L, 2L, "o2", "dB"))
      .toDF("jk", "pk", "payload", "dim")
    val got = Merge.maintainJoinView(view, aOld, aDelta, Seq("pk"),
      bOld, bDelta, "jk")
      .collect().map(r => r.getAs[Long]("pk") -> r.getAs[String]("dim")).toMap
    assert(got(1L) == "POISON") // carried verbatim — proof of no recompute
    assert(got(2L) == "dB" && got(3L) == "dB")
  }

  test("stickinessPanel: hand-computed DAU/WAU/MAU on a tiny activity grid") {
    import java.sql.Timestamp
    import graft.operators.AnalyticsPack
    // u1 active days 1 and 10; u2 active day 10 only
    val rows = Seq(
      (Timestamp.valueOf("2024-03-01 10:00:00"), 1L),
      (Timestamp.valueOf("2024-03-10 10:00:00"), 1L),
      (Timestamp.valueOf("2024-03-10 11:00:00"), 2L)
    ).toDF("ts", "user_id")
    val got = AnalyticsPack.stickinessPanel(rows)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    val d1 = got("2024-03-01")
    assert(d1.getAs[Long]("dau") == 1L && d1.getAs[Long]("wau") == 1L &&
      d1.getAs[Long]("mau") == 1L && d1.getAs[Double]("stickiness") == 1.0)
    val d10 = got("2024-03-10")
    assert(d10.getAs[Long]("dau") == 2L)
    assert(d10.getAs[Long]("wau") == 2L)   // only day-10 activity in window
    assert(d10.getAs[Long]("mau") == 2L)   // u1's day-1 visit is within 28d
    assert(d10.getAs[Double]("stickiness") == 1.0)
  }

  test("kAnonymity: small combos flagged, single-sensitive combos not l-diverse") {
    import graft.operators.Audit
    val rows = Seq(
      // combo (1,1): 5 rows, 2 sensitive values -> safe both ways
      ("a", 1L, 1L), ("b", 1L, 1L), ("a", 1L, 1L), ("a", 1L, 1L), ("b", 1L, 1L),
      // combo (2,2): 2 rows -> not k-anonymous at k=3; single value -> not l-diverse
      ("x", 2L, 2L), ("x", 2L, 2L)
    ).toDF("sens", "q1", "q2")
    val got = Audit.kAnonymity(rows, Seq("q1", "q2"), "sens", k = 3, l = 2)
      .collect().map(r => (r.getAs[Long]("q1"), r.getAs[Long]("q2")) -> r).toMap
    val safe = got((1L, 1L))
    assert(safe.getAs[Long]("n_rows") == 5L && safe.getAs[Boolean]("k_anonymous"))
    assert(safe.getAs[Long]("n_sensitive") == 2L && safe.getAs[Boolean]("l_diverse"))
    val leak = got((2L, 2L))
    assert(!leak.getAs[Boolean]("k_anonymous") && !leak.getAs[Boolean]("l_diverse"))
  }

  test("lDiversityEntropy: balanced mix clears ln(l), skewed mix fails where distinct-l passes") {
    import graft.operators.Audit
    val rows =
      // combo (1,1): uniform over 3 values -> entropy >= ln 3, both verdicts true
      Seq.fill(4)(Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 1L, 1L))).flatten ++
      // combo (2,2): 98% one value with trace b/c -> distinct-l TRUE
      // (3 values present) but entropy ~0.11 << ln 3 -> entropy-l FALSE:
      // exactly the over-promise the entropy tier exists to catch
      (Seq.fill(98)(("a", 2L, 2L)) ++ Seq(("b", 2L, 2L), ("c", 2L, 2L)))
    val got = Audit.lDiversityEntropy(rows.toDF("sens", "q1", "q2"),
        Seq("q1", "q2"), "sens", l = 3)
      .collect().map(r => (r.getAs[Long]("q1"), r.getAs[Long]("q2")) -> r).toMap
    val uni = got((1L, 1L))
    assert(uni.getAs[Long]("n_rows") == 12L && uni.getAs[Long]("n_sensitive") == 3L)
    assert(uni.getAs[Boolean]("distinct_l_diverse"))
    assert(uni.getAs[Boolean]("entropy_l_diverse"))
    assert(math.abs(uni.getAs[Double]("entropy") - math.log(3.0)) < 1e-5)
    val skew = got((2L, 2L))
    assert(skew.getAs[Boolean]("distinct_l_diverse"))   // count says fine
    assert(!skew.getAs[Boolean]("entropy_l_diverse"))   // information says leak
    assert(skew.getAs[Double]("entropy") < 0.2)
  }

  test("vif: near-collinear pair inflates, independent feature stays near 1") {
    import graft.operators.MlLite
    val rnd = new scala.util.Random(5)
    // x2 tracks x1 almost exactly; x3 is independent noise
    val rows = (1 to 300).map { _ =>
      val a = rnd.nextDouble()
      (a, a + rnd.nextDouble() * 0.01, rnd.nextDouble())
    }
    val got = MlLite.vif(rows.toDF("x1", "x2", "x3"), Seq("x1", "x2", "x3"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(got.keySet == Set("x1", "x2", "x3"))
    assert(got.values.forall(_.getAs[Long]("n") == 300L))
    // collinear pair: both heavily inflated, and symmetrically so
    assert(got("x1").getAs[Double]("vif") > 10.0)
    assert(got("x2").getAs[Double]("vif") > 10.0)
    // the independent feature carries no shared variation
    assert(got("x3").getAs[Double]("vif") < 2.0)
    assert(got("x3").getAs[Double]("r2_others") < 0.5)
    // a CONSTANT feature has undefined correlations -> NULL row, and
    // the remaining features' R2 degrade to NULL with it, never Inf
    val flat = (1 to 50).map(i => (i.toDouble, 1.0, 51.0 - i))
    val f = MlLite.vif(flat.toDF("x1", "x2", "x3"), Seq("x1", "x2", "x3"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(f("x2").isNullAt(f("x2").fieldIndex("r2_others")))
    assert(f("x2").isNullAt(f("x2").fieldIndex("vif")))
  }

  test("permutationImportance: the load-bearing feature collapses AUC, a constant moves nothing") {
    import graft.operators.MlLite
    // x3 separates the label perfectly (any positive weight ranks it
    // right -> model AUC exactly 1); x1 is label-free noise; x2 is
    // CONSTANT, so its permutation is an identity
    val rows = (1 to 400).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (i.toLong, y, (i * 37 % 100) / 100.0, 0.5, if (y == 1.0) 0.9 else 0.1)
    }
    val got = MlLite.permutationImportance(
        rows.toDF("id", "y", "x1", "x2", "x3"),
        "id", "y", Seq("x1", "x2", "x3"), lr = 0.5, rounds = 6)
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(got.keySet == Set("x1", "x2", "x3"))
    assert(got("x3").getAs[Double]("auc_model") == 1.0)
    // destroying the separator costs ~half the AUC
    assert(got("x3").getAs[Double]("importance") > 0.3)
    // noise barely matters; a constant column's permutation is a no-op
    assert(math.abs(got("x1").getAs[Double]("importance")) < 0.1)
    assert(got("x2").getAs[Double]("importance") == 0.0)
    assert(got("x2").getAs[Double]("auc_permuted") == 1.0)

    // small-n clamp: at n=10 the effective bucket count is n/2=5, so
    // buckets hold ~2 rows and the rotation really moves values — the
    // pre-clamp 64-bucket layout made every bucket a singleton and
    // the "permutation" an identity (importance pinned to 0 exactly,
    // diluting the measurement the docstring promises)
    val tiny = (1 to 10).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (i.toLong, y, (i * 37 % 100) / 100.0, 0.5, if (y == 1.0) 0.9 else 0.1)
    }
    val tinyGot = MlLite.permutationImportance(
        tiny.toDF("id", "y", "x1", "x2", "x3"),
        "id", "y", Seq("x1", "x2", "x3"), lr = 0.5, rounds = 6)
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(tinyGot("x3").getAs[Double]("auc_model") == 1.0)
    assert(tinyGot("x3").getAs[Double]("importance") > 0.0,
      "separator permutation degenerated to identity at small n")
  }

  test("costCurve: higher FN cost pushes the optimal threshold down (catch more positives)") {
    import org.apache.spark.sql.functions.col
    // separable-ish data the logistic fit orders correctly
    val rows = (1 to 60).map { i =>
      val pos = i % 3 == 0
      (if (pos) 1.0 else 0.0,
        if (pos) 2.0 + (i % 5) * 0.1 else -1.0 - (i % 5) * 0.1, 0.5, 1.0)
    }
    val df = rows.toDF("y", "x1", "x2", "x3")
    val got = MlLite.costCurve(df, "y", Seq("x1", "x2", "x3"),
      lr = 0.5, rounds = 6, thresholds = Seq(0.2, 0.5, 0.8),
      fnCostRatios = Seq(1.0, 10.0)).collect()
    assert(got.length == 6) // 3 thresholds x 2 ratios
    // per ratio exactly the min rows flag optimal and cost = fp + r*fn
    got.foreach { r =>
      val want = r.getAs[Long]("fp").toDouble +
        r.getAs[Double]("fn_cost_ratio") * r.getAs[Long]("fn").toDouble
      assert(r.getAs[Double]("expected_cost") == want)
    }
    val best = got.filter(_.getAs[Boolean]("is_optimal"))
      .map(r => r.getAs[Double]("fn_cost_ratio") -> r.getAs[Double]("threshold"))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    // at FN-cost 10 the chosen threshold can never sit ABOVE the
    // FN-cost-1 choice (misses get 10x dearer)
    assert(best(10.0) <= best(1.0))
  }

  test("ksSeparation: perfect split is 1 at the class boundary; identical classes are 0") {
    import org.apache.spark.sql.functions.col
    // negatives at 1..3, positives at 10..12: full gap closes at 3
    val df = (Seq(1.0, 2.0, 3.0).map((_, false)) ++
      Seq(10.0, 11.0, 12.0).map((_, true))).toDF("s", "y")
    val r = MlLite.ksSeparation(df, "s", col("y")).collect().head
    assert(r.getAs[Double]("ks_stat") == 1.0)
    assert(r.getAs[Double]("best_threshold") == 3.0)
    assert(r.getAs[Long]("n_neg") == 3L && r.getAs[Long]("n_pos") == 3L)
    // label-independent scores: CDFs coincide at every distinct value
    val same = Seq((1.0, true), (1.0, false), (2.0, true), (2.0, false))
      .toDF("s", "y")
    assert(MlLite.ksSeparation(same, "s", col("y"))
      .collect().head.getAs[Double]("ks_stat") == 0.0)
  }

  test("dpNoisyMean: clamp bounds influence, draws replay, denominator floors at 1") {
    import graft.operators.{Audit, Sampling}
    import org.apache.spark.sql.functions.{col, lit}
    // group A: values 10, 20, 1e9 (clamped to 100) — clamped_sum = 130
    val df = Seq(("A", 10.0), ("A", 20.0), ("A", 1e9)).toDF("g", "v")
    val r = Audit.dpNoisyMean(df, Seq("g"), "v", lo = 0.0, hi = 100.0,
      epsilon = 1.0).collect().head
    assert(r.getAs[Double]("clamped_sum") == 130.0)
    // replay the sum draw by hand: u from md5("A|sum"), b = 100/(ε/2)
    val u = (df.sparkSession.range(1).select(
      (Sampling.md5Long32(Seq(lit("A"), lit("sum"))).cast("double") + lit(0.5))
        / lit(4294967296.0)).head.getDouble(0))
    val lnq = math.floor(math.log(1.0 - 2.0 * math.abs(u - 0.5)) * 1e6) / 1e6
    val expected = math.floor(-200.0 * (if (u < 0.5) -1.0 else 1.0) * lnq * 1e6) / 1e6
    assert(r.getAs[Double]("noise_sum") == expected)
    // released mean = (clamped_sum + noise_sum) / max(1, n + noise_cnt)
    val den = math.max(1.0, 3.0 + r.getAs[Double]("noise_cnt"))
    assert(math.abs(r.getAs[Double]("released_mean")
      - (130.0 + r.getAs[Double]("noise_sum")) / den) < 1e-12)
    // a heavily negative count draw cannot flip the sign: denominator >= 1
    assert(den >= 1.0)
  }

  test("tCloseness: skewed-mix combo exceeds t even when l-diverse; balanced combo passes") {
    import graft.operators.Audit
    // global mix: a=5, b=5 -> q = (0.5, 0.5)
    // combo 1: 4a+1b (skewed: tv = ½(|.8-.5|+|.2-.5|) = 0.3)
    // combo 2: 1a+4b (mirror, 0.3); both l-diverse yet NOT 0.2-close
    val rows = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L), ("a", 1L), ("b", 1L),
      ("a", 2L), ("b", 2L), ("b", 2L), ("b", 2L), ("b", 2L)
    ).toDF("sens", "q1")
    val got = Audit.tCloseness(rows, Seq("q1"), "sens", t = 0.2)
      .collect().map(r => r.getAs[Long]("q1") -> r).toMap
    assert(math.abs(got(1L).getAs[Double]("tv_distance") - 0.3) < 1e-6)
    assert(!got(1L).getAs[Boolean]("t_close"))
    assert(!got(2L).getAs[Boolean]("t_close"))
    // a perfectly representative combo is 0-distant: absent values
    // pay |0 - q| (drop combo 2 -> combo 1 IS the population)
    val bal = Seq(("a", 1L), ("b", 1L)).toDF("sens", "q1")
    val b = Audit.tCloseness(bal, Seq("q1"), "sens", t = 0.2).collect().head
    assert(b.getAs[Double]("tv_distance") == 0.0 && b.getAs[Boolean]("t_close"))
    // one-value population vs one-value combo: distance 0; a combo
    // missing a global value pays its mass — construct 3-value global
    val tri = Seq(("a", 1L), ("b", 1L), ("c", 2L)).toDF("sens", "q1")
    val tv = Audit.tCloseness(tri, Seq("q1"), "sens", t = 0.2)
      .collect().map(r => r.getAs[Long]("q1") -> r.getAs[Double]("tv_distance")).toMap
    // combo 1: p=(.5,.5,0) vs q=(1/3,1/3,1/3) -> tv = ½(1/6+1/6+1/3) = 1/3
    assert(math.abs(tv(1L) - 1.0 / 3) < 1e-5)
  }

  test("targetEncode: own label excluded, singleton encodes as the prior") {
    val df = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0))
      .toDF("id", "cat", "y")
    val got = MlLite.targetEncode(df, "id", "cat", "y", smoothing = 2.0)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // prior = 60/3 = 20
    assert(got(1L).getAs[Double]("prior") == 20.0)
    // LOO for (A, 10): (30-10 + 2*20)/(1+2) = 20 — its own 10 excluded
    assert(got(1L).getAs[Double]("encoded") == 20.0)
    // LOO for (A, 20): (30-20 + 40)/3
    assert(math.abs(got(2L).getAs[Double]("encoded") - 50.0 / 3) < 1e-12)
    // singleton B: (0 + 2*20)/(0+2) = the prior exactly
    assert(got(3L).getAs[Double]("encoded") == 20.0)
    assert(got(3L).getAs[Long]("n_cat") == 1L)
  }

  test("gbtStumpsRegression: residual recurrence replayed by hand; mse decays geometrically") {
    val df = Seq((10.0, 0L), (10.0, 0L), (20.0, 1L), (20.0, 1L))
      .toDF("y", "x")
    val got = MlLite.gbtStumpsRegression(df, "y", Seq("x"), rounds = 3, eta = 0.25)
      .orderBy("round").collect()
    assert(got.length == 3)
    // f0 = 15; round 1 residual sums are -10/+10 over 2 rows each
    val r1 = got(0)
    assert(r1.getAs[String]("feature") == "x" && r1.getAs[Long]("threshold") == 0L)
    assert(r1.getAs[Double]("gamma_left") == -5.0)
    assert(r1.getAs[Double]("gamma_right") == 5.0)
    // after the eta=1/4 update F = (13.75, 16.25): mse = 3.75^2
    assert(math.abs(r1.getAs[Double]("train_mse") - 14.0625) < 1e-9)
    // residuals shrink by (1 - eta) per round -> gamma and mse follow
    val r2 = got(1)
    assert(r2.getAs[Double]("gamma_left") == -3.75)
    // mse terms floor onto the 1e-6 grid -> tolerance one grid step
    assert(math.abs(r2.getAs[Double]("train_mse") - 25.0 * math.pow(0.5625, 2)) < 1e-6)
    assert(got.map(_.getAs[Double]("train_mse")).sliding(2)
      .forall(p => p(1) < p(0)))
  }

  test("gbtStumpsRegression: non-dyadic eta is rejected") {
    val df = Seq((1.0, 0L), (2.0, 1L)).toDF("y", "x")
    intercept[IllegalArgumentException] {
      MlLite.gbtStumpsRegression(df, "y", Seq("x"), rounds = 1, eta = 0.3)
    }
  }

  test("dpNoisyCounts: noise replays the md5 Laplace draw exactly; clamp holds") {
    import graft.operators.Audit
    val rows = (1 to 7).map(i => ("g1", 1L)) ++ Seq(("g2", 2L))
    val df = rows.toDF("pad", "grp")
    val got = Audit.dpNoisyCounts(df.select(col("grp")), Seq("grp"),
        epsilon = 0.5)
      .collect().map(r => r.getAs[Long]("grp") -> r).toMap
    // replay the draw driver-side: u from the first 8 md5 hex chars
    def noiseOf(key: String): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      val lnq = math.floor(math.log(1.0 - 2.0 * math.abs(u - 0.5)) * 1e6) / 1e6
      val s = if (u < 0.5) -1.0 else 1.0
      math.floor(-2.0 * s * lnq * 1e6) / 1e6
    }
    val g1 = got(1L); val g2 = got(2L)
    assert(g1.getAs[Long]("n_rows") == 7L && g2.getAs[Long]("n_rows") == 1L)
    assert(g1.getAs[Double]("noise") == noiseOf("1"))
    assert(g2.getAs[Double]("noise") == noiseOf("2"))
    assert(g1.getAs[Double]("noisy_count") == 7.0 + noiseOf("1"))
    // released counts are floor-clamped at zero
    assert(got.values.forall(_.getAs[Long]("released_count") >= 0L))
    assert(g1.getAs[Long]("released_count") ==
      math.max(0L, math.floor(7.0 + noiseOf("1")).toLong))
    // a second evaluation is bit-identical (pure function of the key)
    val again = Audit.dpNoisyCounts(df.select(col("grp")), Seq("grp"),
        epsilon = 0.5)
      .collect().map(r => r.getAs[Long]("grp") -> r.getAs[Double]("noise")).toMap
    assert(again(1L) == g1.getAs[Double]("noise"))
    // a tighter privacy budget (smaller epsilon) scales noise up
    val loose = Audit.dpNoisyCounts(df.select(col("grp")), Seq("grp"),
        epsilon = 2.0)
      .collect().map(r => r.getAs[Long]("grp") -> r.getAs[Double]("noise")).toMap
    assert(math.abs(loose(1L)) <= math.abs(g1.getAs[Double]("noise")))
  }

  // ── hotspot clustering ────────────────────────────────────────────

  test("hotspotClusters: adjacent dense cells merge, isolated dense cell stands alone, sparse cells drop") {
    // cell size 10: (0,0) and (1,1) dense and diagonal-adjacent →
    // one region; (5,5) dense but isolated → its own region; (9,9)
    // has a single point → not dense, excluded entirely.
    def pts(cx: Int, cy: Int, n: Int) =
      (1 to n).map(i => (cx * 10.0 + 1.0 + (i % 3), cy * 10.0 + 2.0, 1.0))
    val df = (pts(0, 0, 3) ++ pts(1, 1, 2) ++ pts(5, 5, 4) ++ pts(9, 9, 1))
      .toDF("x", "y", "w")
    val got = Serving.hotspotClusters(df, "x", "y", cell = 10.0,
      weightCol = "w", minPts = 2).collect()
    assert(got.length == 2)
    val merged = got.find(_.getAs[Long]("n_cells") == 2L).get
    assert(merged.getAs[Long]("n_points") == 5L)
    assert(merged.getAs[Long]("cell_x_min") == 0L)
    assert(merged.getAs[Long]("cell_x_max") == 1L)
    val iso = got.find(_.getAs[Long]("n_cells") == 1L).get
    assert(iso.getAs[Long]("n_points") == 4L)
    assert(iso.getAs[Long]("cell_x_min") == 5L)
  }

  test("hotspotClusters: a snake of adjacent dense cells is one region with the min packed id") {
    val df = (0 to 6).flatMap(i =>
      Seq((i * 10.0 + 1, 1.0, 1.0), (i * 10.0 + 2, 2.0, 1.0)))
      .toDF("x", "y", "w")
    val got = Serving.hotspotClusters(df, "x", "y", cell = 10.0,
      weightCol = "w", minPts = 2).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_cells") == 7L)
    assert(got.head.getAs[Long]("n_points") == 14L)
    // min packed id of cell (0,0): (0+1e6)·2e6 + (0+1e6)
    assert(got.head.getAs[Long]("cluster_id") == 1000000L * 2000000L + 1000000L)
  }

  test("isotonicCalibration: violations pool to the L2-closest monotone fit") {
    import graft.operators.MlLite
    import org.apache.spark.sql.functions.col
    // raw rates 0.2, 0.6, 0.4 with equal bin mass: bins 1-2 pool to 0.5
    val rows =
      (1 to 5).map(i => (0, i <= 1)) ++
      (1 to 5).map(i => (1, i <= 3)) ++
      (1 to 5).map(i => (2, i <= 2))
    val df = rows.toDF("b", "lab")
    val got = MlLite.isotonicCalibration(df, col("b"), col("lab"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("rate_raw"), r.getAs[Double]("rate_isotonic"))).toMap
    assert(got(0L) == ((0.2, 0.2)))
    assert(got(1L) == ((0.6, 0.5)))
    assert(got(2L) == ((0.4, 0.5)))
    // already-monotone input passes through unchanged
    val mono = ((1 to 4).map(i => (0, i <= 1)) ++ (1 to 4).map(i => (1, i <= 3)))
      .toDF("b", "lab")
    val g2 = MlLite.isotonicCalibration(mono, col("b"), col("lab"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("rate_isotonic")).toMap
    assert(g2 == Map(0L -> 0.25, 1L -> 0.75))
  }

  test("generalizeRelease: picks the first k-anonymous level, falls back to suppression") {
    import graft.operators.Audit
    import org.apache.spark.sql.functions.{col, lit}
    // level 0 has a singleton class -> coarsen to '*' and keep ALL rows
    val df1 = (Seq.fill(10)(1) :+ 2).toDF("x")
    val lad2 = Seq(Seq(col("x").cast("string")), Seq(lit("*")))
    val r1 = Audit.generalizeRelease(df1, lad2, Seq("x"), k = 5).collect()
    assert(r1.length == 11)
    assert(r1.forall(r => r.getString(0) == "*" && r.getAs[Int]("gen_level") == 1))
    // every level-0 class >= k -> finest level survives intact
    val df2 = (Seq.fill(10)(1) ++ Seq.fill(6)(2)).toDF("x")
    val r2 = Audit.generalizeRelease(df2, lad2, Seq("x"), k = 5).collect()
    assert(r2.length == 16 && r2.forall(_.getAs[Int]("gen_level") == 0))
    assert(r2.count(_.getString(0) == "2") == 6)
    // single-level ladder that cannot reach k: residual suppression
    val df3 = (Seq.fill(6)(1) ++ Seq.fill(2)(2)).toDF("x")
    val r3 = Audit.generalizeRelease(df3,
      Seq(Seq(col("x").cast("string"))), Seq("x"), k = 5).collect()
    assert(r3.length == 6 && r3.forall(_.getString(0) == "1"))
  }

  test("averagePrecision: perfect separation is 1; interleaved case hand-computed") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("score", "pos")
    val p = MlLite.averagePrecision(perfect, "score", col("pos")).head
    assert(p.getAs[Long]("n_pos") == 2L && p.getAs[Long]("n_neg") == 2L)
    assert(p.getAs[Double]("avg_precision") == 1.0)
    assert(p.getAs[Double]("prevalence") == 0.5)
    // pos {3,1}, neg {2}: blocks desc -> prec 1 at s=3, 2/3 at s=1;
    // AP = (1 + grid6(2/3)) / 2
    val mixed = Seq((3.0, true), (2.0, false), (1.0, true)).toDF("score", "pos")
    val m = MlLite.averagePrecision(mixed, "score", col("pos")).head
    val want = (1.0 + math.floor(2.0 / 3.0 * 1e6) / 1e6) / 2.0
    assert(math.abs(m.getAs[Double]("avg_precision") - want) < 1e-12)
  }

  test("aucRoc: midrank ties as half-credit, perfect and inverted separation") {
    import org.apache.spark.sql.functions.col
    // pos scores {3,5}, neg {1,3}: pair credit (3>1)+½(3=3)+(5>1)+(5>3)
    // = 3.5 of 4 → AUC 0.875
    val df = Seq((3.0, true), (5.0, true), (1.0, false), (3.0, false))
      .toDF("s", "y")
    val r = MlLite.aucRoc(df, "s", col("y")).collect().head
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(math.abs(r.getAs[Double]("auc") - 0.875) < 1e-12)
    assert(math.abs(r.getAs[Double]("gini") - 0.75) < 1e-12)
    // perfect separation → 1; inverted labels → 0
    val sep = Seq((10.0, true), (11.0, true), (1.0, false)).toDF("s", "y")
    assert(MlLite.aucRoc(sep, "s", col("y")).collect().head.getAs[Double]("auc") == 1.0)
    assert(MlLite.aucRoc(sep, "s", !col("y")).collect().head.getAs[Double]("auc") == 0.0)
    // one empty class → NULL, never a division error
    val onec = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    val o = MlLite.aucRoc(onec, "s", col("y")).collect().head
    assert(o.isNullAt(o.fieldIndex("auc")))
  }

  test("baselineScorePanel: collapsed sums equal the row-level proper scores") {
    import org.apache.spark.sql.functions.col
    // group A: 4 rows 2 pos (p = 2.5/5 = 0.5); group B: 2 rows 0 pos
    // (p = 0.5/3). Row-level Brier/log-loss computed sequentially.
    val df = Seq(("A", true), ("A", true), ("A", false), ("A", false),
      ("B", false), ("B", false)).toDF("g", "y")
    val r = MlLite.baselineScorePanel(df, col("y"), col("g")).collect().head
    val pA = 2.5 / 5.0; val pB = 0.5 / 3.0
    val rows = Seq((pA, 1.0), (pA, 1.0), (pA, 0.0), (pA, 0.0),
      (pB, 0.0), (pB, 0.0))
    val brier = rows.map { case (p, y) => (p - y) * (p - y) }.sum / 6
    val ll = rows.map { case (p, y) =>
      -(y * math.log(p) + (1 - y) * math.log(1 - p)) }.sum / 6
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("k_groups") == 2L)
    assert(math.abs(r.getAs[Double]("base_rate") - 2.0 / 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("brier") - brier) < 1e-5)
    assert(math.abs(r.getAs[Double]("log_loss") - ll) < 1e-5)
    // a pure group stays finite through the Laplace smoothing
    assert(!r.isNullAt(r.fieldIndex("log_loss")))
  }

  test("learningCurve: nested fractions grow the train set; separable classes hit 1.0 at full data") {
    import org.apache.spark.sql.functions.col
    // two classes with disjoint vocabularies — NB trained on ANY
    // non-empty slice of both classes classifies the held-out docs
    val docs = (1L to 60L).map(i =>
      if (i % 2 == 0) (i, "aa bb aa bb", "A") else (i, "xx yy xx yy", "B"))
      .toDF("doc_id", "text", "lang")
    val got = MlLite.learningCurve(docs, "doc_id", "text", "lang",
        testFrac = 0.2, fracs = Seq(0.25, 1.0))
      .orderBy("train_frac").collect()
    assert(got.length == 2)
    val (q, full) = (got(0), got(1))
    assert(q.getAs[Double]("train_frac") == 0.25)
    assert(full.getAs[Double]("train_frac") == 1.0)
    // nested thresholds: the quarter slice is a subset of the pool
    assert(q.getAs[Long]("n_train") < full.getAs[Long]("n_train"))
    // test slice is SHARED across fractions
    assert(q.getAs[Long]("n_test") == full.getAs[Long]("n_test"))
    assert(full.getAs[Long]("n_test") > 0)
    // disjoint vocab: full-pool training classifies every test doc
    assert(full.getAs[Double]("accuracy") == 1.0)
    // deterministic under repartition
    val again = MlLite.learningCurve(docs.repartition(5), "doc_id", "text",
        "lang", testFrac = 0.2, fracs = Seq(0.25, 1.0))
      .orderBy("train_frac").collect()
    assert(again.map(_.getAs[Long]("n_correct")).toSeq ==
      got.map(_.getAs[Long]("n_correct")).toSeq)
  }

  test("cohensKappa: hand-computed 2x2 kappa; perfect agreement is 1") {
    import org.apache.spark.sql.functions.col
    // confusion: (x,x)=4 (y,y)=2 (x,y)=1 (y,x)=1 → n=8 po=6/8
    // marginals a: x=5 y=3; b: x=5 y=3 → pe=(25+9)/64
    val df = Seq(("x","x"),("x","x"),("x","x"),("x","x"),
      ("y","y"),("y","y"),("x","y"),("y","x")).toDF("a","b")
    val r = MlLite.cohensKappa(df, "a", "b").collect().head
    assert(r.getAs[Long]("n_items") == 8L && r.getAs[Long]("n_agree") == 6L)
    assert(r.getAs[Long]("n_classes") == 2L)
    val pe = 25.0 / 64 + 9.0 / 64
    assert(math.abs(r.getAs[Double]("p_expected") - pe) < 1e-9)
    assert(math.abs(r.getAs[Double]("kappa") - (0.75 - pe) / (1 - pe)) < 1e-6)
    val perf = Seq(("x","x"),("y","y")).toDF("a","b")
    assert(math.abs(MlLite.cohensKappa(perf, "a", "b")
      .collect().head.getAs[Double]("kappa") - 1.0) < 1e-9)
  }

  test("cohensKappa: one-rater-only classes widen n_classes, not p_expected") {
    import org.apache.spark.sql.functions.col
    // rater b never says 'z'; the z row adds a class but its expected
    // term is zero (zero column marginal)
    val df = Seq(("x","x"),("y","y"),("z","x")).toDF("a","b")
    val r = MlLite.cohensKappa(df, "a", "b").collect().head
    assert(r.getAs[Long]("n_classes") == 3L)
    // pe = (ra_x*cb_x + ra_y*cb_y)/9 = (1*2 + 1*1)/9
    assert(math.abs(r.getAs[Double]("p_expected") - 3.0 / 9.0) < 1e-9)
  }

  test("mcnemar: discordant-only chi2 with continuity correction, symmetric case is 0") {
    import org.apache.spark.sql.functions.col
    // y always true; A right on 6, B right on 2 of those+2 others:
    // build b=4 (A only), c=1 (B only), both=2, neither=1 → n=8
    val rows = Seq.fill(2)((true, true, true)) ++   // both correct
      Seq.fill(4)((true, true, false)) ++            // A only
      Seq.fill(1)((true, false, true)) ++            // B only
      Seq.fill(1)((true, false, false))              // both wrong
    val df = rows.toDF("y", "pa", "pb")
    val r = MlLite.mcnemar(df, col("y"), col("pa"), col("pb")).collect().head
    assert(r.getAs[Long]("n_a_only") == 4L && r.getAs[Long]("n_b_only") == 1L)
    // chi2 = (|4−1|−1)² / (4+1) = 4/5
    assert(math.abs(r.getAs[Double]("chi2_cc") - 4.0 / 5.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("acc_a") - 6.0 / 8.0) < 1e-12)
    // b = c → |b−c|−1 clamps to 0 → chi2 exactly 0, p ~ 1
    val sym = (Seq.fill(3)((true, true, false)) ++ Seq.fill(3)((true, false, true)))
      .toDF("y", "pa", "pb")
    val rs = MlLite.mcnemar(sym, col("y"), col("pa"), col("pb")).collect().head
    assert(rs.getAs[Double]("chi2_cc") == 0.0)
    assert(rs.getAs[Double]("p_value") > 0.99)
    // no discordant rows → NULL chi2, never a division error
    val none = Seq((true, true, true)).toDF("y", "pa", "pb")
    val rn = MlLite.mcnemar(none, col("y"), col("pa"), col("pb")).collect().head
    assert(rn.isNullAt(rn.fieldIndex("chi2_cc")))
  }

  test("calibrationEce: perfectly calibrated groups give near-zero ece; gap lands in the right bin") {
    import org.apache.spark.sql.functions.col
    // group A: 9 rows 5 pos → p=5.5/10=0.55, acc=5/9; group B: 9 rows
    // 0 pos → p=0.5/10=0.05, acc=0. Two bins: 5 (A) and 0 (B).
    val rows = (1 to 9).map(i => ("A", i <= 5)) ++ (1 to 9).map(_ => ("B", false))
    val df = rows.toDF("g", "y")
    val out = MlLite.calibrationEce(df, col("y"), col("g"), nBins = 10)
      .collect().map(r => r.getAs[Int]("bin") -> r).toMap
    assert(out.keySet == Set(0, 5))
    val a = out(5)
    assert(a.getAs[Long]("n_rows") == 9L)
    assert(math.abs(a.getAs[Double]("avg_conf") - 0.55) < 1e-6)
    assert(math.abs(a.getAs[Double]("accuracy") - 5.0 / 9) < 1e-12)
    // ece = weighted mean of the two gaps; both rows carry the same summary
    val gapA = math.abs(5.0 / 9 - 0.55); val gapB = 0.05
    val ece = (9 * math.floor(gapA * 1e6) / 1e6 + 9 * math.floor(gapB * 1e6) / 1e6) / 18
    assert(math.abs(a.getAs[Double]("ece") - ece) < 1e-6)
    assert(a.getAs[Double]("ece") == out(0).getAs[Double]("ece"))
    assert(math.abs(a.getAs[Double]("mce") - math.floor(gapA.max(gapB) * 1e6) / 1e6) < 1e-9)
  }
}
