package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{AnalyticsPack, CorpusQc, MlLite, Prejoin, PrefixSum, TextDedup}

/** Property-based invariants over randomized inputs — the algebraic
  * contracts that example specs cannot exhaust:
  *  - the distributed prefix sum IS the sequential running sum;
  *  - chunking with overlap reconstructs the exact token sequence;
  *  - salting never changes a join's result;
  *  - exact dedup conserves rows (survivor copies sum to input size).
  *
  * Plain scalacheck generators with FIXED seeds (scalatestplus is not
  * in the offline cache): deterministic across runs, so a failure is
  * reproducible by seed index.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: distributed prefix sum == sequential running sum on any data") {
    val gen = for {
      n <- Gen.choose(1, 300)
      vals <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield vals
    samples(gen).foreach { vals =>
      val df = new scala.util.Random(vals.hashCode).shuffle(
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v) })
        .toDF("k", "v").repartition(5)
      val got = PrefixSum.globalOrdered(df, Seq(col("k")), "v", nRangeParts = 4)
        .select("k", "prefix_sum", "row_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val expected = vals.scanLeft(0L)(_ + _).tail
      assert(got.map(_._2).toSeq == expected)
      assert(got.map(_._3).toSeq == (1L to vals.length).toSeq)
    }
  }

  test("property: chunks reconstruct the token sequence exactly") {
    val word = Gen.choose('a', 'z').flatMap(c => Gen.choose(1, 5)
      .map(n => c.toString * n))
    val gen = for {
      n <- Gen.choose(1, 120)
      toks <- Gen.listOfN(n, word)
      size <- Gen.choose(2, 20)
      overlap <- Gen.choose(0, size - 1)
    } yield (toks, size, overlap)
    samples(gen, 8).foreach { case (toks, size, overlap) =>
      val stride = size - overlap
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = CorpusQc.chunkTokens(df, "doc_id", "text", size, overlap)
        .orderBy("chunk_seq").collect()
      // stitching: chunk 0 whole, then each subsequent chunk minus its
      // overlapping head, equals the original token stream
      val stitched = chunks.toSeq.flatMap { r =>
        val ts = r.getString(4).split(" ").toSeq
        if (r.getInt(1) == 0) ts else ts.drop(overlap)
      }
      assert(stitched == toks, s"size=$size overlap=$overlap n=${toks.length}")
      // every chunk starts on the stride grid and respects the budget
      chunks.foreach { r =>
        assert(r.getInt(2) == r.getInt(1) * stride)
        assert(r.getInt(3) <= size && r.getInt(3) >= 1)
      }
    }
  }

  test("property: salted join result is the plain join result") {
    val gen = for {
      nf <- Gen.choose(0, 80)
      fk <- Gen.listOfN(nf, Gen.choose(0L, 8L))
      nd <- Gen.choose(0, 8)
      dk <- Gen.listOfN(nd, Gen.choose(0L, 10L))
      saltN <- Gen.choose(1, 6)
    } yield (fk, dk.distinct, saltN)
    samples(gen).foreach { case (fk, dk, saltN) =>
      val fact = fk.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row")
      val dim = dk.map(k => (k, s"attr$k")).toDF("k", "attr")
      val salted = Prejoin.saltedJoin(fact, dim, Seq("k"), "row", saltN)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val plain = fact.join(dim, Seq("k"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      assert(salted == plain, s"saltN=$saltN")
    }
  }

  test("property: prefix-filter join == uncapped inverted-index join on any corpus") {
    // random corpora from a tiny vocabulary (dense overlap, heavy
    // ties): the prefix filter must reproduce the exact pair set the
    // full inverted index produces, at several thresholds
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val gen = for {
      n <- Gen.choose(2, 25)
      docs <- Gen.listOfN(n, Gen.choose(3, 9).flatMap(Gen.listOfN(_, word)))
      t <- Gen.oneOf(0.3, 0.5, 0.8)
    } yield (docs, t)
    samples(gen, 6).foreach { case (docs, t) =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val pf = TextDedup.prefixFilterPairs(df, "doc_id", "text", n = 3, threshold = t)
        .collect().map(_.toSeq).sortBy(_.toString)
      val jp = TextDedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = t,
        maxDf = Int.MaxValue).collect().map(_.toSeq).sortBy(_.toString)
      assert(pf.toSeq == jp.toSeq, s"threshold=$t docs=$docs")
    }
  }

  test("property: bucketized range joins == brute-force theta joins on any intervals") {
    import graft.operators.RangeJoin
    val gen = for {
      np <- Gen.choose(1, 60)
      pts <- Gen.listOfN(np, Gen.choose(-100L, 300L))
      ni <- Gen.choose(1, 40)
      ivs <- Gen.listOfN(ni, for {
        lo <- Gen.choose(-120L, 280L)
        span <- Gen.choose(-10L, 80L) // negatives: inverted intervals drop
      } yield (lo, lo + span))
      bw <- Gen.oneOf(1L, 7L, 32L, 101L)
    } yield (pts, ivs, bw)
    samples(gen, 6).foreach { case (pts, ivs, bw) =>
      val p = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(p, "p", iv, "lo", "hi", bw)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = p.crossJoin(iv).filter($"lo" <= $"p" && $"p" <= $"hi" && $"lo" <= $"hi")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sorted.toSeq == brute.sorted.toSeq, s"bw=$bw")
      // overlap join: set equality AND multiplicity one per pair
      val iv2 = iv.select($"iid".as("jid"), $"lo".as("lo2"), $"hi".as("hi2"))
      val ov = RangeJoin.intervalOverlap(iv, "lo", "hi", iv2, "lo2", "hi2", bw)
        .select("iid", "jid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val ovBrute = iv.crossJoin(iv2)
        .filter($"lo" <= $"hi2" && $"lo2" <= $"hi" && $"lo" <= $"hi" && $"lo2" <= $"hi2")
        .select("iid", "jid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(ov.sorted.toSeq == ovBrute.sorted.toSeq, s"bw=$bw")
      assert(ov.length == ov.distinct.length)
    }
  }

  test("property: exact dedup conserves rows — survivor copy counts sum to input") {
    val gen = for {
      n <- Gen.choose(1, 100)
      texts <- Gen.listOfN(n, Gen.choose(0, 15).map(i => s"content body $i"))
    } yield texts
    samples(gen).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextDedup.exact(df, "text", "doc_id").collect()
      assert(got.map(_.getAs[Long]("n_copies")).sum == texts.length)
      assert(got.length == texts.distinct.length)
      // each survivor is the smallest id of its content class
      got.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val txt = r.getAs[String]("text")
        assert(id == texts.zipWithIndex.filter(_._1 == txt).map(_._2).min)
      }
    }
  }

  test("property: distributed Spearman == Pearson of sequential midranks") {
    import graft.operators.Profiling
    def midranks(xs: Seq[Double]): Seq[Double] = {
      val sorted = xs.sorted
      xs.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        (lo + hi) / 2.0
      }
    }
    val gen = for {
      n <- Gen.choose(3, 60)
      xs <- Gen.listOfN(n, Gen.choose(0, 8).map(_.toDouble)) // heavy ties
      ys <- Gen.listOfN(n, Gen.choose(0, 8).map(_.toDouble))
    } yield (xs, ys)
    samples(gen).foreach { case (xs, ys) =>
      val got = Profiling.spearmanPair(xs.zip(ys).toDF("x", "y"), "x", "y")
        .collect().head
      val (rx, ry) = (midranks(xs), midranks(ys))
      val n = xs.length
      val (mx, my) = (rx.sum / n, ry.sum / n)
      val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = rx.map(a => (a - mx) * (a - mx)).sum
      val vy = ry.map(b => (b - my) * (b - my)).sum
      if (vx == 0.0 || vy == 0.0) assert(got.isNullAt(3))
      else assert(math.abs(got.getAs[Double]("rho") -
        cov / math.sqrt(vx * vy)) < 1e-9)
    }
  }

  test("property: Kendall tau-b == brute-force pair counting on any discrete data") {
    import graft.operators.Profiling
    val gen = for {
      n <- Gen.choose(3, 40)
      xs <- Gen.listOfN(n, Gen.choose(0, 4))
      ys <- Gen.listOfN(n, Gen.choose(0, 4))
    } yield (xs, ys)
    samples(gen).foreach { case (xs, ys) =>
      val got = Profiling.kendallTauB(xs.zip(ys).toDF("x", "y"), "x", "y")
        .collect().head
      val pairs = for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield ((xs(i) compare xs(j)) * (ys(i) compare ys(j)))
      val (c, d) = (pairs.count(_ > 0).toDouble, pairs.count(_ < 0).toDouble)
      assert(got.getAs[Double]("n_c") == c && got.getAs[Double]("n_d") == d)
      val n = xs.length.toDouble
      def ties(vs: Seq[Int]) =
        vs.groupBy(identity).values.map(g => g.size.toDouble * (g.size - 1)).sum
      val denom = math.sqrt((n * (n - 1) - ties(xs)) / 2.0) *
        math.sqrt((n * (n - 1) - ties(ys)) / 2.0)
      if (denom == 0.0) assert(got.isNullAt(got.fieldIndex("tau_b")))
      else assert(math.abs(got.getAs[Double]("tau_b") - (c - d) / denom) < 1e-9)
    }
  }

  test("property: Kruskal-Wallis H == the direct rank-sum formula") {
    import graft.operators.AnalyticsPack
    val gen = for {
      n <- Gen.choose(4, 50)
      gs <- Gen.listOfN(n, Gen.oneOf("A", "B", "C"))
      vs <- Gen.listOfN(n, Gen.choose(0, 6).map(_.toDouble)) // ties
    } yield (gs, vs)
    samples(gen).foreach { case (gs, vs) =>
      val distinctGroups = gs.distinct.size
      val got = AnalyticsPack.kruskalWallis(
        gs.zip(vs).toDF("g", "v"), "v", "g").collect().head
      // sequential replica: midranks, per-group rank sums, textbook H
      val sorted = vs.sorted
      val rank = vs.map { v =>
        ((sorted.indexOf(v) + 1) + (sorted.lastIndexOf(v) + 1)) / 2.0
      }
      val n = vs.length.toDouble
      val byG = gs.zip(rank).groupBy(_._1)
      val h = 12.0 / (n * (n + 1)) *
        byG.values.map { g =>
          val r = g.map(_._2).sum; r * r / g.size
        }.sum - 3.0 * (n + 1)
      val t3 = vs.groupBy(identity).values
        .map(g => math.pow(g.size, 3) - g.size).sum
      val corr = 1.0 - t3 / (n * n * n - n)
      assert(got.getAs[Long]("n_groups") == distinctGroups.toLong)
      assert(math.abs(got.getAs[Double]("h") - h) < 1e-6)
      if (corr == 0.0) assert(got.isNullAt(got.fieldIndex("h_corrected")))
      else assert(math.abs(got.getAs[Double]("h_corrected") - h / corr) < 1e-6)
    }
  }
  test("property: ROC AUC == brute-force pair counting with half-credit ties") {
    val gen = for {
      n <- Gen.choose(4, 60)
      ys <- Gen.listOfN(n, Gen.oneOf(true, false))
      ss <- Gen.listOfN(n, Gen.choose(0, 8).map(_.toDouble)) // heavy ties
    } yield (ys, ss)
    samples(gen).foreach { case (ys, ss) =>
      val rows = ss.zip(ys)
      val got = MlLite.aucRoc(rows.toDF("s", "y"), "s", col("y"))
        .collect().head
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      if (pos.isEmpty || neg.isEmpty)
        assert(got.isNullAt(got.fieldIndex("auc")))
      else {
        val credit = (for { p <- pos; q <- neg } yield
          if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        val auc = credit / (pos.size.toDouble * neg.size)
        assert(math.abs(got.getAs[Double]("auc") - auc) < 1e-9)
        assert(math.abs(got.getAs[Double]("gini") - (2 * auc - 1)) < 1e-9)
      }
    }
  }

  test("property: Welch t == the sequential two-sample computation") {
    val gen = for {
      na <- Gen.choose(2, 30)
      nb <- Gen.choose(2, 30)
      as <- Gen.listOfN(na, Gen.choose(0, 400).map(_ / 4.0))
      bs <- Gen.listOfN(nb, Gen.choose(0, 400).map(_ / 4.0))
    } yield (as, bs)
    samples(gen).foreach { case (as, bs) =>
      val df = (as.map(("A", _)) ++ bs.map(("B", _))).toDF("g", "v")
      val got = AnalyticsPack.welchTTest(df, "v", col("g") === "A")
        .collect().head
      def mv(xs: Seq[Double]): (Double, Double) = {
        val m = xs.sum / xs.length
        (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      }
      val (ma, va) = mv(as); val (mb, vb) = mv(bs)
      assert(math.abs(got.getAs[Double]("mean_a") - ma) < 1e-4)
      assert(math.abs(got.getAs[Double]("mean_b") - mb) < 1e-4)
      if (va + vb > 1e-9) {
        val t = (ma - mb) / math.sqrt(va / as.size + vb / bs.size)
        assert(math.abs(got.getAs[Double]("t_stat") - t) < 1e-2,
          s"t ${got.getAs[Double]("t_stat")} vs $t")
      }
    }
  }

  test("property: spearman moment pipeline exact past 2^31 doubled midranks") {
    import graft.operators.Profiling
    // doubled midranks at the magnitude a 100-TB row count produces
    // (d ~ 2n+1 with n ~ 2^32): a long x long product of two such
    // ranks wraps silently; the DECIMAL-before-multiply discipline
    // must reproduce exact BigInt arithmetic bit-for-bit at the final
    // double cast
    val big = 4294967296L // 2^32
    val gen = for {
      n <- Gen.choose(3, 12)
      xs <- Gen.listOfN(n, Gen.choose(big, big + 2000000000L))
      ys <- Gen.listOfN(n, Gen.choose(big, big + 2000000000L))
    } yield (xs, ys)
    samples(gen).foreach { case (xs, ys) =>
      val ranked = xs.zip(ys).toDF("__dx", "__dy")
      val got = Profiling.spearmanFromDoubledRanks(ranked).collect().head
      assert(got.getAs[Long]("n_pairs") == xs.length.toLong)
      // exact replay in BigInt, rounded to double only at the edges
      val n = BigInt(xs.length)
      def bsum(zs: Seq[Long]) = zs.map(BigInt(_)).sum
      def bdot(as: Seq[Long], bs: Seq[Long]) =
        as.zip(bs).map { case (p, q) => BigInt(p) * BigInt(q) }.sum
      val num = (n * bdot(xs, ys)).toDouble - (bsum(xs) * bsum(ys)).toDouble
      val vx = (n * bdot(xs, xs)).toDouble - (bsum(xs) * bsum(xs)).toDouble
      val vy = (n * bdot(ys, ys)).toDouble - (bsum(ys) * bsum(ys)).toDouble
      if (vx > 0 && vy > 0) {
        val rho = num / (math.sqrt(vx) * math.sqrt(vy))
        val gr = got.getAs[Double]("rho")
        assert(math.abs(gr - rho) <= 1e-12 * math.max(1.0, math.abs(rho)),
          s"rho $gr vs exact $rho on xs=$xs ys=$ys")
      } else assert(got.isNullAt(got.fieldIndex("rho")))
    }
  }

  test("property: odds ratio exact when cell products pass 2^63") {
    // cells in [3.1e9, 5e9]: every a*d and b*c passes a signed long
    // (min product 9.61e18 > 9.22e18); the
    // cast-to-double-before-multiply discipline must agree with exact
    // BigDecimal arithmetic to the last few ulps
    val gen = for {
      a <- Gen.choose(3100000000L, 5000000000L)
      b <- Gen.choose(3100000000L, 5000000000L)
      c <- Gen.choose(3100000000L, 5000000000L)
      d <- Gen.choose(3100000000L, 5000000000L)
    } yield (a, b, c, d)
    samples(gen).foreach { case (a, b, c, d) =>
      assert(BigInt(a) * BigInt(d) > BigInt(Long.MaxValue)) // adversarial for real
      val g = Seq((a, b, c, d))
        .toDF("n_exp_pos", "n_exp_neg", "n_ctl_pos", "n_ctl_neg")
      val got = AnalyticsPack.oddsRatioFromCells(g).collect().head
      val exact = (BigDecimal(a) * BigDecimal(d) / (BigDecimal(b) * BigDecimal(c))).toDouble
      val gr = got.getAs[Double]("odds_ratio")
      // two product roundings + one division: <= 3 ulps relative
      assert(math.abs(gr - exact) <= 4 * math.ulp(exact),
        s"or $gr vs exact $exact for ($a,$b,$c,$d)")
      // the CI stays finite and ordered at these magnitudes
      assert(got.getAs[Double]("ln_or_lo95") <= got.getAs[Double]("ln_or_hi95"))
    }
  }
}
