package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  // Tiny 4-d corpus with known geometry: ids 0,1 are queries.
  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0f, 1f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f, 0f)),  // closest to 0
    (3L, Array(0.1f, 0.9f, 0f, 0f)),  // closest to 1
    (4L, Array(-1f, 0f, 0f, 0f)),     // opposite of 0
    (5L, Array(0.8f, 0.2f, 0f, 0f)))
    .toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks by similarity with id tie-break") {
    val got = Ann.cosineTopK(vecs, "vec_id", "embedding", nQueries = 2, k = 3)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.take(3).toSeq == Seq((0L, 1, 2L), (0L, 2, 5L), (0L, 3, 3L)))
    assert(got(3) == ((1L, 1, 3L)))
    // the antipode is never in 0's top-3
    assert(!got.take(3).exists(_._3 == 4L))
  }

  test("cosine of identical and orthogonal vectors is exact") {
    val df = Seq((Array(1.0, 2.0, 2.0), Array(1.0, 2.0, 2.0)),
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)))
      .toDF("a", "b")
    val got = df.select(
      (Ann.dot($"a", $"b") / (Ann.l2norm($"a") * Ann.l2norm($"b"))).as("c"))
      .as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-15 && got(1) == 0.0)
  }

  test("lsh top-k finds the dominant neighbours of the brute-force baseline") {
    val exact = Ann.cosineTopK(vecs, "vec_id", "embedding", 2, 1)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(vecs, "vec_id", "embedding", nQueries = 2, k = 3,
        tables = 4, planes = 2, dim = 4)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // near-identical directions collide in at least one of 4 tables
    assert(exact.subsetOf(approx))
  }

  test("embedding near-dup pairs: LSH self-join finds the planted duplicate") {
    val planted = vecs.union(Seq((9L, Array(0.99f, 0.01f, 0f, 0f))).toDF("vec_id", "embedding"))
    val got = Ann.cosineNearDupPairs(planted, "vec_id", "embedding",
        threshold = 0.95, tables = 4, planes = 2, dim = 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 9L)))   // 0 and its planted near-copy
    assert(got.contains((2L, 9L)) || got.contains((0L, 2L)) || got.nonEmpty)
    // nothing below the threshold sneaks in
    val sims = Ann.cosineNearDupPairs(planted, "vec_id", "embedding",
        threshold = 0.95, tables = 4, planes = 2, dim = 4)
      .select("cos_sim").as[Double].collect()
    assert(sims.forall(_ >= 0.95))
  }

  test("ivf top-k probes the right cells and ranks exactly within them") {
    // stride 1 -> every vector a centroid candidate, lowest 4 kept;
    // probing all 4 cells makes IVF exhaustive = brute force.
    val exact = Ann.cosineTopK(vecs, "vec_id", "embedding", 2, 3)
      .select("q_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val ivfAll = Ann.ivfTopK(vecs, "vec_id", "embedding", 2, 3,
        nCentroids = 4, nProbe = 4, sampleStride = 1)
      .select("q_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(ivfAll == exact)
    // narrow probing still finds the dominant neighbour
    val ivf1 = Ann.ivfTopK(vecs, "vec_id", "embedding", 2, 1,
        nCentroids = 4, nProbe = 2, sampleStride = 1)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(ivf1(0L) == 2L)
  }

  test("planesFor: table size follows corpus size, clamped") {
    assert(Ann.planesFor(100) == 4)            // clamp floor: >= 16 buckets
    assert(Ann.planesFor(100000) == 10)        // ceil(log2(100k/128))
    assert(Ann.planesFor(1000000) == 13)
    assert(Ann.planesFor(1000000, 1024) == 10) // bigger target -> fewer buckets
    assert(Ann.planesFor(Long.MaxValue) == 24) // clamp ceiling
    // monotone non-decreasing in corpus size
    val sizes = Seq(1L, 1000L, 10000L, 100000L, 1000000L, 100000000L)
    assert(sizes.map(Ann.planesFor(_)) == sizes.map(Ann.planesFor(_)).sorted)
  }

  test("auto planes bound bucket occupancy on a skewed corpus") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val clusterBase = Array.fill(dim)(rnd.nextGaussian())
    val n = 2048
    val nCluster = n / 4
    // 25% near-duplicates of one direction + 75% random directions
    val rows = (0 until n).map { i =>
      val v =
        if (i < nCluster) clusterBase.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
        else Array.fill(dim)(rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val base = df.select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val planes = Ann.planesFor(n) // = 4 -> 16 buckets, expected 128/bucket
    val occ = Ann.bucketed(base, tables = 1, planes = planes, dim = dim, seed = 42L)
      .groupBy("bucket").count().select("count").as[Long].collect()
    assert(occ.sum == n)
    // the table actually spreads: a healthy share of the keyspace is hit
    assert(occ.length >= (1 << planes) / 2)
    // the hottest bucket is the data's intrinsic cluster plus a uniform
    // share — NOT a coarse-table artifact swallowing the corpus
    val expected = n / (1 << planes)
    assert(occ.max <= nCluster + 4L * expected)
    // candidate volume stays linear-ish: far under the n^2/2 all-pairs
    val pairs = occ.map(c => c * (c - 1) / 2).sum
    assert(pairs < n.toLong * n / 8)
  }

  test("embedding quality gate: first-match reasons and exact norms") {
    val rows: Seq[(Long, Option[Seq[Float]])] = Seq(
      1L -> Some(Seq(3f, 4f)),
      2L -> None,
      3L -> Some(Seq(1f)),
      4L -> Some(Seq(Float.NaN, 1f)),
      5L -> Some(Seq(0f, 0f)),
      6L -> Some(Seq(1e-5f, 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Ann.qualityGate(df, "vec_id", "embedding", expectedDim = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(got(1L).getAs[Double]("l2_norm") == 5.0 && got(1L).getAs[Boolean]("is_valid"))
    assert(got(2L).getAs[String]("reason_code") == "NULL_VEC")
    assert(got(2L).isNullAt(got(2L).fieldIndex("n_dims")))
    assert(got(3L).getAs[String]("reason_code") == "BAD_DIM")
    assert(got(4L).getAs[String]("reason_code") == "NON_FINITE")
    assert(got(5L).getAs[String]("reason_code") == "ZERO_NORM")
    assert(got(6L).getAs[String]("reason_code") == "LOW_NORM")
  }

  test("lsh candidate generation is deterministic across runs") {
    def run() = Ann.lshTopK(vecs, "vec_id", "embedding", 2, 3, tables = 4, planes = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(run() == run())
  }

  test("pq codes: m codes per vector, all within the codebook") {
    val emb = Tables(spark, sf, "embeddings")
    val codes = Ann.pqCodes(emb, "vec_id", "embedding", m = 8, ks = 16, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val n = emb.count()
    assert(codes.length == n * 8, s"expected ${n * 8} codes, got ${codes.length}")
    assert(codes.forall { case (_, sub, code) =>
      sub >= 0 && sub < 8 && code >= 1 && code <= 16 })
    // every vector carries exactly one code per subspace
    assert(codes.groupBy(_._1).forall(_._2.map(_._2).toSet.size == 8))
  }

  test("pq top-k: structure, determinism, and recall of the exact baseline") {
    val emb = Tables(spark, sf, "embeddings")
    val k = 5
    def run() = Ann.pqTopK(emb, "vec_id", "embedding", nQueries = 10, k = k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val got = run()
    // k rows per query with dense ranks
    assert(got.length == 10 * k)
    assert(got.groupBy(_._1).forall(_._2.map(_._2).sorted == (1 to k)))
    assert(run() == got) // deterministic codebook + decimal ADC sums
    // ADC shortlist + exact re-rank recovers a solid share of the
    // exact top-k (random 64-d corpus, 16-centroid codebooks — pin a
    // conservative floor well under the observed rate)
    val exact = Ann.cosineTopK(emb, "vec_id", "embedding", 10, k)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = got.map(t => (t._1, t._3)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall@5 degraded to $recall")
  }

  test("ivf-pq top-k: structure, determinism, recall floor of the composed index") {
    val emb = Tables(spark, sf, "embeddings")
    val k = 5
    def run() = Ann.ivfPqTopK(emb, "vec_id", "embedding", nQueries = 10, k = k,
      nProbe = 6, shortlistFactor = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val got = run()
    assert(got.length == 10 * k)
    assert(got.groupBy(_._1).forall(_._2.map(_._2).sorted == (1 to k)))
    assert(run() == got) // deterministic centroids, codebooks, decimal ADC
    // composed recall on the structureless corpus: within-cell
    // candidates + residual ADC + exact re-rank — pin a conservative
    // floor (IVF alone measures ~0.56 here; PQ residual coding inside
    // the probed cells should hold a solid share of that)
    val exact = Ann.cosineTopK(emb, "vec_id", "embedding", 10, k)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got.map(t => (t._1, t._3)).toSet).size.toDouble / exact.size
    assert(recall >= 0.2, s"ivf-pq recall@5 degraded to $recall")
  }

  test("randomProject: deterministic JL embedding, exact per-component dots, sane distances") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val emb = vecs.toDF("vec_id", "embedding")
    val p1 = Ann.randomProject(emb, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // deterministic: a second evaluation is identical
    val p2 = Ann.randomProject(emb, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 == p2 && p1(0L).size == 16)
    // component 0 equals the driver-side dot with the same seeded row
    val mrnd = new java.util.Random(42L)
    val mat = Seq.fill(16)(Array.fill(64)(if (mrnd.nextBoolean()) 1.0 else -1.0))
    val scale = 1.0 / math.sqrt(16.0)
    val expected = vecs.head._2.zip(mat.head).map { case (x, r) => x.toDouble * r }.sum * scale
    assert(math.abs(p1(0L).head - expected) < 1e-9)
    // JL: projected distances track original distances within a loose band
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val origs = vecs.map { case (i, v) => i -> v.map(_.toDouble).toSeq }.toMap
    val ratios = for (i <- 0L until 10L; j <- (i + 1) until 10L) yield
      dist(p1(i), p1(j)) / dist(origs(i), origs(j))
    assert(ratios.forall(r => r > 0.4 && r < 1.8), s"JL ratios out of band: $ratios")
    // long form: one row per (vec_id, dim_pos), components identical
    // to the array form — this is the driver-checked schema
    val long = Ann.randomProjectLong(emb, "vec_id", "embedding", 64, 16)
    assert(long.columns.toSeq == Seq("vec_id", "dim_pos", "component"))
    val longRows = long.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(longRows.size == 40 * 16)
    assert(p1.forall { case (id, vec) =>
      vec.zipWithIndex.forall { case (v, d) => longRows((id, d)) == v } })
    // a ragged vector fails LOUDLY — the dot kernel would otherwise
    // silently truncate to the shorter array
    val ragged = Seq((0L, Array.fill(32)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ann.randomProject(ragged, "vec_id", "embedding", 64, 16).collect()
    }
    assert(e.getMessage.contains("embedding dim") || Option(e.getCause).exists(
      _.getMessage.contains("embedding dim")), e.getMessage)
  }

  test("kmeans: recovers planted clusters, assignment is truly nearest, deterministic") {
    val rnd = new scala.util.Random(7)
    // three tight bundles around orthogonal axes, 10 points each
    def bundle(center: Array[Float], ids: Range) = ids.map { i =>
      (i.toLong, center.map(c => c + (rnd.nextDouble() * 0.05).toFloat))
    }
    val pts = bundle(Array(1f, 0f, 0f, 0f), 0 until 10) ++
      bundle(Array(0f, 1f, 0f, 0f), 10 until 20) ++
      bundle(Array(0f, 0f, 1f, 0f), 20 until 30)
    val emb = pts.toDF("vec_id", "embedding")
    val got = Ann.kmeans(emb, "vec_id", "embedding", k = 3, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 30)
    // each planted bundle lands in ONE cluster, bundles in different ones
    val byBundle = got.groupBy(_._1 / 10).map { case (b, rows) =>
      b -> rows.map(_._2).distinct }
    assert(byBundle.values.forall(_.size == 1), s"bundle split: $byBundle")
    assert(byBundle.values.flatten.toSet.size == 3)
    // deterministic across runs (bit-identical d2 included)
    val again = Ann.kmeans(emb, "vec_id", "embedding", k = 3, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("clusterQuality: tight separated bundles score low ratios; k=1 has NULL separation") {
    val rnd = new scala.util.Random(11)
    def bundle(center: Array[Float], ids: Range) = ids.map { i =>
      (i.toLong, center.map(c => c + (rnd.nextDouble() * 0.05).toFloat))
    }
    val emb = (bundle(Array(1f, 0f, 0f, 0f), 0 until 10) ++
      bundle(Array(0f, 1f, 0f, 0f), 10 until 20)).toDF("vec_id", "embedding")
    val got = Ann.clusterQuality(emb, "vec_id", "embedding", k = 2, rounds = 5)
      .collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Long]("n_members") == 10L)
      // intra spread ~0.05² per dim; separation ~2 (orthogonal axes):
      // the ratio must scream "well-clustered"
      assert(r.getAs[Double]("mean_d2") < 0.1)
      assert(r.getAs[Double]("min_other_d2") > 1.0)
      assert(r.getAs[Double]("compactness_ratio") < 0.1)
    }
    // the consistency identity: ratio == mean/sep bit-for-bit
    got.foreach { r =>
      assert(r.getAs[Double]("compactness_ratio") ==
        r.getAs[Double]("mean_d2") / r.getAs[Double]("min_other_d2"))
    }
    val k1 = Ann.clusterQuality(emb, "vec_id", "embedding", k = 1, rounds = 2)
      .collect()
    assert(k1.length == 1 && k1.head.getAs[Long]("n_members") == 20L)
    assert(k1.head.isNullAt(k1.head.fieldIndex("min_other_d2")))
    assert(k1.head.isNullAt(k1.head.fieldIndex("compactness_ratio")))
  }

  test("kmeansSilhouette: tight well-separated bundles score near 1") {
    val rnd = new scala.util.Random(7)
    def bundle(center: Array[Float], ids: Range) = ids.map { i =>
      (i.toLong, center.map(c => c + (rnd.nextDouble() * 0.02).toFloat))
    }
    val emb = (bundle(Array(1f, 0f, 0f, 0f), 0 until 20) ++
      bundle(Array(0f, 1f, 0f, 0f), 20 until 40)).toDF("vec_id", "embedding")
    val got = Ann.kmeansSilhouette(emb, "vec_id", "embedding", k = 2, rounds = 5)
      .collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[Long]("n_members")).sum == 40L)
    got.foreach { r =>
      assert(r.getAs[Double]("mean_silhouette") > 0.9,
        s"cluster ${r.getLong(0)}: ${r.getAs[Double]("mean_silhouette")}")
    }
  }

  test("clusterOutliers: planted far point flagged against its own cluster's band") {
    val rnd = new scala.util.Random(13)
    def bundle(center: Array[Float], ids: Range) = ids.map { i =>
      (i.toLong, center.map(c => c + (rnd.nextDouble() * 0.05).toFloat))
    }
    // two tight bundles + one far outlier nominally nearest bundle A
    val emb = (bundle(Array(1f, 0f, 0f, 0f), 0 until 20) ++
      bundle(Array(0f, 1f, 0f, 0f), 20 until 40) ++
      Seq((99L, Array(3f, 0f, 0f, 0f)))).toDF("vec_id", "embedding")
    val got = Ann.clusterOutliers(emb, "vec_id", "embedding", k = 2, rounds = 5,
        p = 0.9).collect()
    assert(got.length == 41)
    val byId = got.map(r => r.getLong(0) -> r).toMap
    // the planted point is the flagged one
    assert(byId(99L).getAs[Boolean]("is_outlier"))
    // per-cluster p90 over 21/20 members flags only the extreme tail:
    // a small, cluster-local set — never a whole bundle
    val flagged = got.filter(_.getAs[Boolean]("is_outlier")).map(_.getLong(0)).toSet
    assert(flagged.contains(99L) && flagged.size <= 5, flagged.toString)
    // threshold is shared within a cluster and the flag is exactly the
    // comparison (consistency identity)
    got.foreach { r =>
      assert(r.getAs[Boolean]("is_outlier") ==
        (r.getAs[Double]("d2_full") > r.getAs[Double]("p95_d2")))
    }
  }

  test("recallEval: one row per method, sane recall bounds, deterministic") {
    val emb = Tables(spark, sf, "embeddings")
    val got = Ann.recallEval(emb, "vec_id", "embedding", nQueries = 10, k = 5)
      .orderBy("method").collect()
    assert(got.map(_.getString(0)).toSeq ==
      Seq("ivf", "ivf_pq", "lsh", "lsh_multiprobe", "pq", "sq8"))
    got.foreach { r =>
      assert(r.getLong(1) == 50L) // 10 queries x top-5 truth rows
      val recall = r.getDouble(3)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall == r.getLong(2).toDouble / r.getLong(1))
    }
    // a floor that says "not junk" at this spec's tiny sf0.001 corpus
    // (80 vectors starves the seeded tables AND the stride-sampled
    // codebooks — 3 centroids/codes; the per-method specs pin tighter
    // floors on their tuned fixtures)
    assert(got.forall(_.getDouble(3) >= 0.2), got.map(_.getDouble(3)).mkString(","))
    // multi-probe never loses to single-probe on the SAME index
    val byM = got.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byM("lsh_multiprobe") >= byM("lsh"), byM.toString)
    // int8 reconstruction barely perturbs cosine ranks: near-exact
    assert(byM("sq8") >= 0.8, s"sq8 recall ${byM("sq8")}")
    val again = Ann.recallEval(emb, "vec_id", "embedding", nQueries = 10, k = 5)
      .orderBy("method").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("kcenterSelect: visits every planted bundle before densifying, radius shrinks") {
    val rnd = new scala.util.Random(11)
    def bundle(center: Array[Float], ids: Range) = ids.map { i =>
      (i.toLong, center.map(c => c + (rnd.nextDouble() * 0.05).toFloat))
    }
    // four tight, well-separated bundles: the first four picks must
    // land in four DIFFERENT bundles (greedy max-min provably leaves
    // no far bundle unvisited while another holds two picks)
    val pts = bundle(Array(1f, 0f, 0f, 0f), 0 until 10) ++
      bundle(Array(0f, 1f, 0f, 0f), 10 until 20) ++
      bundle(Array(0f, 0f, 1f, 0f), 20 until 30) ++
      bundle(Array(0f, 0f, 0f, 1f), 30 until 40)
    val emb = pts.toDF("vec_id", "embedding")
    val got = Ann.kcenterSelect(emb, "vec_id", "embedding", k = 6)
      .orderBy("sel_rank").collect()
    assert(got.length == 6)
    assert(got.map(_.getLong(1)).distinct.length == 6)
    assert(got.head.isNullAt(2)) // seed has no prior set
    val firstFour = got.take(4).map(_.getLong(1) / 10).toSet
    assert(firstFour == Set(0L, 1L, 2L, 3L), s"bundles visited: $firstFour")
    // coverage radius non-increasing; intra-bundle picks are tiny
    val d2s = got.drop(1).map(_.getDouble(2))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => b <= a })
    // ranks 1-3 cross bundles (orthogonal units: d² ≈ 2); rank 4+ is
    // the first intra-bundle pick (every bundle already covered)
    assert(d2s(0) > 1.0 && d2s(2) > 1.0 && d2s(3) < 0.1 && d2s.last < 0.1)
    // bit-deterministic
    val again = Ann.kcenterSelect(emb, "vec_id", "embedding", k = 6)
      .orderBy("sel_rank").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("pcaProject: recovers a planted dominant direction, centered, deterministic") {
    // variance concentrated on axis 0 (values spread ±8), tiny spread
    // on axis 1, nothing on 2..3 — PC1 must align with axis 0
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).map { i =>
      val x = (i.toDouble - 19.5) * 0.4
      (i, Array(x.toFloat, (rnd.nextDouble() * 0.01).toFloat, 0f, 0f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val got = Ann.pcaProject(emb, "vec_id", "embedding", dim = 4, iterations = 15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 40)
    // projections of centered data sum to ~0 (within the 1e-6 grid)
    assert(math.abs(got.values.sum) < 1e-3)
    // score order matches the dominant coordinate's order (up to sign)
    val byX = rows.sortBy(r => r._2(0)).map(_._1)
    val byScore = got.toSeq.sortBy(_._2).map(_._1)
    assert(byScore == byX || byScore == byX.reverse,
      s"PC1 does not order along the planted axis")
    // the score spread matches the planted coordinate spread (|e1|≈1)
    val xs = rows.map(_._2(0).toDouble)
    val spread = got.values.max - got.values.min
    assert(math.abs(spread - (xs.max - xs.min)) < 0.05, s"spread $spread")
    // bit-identical across runs
    val again = Ann.pcaProject(emb, "vec_id", "embedding", dim = 4, iterations = 15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.forall { case (k, v) =>
      java.lang.Double.doubleToRawLongBits(again(k)) ==
        java.lang.Double.doubleToRawLongBits(v) })
  }

  test("semanticDedup: planted near-copies drop, cluster minima survive, deterministic") {
    // three tight direction bundles + one isolated vector; ids chosen
    // so bundles are NOT contiguous in id space
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (7L, Array(0.99f, 0.01f, 0f, 0f)),   // near-copy of 0
      (3L, Array(0f, 1f, 0f, 0f)),
      (9L, Array(0.01f, 0.99f, 0f, 0f)),   // near-copy of 3
      (5L, Array(0f, 0f, 1f, 0f)),
      (2L, Array(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Ann.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.95, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = got.map(r => r._1 -> r).toMap
    // every input row gets exactly one decision
    assert(got.length == 6 && byId.size == 6)
    // each cluster's lowest id can never be a duplicate (first-wins)
    val clusterMin = got.groupBy(_._2).values.map(_.minBy(_._1))
    assert(clusterMin.forall(!_._3), s"cluster minimum marked dup: $got")
    // a planted near-copy drops iff it landed with its original
    for ((orig, copy) <- Seq((0L, 7L), (3L, 9L)))
      if (byId(orig)._2 == byId(copy)._2)
        assert(byId(copy)._3 && !byId(orig)._3,
          s"near-copy $copy of $orig not deduped: $got")
    // the isolated directions never drop
    assert(!byId(5L)._3 && !byId(2L)._3)
    // deterministic across runs
    val again = Ann.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.95, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // auto-k: tiny corpus floors at 4 clusters and still runs
    val auto = Ann.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.95)
    assert(auto.count() == 6)
  }

  test("rangeSearch: threshold filter, self excluded, agrees with top-k on the same fixture") {
    // q0 = e1; same-direction (scaled) vector cos=1; orthogonal cos=0
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)),   // cos 1 with q0
      (2L, Array(0f, 1f, 0f, 0f)),   // cos 0
      (3L, Array(1f, 1f, 0f, 0f)))   // cos 1/sqrt(2) ≈ 0.707
      .toDF("vec_id", "embedding")
    val got = Ann.rangeSearch(emb, "vec_id", "embedding", nQueries = 1, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).toSet == Set(1L, 3L))         // 2 below threshold, 0 is self
    assert(got.forall(_._1 == 0L) && got.forall(_._3 >= 0.7))
    // the radius result is exactly the top-k result cut at the threshold
    val topk = Ann.cosineTopK(emb, "vec_id", "embedding", nQueries = 1, k = 3)
      .collect().filter(_.getDouble(3) >= 0.7).map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.map(t => (t._2, t._3)).toSet == topk.toSet)
  }

  test("embedding near-dup clusters: components follow the cosine pair graph") {
    val rnd = new scala.util.Random(13)
    def bundle(center: Array[Float], ids: Range) = ids.map { i =>
      (i.toLong, center.map(c => c + (rnd.nextDouble() * 0.02).toFloat))
    }
    val pts = bundle(Array(1f, 0f, 0f, 0f), 0 until 5) ++
      bundle(Array(0f, 1f, 0f, 0f), 100 until 105) ++
      Seq((999L, Array(0.7f, 0.7f, 0.1f, 0.1f))) // between: near neither at 0.9
    val emb = pts.toDF("vec_id", "embedding")
    val clusters = graft.operators.TextDedup.connectedComponents(
      Ann.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.9, planes = 4, dim = 4),
      "vec_a", "vec_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each bundle collapses to one cluster; bundles stay apart
    val c0 = (0L until 5L).map(clusters)
    val c1 = (100L until 105L).map(clusters)
    assert(c0.distinct.size == 1 && c1.distinct.size == 1)
    assert(c0.head != c1.head)
    // the in-between vector is in neither bundle's cluster
    assert(!clusters.contains(999L))
  }

  test("mutualKnnLsh: bundles connect internally, pairs are mutual and canonical, deterministic") {
    val rnd = new scala.util.Random(11)
    def bundle(center: Array[Float], ids: Range) = ids.map { i =>
      (i.toLong, center.map(c => c + (rnd.nextDouble() * 0.05).toFloat))
    }
    // two tight bundles on orthogonal axes: within-bundle cosines
    // ~1.0, cross-bundle ~0 — mutual top-k edges must stay in-bundle
    val pts = bundle(Array(1f, 0f, 0f, 0f), 0 until 8) ++
      bundle(Array(0f, 1f, 0f, 0f), 100 until 108)
    val emb = pts.toDF("vec_id", "embedding")
    val got = Ann.mutualKnnLsh(emb, "vec_id", "embedding", k = 4,
        planes = 4, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getInt(4)))
    assert(got.nonEmpty)
    // canonical orientation, no self-pairs
    assert(got.forall { case (a, b, _, _, _) => a < b })
    // no cross-bundle edge survives the mutual top-4 cut
    assert(got.forall { case (a, b, _, _, _) => (a < 50) == (b < 50) },
      s"cross-bundle edge in: ${got.mkString(",")}")
    // both directed ranks within k
    assert(got.forall { case (_, _, _, rab, rba) =>
      rab >= 1 && rab <= 4 && rba >= 1 && rba <= 4 })
    // every node keeps at most k mutual edges per direction
    val degree = got.flatMap { case (a, b, _, _, _) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.length)
    assert(degree.values.forall(_ <= 4))
    // deterministic across layouts (seeded hyperplanes, total-order ranks)
    val again = Ann.mutualKnnLsh(emb.repartition(5), "vec_id", "embedding",
        k = 4, planes = 4, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getInt(4)))
    assert(again.toSet == got.toSet)
  }

  test("similarityHist: pair conservation, fixed buckets, deterministic panel") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 2 identical (cos 1 → bucket 19), 2 orthogonal axes (cos 0 →
    // bucket 10), an anti-parallel pair (cos −1 → bucket 0)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Ann.similarityHist(vecs, "vec_id", "embedding",
        panelK = 96, buckets = 20)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 4 vectors → 6 pairs, all accounted for
    assert(got.values.sum == 6L)
    assert(got(19) == 1L) // the identical pair (1,2)
    assert(got(10) == 3L) // the orthogonal pairs (1,3),(2,3),(3,4)
    assert(got(0) == 2L)  // the anti-parallel pairs (1,4),(2,4)
    // deterministic: a repartitioned input yields the same histogram
    val again = graft.operators.Ann.similarityHist(vecs.repartition(3),
        "vec_id", "embedding", panelK = 96, buckets = 20)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == got)
    // bucket_lo arithmetic: bucket b starts at −1 + b·0.1
    val lo = graft.operators.Ann.similarityHist(vecs, "vec_id", "embedding")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(lo(10) - 0.0) < 1e-12)
  }

  test("lshTuningCurve: more bands raise candidates, more rows sharpen the curve") {
    val got = graft.operators.Ann.lshTuningCurve(vecs, "vec_id", "embedding",
        configs = Seq((4, 4), (16, 4), (8, 8)), tau = 0.5)
      .collect().map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band")) -> r)
      .toMap
    val b4 = got((4, 4)); val b16 = got((16, 4)); val r8 = got((8, 8))
    // same total pair mass measured in every config
    assert(got.values.map(_.getAs[Long]("n_pairs_total")).toSet.size == 1)
    // more bands = strictly more expected candidates (monotone S-curve)
    assert(b16.getAs[Double]("expected_candidates") >
      b4.getAs[Double]("expected_candidates"))
    // more rows per band = sharper curve = fewer low-sim candidates
    assert(r8.getAs[Double]("expected_candidates") <
      b16.getAs[Double]("expected_candidates"))
    // recall over the >= tau mass is a probability and beats the
    // config's GLOBAL candidate rate (the S-curve concentrates mass up top)
    got.values.foreach { r =>
      val rec = r.getAs[Double]("expected_recall_at_tau")
      assert(rec >= 0.0 && rec <= 1.0 + 1e-9)
      assert(rec >= r.getAs[Double]("candidate_rate") - 1e-9)
    }
  }

  test("dimStats: per-dimension moments exact on a hand panel; shares sum to 1") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(3.0f, 0.0f)),
      (3L, Array(5.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Ann.dimStats(df, "embedding")
      .orderBy("dim_pos").collect()
    assert(got.length == 2)
    val d0 = got(0)
    assert(d0.getAs[Long]("n_vectors") == 3L)
    assert(d0.getAs[Double]("mean_v") == 3.0)
    // var = ((1+9+25) − 9²/3)/3 = 8/3; std = sqrt
    assert(math.abs(d0.getAs[Double]("std_v") - math.sqrt(8.0 / 3)) < 1e-9)
    assert(d0.getAs[Double]("min_v") == 1.0 && d0.getAs[Double]("max_v") == 5.0)
    // dim 1 is dead: zero variance, zero share; dim 0 carries all of it
    val d1 = got(1)
    assert(d1.getAs[Double]("std_v") == 0.0)
    assert(d1.getAs[Double]("var_share") == 0.0)
    assert(math.abs(d0.getAs[Double]("var_share") - 1.0) < 1e-9)
  }
}
