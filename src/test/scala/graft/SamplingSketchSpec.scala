package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Profiling, Sampling, Sessionize}
import graft.sources.MedallionSink

/** Round-4 additions: deterministic sampling, sketch profiles, the
  * session_window twin, first-wins dedup, and bucketed co-location.
  */
class SamplingSketchSpec extends SparkSpec {

  private lazy val events = Tables(spark, sf, "events")

  test("thresholdHex maps rates onto the 16-bit bucket space") {
    assert(Sampling.thresholdHex(0.0) == "0000")
    assert(Sampling.thresholdHex(0.25) == "4000")
    assert(Sampling.thresholdHex(0.125) == "2000")
    assert(Sampling.thresholdHex(0.5) == "8000")
    assert(Sampling.thresholdHex(1.0) == "g") // > every hex bucket
    intercept[IllegalArgumentException](Sampling.thresholdHex(-0.1))
  }

  test("hllRollup: union-of-daily == direct weekly sketch, near-exact, overlap-aware") {
    import spark.implicits._
    // 3 weekdays sharing a heavy user overlap: summed daily distincts
    // overcount, the merged sketch must not
    val rows = for {
      d <- Seq("2024-01-08", "2024-01-09", "2024-01-10")
      u <- 1 to 500 // users 1..500 active EVERY day
    } yield (Timestamp.valueOf(s"$d 10:00:00"), u.toLong)
    val extra = (501 to 700).map(u => (Timestamp.valueOf("2024-01-09 11:00:00"), u.toLong))
    val df = (rows ++ extra).toDF("ts", "user_id")
    val got = Profiling.hllRollup(df, "ts", "user_id").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_days") == 3L)
    val est = r.getAs[Long]("distinct_est")
    assert(math.abs(est - 700.0) / 700.0 < 0.05)     // lgK=12: ~1.6% rel std err
    assert(r.getAs[Long]("sum_daily_est") > 1600L)   // naive sum overcounts ~2.4x
    // mergeability: the weekly union equals sketching the week directly
    val direct = df.select(date_trunc("week", to_date($"ts")).cast("date").as("week"),
        $"user_id")
      .groupBy($"week").agg(hll_sketch_estimate(
        hll_sketch_agg($"user_id", lit(12))).as("direct_est"))
      .collect().head.getAs[Long]("direct_est")
    assert(est == direct) // same library, same lgK -> bit-equal estimate
  }

  test("KllDoubles: exact below k, mass-conserving compaction, deterministic codec") {
    import graft.expressions.{KllCodec, KllDoubles}
    // below capacity: every value retained, quantiles exact
    val s0 = new KllDoubles(200)
    (1 to 100).foreach(v => s0.update(v.toDouble))
    assert(s0.n == 100L && s0.carriedWeight == 100L)
    assert(s0.quantile(0.5) == 50.0)
    assert(s0.quantile(0.0) == 1.0 && s0.quantile(1.0) == 100.0)
    // large single-threaded build: carried weight conserved through
    // every compaction, rank error inside the declared 2/k envelope
    val s = new KllDoubles(200)
    (1 to 100000).foreach(v => s.update(v.toDouble))
    assert(s.carriedWeight == 100000L)
    for (p <- Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val e = s.quantile(p)
      assert(math.abs(e / 100000.0 - p) <= 2.0 / 200 + 1e-9, s"p=$p est=$e")
    }
    assert(s.minV == 1.0 && s.maxV == 100000.0)
    // deterministic: same input order => bit-identical sketch
    val s2 = new KllDoubles(200)
    (1 to 100000).foreach(v => s2.update(v.toDouble))
    assert(java.util.Arrays.equals(KllCodec.serialize(s), KllCodec.serialize(s2)))
    // codec roundtrip preserves every answer
    val rt = KllCodec.deserialize(KllCodec.serialize(s))
    assert(rt.n == s.n && rt.quantile(0.5) == s.quantile(0.5)
      && rt.quantile(0.99) == s.quantile(0.99))
    // merge of disjoint halves: weight exact, envelope still holds
    val a = new KllDoubles(200)
    val b = new KllDoubles(200)
    (1 to 50000).foreach(v => a.update(v.toDouble))
    (50001 to 100000).foreach(v => b.update(v.toDouble))
    a.merge(b)
    assert(a.n == 100000L && a.carriedWeight == 100000L)
    for (p <- Seq(0.25, 0.5, 0.75))
      assert(math.abs(a.quantile(p) / 100000.0 - p) <= 2.0 / 200 + 1e-9)
  }

  test("kll merges keep the inputs' k, not a default") {
    import spark.implicits._
    import graft.expressions.{Kll, KllCodec}
    // aggregate path: k=1000 day sketches must roll up at k=1000
    val days = (1 to 30000).map(i => (i % 3, i.toDouble)).toDF("d", "v")
      .groupBy($"d").agg(Kll.sketchAgg($"v", k = 1000).as("sk"))
    val merged = days.agg(Kll.mergeAgg($"sk").as("msk"))
      .select($"msk").collect().head.getAs[Array[Byte]](0)
    val m = KllCodec.deserialize(merged)
    assert(m.k == 1000, s"merge re-compressed to k=${m.k}")
    assert(m.n == 30000L)
    // the k=1000 envelope (not 200's) must hold
    assert(math.abs(m.quantile(0.5) / 30000.0 - 0.5) <= 2.0 / 1000 + 1e-9)
    // scalar pair merge: host is the larger-k side regardless of order
    val pair = (1 to 8000).map(i => (if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("g", "v")
      .groupBy($"g")
      .agg(Kll.sketchAgg($"v", k = 400).as("sk400"),
        Kll.sketchAgg($"v", k = 64).as("sk64"))
      .select(Kll.mergePair($"sk64", $"sk400").as("ab"),
        Kll.mergePair($"sk400", $"sk64").as("ba"))
      .collect().head
    val ab = KllCodec.deserialize(pair.getAs[Array[Byte]]("ab"))
    val ba = KllCodec.deserialize(pair.getAs[Array[Byte]]("ba"))
    assert(ab.k == 400 && ba.k == 400)
    assert(ab.n == 8000L && ba.n == 8000L)
    assert(java.util.Arrays.equals(KllCodec.serialize(ab), KllCodec.serialize(ba)))
  }

  test("kllRollup: weekly merged quantiles inside the envelope, distributed build") {
    import spark.implicits._
    // 3 days x 20k rows of disjoint uniform ranges: a day's own median
    // is useless for the week's — only the MERGED sketch answers it
    val rows = for {
      (d, off) <- Seq(("2024-01-08", 0), ("2024-01-09", 20000),
        ("2024-01-10", 40000))
      i <- 1 to 20000
    } yield (Timestamp.valueOf(s"$d 10:00:00"), (off + i).toDouble)
    val df = rows.toDF("ts", "value").repartition(8)
    val got = Profiling.kllRollup(df, "ts", "value").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("n_rows") == 60000L)
    for ((p, cname) <- Seq((0.25, "q25"), (0.5, "q50"), (0.75, "q75"),
      (0.9, "q90"), (0.99, "q99"))) {
      val est = r.getAs[Double](cname)
      // distributed merge order varies run to run: pin the envelope
      assert(math.abs(est / 60000.0 - p) <= 2.0 / 200 + 1e-9,
        s"$cname=$est rank=${est / 60000.0} vs $p")
    }
  }

  test("kll SQL functions: sketch/merge/quantiles/n registered via extensions") {
    import spark.implicits._
    (1 to 10000).map(i => (i % 7, i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("kll_sql_t")
    val r = spark.sql(
      """SELECT kll_n(sk) AS n,
        |       kll_quantiles(sk, 0.5D)[0] AS p50
        |FROM (SELECT kll_merge_agg(sk) AS sk
        |      FROM (SELECT kll_sketch_agg(CAST(v AS DOUBLE), 200) AS sk
        |            FROM kll_sql_t GROUP BY g))""".stripMargin)
      .collect().head
    assert(r.getAs[Long]("n") == 10000L)
    assert(math.abs(r.getAs[Double]("p50") / 10000.0 - 0.5) <= 2.0 / 200 + 1e-9)
    // scalar pair merge agrees with the aggregate path
    val p = spark.sql(
      """SELECT kll_n(kll_merge_pair(a.sk, b.sk)) AS n FROM
        |  (SELECT kll_sketch_agg(CAST(v AS DOUBLE)) AS sk FROM kll_sql_t WHERE g < 3) a,
        |  (SELECT kll_sketch_agg(CAST(v AS DOUBLE)) AS sk FROM kll_sql_t WHERE g >= 3) b""".stripMargin)
      .collect().head
    assert(p.getAs[Long]("n") == 10000L)
  }

  test("kll merge determinism: max-k adoption is order-free; equal-k pair merge is symmetric") {
    import graft.expressions.{KllCodec, KllDoubles}
    def sk(k: Int, vs: Range): Array[Byte] = {
      val s = new KllDoubles(k); vs.foreach(v => s.update(v.toDouble))
      KllCodec.serialize(s)
    }
    val a64 = sk(64, 1 to 3000)
    val b400 = sk(400, 3001 to 6000)
    val c128 = sk(128, 6001 to 9000)
    // heterogeneous-k rollup through the PRODUCTION aggregate's merge
    // path: result k = MAX k seen, whatever the partition/merge order
    // (the r10-advice hazard) — driving KllMergeAgg itself, not a
    // replica of its rule
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val agg = graft.expressions.KllMergeAgg(Literal(null, BinaryType))
    for (order <- Seq(a64, b400, c128).permutations) {
      val m = order.foldLeft(agg.createAggregationBuffer()) { (acc, bytes) =>
        agg.merge(acc, KllCodec.deserialize(bytes))
      }
      assert(m.k == 400 && m.n == 9000L, s"k=${m.k} n=${m.n}")
    }
    // equal-k scalar pair merge: byte-identical in both argument
    // orders (content tie-break, not argument order)
    import org.apache.spark.sql.catalyst.InternalRow
    import graft.expressions.KllMergePairExpr
    val x = sk(200, 1 to 5000)
    val y = sk(200, 5001 to 9999)
    val xy = KllMergePairExpr(Literal(x), Literal(y))
      .eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    val yx = KllMergePairExpr(Literal(y), Literal(x))
      .eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    assert(java.util.Arrays.equals(xy, yx))
    assert(KllCodec.deserialize(xy).n == 9999L)
  }

  test("kllErrorPanel: every estimate inside the declared envelope") {
    import spark.implicits._
    // heavy-tailed values (i^2), shuffled across 8 partitions — the
    // in-plan partial-sketch merge IS the mergeability exercise
    val df = (1 to 50000).map(i => (i.toLong * i)).toDF("value")
      .repartition(8)
    val got = Profiling.kllErrorPanel(df, "value").collect()
    assert(got.length == 5)
    assert(got.forall(_.getAs[Boolean]("within_bound")),
      got.map(r => s"${r.getAs[Double]("quantile")}:${r.getAs[Double]("rank_error")}")
        .mkString(", "))
  }

  test("weightedSampleN: exact size, weight-proportional inclusion, deterministic") {
    import spark.implicits._
    // 1000 light (w=1) + 1000 heavy (w=10) rows
    val df = ((1L to 1000L).map(i => (i, 1.0)) ++
      (1001L to 2000L).map(i => (i, 10.0))).toDF("k", "w")
    val got = Sampling.weightedSampleN(df, "k", "w", n = 200).collect()
    assert(got.length == 200)
    assert(got.map(_.getLong(0)).distinct.length == 200) // without replacement
    val heavy = got.count(_.getLong(0) > 1000L)
    // inclusion odds ~10:1 -> expect ~180 heavy; leave generous noise room
    assert(heavy > 150 && heavy < 200, s"heavy=$heavy")
    // pure function of (key, weight): identical rows after repartition
    val again = Sampling.weightedSampleN(df.repartition(17), "k", "w", n = 200)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // zero/negative/null weights never selected
    val mixed = df.unionAll(Seq((3000L, 0.0), (3001L, -5.0)).toDF("k", "w"))
    val sel = Sampling.weightedSampleN(mixed, "k", "w", n = 2000)
      .collect().map(_.getLong(0)).toSet
    assert(!sel.contains(3000L) && !sel.contains(3001L) && sel.size == 2000)
  }

  test("bootstrapMeans: Poisson(1) weights, layout-invariant, means bracket truth") {
    import spark.implicits._
    val n = 4000
    val df = (1 to n).map(i => (i.toLong, 10.0 + (i % 7))).toDF("k", "v")
    val got = Sampling.bootstrapMeans(df, "k", "v", b = 16)
      .orderBy("resample_id").collect()
    assert(got.length == 16)
    // E[weight] = 1: each resample's effective n concentrates near n
    val effs = got.map(_.getAs[Long]("n_eff"))
    assert(effs.forall(e => e > n * 0.9 && e < n * 1.1))
    // every resampled mean stays near the true mean (sd ~ 2/63 here)
    val truth = (1 to n).map(i => 10.0 + (i % 7)).sum / n
    assert(got.map(_.getAs[Double]("mean_boot")).forall(m => math.abs(m - truth) < 0.5))
    // pure function of (key, resample): identical bits after repartition
    val again = Sampling.bootstrapMeans(df.repartition(13), "k", "v", b = 16)
      .orderBy("resample_id").collect()
    assert(got.map(_.getAs[Double]("mean_boot")).toSeq ==
      again.map(_.getAs[Double]("mean_boot")).toSeq)
    assert(effs.toSeq == again.map(_.getAs[Long]("n_eff")).toSeq)
  }

  test("stratified sample is deterministic and row-key-defined") {
    val s1 = Sampling.stratified(events, "event_type",
      Map("CLICK" -> 0.25, "VIEW" -> 0.125), 0.5, Seq("event_id"))
    val s2 = Sampling.stratified(events, "event_type",
      Map("CLICK" -> 0.25, "VIEW" -> 0.125), 0.5, Seq("event_id"))
    assert(s1.collect().sortBy(_.getLong(0)).sameElements(
      s2.collect().sortBy(_.getLong(0))))
    // Membership is exactly the md5-prefix rule — no row inside the
    // sample violates it, no row outside satisfies it.
    val annotated = events.withColumn("bkt",
      substring(md5(col("event_id").cast("string")), 1, 4))
    val kept = s1.select("event_id").collect().map(_.getLong(0)).toSet
    annotated.select("event_id", "event_type", "bkt").collect().foreach { r =>
      val thr = r.getString(1) match {
        case "CLICK" => "4000"; case "VIEW" => "2000"; case _ => "8000"
      }
      assert((r.getString(2) < thr) == kept.contains(r.getLong(0)),
        s"row ${r.getLong(0)} bucket ${r.getString(2)} thr $thr")
    }
  }

  test("classBalance: minority kept whole, majority thinned toward parity, md5-pure") {
    import spark.implicits._
    // 400 majority 'a' vs 50 minority 'b': b keeps rate 1 (thr 65536
    // > any 4-hex bucket), a keeps ~50 in expectation
    val df = ((1L to 400L).map(i => (i, "a")) ++ (401L to 450L).map(i => (i, "b")))
      .toDF("doc_id", "cls")
    val got = Sampling.classBalance(df, "cls", Seq("doc_id"))
    val byCls = got.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCls("b") == 50L)
    assert(byCls("a") > 20L && byCls("a") < 90L)
    // rate columns carry the applied rule
    val aRow = got.filter(col("cls") === "a").head
    assert(aRow.getAs[Long]("n_class") == 400L)
    assert(aRow.getAs[Double]("class_rate") == 0.125)
    // determinism
    val again = Sampling.classBalance(df, "cls", Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("stratified sample hits each stratum's rate within binomial noise") {
    val s = Sampling.stratified(events, "event_type",
      Map("CLICK" -> 0.25, "VIEW" -> 0.125), 0.5, Seq("event_id"))
    val totals = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = s.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (stratum, n) =>
      val rate = stratum match {
        case "CLICK" => 0.25; case "VIEW" => 0.125; case _ => 0.5
      }
      val got = sampled.getOrElse(stratum, 0L).toDouble
      val sd = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(got - n * rate) <= 5 * sd + 1,
        s"$stratum: got $got of $n at rate $rate")
    }
  }

  test("sample membership is invariant under repartitioning (what sample() lacks)") {
    // the property that makes the sampler curation-grade: physical
    // layout can never change which rows survive
    val a = Sampling.stratified(events, "event_type", Map("CLICK" -> 0.25), 0.5,
      Seq("event_id")).select("event_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratified(events.repartition(13), "event_type",
      Map("CLICK" -> 0.25), 0.5,
      Seq("event_id")).select("event_id").collect().map(_.getLong(0)).toSet
    val c = Sampling.stratified(events.repartition(1), "event_type",
      Map("CLICK" -> 0.25), 0.5,
      Seq("event_id")).select("event_id").collect().map(_.getLong(0)).toSet
    assert(a == b && b == c)
    // while Spark's own sample() shifts membership with the layout
    val s1 = events.sample(0.5, seed = 7).select("event_id").collect().toSet
    val s2 = events.repartition(13).sample(0.5, seed = 7).select("event_id").collect().toSet
    assert(s1 != s2, "sample() happened to agree across layouts — raise partitions")
  }

  test("split assignment: group-consistent, exhaustive, ratio-sane") {
    val s = Sampling.splitAssign(events,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), Seq("user_id"))
    // every row of a user lands in exactly one split (the leakage guard)
    val perUser = s.groupBy("user_id")
      .agg(countDistinct(col("split")).as("n_splits")).collect()
    assert(perUser.forall(_.getLong(1) == 1L))
    // the partition is exhaustive and ratios are near the targets
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    val total = counts.values.sum
    assert(total == events.count())
    assert(math.abs(counts("train").toDouble / total - 0.8) < 0.1)
    // invalid fractions are rejected
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(events, Seq("a" -> 0.5, "b" -> 0.4), Seq("user_id"))
    }
  }

  test("domain mix hits the target proportions and maxes out the scarcest domain") {
    import spark.implicits._
    // 1000 A, 300 B, 100 C; targets 60/30/10 → T = min(1000/.6,
    // 300/.3, 100/.1) = 1000, bound by B AND C (both keep all, rate
    // 1); A downsamples to ~600 (rate .6) — SEQUENTIAL ids on
    // purpose: a `key mod N` bucket would keep all 1000 A rows here
    val docs = ((1L to 1000L).map((_, "A")) ++ (2001L to 2300L).map((_, "B")) ++
      (3001L to 3100L).map((_, "C")) :+ (4001L, "D")) // untargeted domain drops
      .toDF("doc_id", "lang")
    val shares = Map("A" -> 0.6, "B" -> 0.3, "C" -> 0.1)
    val kept = Sampling.domainMix(docs, "lang", shares, "doc_id")
    val by = kept.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the binding domains keep everything (rate exactly 1 → "g")
    assert(by("B") == 300L && by("C") == 100L, by.toString)
    assert(!by.contains("D"))
    // A's md5-bucket downsample lands near its 600-row target
    // (binomial noise over 1000 trials)
    assert(math.abs(by("A") - 600.0) < 60, by.toString)
    val total = by.values.sum.toDouble
    assert(math.abs(by("A") / total - 0.6) < 0.05, by.toString)
    // membership is layout-invariant
    val again = Sampling.domainMix(docs.repartition(13), "lang", shares, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("rate 1.0 keeps every row, rate 0.0 keeps none") {
    val all = Sampling.stratified(events, "event_type", Map.empty, 1.0, Seq("event_id"))
    assert(all.count() == events.count())
    val none = Sampling.stratified(events, "event_type", Map.empty, 0.0, Seq("event_id"))
    assert(none.count() == 0)
  }

  test("importanceWeights: target-only vocabulary scores positive, anti-target negative") {
    import spark.implicits._
    // target docs speak {aa bb}, non-target docs speak {zz yy}; one
    // mixed doc sits in between. Weights must order: pure-target
    // vocab > mixed > pure-raw vocab, with signs matching.
    val docs = Seq(
      (1L, "aa bb aa bb", "en"), (2L, "aa bb bb aa", "en"),
      (3L, "zz yy zz yy", "fr"), (4L, "yy zz yy zz", "fr"),
      (5L, "aa zz", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = Sampling.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en", nBuckets = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.size == 5)
    assert(got(1)._1 == 4 && got(1)._2 > 0 && got(1)._3)
    assert(got(3)._2 < 0 && !got(3)._3)
    assert(got(1)._2 > got(5)._2 && got(5)._2 > got(3)._2)
    // same text, same weight: the score is a pure function of tokens
    assert(got(1)._2 == got(2)._2 && got(3)._2 == got(4)._2)
  }

  test("sketch profile tracks exact distincts and quantiles within bounds") {
    val sk = SparkEntry.queries("sketch_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val exact = events
      .groupBy(upper(trim(col("event_type"))).as("et"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("du"),
        percentile(col("value"), lit(0.5)).as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(sk.keySet == exact.keySet)
    exact.foreach { case (et, (n, du, med)) =>
      val (skN, skDu, skMed) = sk(et)
      assert(skN == n) // plain count is exact
      assert(math.abs(skDu - du) <= math.max(3, du * 0.05), s"$et distinct $skDu vs $du")
      assert(math.abs(skMed - med) <= math.abs(med) * 0.05 + 1, s"$et median $skMed vs $med")
    }
  }

  test("session_window twin equals the window-function sessionizer on the lake") {
    val a = Sessionize.byGap(events, "user_id", "ts", "event_id", "value", 1800)
      .orderBy("user_id", "session_seq").collect()
    val b = Sessionize.byGapBuiltin(events, "user_id", "ts", "event_id", "value", 1800)
      .orderBy("user_id", "session_seq").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("session_window twin agrees at the exact-gap boundary") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def at(ms: Long) = new Timestamp(t0.getTime + ms)
    // gap 10s: +10000ms is INSIDE (<=), +10001ms opens a new session
    val df = Seq(
      (1L, at(0), 1L, 1.0), (1L, at(10000), 2L, 1.0), (1L, at(20001), 3L, 1.0),
      (2L, at(0), 4L, 1.0), (2L, at(10001), 5L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val a = Sessionize.byGap(df, "user_id", "ts", "event_id", "value", 10)
      .orderBy("user_id", "session_seq").collect()
    val b = Sessionize.byGapBuiltin(df, "user_id", "ts", "event_id", "value", 10)
      .orderBy("user_id", "session_seq").collect()
    assert(a.sameElements(b))
    val sess = a.map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(sess.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L), (2L, 2L, 1L)))
  }

  test("firstByGrain keeps the earliest row per grain") {
    import spark.implicits._
    val df = Seq(
      (1L, "A", Timestamp.valueOf("2024-01-01 10:00:00"), 10L),
      (1L, "A", Timestamp.valueOf("2024-01-01 09:00:00"), 11L),
      (1L, "B", Timestamp.valueOf("2024-01-01 12:00:00"), 12L),
      (2L, "A", Timestamp.valueOf("2024-01-01 08:00:00"), 13L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Dedup.firstByGrain(df, Seq("user_id", "event_type"), Seq("ts", "event_id"))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(11L, 12L, 13L))
  }

  test("embedding centroids: distributed per-label vector mean") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(10.0f, 20.0f), 1),
      (4L, null.asInstanceOf[Array[Float]], 1)) // null vectors drop out
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Ann.centroids(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      (0, 0) -> (2L, 2.0), (0, 1) -> (2L, 3.0),
      (1, 0) -> (1L, 10.0), (1, 1) -> (1L, 20.0)))
  }

  test("skew hot keys: descending counts, shares and x_avg self-consistent") {
    val got = SparkEntry.queries("skew_hot_keys")(spark, sf).collect()
    assert(got.length == 5)
    val counts = got.map(_.getAs[Long]("n_rows"))
    assert(counts.sameElements(counts.sortBy(-(_: Long))), "not ordered by count desc")
    // the hottest key is at or above the per-key average by definition
    assert(got.head.getAs[Double]("x_avg") >= 1.0)
    assert(got.forall { r =>
      val p = r.getAs[Double]("pct_of_total"); p > 0.0 && p <= 100.0
    })
  }

  test("quality-weighted sampling: tier thresholds applied, deterministic replay") {
    val q = SparkEntry.queries("sample_quality_weighted")
    val a = q(spark, sf).collect()
    // the tier -> threshold mapping is part of the checked output
    val thresholds = a.map(r =>
      r.getAs[String]("quality_tier") -> r.getAs[String]("sample_threshold")).toSet
    assert(thresholds.subsetOf(Set(
      "T1" -> "2000", "T2" -> "4000", "T3" -> "8000", "T4" -> "g")))
    // top tier keeps every row (threshold 'g' beats any hex bucket)
    assert(a.filter(_.getAs[String]("quality_tier") == "T4")
      .forall(_.getAs[String]("sample_bucket") < "g"))
    // membership is a pure function of doc_id: a rerun is identical
    val b = q(spark, sf).collect()
    assert(a.map(_.getAs[Long]("doc_id")).sorted.sameElements(
      b.map(_.getAs[Long]("doc_id")).sorted))
  }

  test("data drift: proportions each sum to 1, shifts sum to 0") {
    import spark.implicits._
    val got = SparkEntry.queries("data_drift_value")(spark, sf).collect()
    assert(got.nonEmpty)
    assert(math.abs(got.map(_.getAs[Double]("p_old")).sum - 1.0) < 1e-9)
    assert(math.abs(got.map(_.getAs[Double]("p_new")).sum - 1.0) < 1e-9)
    assert(math.abs(got.map(_.getAs[Double]("p_shift")).sum) < 1e-9)
    // both snapshots counted over the same shared-bounds buckets
    val ev = events.filter($"value".isNotNull)
    assert(got.map(r => r.getAs[Long]("n_old") + r.getAs[Long]("n_new")).sum == ev.count())
  }

  test("rollup demand: detail, per-mode and grand-total levels reconcile") {
    val got = SparkEntry.queries("ana_rollup_demand")(spark, sf).collect()
    val grand = got.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val modeTotals = got.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val detail = got.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length == 1)
    val total = grand.head.getAs[Long]("n_events")
    assert(detail.map(_.getAs[Long]("n_events")).sum == total)
    assert(modeTotals.map(_.getAs[Long]("n_events")).sum == total)
    assert(modeTotals.nonEmpty && detail.length > modeTotals.length)
  }

  test("kfoldAssign: complete tiling, group purity, near-even folds, stable") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (1L to 4000L).map(u => (u, u % 13)).toDF("user_id", "x")
    val got = Sampling.kfoldAssign(df, k = 5, Seq("user_id"))
    val folds = got.groupBy("fold_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(folds.keySet == Set(0, 1, 2, 3, 4))
    // equal hash-space tiles: binomial noise only
    assert(folds.values.forall(n => n > 600 && n < 1000), folds.toString)
    // every row of a group lands in one fold (pure function of the key)
    val multi = df.unionAll(df) // duplicate rows = same keys
    val perKey = Sampling.kfoldAssign(multi, k = 5, Seq("user_id"))
      .groupBy("user_id").agg(countDistinct(col("fold_id")).as("nf"))
      .filter(col("nf") > 1).count()
    assert(perKey == 0L)
    // layout/run stable
    val again = Sampling.kfoldAssign(df.repartition(7), k = 5, Seq("user_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val first = got.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(first == again)
  }

  test("hllOverlap: inclusion-exclusion overlap near-exact in the sparse regime") {
    import spark.implicits._
    import graft.operators.Profiling
    val df = ((1 to 1000).map(k => (k.toLong, "A")) ++
      (501 to 1500).map(k => (k.toLong, "B"))).toDF("k", "slice")
    val got = Profiling.hllOverlap(df, "k",
      col("slice") === "A", col("slice") === "B").collect()(0)
    // truth: |A|=1000, |B|=1000, |A∪B|=1500, |A∩B|=500, J=1/3;
    // lgK=12 sketches at this cardinality estimate within a few %
    assert(math.abs(got.getAs[Double]("est_a") - 1000.0) < 50)
    assert(math.abs(got.getAs[Double]("est_b") - 1000.0) < 50)
    assert(math.abs(got.getAs[Double]("est_union") - 1500.0) < 75)
    assert(math.abs(got.getAs[Double]("est_intersect") - 500.0) < 100)
    assert(math.abs(got.getAs[Double]("jaccard_est") - 1.0 / 3.0) < 0.07)
    // disjoint slices: the clamp keeps I-E's noise out of negative
    // territory and Jaccard stays near zero
    val dj = Profiling.hllOverlap(df, "k",
      col("slice") === "A" && col("k") <= 200,
      col("slice") === "A" && col("k") > 800).collect()(0)
    assert(dj.getAs[Double]("est_intersect") >= 0.0)
    assert(dj.getAs[Double]("est_intersect") < 40.0)
    assert(dj.getAs[Double]("jaccard_est") < 0.1)
  }

  test("hllOverlapReplayable: md5-register estimates inside the envelope, both branches, exact identities") {
    import spark.implicits._
    import graft.operators.Profiling
    // planted: |A|=|B|=10000, |A∪B|=19000, |A∩B|=1000 — at lgK=12
    // (m=4096) the slice estimates sit in the LINEAR-COUNTING branch
    // (raw <= 2.5m) while the union (19000) takes the RAW integer
    // branch, so one run pins both estimator paths
    val rows = ((1 to 10000).map(u => (u.toLong, "a")) ++
      (9001 to 19000).map(u => (u.toLong, "b"))).toDF("uid", "slice")
    val out = Profiling.hllOverlapReplayable(rows, "uid",
      col("slice") === "a", col("slice") === "b", lgK = 12).collect().head
    def d(name: String): Double =
      out.getDecimal(out.fieldIndex(name)).doubleValue()
    // HLL RSE at m=4096 ~ 1.6%; linear counting tighter — allow 5%
    assert(math.abs(d("est_a") - 10000) / 10000 < 0.05, s"est_a=${d("est_a")}")
    assert(math.abs(d("est_b") - 10000) / 10000 < 0.05, s"est_b=${d("est_b")}")
    assert(math.abs(d("est_union") - 19000) / 19000 < 0.05)
    // I-E intersection: absolute error rides the UNION's few-% noise
    // (documented "is the overlap big" gate) — loose band only
    assert(d("est_intersect") >= 0.0 && d("est_intersect") < 3000.0,
      s"est_intersect=${d("est_intersect")}")
    // exact panel identities: the clamp and the integer-ppm Jaccard
    // recompute bit-identically from the emitted decimals
    val (ea, eb, eu, ei) = (out.getDecimal(out.fieldIndex("est_a")),
      out.getDecimal(out.fieldIndex("est_b")),
      out.getDecimal(out.fieldIndex("est_union")),
      out.getDecimal(out.fieldIndex("est_intersect")))
    val want = ea.add(eb).subtract(eu).max(java.math.BigDecimal.ZERO)
    assert(ei.compareTo(want) == 0)
    val ppm = out.getLong(out.fieldIndex("jaccard_ppm"))
    val wantPpm = (BigInt(ei.movePointRight(6).toBigIntegerExact) * 1000000 /
      BigInt(eu.movePointRight(6).toBigIntegerExact)).toLong
    assert(ppm == wantPpm)
  }

  test("cube demand: all four grouping sets present and every level reconciles") {
    val got = SparkEntry.queries("ana_cube_demand")(spark, sf).collect()
    def ofSet(gid: Long) = got.filter(_.getAs[Long]("grouping_set_id") == gid)
    val detail = ofSet(0L)      // (type, day)
    val perType = ofSet(1L)     // day aggregated away
    val perDay = ofSet(2L)      // type aggregated away — the set ROLLUP lacks
    val grand = ofSet(3L)
    assert(grand.length == 1)
    val total = grand.head.getAs[Long]("n_events")
    assert(detail.map(_.getAs[Long]("n_events")).sum == total)
    assert(perType.map(_.getAs[Long]("n_events")).sum == total)
    assert(perDay.map(_.getAs[Long]("n_events")).sum == total)
    // the grouping id, not NULL-ness, is the set discriminator: every
    // per-day row has its type NULLed by the cube
    assert(perDay.forall(_.isNullAt(0)) && perDay.forall(!_.isNullAt(1)))
    assert(perType.forall(!_.isNullAt(0)) && perType.forall(_.isNullAt(1)))
    // CUBE == ROLLUP + the per-day slice: the shared sets agree
    val roll = SparkEntry.queries("ana_rollup_demand")(spark, sf).collect()
      .filter(r => !r.isNullAt(0) && r.isNullAt(1))
      .map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap
    assert(perType.map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap == roll)
  }

  test("histogram: exact equi-width buckets, max value clamped into the last") {
    import spark.implicits._
    val df = (0 to 100).map(_.toDouble).toDF("v") // mn=0, mx=100, 10 buckets of width 10
    val got = Profiling.histogram(df, "v", 10).orderBy("bucket").collect()
    assert(got.length == 10)
    assert(got.map(_.getAs[Long]("n_rows")).sum == 101L)
    assert(got.head.getAs[Long]("n_rows") == 10L)      // [0, 10)
    val last = got.last
    assert(last.getAs[Int]("bucket") == 9)
    assert(last.getAs[Long]("n_rows") == 11L)          // [90, 100] — mx clamped in
    assert(last.getAs[Double]("bucket_max") == 100.0)
    // a degenerate (constant) column collapses to bucket 0, no div-by-zero
    val deg = Profiling.histogram(Seq(5.0, 5.0).toDF("v"), "v", 10).collect()
    assert(deg.length == 1 && deg.head.getAs[Int]("bucket") == 0 &&
      deg.head.getAs[Long]("n_rows") == 2L)
  }

  test("equi-depth histogram: ~n/k rows per bucket even under heavy skew") {
    import spark.implicits._
    // heavily skewed: equi-width would put 990 of 1000 rows in bucket 0
    val df = ((1 to 990).map(_.toDouble / 100) ++ (1 to 10).map(_ * 1000.0))
      .toDF("v")
    val got = Profiling.histogramEquiDepth(df, "v", 4)
      .orderBy("bucket").collect()
    assert(got.length == 4)
    assert(got.map(_.getAs[Long]("n_rows")).sum == 1000L)
    // every quartile bucket holds ~250 rows despite the skew
    got.foreach(r => assert(math.abs(r.getAs[Long]("n_rows") - 250L) <= 5,
      got.map(_.getAs[Long]("n_rows")).mkString(",")))
    // buckets tile the value range in order
    val maxes = got.map(_.getAs[Double]("bucket_max"))
    assert(maxes.sameElements(maxes.sorted))
    assert(got.last.getAs[Double]("bucket_max") == 10000.0)
  }

  test("bucketed co-located join and aggregation plan with zero exchanges") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong % 97, i.toLong * 2)).toDF("k", "vb")
    MedallionSink.writeBucketed(a, "graft_bkt_a", 8, Seq("k"))
    MedallionSink.writeBucketed(b, "graft_bkt_b", 8, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      assert(j.count() == a.join(b, "k").count())
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      val agg = spark.table("graft_bkt_a").groupBy("k").agg(sum("va"))
      assert(agg.count() == 97)
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed agg shuffled:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("winsorize: exact percentile band clips tails, interior untouched") {
    import spark.implicits._
    val df = (1 to 20).map(i => ("A", i.toDouble)).toDF("g", "v")
    val got = Sampling.winsorize(df, "g", "v", 0.05, 0.95)
      .orderBy("v").collect()
    // 1..20: p05 = 1.95, p95 = 19.05 (linear interpolation)
    assert(math.abs(got.head.getAs[Double]("v_winsorized") - 1.95) < 1e-9)
    assert(math.abs(got.last.getAs[Double]("v_winsorized") - 19.05) < 1e-9)
    assert(got.head.getAs[Boolean]("was_clipped") && got.last.getAs[Boolean]("was_clipped"))
    val interior = got.filter(r => r.getAs[Double]("v") >= 2 && r.getAs[Double]("v") <= 19)
    assert(interior.forall(r => r.getAs[Double]("v_winsorized") == r.getAs[Double]("v")))
    assert(interior.forall(!_.getAs[Boolean]("was_clipped")))
  }

  test("negativePairs: exact k per anchor, never self, deterministic, degenerate-safe") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val out = graft.operators.Sampling.negativePairs(docs, "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // exactly k rows per anchor, every anchor covered
    assert(out.length == 400)
    assert(out.groupBy(_._1).forall { case (_, g) =>
      g.length == 4 && g.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4) })
    // self-pairing is impossible by construction (nonzero rotation)
    assert(out.forall { case (a, _, n) => a != n })
    // negatives land in the corpus
    assert(out.forall { case (_, _, n) => n >= 0L && n < 100L })
    // pure function of (key, index): layout cannot change the draw
    val re = graft.operators.Sampling.negativePairs(docs.repartition(7), "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(re.toSet == out.toSet)
    // roughly uniform usage: no doc should dominate as a negative
    val use = out.groupBy(_._3).view.mapValues(_.length)
    assert(use.values.max <= 20)
    // a 1-row corpus has no valid negative: empty, not a crash
    val one = Seq((1L, "only")).toDF("doc_id", "text")
    assert(graft.operators.Sampling.negativePairs(one, "doc_id", 4).count() == 0L)
  }

  test("corpusShuffle: exact permutation, bounded shards, layout-stable") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val out = graft.operators.Sampling.corpusShuffle(docs, "doc_id", shardSize = 64)
    // payload columns ride along with the shuffle columns
    assert(out.columns.toSeq ==
      Seq("doc_id", "text", "shuffle_hash", "shuffle_pos", "shard", "shard_pos"))
    val got = out.select("doc_id", "shuffle_pos", "shard", "shard_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // positions are exactly 1..n (a permutation — nothing lost/duped)
    assert(got.map(_._2).sorted.toSeq == (1L to 300L))
    // shard layout: pos p -> shard (p-1)/64, 1-based in-shard position
    assert(got.forall { case (_, pos, sh, shPos) =>
      sh == (pos - 1) / 64 && shPos == pos - sh * 64 && shPos >= 1 && shPos <= 64 })
    // the permutation is md5 order — replay it driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 300L).sortBy(id => (hex(id.toString), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got.forall { case (id, pos, _, _) => expected(id) == pos })
    // layout-independent: same permutation under a different partitioning
    val re = graft.operators.Sampling.corpusShuffle(docs.repartition(7), "doc_id", 64)
      .select("doc_id", "shuffle_pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, pos, _, _) => re(id) == pos })
    // an epoch salt selects a DIFFERENT deterministic permutation
    val e1 = graft.operators.Sampling.corpusShuffle(docs, "doc_id", 64, salt = "epoch=1")
      .select("doc_id", "shuffle_pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 != re)                        // reshuffled vs the bare-key order
    assert(e1.values.toSeq.sorted == (1L to 300L))  // still a full permutation
    val e1again = graft.operators.Sampling.corpusShuffle(docs, "doc_id", 64, salt = "epoch=1")
      .select("doc_id", "shuffle_pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 == e1again)                   // and reproducible
  }

  test("writeTrainingShards: shard dirs replay the exact permutation, no extra shuffle pass") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/corpus"
    graft.sources.MedallionSink.writeTrainingShards(docs, dir, "doc_id", shardSize = 64)
    val back = spark.read.parquet(dir)
    assert(back.count() == 300)
    // 5 shard dirs: 4 full (64 rows) + the tail (44); the partition
    // column comes back directory-inferred (int) — normalize to long
    val byShard = back.groupBy(col("shard").cast("long").as("shard")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard == Map(0L -> 64L, 1L -> 64L, 2L -> 64L, 3L -> 64L, 4L -> 44L))
    // reading shards in order + rows by shard_pos replays the global
    // md5 permutation, payload intact
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectedOrder = (0L until 300L).sortBy(id => (hex(id.toString), id))
    val replayed = back.select(col("shard").cast("long"), col("shard_pos"),
        col("doc_id"), col("text")).collect()
      .sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(replayed.map(_.getLong(2)).toSeq == expectedOrder)
    assert(replayed.forall(r => r.getString(3) == s"doc${r.getLong(2)}"))
    // boundary slop only: each shard is at most 2 files
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 to 4).foreach { sh =>
      val n = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/shard=$sh"))
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(n >= 1 && n <= 2, s"shard $sh written as $n files")
    }
  }

  test("tokenBudget: quality-greedy prefix, exact running total, budget respected") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val stats = (0L until 200L).map(i =>
      (i, math.rint(rnd.nextDouble() * 100) / 100, 10 + rnd.nextInt(90)))
      .toDF("doc_id", "q", "n_tok")
    val kept = graft.operators.Sampling.tokenBudget(stats, "doc_id", "q", "n_tok", 3000L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._4)
    // replay sequentially: greedy by (q desc, doc_id) while total <= budget
    val all = stats.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    var run = 0L
    val expect = all.takeWhile { case (_, _, t) => { run += t; run <= 3000L } }
    assert(kept.map(_._1).toSeq == expect.map(_._1).toSeq)
    // running totals are the exact sequential prefix sums
    val cums = expect.scanLeft(0L) { case (a, (_, _, t)) => a + t }.tail
    assert(kept.map(_._4).toSeq == cums.toSeq)
    assert(kept.last._4 <= 3000L)
  }

  test("corrPairs: exact ±1 on linear columns, NULL on zero variance, null rows excluded") {
    import spark.implicits._
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0),
      (4.0, 8.0, -4.0, 5.0))
      .toDF("x", "y", "z", "c")
      .unionByName(Seq((Option.empty[Double], Option(1.0), Option(1.0), Option(1.0)))
        .toDF("x", "y", "z", "c"))
    val got = graft.operators.Profiling.corrPairs(df, Seq("x", "y", "z", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.get(3)))).toMap
    assert(got.size == 6)
    assert(got(("x", "y"))._1 == 4) // the null-x row is excluded everywhere
    assert(math.abs(got(("x", "y"))._2.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(got(("x", "z"))._2.asInstanceOf[Double] + 1.0) < 1e-12)
    assert(got(("x", "c"))._2 == null) // zero variance -> NULL, not a div error
  }

  test("partialCorr: matches the textbook recursion; confounder collapse and survival") {
    import spark.implicits._
    // x and y both driven by z plus distinct wiggles: pairwise r_xy is
    // strongly positive, but controlling for z must collapse it toward
    // the wiggles' (near-zero) association.
    val rnd = new scala.util.Random(77)
    val rows = Seq.tabulate(200) { i =>
      val z = rnd.nextDouble() * 10
      (z + rnd.nextGaussian() * 0.5, z + rnd.nextGaussian() * 0.5, z)
    }
    val df = rows.toDF("x", "y", "z")
    val r = graft.operators.Profiling.partialCorr(df, "x", "y", "z").collect().head
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length; val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum
      cov / math.sqrt(a.map(u => (u - ma) * (u - ma)).sum *
        b.map(v => (v - mb) * (v - mb)).sum)
    }
    val (xs, ys, zs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val expect = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(r.getAs[Long]("n") == 200L)
    // decimal(18,6) moment grid: agreement to ~1e-4 on unit-scale r's
    assert(math.abs(r.getAs[Double]("r_xy") - rxy) < 1e-4)
    assert(math.abs(r.getAs[Double]("partial_corr") - expect) < 1e-3)
    // the collapse: the partial is much smaller than the raw r_xy
    assert(math.abs(r.getAs[Double]("partial_corr")) <
      math.abs(r.getAs[Double]("r_xy")) / 2)
    // |r_xz| = 1 (x IS z): denominator 0 → NULL partial, not an error
    val degen = rows.map(t => (t._3, t._2, t._3)).toDF("x", "y", "z")
    val dg = graft.operators.Profiling.partialCorr(degen, "x", "y", "z").collect().head
    assert(dg.isNullAt(dg.fieldIndex("partial_corr")))
  }

  test("temperatureShares: flattens toward uniform, alpha=1 reproduces raw shares") {
    import spark.implicits._
    // 100:10:1 domain imbalance, plus a null domain that must drop
    val docs = (Seq.fill(100)("big") ++ Seq.fill(10)("mid") ++ Seq("rare"))
      .map(Option(_)).:+(Option.empty[String]).toDF("lang")
    val t05 = graft.operators.Sampling.temperatureShares(docs, "lang", 0.5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(t05.keySet == Set("big", "mid", "rare"))
    assert(t05("big")._1 == 100 && t05("rare")._1 == 1)
    // raw shares are exact quotients of 111
    assert(t05("big")._2 == 100.0 / 111.0 && t05("rare")._2 == 1.0 / 111.0)
    // tempering upweights the rare domain and downweights the big one
    assert(t05("rare")._3 > t05("rare")._2 && t05("big")._3 < t05("big")._2)
    // shares remain a distribution
    assert(math.abs(t05.values.map(_._3).sum - 1.0) < 1e-9)
    // ordering is preserved: bigger domains still get bigger shares
    assert(t05("big")._3 > t05("mid")._3 && t05("mid")._3 > t05("rare")._3)
    // alpha = 1 reproduces the raw mixture up to the 1e-6 weight grid
    // (weights floor-quantize before normalization — the §5 rule)
    val t1 = graft.operators.Sampling.temperatureShares(docs, "lang", 1.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(t1.values.forall { case (raw, temp) => math.abs(raw - temp) < 2e-6 })
    // deterministic across runs
    val again = graft.operators.Sampling.temperatureShares(docs, "lang", 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(t05.forall { case (k, v) => again(k) == v._3 })
  }

  test("exactQuota equals the naive per-stratum window for every branch") {
    import org.apache.spark.sql.expressions.Window
    // big stratum exercises the candidate pre-filter; small ones the
    // sort-whole fallback ("g" threshold)
    val rows = (1L to 2000L).map(i => (i, "big")) ++
      (3001L to 3005L).map(i => (i, "small")) ++
      (4001L to 4060L).map(i => (i, "mid"))
    val df = spark.createDataFrame(rows).toDF("k", "s")
    val w = Window.partitionBy(col("s"))
      .orderBy(md5(col("k").cast("string")), col("k"))
    // several (k, margin) combos cover tight margins (where a stratum
    // may undershoot its candidate draw and take the rescue branch) —
    // the equivalence must hold regardless of which branch fired
    for ((k, m) <- Seq((10, 4.0), (10, 1.2), (50, 1.05), (3, 2.0))) {
      val naive = df.withColumn("sample_rank", row_number().over(w))
        .filter(col("sample_rank") <= k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val got = graft.operators.Sampling.exactQuota(df, "s", "k", k, margin = m)
        .select("k", "s", "sample_rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(got == naive, s"k=$k margin=$m")
    }
    // each stratum yields exactly min(k, n_s) rows
    val q = graft.operators.Sampling.exactQuota(df, "s", "k", 10)
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q == Map("big" -> 10L, "small" -> 5L, "mid" -> 10L))
  }

  test("hllErrorPanel: small cardinalities estimate inside the 3-sigma envelope") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"u${i % 100}", s"t${i % 7}")).toDF("uid", "typ")
    val got = graft.operators.Profiling.hllErrorPanel(df, Seq("uid", "typ"), lgK = 12)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(got("uid").getAs[Long]("exact_distinct") == 100L)
    assert(got("typ").getAs[Long]("exact_distinct") == 7L)
    got.values.foreach { r =>
      assert(r.getAs[Boolean]("within_3sigma"),
        s"${r.getAs[String]("column_name")} rel_error ${r.getAs[Double]("rel_error")}")
      assert(math.abs(r.getAs[Double]("rel_error")) < 0.05)
    }
    // deterministic for a fixed dataset: the same panel twice agrees
    val again = graft.operators.Profiling.hllErrorPanel(df, Seq("uid"), lgK = 12)
      .collect().head.getAs[Long]("hll_estimate")
    assert(again == got("uid").getAs[Long]("hll_estimate"))
  }

  test("budgetWaterfill: small sources keep all, big ones ration at the water line") {
    import spark.implicits._
    // capacities A=10, B=20, C=100, D=200; budget 90:
    // i=2 regime (A,B capped): tau = (90-30)/2 = 30 -> C,D get 30 each
    val df = Seq(("A", 10L), ("B", 20L), ("C", 100L), ("D", 200L))
      .flatMap { case (s, n) => Seq((s, n)) }
      .toDF("source", "w")
    val got = graft.operators.Sampling.budgetWaterfill(df, "source", "w", 90L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("allocated"), r.getAs[Boolean]("is_exhausted"))).toMap
    assert(got("A") == ((10L, true)) && got("B") == ((20L, true)))
    assert(got("C") == ((30L, false)) && got("D") == ((30L, false)))
    // budget respected exactly at the regime boundary
    assert(got.values.map(_._1).sum == 90L)
    // budget covers everything -> tau NULL, everyone exhausted
    val rich = graft.operators.Sampling.budgetWaterfill(df, "source", "w", 1000L)
      .collect()
    assert(rich.forall(_.getAs[Boolean]("is_exhausted")))
    assert(rich.forall(_.isNullAt(rich.head.fieldIndex("tau"))))
    // budget below k*min_cap: nobody capped, everyone gets floor(B/k)
    val tight = graft.operators.Sampling.budgetWaterfill(df, "source", "w", 8L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("allocated")).toMap
    assert(tight.values.toSet == Set(2L)) // floor(8/4)
  }

  test("upsampleRare: rare domains replicate to the floor share, cap binds, rich stay at 1") {
    import spark.implicits._
    // 100 docs: A=80, B=15, C=4, D=1; floor 10%, cap 3
    val df = (Seq.fill(80)("A") ++ Seq.fill(15)("B") ++ Seq.fill(4)("C") ++
      Seq.fill(1)("D")).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "source")
    val got = graft.operators.Sampling.upsampleRare(df, "source",
        minShare = 0.10, maxRep = 3)
      .collect().map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("rep_factor"), r.getAs[Long]("upsampled_docs"))).toMap
    assert(got("A") == ((1L, 80L)))  // 80% >= 10% -> untouched
    assert(got("B") == ((1L, 15L)))  // 15% >= 10% -> untouched
    assert(got("C") == ((3L, 12L)))  // ceil(10/4) = 3 -> within cap
    assert(got("D") == ((3L, 3L)))   // ceil(10/1) = 10 -> CAP binds at 3
    // shares re-normalize over the upsampled total
    val shares = graft.operators.Sampling.upsampleRare(df, "source", 0.10, 3)
      .collect().map(r => r.getAs[String]("domain") ->
        r.getAs[Double]("upsampled_share")).toMap
    assert(math.abs(shares.values.sum - 1.0) < 1e-12)
    assert(math.abs(shares("C") - 12.0 / 110.0) < 1e-12)
  }

  test("kmvRollup: weekly rollup of daily k-min lists EQUALS the direct weekly sketch") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // two ISO weeks; days share heavy user overlap so summed daily
    // distincts overcount while the merged sketch must not; enough
    // users that the weekly sketch saturates k
    val rows = for {
      (d, base) <- Seq(("2024-01-08", 0), ("2024-01-09", 200), ("2024-01-10", 400),
        ("2024-01-15", 0), ("2024-01-17", 350))
      u <- base until (base + 600)
    } yield (Timestamp.valueOf(s"$d 12:00:00"), u.toLong)
    val df = rows.toDF("ts", "user_id")
    val k = 256
    val out = Profiling.kmvRollup(df, "ts", "user_id", k = k)
      .orderBy("week").collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(out.head.fieldIndex("n_days"))).toSeq == Seq(3L, 2L))
    // DIRECT weekly sketch from scratch — the KMV merge exactness
    // claim: k-min(union of daily k-mins) == k-min(week's full set)
    val direct = df
      .select(date_trunc("week", to_date(col("ts"))).cast("date").as("week"),
        graft.operators.Sampling.md5Long60(Seq(col("user_id"))).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("week")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n"), max(col("h")).as("hmax"))
      .orderBy("week").collect()
    out.zip(direct).foreach { case (r, d) =>
      assert(r.getLong(r.fieldIndex("n_retained")) == d.getLong(d.fieldIndex("n")))
      // same retained sample => same theta bound => same estimate;
      // the panel is exact-integer: theta_h is the raw kth hash and
      // est_distinct = (n_eff * 2^60) div theta_h, replayed here with
      // BigInt — bit-identical by construction, no grid tolerance
      val thetaH = r.getLong(r.fieldIndex("theta_h"))
      val est = r.getLong(r.fieldIndex("est_distinct"))
      val hmax = d.getLong(d.fieldIndex("hmax"))
      val n = d.getLong(d.fieldIndex("n"))
      val thetaHDirect = if (n == k) hmax else 1152921504606846976L
      assert(thetaH == thetaHDirect)
      val nEff = if (n == k) k - 1L else n
      val estDirect =
        (BigInt(nEff) * BigInt(1152921504606846976L) / BigInt(thetaHDirect)).toLong
      assert(est == estDirect)
      // true weekly distincts: week1 = 1000 (0..999), week2 = 950
      val truth = if (d.getDate(0).toString == "2024-01-08") 1000.0 else 950.0
      assert(math.abs(est - truth) / truth < 0.19, s"est=$est truth=$truth")
    }
  }

  test("kmvOverlap: planted small intersection inside the envelope; unsaturated regime exact") {
    import spark.implicits._
    // planted universe: A = 1..10000, B = 9001..19000 — true
    // |A|=|B|=10000, |A∩B|=1000, |A∪B|=19000, |A\B|=9000, J≈0.0526.
    // The intersection (~5% of the union) is exactly the regime where
    // HLL inclusion–exclusion noise swamps the signal; the KMV sample
    // must land inside its own sqrt envelope instead.
    val rows = ((1 to 10000).map(u => (u.toLong, "a")) ++
      (9001 to 19000).map(u => (u.toLong, "b"))).toDF("uid", "slice")
    val k = 256
    val out = Profiling.kmvOverlap(rows, "uid",
      col("slice") === "a", col("slice") === "b", k = k).collect().head
    def d(name: String): Double = out.getLong(out.fieldIndex(name)).toDouble
    // base estimates: RSE ~ 1/sqrt(k-1) ≈ 6.3%; allow 3 sigma
    assert(math.abs(d("est_a") - 10000) / 10000 < 0.19, s"est_a=${d("est_a")}")
    assert(math.abs(d("est_b") - 10000) / 10000 < 0.19, s"est_b=${d("est_b")}")
    assert(math.abs(d("est_union") - 19000) / 19000 < 0.19)
    // intersection: the retained sample holds ~k·|I|/|U| ≈ 13 hits, so
    // the envelope is 3/sqrt(13) ≈ 83% relative — still a bounded
    // estimator where HLL I-E has NO envelope at all (its absolute
    // error scales with the UNION). The md5 hash is fixed, so the
    // realized draw is deterministic; the bound pins the estimator
    // SHAPE, a regression flips it far outside.
    assert(math.abs(d("est_intersect") - 1000) / 1000 < 0.85,
      s"est_intersect=${d("est_intersect")}")
    assert(math.abs(d("est_diff_ab") - 9000) / 9000 < 0.30)
    assert(math.abs(d("jaccard_ppm") / 1e6 - 1000.0 / 19000.0) < 0.05)
    // consistency: retained counts scale by ONE shared theta, so
    // intersect + diff_ab <= union exactly
    val (nU, nI, nD) = (out.getLong(out.fieldIndex("n_union")),
      out.getLong(out.fieldIndex("n_intersect")),
      out.getLong(out.fieldIndex("n_diff_ab")))
    assert(nI + nD <= nU && nU <= 2L * k)

    // unsaturated regime: both slices under k distinct keys -> theta 1
    // and every number EXACT (the sketch degrades to the true sets)
    val small = ((1 to 100).map(u => (u.toLong, "a")) ++
      (81 to 150).map(u => (u.toLong, "b"))).toDF("uid", "slice")
    val s = Profiling.kmvOverlap(small, "uid",
      col("slice") === "a", col("slice") === "b", k = k).collect().head
    def sd(name: String): Long = s.getLong(s.fieldIndex(name))
    assert(sd("theta_h") == 1152921504606846976L) // theta 1 = the full 2^60 range
    assert(sd("est_a") == 100L && sd("est_b") == 70L)
    assert(sd("est_union") == 150L && sd("est_intersect") == 20L)
    assert(sd("est_diff_ab") == 80L)
    assert(sd("jaccard_ppm") == 20L * 1000000L / 150L) // exact integer ppm
  }

  test("neymanAllocation: volatile strata win budget, remainders conserve it exactly") {
    import spark.implicits._
    // stratum A: 100 rows alternating 0/10 (sd ~ 5.025); stratum B:
    // 100 rows constant 7 (sd 0); stratum C: 10 rows alternating
    // 0/100 (sd ~ 52.7). Neyman weights N_h*sd_h: A ~ 502, B 0,
    // C ~ 527 — the SMALL volatile stratum out-allocates the big
    // homogeneous one, and B gets nothing despite 100 rows
    val rows =
      (1 to 100).map(i => ("A", if (i % 2 == 0) 10.0 else 0.0)) ++
      (1 to 100).map(_ => ("B", 7.0)) ++
      (1 to 10).map(i => ("C", if (i % 2 == 0) 100.0 else 0.0))
    val got = Sampling.neymanAllocation(rows.toSeq.toDF("s", "v"), "s", "v",
        budget = 100L)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    val (a, b, c) = (got("A"), got("B"), got("C"))
    assert(b.getAs[Double]("sd") == 0.0 && b.getAs[Long]("alloc_neyman") == 0L)
    assert(c.getAs[Long]("alloc_neyman") > a.getAs[Long]("alloc_neyman"))
    // budgets conserved EXACTLY under both schemes
    assert(got.values.map(_.getAs[Long]("alloc_neyman")).sum == 100L)
    assert(got.values.map(_.getAs[Long]("alloc_proportional")).sum == 100L)
    // proportional ignores variance: B gets its population share
    assert(b.getAs[Long]("alloc_proportional") > 40L)
    // C allocated past its 10-row population -> flagged for the designer
    assert(c.getAs[Long]("alloc_neyman") > 10L &&
      c.getAs[Boolean]("over_allocated"))
    assert(!a.getAs[Boolean]("over_allocated"))
    // all-constant corpus: no variance to optimize -> NULL Neyman,
    // proportional still fills the budget
    val flat = Seq(("X", 1.0), ("X", 1.0), ("Y", 1.0), ("Y", 1.0))
      .toDF("s", "v")
    val f = Sampling.neymanAllocation(flat, "s", "v", budget = 10L)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    assert(f.values.forall(_.isNullAt(3)))
    assert(f.values.map(_.getAs[Long]("alloc_proportional")).sum == 10L)
  }
}
