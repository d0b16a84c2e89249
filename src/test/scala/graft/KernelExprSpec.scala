package graft

import org.apache.spark.sql.functions._

import graft.expressions.Kernels
import graft.functions.TextOps
import graft.operators.TextDedup

class KernelExprSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different words entirely here now"),
    (3L, "ab"))
    .toDF("doc_id", "text")

  test("minhash kernel expression agrees slot-for-slot with the column version") {
    val shs = TextOps.shingles(TextOps.tokens($"text"), 3)
    val both = docs.select(
      Kernels.minhashSig(shs, 32).as("kern"),
      TextDedup.minhashSignature(TextDedup.shingleHashes(shs), 32).as("decl"),
      Kernels.minhashSig(transform(shs, s => xxhash64(s)), 32).as("kern_hashed"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](0) == r.getSeq[Long](2)) // pre-hashed input path
    }
  }

  test("kernel edge inputs: empty arrays and null elements are defined, not sentinels") {
    // SQL-registered surface reaches the kernels with arbitrary arrays
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("a", null, "b")),
      (3L, Seq[String](null)))
      .toDF("id", "arr")
    df.createOrReplaceTempView("edge")
    val mh = spark.sql(
      "SELECT id, minhash_sig(arr, 4) AS sig, simhash64(arr) AS sh FROM edge")
      .orderBy("id").collect()
    // empty array -> NULL signature (not a MaxValue sentinel that
    // would band-match every other empty doc)
    assert(mh(0).isNullAt(1))
    // null elements hash like builtin xxhash64(null) (the seed): no
    // NPE, same signature as replacing null with any seed-hashing value
    assert(!mh(1).isNullAt(1) && mh(1).getSeq[Long](1).length == 4)
    assert(!mh(2).isNullAt(1))
    // simhash on empty = all-ones fold from zero votes, matching the
    // declarative aggregate's initial accumulator
    assert(mh(0).getLong(2) == -1L)
    assert(mh(1).getLong(2) != 0L)
  }

  test("shingle-hash kernel matches the declarative shingles->xxhash64 chain") {
    val both = docs.union(Seq((4L, ""), (5L, "a b")).toDF("doc_id", "text"))
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select(
        Kernels.shingleHashes($"toks", 3).as("kern"),
        transform(TextOps.shingles($"toks", 3), s => xxhash64(s)).as("decl"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("simhash kernel matches the declarative per-bit majority vote") {
    val toks = TextOps.tokens($"text")
    val both = docs
      .withColumn("h64", transform(toks, t => xxhash64(t)))
      .select(Kernels.simhash64(toks).as("kern"),
        TextDedup.simhash64("h64").as("decl"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  // The declarative md5Long60: conv(substr(md5(s),1,15),16,10) — the
  // exact chain the DuckDB oracle replays (CAST('0x'||substr(md5(s),
  // 1,15) AS BIGINT)); each md5-mode kernel must agree with it.
  private def md5L60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("md5 kernel hash equals the conv(substr(md5)) oracle chain") {
    val got = Seq("", "a", "the quick brown", "ümlaut ø 中文")
      .toDF("s")
      .select(Kernels.shingleHashes(array($"s"), 3, md5 = true).getItem(0).as("kern"),
        md5L60($"s").as("decl"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("md5 shingle-hash kernel matches the declarative shingles->md5 chain") {
    val both = docs.union(Seq((4L, ""), (5L, "a b")).toDF("doc_id", "text"))
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select(
        Kernels.shingleHashes($"toks", 3, md5 = true).as("kern"),
        transform(TextOps.shingles($"toks", 3), s => md5L60(s)).as("decl"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("md5 simhash kernel matches the declarative 60-bit majority vote") {
    val toks = TextOps.tokens($"text")
    val decl = (0 until 60).map { j =>
      val vote = aggregate(col("h60"), lit(0L),
        (acc, h) => acc +
          when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val both = docs
      .withColumn("h60", transform(toks, t => md5L60(t)))
      .select(Kernels.simhash64(toks, md5 = true).as("kern"), decl.as("decl"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("md5 fingerprint kernel matches the declarative md5 rolling + min-shingle") {
    val p = 1000000007L
    val toks = TextOps.tokens($"text")
    val roll = aggregate(col("h60"), lit(0L),
      (acc, h) => pmod(acc * 31 + pmod(h, lit(p)), lit(p)))
    val minsh = array_min(transform(TextOps.shingles(toks, 3),
      s => pmod(md5L60(s), lit(p))))
    val both = docs.union(Seq((4L, "")).toDF("doc_id", "text"))
      .withColumn("h60", transform(toks, t => md5L60(t)))
      .select(Kernels.fingerprints(toks, 3, md5 = true).as("kern"),
        roll.as("roll"), minsh.as("minsh"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == Seq(r.getLong(1), r.getLong(2)))
    }
  }

  test("fingerprint kernel matches the declarative rolling + min-shingle") {
    val toks = TextOps.tokens($"text")
    val both = docs.union(Seq((4L, "")).toDF("doc_id", "text")).select(
      Kernels.fingerprints(toks, 3).as("kern"),
      TextOps.rollingFingerprint(toks).as("roll"),
      TextOps.minShingleFingerprint(toks, 3).as("minsh"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == Seq(r.getLong(1), r.getLong(2)))
    }
  }

  test("dot-product kernel is bit-identical to the aggregate fold") {
    val df = Seq(
      (Array(0.1, -0.2, 0.3000001, 7.5e-3), Array(1.0, 2.0, -3.0, 0.25)),
      (Array(1e300, 1.0, -1e300, 0.5), Array(1.0, 1.0, 1.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(
      Kernels.dotProduct($"a", $"b").as("kern"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("decl"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("kernels are SQL-registered via GraftExtensions") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       simhash64(split('a b c', ' ')) AS s,
        |       size(minhash_sig(split('a b c', ' '), 8)) AS k""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == spark.range(1)
      .select(Kernels.simhash64(split(lit("a b c"), " "))).head().getLong(0))
    assert(r.getInt(2) == 8)
  }

  test("remaining kernels reach SQL: shingles, fingerprints, jaro, rng, decimal, geo, bloom") {
    // every SQL answer must equal its Column-API twin bit for bit
    val api = spark.range(1).select(
      Kernels.shingleHashes(split(lit("a b c d"), " "), 3).as("sh"),
      Kernels.fingerprints(split(lit("a b c d"), " "), 3).as("fp"),
      Kernels.splitmixUniform(lit("00112233445566778899aabbccddeeff"), lit(2)).as("u"),
      Kernels.utmToLat(lit(346000.0), lit(6288000.0), 19, southern = true).as("la"),
      Kernels.utmToLon(lit(346000.0), lit(6288000.0), 19, southern = true).as("lo"))
      .head()
    val viaSql = spark.sql(
      """SELECT shingle_hashes(split('a b c d', ' '), 3) AS sh,
        |       fingerprints(split('a b c d', ' '), 3) AS fp,
        |       jaro_winkler('martha', 'marhta') AS jw,
        |       splitmix_uniform('00112233445566778899aabbccddeeff', 2) AS u,
        |       double_to_decimal(1.5d, 18, 6) AS dec,
        |       utm_to_lat(346000.0d, 6288000.0d, 19, true) AS la,
        |       utm_to_lon(346000.0d, 6288000.0d, 19, true) AS lo""".stripMargin)
      .head()
    assert(viaSql.getSeq[Long](0) == api.getSeq[Long](0))
    assert(viaSql.getSeq[Long](1) == api.getSeq[Long](1))
    assert(math.abs(viaSql.getDouble(2) - 0.9611111111111111) < 1e-12)
    assert(viaSql.getDouble(3) == api.getDouble(2)) // u
    assert(viaSql.getDecimal(4) ==
      new java.math.BigDecimal("1.500000"))
    assert(viaSql.getDouble(5) == api.getDouble(3)) // la
    assert(viaSql.getDouble(6) == api.getDouble(4)) // lo
    // bloom probe through a SQL binary (hex) literal: members hit,
    // a key far outside the inserted range misses
    val bloom = graft.operators.Prejoin.keyBloom(
      (0L until 100L).toSeq.toDF("k"), "k", expectedItems = 100)
    val hex = bloom.map("%02x".format(_)).mkString
    val probes = spark.sql(
      s"""SELECT bloom_might_contain(CAST(7 AS BIGINT), X'$hex') AS hit,
         |       bloom_might_contain(CAST(123456789 AS BIGINT), X'$hex') AS miss"""
        .stripMargin).head()
    assert(probes.getBoolean(0))
    assert(!probes.getBoolean(1))
  }

  test("kernel expressions are null-safe") {
    val df = Seq((Option.empty[Seq[String]], Option.empty[Seq[Double]]))
      .toDF("s", "v")
    val r = df.select(
      Kernels.simhash64($"s"),
      Kernels.minhashSig($"s", 4),
      Kernels.dotProduct($"v", $"v")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("bloom prune: no false negatives, real pruning, codegen'd probe") {
    import graft.operators.Prejoin
    val dim = (0L until 1000L by 2).toSeq.toDF("k") // 500 even keys
    // range-backed fact: a LocalRelation would be constant-folded
    // through the filter at optimization time, hiding the plan shape
    val fact = spark.range(0, 2000)
      .select($"id".as("k"), concat(lit("r"), $"id").as("payload"))
    val bloom = Prejoin.keyBloom(dim, "k", expectedItems = 500)
    val pruned = Prejoin.pruneFactByDimKeys(fact, "k", bloom)
    // no false negatives: the pruned join equals the unpruned join
    val a = pruned.join(dim, "k").collect().map(_.getLong(0)).sorted
    val b = fact.join(dim, "k").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b) && a.length == 500)
    // real pruning: 500 members survive + ~1% of the 1500 non-members
    // as false positives
    val kept = pruned.count()
    assert(kept >= 500 && kept < 600, s"kept $kept of 2000")
    // null keys (inner-join-dead) drop too
    val withNull = Seq((Option.empty[Long], "null_key"), (Some(0L), "r0"))
      .toDF("k", "payload")
    assert(Prejoin.pruneFactByDimKeys(withNull, "k", bloom).collect()
      .map(_.getString(1)).toSeq == Seq("r0"))
    // the probe runs as a codegen'd predicate at the scan
    assert(pruned.queryExecution.executedPlan.toString.contains("bloom_might_contain"))
  }

  test("bloom prune: non-integral keys are rejected loudly, not silently NULLed") {
    import graft.operators.Prejoin
    // a string key would cast to NULL on both build and probe —
    // matching fact rows silently dropped; the contract is enforced,
    // not documented
    val strDim = Seq("a", "b").toDF("k")
    intercept[IllegalArgumentException](Prejoin.keyBloom(strDim, "k", 10))
    // fractional doubles truncate — lossy on the probe side too
    val dblDim = Seq(1.5, 2.0).toDF("k")
    intercept[IllegalArgumentException](Prejoin.keyBloom(dblDim, "k", 10))
    val bloom = Prejoin.keyBloom(Seq(1L, 2L).toDF("k"), "k", 10)
    intercept[IllegalArgumentException](
      Prejoin.pruneFactByDimKeys(Seq("1", "2").toDF("k"), "k", bloom))
    // int keys widen losslessly and stay accepted
    val intFact = Seq(1, 2, 9).toDF("k")
    assert(Prejoin.pruneFactByDimKeys(intFact, "k", bloom).count() >= 2)
  }
  test("double->decimal kernel is bit-identical to the builtin cast (exact, boundary, large, random)") {
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(7)
    val edge = Seq(0.0, -0.0, 1.0, -1.0, 0.1, 0.3, 1e-7, 5e-7, -5e-7, 1.5e-6,
      0.0000005, 0.0000015, 123.4567895, -123.4567895, 49.382400000000004,
      9.999999e11, -9.999999e11, 4.0e9, 1.00000049999999, 0.9999995,
      12345678.3456785, 1e-300, -1e-300,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val vals = edge ++
      (1 to 20000).map(_ => rnd.nextDouble() * math.pow(10, rnd.nextInt(14) - 4) *
        (if (rnd.nextBoolean()) 1 else -1)) ++                       // arbitrary magnitudes
      (1 to 20000).map(_ => math.rint(rnd.nextDouble() * 1e8) / 1e4 *
        (if (rnd.nextBoolean()) 1 else -1)) ++                       // exact 4dp decimals (money shape)
      (1 to 10000).map(_ => (rnd.nextInt(2000000) + 0.5) / 1e6)      // exact HALF_UP tie boundaries
    val df = vals.toDF("v")
    for ((p, s) <- Seq((18, 6), (18, 2), (28, 6), (28, 12))) {
      val bad = df.select($"v", $"v".cast(DecimalType(p, s)).as("b"),
          Kernels.toDecimal($"v", p, s).as("k"))
        .filter(!($"b" <=> $"k")).count()
      assert(bad == 0, s"kernel cast diverges from builtin at DECIMAL($p,$s)")
    }
    // nulls pass through; overflow throws loudly like the ANSI builtin
    assert(Seq[Option[Double]](None).toDF("v")
      .select(Kernels.toDecimal($"v", 18, 6)).head.isNullAt(0))
    intercept[Exception] {
      Seq(1e13).toDF("v").select(Kernels.toDecimal($"v", 18, 6)).collect()
    }
  }

  test("unicodeNormalize: composed/decomposed forms converge, ASCII is identity, null-safe") {
    val composed = "caf\u00e9"          // e-acute as one codepoint
    val decomposed = "cafe\u0301"      // e + combining acute
    val df = Seq(Some(composed), Some(decomposed), Some("plain ascii"), None)
      .toDF("s")
    val got = df.select(Kernels.unicodeNormalize($"s").as("n"))
      .as[Option[String]].collect()
    // NFC maps both spellings to the composed form
    assert(got(0).contains(composed) && got(1).contains(composed))
    assert(got(2).contains("plain ascii"))   // ASCII is a fixed point
    assert(got(3).isEmpty)                   // null passes through
    // NFD goes the other way
    val nfd = df.select(Kernels.unicodeNormalize($"s", "NFD").as("n"))
      .as[Option[String]].collect()
    assert(nfd(0).contains(decomposed) && nfd(1).contains(decomposed))
    // NFKC folds compatibility forms (ligature fi -> fi)
    val nfkc = Seq("ﬁle").toDF("s")
      .select(Kernels.unicodeNormalize($"s", "NFKC")).as[String].head()
    assert(nfkc == "file")
    // a bad form fails at plan construction, not per row
    intercept[IllegalArgumentException] {
      Kernels.unicodeNormalize($"s", "NFX")
    }
    // SQL-registered via GraftExtensions, default form NFC
    val viaSql = spark.sql(
      s"SELECT unicode_normalize('$decomposed'), " +
        "unicode_normalize('\ufb01le', 'NFKC')")
      .head()
    assert(viaSql.getString(0) == composed)
    assert(viaSql.getString(1) == "file")
  }
}
