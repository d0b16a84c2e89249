package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{BloomMightContainExpr, DotProductExpr, DoubleToDecimalExpr, FingerprintsExpr, JaroWinklerExpr, KllMergeAgg, KllMergePairExpr, KllNExpr, KllQuantilesExpr, KllSketchAgg, MinHashSigExpr, ShingleHashesExpr, SimHash64Expr, SplitMixUniformExpr, UnicodeNormalizeExpr, UtmToLatExpr, UtmToLonExpr}

/** SparkSessionExtensions entry point: registers the native kernel
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd kernels as the Column API:
  *
  *   minhash_sig(arr, numHashes[, seed])   -> array<bigint>
  *   shingle_hashes(tokens, n)             -> array<bigint>
  *   fingerprints(tokens, n)               -> array<bigint>
  *   simhash64(arr)                        -> bigint
  *   dot_product(a, b)                     -> double
  *   jaro_winkler(a, b)                    -> double
  *   bloom_might_contain(key, bloomBytes)  -> boolean (bytes: binary literal,
  *                                            a serialized graft bloom filter)
  *   splitmix_uniform(seedHex, k)          -> double in [0, 1)
  *   double_to_decimal(v, precision, scale)-> decimal(precision, scale)
  *   utm_to_lat(e, n, zone, southern)      -> double (WGS84 latitude)
  *   utm_to_lon(e, n, zone, southern)      -> double (WGS84 longitude)
  *   unicode_normalize(s[, form])          -> string (form: 'NFC' default,
  *                                            'NFD', 'NFKC', 'NFKD')
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (GraftSession does this by default) or `.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  private def bytesArg(e: Expression, what: String): Array[Byte] = e match {
    case Literal(v: Array[Byte], _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a binary literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: the merge as-of join's planner
    // strategy (custom LogicalPlan -> custom merge SparkPlan)
    ext.injectPlannerStrategy(_ => graft.plans.MergeAsOfStrategy)
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.size == 2 || args.size == 3,
          "minhash_sig(arr, numHashes[, seed])")
        val seed = if (args.size == 3) longArg(args(2), "seed") else 42L
        MinHashSigExpr(args.head, intArg(args(1), "numHashes"), seed)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "simhash64(arr)")
        SimHash64Expr(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "shingle_hashes(tokens, n)")
        ShingleHashesExpr(args.head, intArg(args(1), "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("fingerprints"),
      new ExpressionInfo(classOf[FingerprintsExpr].getName, "fingerprints"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "fingerprints(tokens, n)")
        FingerprintsExpr(args.head, intArg(args(1), "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "jaro_winkler(a, b)")
        JaroWinklerExpr(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainExpr].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "bloom_might_contain(key, bloomBytes)")
        BloomMightContainExpr(args.head, bytesArg(args(1), "bloomBytes"))
      }))
    ext.injectFunction((
      FunctionIdentifier("splitmix_uniform"),
      new ExpressionInfo(classOf[SplitMixUniformExpr].getName,
        "splitmix_uniform"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "splitmix_uniform(seedHex, k)")
        SplitMixUniformExpr(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("double_to_decimal"),
      new ExpressionInfo(classOf[DoubleToDecimalExpr].getName,
        "double_to_decimal"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "double_to_decimal(v, precision, scale)")
        DoubleToDecimalExpr(args.head,
          intArg(args(1), "precision"), intArg(args(2), "scale"))
      }))
    ext.injectFunction((
      FunctionIdentifier("utm_to_lat"),
      new ExpressionInfo(classOf[UtmToLatExpr].getName, "utm_to_lat"),
      (args: Seq[Expression]) => {
        require(args.size == 4, "utm_to_lat(e, n, zone, southern)")
        UtmToLatExpr(args.head, args(1),
          intArg(args(2), "zone"), boolArg(args(3), "southern"))
      }))
    ext.injectFunction((
      FunctionIdentifier("utm_to_lon"),
      new ExpressionInfo(classOf[UtmToLonExpr].getName, "utm_to_lon"),
      (args: Seq[Expression]) => {
        require(args.size == 4, "utm_to_lon(e, n, zone, southern)")
        UtmToLonExpr(args.head, args(1),
          intArg(args(2), "zone"), boolArg(args(3), "southern"))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "dot_product(a, b)")
        DotProductExpr(args.head, args(1))
      }))
    // KLL quantile-sketch family (the mergeable stored-percentile
    // state; aggregates are returned raw — the analyzer wraps them
    // in AggregateExpression like any built-in aggregate)
    ext.injectFunction((
      FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (args: Seq[Expression]) => {
        require(args.size == 1 || args.size == 2, "kll_sketch_agg(v[, k])")
        val k = if (args.size == 2) intArg(args(1), "k") else 200
        // the aggregate's update does a raw Double read, so coerce any
        // numeric input here (the Column API wrapper casts the same way)
        KllSketchAgg(org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DoubleType), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge_agg"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "kll_merge_agg(sketch)")
        KllMergeAgg(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_merge_pair"),
      new ExpressionInfo(classOf[KllMergePairExpr].getName, "kll_merge_pair"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "kll_merge_pair(a, b)")
        KllMergePairExpr(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_n"),
      new ExpressionInfo(classOf[KllNExpr].getName, "kll_n"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "kll_n(sketch)")
        KllNExpr(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantilesExpr].getName, "kll_quantiles"),
      (args: Seq[Expression]) => {
        require(args.size >= 2, "kll_quantiles(sketch, p1[, p2, ...])")
        val ps = args.tail.map {
          case Literal(v: Double, _) => v
          case Literal(v: Float, _) => v.toDouble
          case Literal(v: Int, _) => v.toDouble
          case Literal(v: Long, _) => v.toDouble
          case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"quantile probabilities must be numeric literals, got $other")
        }
        KllQuantilesExpr(args.head, ps)
      }))
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalizeExpr].getName, "unicode_normalize"),
      (args: Seq[Expression]) => {
        require(args.size == 1 || args.size == 2,
          "unicode_normalize(s[, form])")
        val form = args.lift(1).map {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"form must be a string literal, got $other")
        }.getOrElse("NFC")
        UnicodeNormalizeExpr(args.head, form)
      }))
  }
}
