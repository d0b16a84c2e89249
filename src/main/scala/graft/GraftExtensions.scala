package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{DotProductExpr, KllMergeAgg, KllMergePairExpr, KllNExpr, KllQuantilesExpr, KllSketchAgg, MinHashSigExpr, SimHash64Expr, UnicodeNormalizeExpr}

/** SparkSessionExtensions entry point: registers the native kernel
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd kernels as the Column API:
  *
  *   minhash_sig(arr, numHashes[, seed])   -> array<bigint>
  *   simhash64(arr)                        -> bigint
  *   dot_product(a, b)                     -> double
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
