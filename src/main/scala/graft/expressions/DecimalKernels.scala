package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Fast double→decimal cast.
  *
  * Spark's built-in `CAST(double AS DECIMAL(p,s))` routes every value
  * through `Double.toString` + `BigDecimal.setScale` (shortest-
  * decimal-representation semantics, HALF_UP) — ~250 ns and two
  * allocations per value. In moment-style profile aggregates that
  * cast IS the query cost: `table_corr_pairs` spends ~70% of its
  * wall time materializing 9M BigDecimals (measured at sf0.1).
  *
  * The kernel keeps the builtin's semantics bit-exactly but takes an
  * integer fast path when it can PROVE the result: candidate
  * `l = round(v·10^s)`, accepted iff
  *
  *   |v − l/10^s| + 1.5·ulp(v) ≤ 0.45·10^-s
  *
  * Proof sketch: the builtin rounds v's shortest decimal repr r, and
  * |r − v| ≤ ulp(v)/2, so the bound puts r strictly inside the open
  * half-spacing interval around l·10^-s — r must round to l, and no
  * HALF_UP tie can occur (ties sit ON the boundary, 0.05·10^-s
  * outside the bound; the 1.5·ulp term also absorbs the float error
  * of computing the bound itself). Values near a rounding boundary,
  * or large enough that ulp(v) rivals the decimal spacing
  * (|v·10^s| ≥ 4·10^15), fall back to the builtin's exact
  * `BigDecimal.valueOf(v).setScale(s, HALF_UP)` path. Exact-decimal
  * data (money, counts, rates and their products) hits the fast path
  * essentially always.
  */
object DecimalKernels {

  private val Pow10D: Array[Double] = (0 to 18).map(math.pow(10, _)).toArray
  private val Pow10L: Array[Long] = {
    val a = new Array[Long](19)
    a(0) = 1L
    var i = 1
    while (i < 19) { a(i) = a(i - 1) * 10L; i += 1 }
    a
  }

  def castDouble(v: Double, precision: Int, scale: Int): Decimal = {
    // The builtin cast yields NULL for NaN/Infinity (even under ANSI —
    // only overflow errors); sums then skip the row.
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return null
    val m = Pow10D(scale)
    val scaled = v * m
    if (scaled >= -4.0e15 && scaled <= 4.0e15) {
      val l = Math.round(scaled)
      val dist = Math.abs(v - l / m)
      if (dist + 1.5 * Math.ulp(Math.abs(v)) <= 0.45 / m) {
        val maxUnscaled =
          if (precision >= 19) Long.MaxValue else Pow10L(precision)
        if (Math.abs(l) >= maxUnscaled)
          throw new ArithmeticException(
            s"Decimal overflow: $v does not fit DECIMAL($precision,$scale)")
        return Decimal.createUnsafe(l, precision, scale)
      }
    }
    // Exact path — identical to the builtin cast: shortest decimal
    // representation (BigDecimal.valueOf == Double.toString), HALF_UP.
    val jbd = java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    if (jbd.precision() - jbd.scale() > precision - scale)
      throw new ArithmeticException(
        s"Decimal overflow: $v does not fit DECIMAL($precision,$scale)")
    Decimal(scala.math.BigDecimal(jbd), precision, scale)
  }
}

/** `CAST(double AS DECIMAL(precision, scale))` through
  * [[DecimalKernels.castDouble]] — bit-identical results, ~4× cheaper
  * on exact-decimal data (spec-pinned against the builtin over exact,
  * boundary, large and random values). Overflow throws (the ANSI
  * behavior); NaN/Infinity yield NULL exactly like the builtin.
  */
case class DoubleToDecimalExpr(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {

  require(precision >= 1 && precision <= 38 && scale >= 0 && scale <= 18 &&
    scale <= precision, s"bad DECIMAL($precision,$scale)")

  override def dataType: DataType = DecimalType(precision, scale)
  override def prettyName: String = "double_to_decimal"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    DecimalKernels.castDouble(input.asInstanceOf[Double], precision, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.DecimalKernels.castDouble($c, $precision, $scale);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): DoubleToDecimalExpr =
    copy(child = newChild)
}
