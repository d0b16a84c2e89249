package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic counter-mode pseudo-randomness: ONE md5 digest per
  * row yields any number of independent uniforms through splitmix64
  * (Steele, Lea & Flood 2014, the JDK SplittableRandom mixer).
  *
  * The k-th draw is the pure function `mix64(seed + (k+1)·γ)` of the
  * digest's first 64 bits — stateless, layout-stable, and replayable
  * by any engine with exact 64-bit modular arithmetic (DuckDB twins
  * run the identical constants through UHUGEINT mod-2^64 products and
  * xor/shift; verified bit-equal). This replaces one-digest-per-draw
  * schemes where the hash dominates the cost: a resample expansion
  * needs b uniforms per row but only ONE digest.
  */
object RandomKernels {
  /** splitmix64 γ (golden-ratio increment). */
  final val Gamma = 0x9E3779B97F4A7C15L
  private final val M1 = 0xBF58476D1CE4E5B9L
  private final val M2 = 0x94D049BB133111EBL

  /** The k-th uniform of the stream seeded by the digest's first 16
    * hex chars: top 32 bits of `mix64(seed + (k+1)·γ)` over 2^32 —
    * exactly representable, identical comparison semantics to the
    * md5-chunk uniforms it replaces.
    */
  def splitmixUniform(hex32: UTF8String, k: Int): Double = {
    val seed = java.lang.Long.parseUnsignedLong(hex32.toString.substring(0, 16), 16)
    var z = seed + (k + 1L) * Gamma
    z ^= (z >>> 30); z *= M1
    z ^= (z >>> 27); z *= M2
    z ^= (z >>> 31)
    (z >>> 32).toDouble / 4294967296.0
  }
}

/** `splitmix_uniform(md5Hex, k)` — the k-th deterministic uniform of
  * the row's digest-seeded stream (see [[RandomKernels]]). Left child
  * is a 32-hex md5 string, right child the integer draw index.
  */
case class SplitMixUniformExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "splitmix_uniform"

  override protected def nullSafeEval(hex: Any, k: Any): Any =
    RandomKernels.splitmixUniform(hex.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, k) =>
      s"${ev.value} = graft.expressions.RandomKernels.splitmixUniform($h, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SplitMixUniformExpr =
    copy(left = newLeft, right = newRight)
}
