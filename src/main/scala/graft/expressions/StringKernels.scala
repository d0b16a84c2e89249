package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a native codegen'd expression —
  * Spark has no builtin for it, and a UDF would break whole-stage
  * codegen on the hottest text-preprocessing path. The JDK's
  * `java.text.Normalizer` is the kernel; DuckDB's `nfc_normalize`
  * replays the NFC form for the oracle (both implement the same
  * Unicode standard annex).
  *
  * `form` is one of NFC/NFD/NFKC/NFKD (validated at construction —
  * a bad literal fails at plan time, not per row).
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val javaForm = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, javaForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

/** Jaro–Winkler similarity as a native codegen'd expression — Spark
  * has only `levenshtein` among the edit-family builtins, and entity
  * resolution needs the prefix-boosted Jaro score on its hot
  * candidate-pair path. The kernel operates over the **UTF-8 bytes**
  * of both strings (NOT codepoints): that is what the DuckDB oracle's
  * `jaro_winkler_similarity` does, verified bit-exact over 6k random
  * mixed-ASCII/multibyte pairs — same greedy match within the
  * `max(0, max(l1,l2)/2 - 1)` window, transpositions halved, the canonical
  * `(m/l1 + m/l2 + (m-t)/m)/3` accumulation order, boost only when
  * jaro strictly exceeds 0.7, prefix capped at 4 bytes, scale 0.1.
  * Both-empty (and either-empty) scores 0.0, matching DuckDB, not
  * the textbook 1.0 for identical empties.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.StringKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

/** Static string kernels callable from generated code. */
object StringKernels {

  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.getBytes
    val s2 = ub.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    // Clamped at 0: DuckDB scores identical length-1 strings 1.0 (an
    // unclamped textbook window would find zero matches there).
    val matchDist = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(l2 - 1, i + matchDist)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t = t / 2
    // Accumulation order matters for the last ulp: keep the canonical
    // (m/l1 + m/l2 + (m-t)/m)/3 exactly as the oracle computes it.
    var j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      var pl = 0
      val cap = math.min(4, math.min(l1, l2))
      while (pl < cap && s1(pl) == s2(pl)) pl += 1
      j = j + pl * 0.1 * (1.0 - j)
    }
    j
  }
}
