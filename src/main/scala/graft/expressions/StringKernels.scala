package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
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
