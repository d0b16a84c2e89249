package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the inverse transverse-Mercator
  * conversion (Snyder/USGS series — see [[graft.functions.Geo]]).
  *
  * Why an Expression and not Column algebra: the series reuses its
  * footpoint-latitude subterm everywhere, and Column composition
  * INLINES a copy of the whole subtree at every use site — the lat
  * expression alone expanded to thousands of Catalyst nodes, and the
  * first execution of a session spent ~3 minutes in optimizer/codegen
  * passes over it (later runs hit the codegen cache). A single static
  * kernel call keeps the tree at one node, codegen at one line, and
  * the arithmetic identical (same double ops, same order).
  */
case class UtmToLatExpr(left: Expression, right: Expression,
                        zone: Int, southern: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "utm_to_lat"

  override protected def nullSafeEval(e: Any, n: Any): Any =
    graft.functions.Geo.utmLatKernel(
      e.asInstanceOf[Double], n.asInstanceOf[Double], zone, southern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, n) =>
      s"${ev.value} = graft.functions.Geo.utmLatKernel($e, $n, $zone, $southern);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): UtmToLatExpr =
    copy(left = newLeft, right = newRight)
}

/** Longitude twin of [[UtmToLatExpr]]. */
case class UtmToLonExpr(left: Expression, right: Expression,
                        zone: Int, southern: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "utm_to_lon"

  override protected def nullSafeEval(e: Any, n: Any): Any =
    graft.functions.Geo.utmLonKernel(
      e.asInstanceOf[Double], n.asInstanceOf[Double], zone, southern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, n) =>
      s"${ev.value} = graft.functions.Geo.utmLonKernel($e, $n, $zone, $southern);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): UtmToLonExpr =
    copy(left = newLeft, right = newRight)
}
