package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.DatasetBridge

/** MERGE AS-OF JOIN as a first-class Catalyst operator — the
  * whole-operator extension tier (custom [[LogicalPlan]] +
  * [[SparkStrategy]] + [[SparkPlan]], registered through
  * `SparkSessionExtensions`), for the one shape the built-in operators
  * cannot express without waste: "each left row takes the LAST right
  * row at or before its time, per key".
  *
  * The composed alternatives both pay for it: the interval join
  * ([[graft.operators.AsOfJoin.apply]]) materializes |versions|
  * candidate pairs per fact row before the residual filters them, and
  * the union+merge-scan ([[graft.operators.AsOfJoin.mergeScan]]) pays
  * a union shuffle plus a running-`last` window over fact+dim rows.
  * This operator instead asks Catalyst for exactly what a merge join
  * needs — both children hash-clustered on the key and sorted by
  * (key, time), which AQE/EnsureRequirements provide with ONE
  * exchange per side (reused if the data is already bucketed) — and
  * then streams BOTH sorted partitions through a single forward merge
  * pass: zero pair materialization, zero window state, O(1) memory
  * per partition (one held dim row). At 100 TB that is the floor for
  * this semantics.
  *
  * Semantics: LEFT OUTER backward as-of — null right columns when no
  * version starts at or before the fact time; null keys and null
  * times never match (standard join-null rules). Exact when the right
  * side is a contiguous version chain per key (what
  * [[graft.operators.Scd2]] builds) — the same contract as the
  * merge-scan twin, whose results it must equal row for row
  * (spec + shared oracle).
  */
object MergeAsOf {

  /** Left-outer backward as-of join through the custom operator. Key
    * columns pair positionally; time columns must share a data type.
    */
  def join(fact: DataFrame, dim: DataFrame,
           factKeys: Seq[String], dimKeys: Seq[String],
           factTime: String, dimTime: String): DataFrame = {
    require(factKeys.nonEmpty && factKeys.size == dimKeys.size,
      s"key lists must pair up: $factKeys vs $dimKeys")
    val l = fact.queryExecution.analyzed
    val r = dim.queryExecution.analyzed
    def att(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"$side column '$n' not found among ${out.map(_.name).mkString(", ")}"))
    val lk = factKeys.map(att(l.output, _, "fact"))
    val rk = dimKeys.map(att(r.output, _, "dim"))
    val lt = att(l.output, factTime, "fact")
    val rt = att(r.output, dimTime, "dim")
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"key type mismatch: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}") }
    require(lt.dataType == rt.dataType,
      s"time type mismatch: ${lt.dataType} vs ${rt.dataType}")
    (lk :+ lt).foreach(a => require(RowOrdering.isOrderable(a.dataType),
      s"column ${a.name}:${a.dataType} is not orderable"))
    DatasetBridge.ofRows(fact.sparkSession,
      MergeAsOfJoinPlan(l, r, lk, rk, lt, rt))
  }
}

/** Logical node: right output re-emitted nullable (left outer). */
case class MergeAsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                             leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                             leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): MergeAsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy — registered via GraftExtensions. */
object MergeAsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case MergeAsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      MergeAsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical merge as-of: children hash-clustered on the key and
  * sorted by (key, time); one forward pass per co-partition, one held
  * dim row of state.
  */
case class MergeAsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                             leftTime: Expression, rightTime: Expression,
                             left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): MergeAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes.toIndexedSeq)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // forward merge state: the next unconsumed dim row (copied — the
      // child iterator reuses its row buffer) and the held candidate
      // (last dim row with key == fact key and time <= fact time)
      var dimRow: InternalRow = null
      var heldPayload: InternalRow = null
      var heldKey: UnsafeRow = null
      def advanceDim(): Unit =
        dimRow = if (rIter.hasNext) rIter.next().copy() else null
      advanceDim()
      lIter.map { l =>
        val fk = lKeyProj(l) // buffer valid until the next left row
        val fTime = lTimeProj(l)
        if (heldKey != null && keyOrd.compare(heldKey, fk) != 0) {
          heldPayload = null; heldKey = null
        }
        val matchable = !fk.anyNull && !fTime.isNullAt(0)
        if (matchable) {
          val fTimeCopy = fTime.copy()
          var continue = dimRow != null
          while (continue) {
            val dk = rKeyProj(dimRow)
            if (dk.anyNull) { advanceDim(); continue = dimRow != null }
            else {
              val c = keyOrd.compare(dk, fk)
              if (c < 0) { advanceDim(); continue = dimRow != null }
              else if (c == 0 && !rTimeProj(dimRow).isNullAt(0) &&
                  timeOrd.compare(rTimeProj(dimRow), fTimeCopy) <= 0) {
                heldPayload = dimRow // already a copy
                heldKey = fk.copy()
                advanceDim(); continue = dimRow != null
              } else if (c == 0 && rTimeProj(dimRow).isNullAt(0)) {
                // null-time versions never match anyone; skip
                advanceDim(); continue = dimRow != null
              } else continue = false
            }
          }
        }
        val payload =
          if (matchable && heldPayload != null && heldKey != null &&
              keyOrd.compare(heldKey, fk) == 0) heldPayload
          else nullRight
        resultProj(joined(l, payload))
      }
    }
  }
}
