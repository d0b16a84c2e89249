package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** KLL quantile sketch over doubles — the MERGEABLE percentile state
  * Spark 4 does not ship (its `percentile_approx` aggregate answers
  * one query but its internal state is not a storable, re-mergeable
  * column value, so a 100-TB lake cannot keep per-partition quantile
  * sketches and roll them up later the way `hll_sketch_agg` sketches
  * roll up distincts). This is the public Karnin–Lang–Liberty
  * construction (FOCS 2016; the Apache DataSketches KLL family):
  * a hierarchy of levels where an item at level `h` carries weight
  * `2^h`; when the sketch overflows, the lowest full level sorts and
  * promotes every other item one level up (weight doubles, size
  * halves). Rank error is O(1/k) with geometrically shrinking level
  * capacities (`k·(2/3)^depth`, floor 8).
  *
  * Determinism: the paper's compaction coin is random; here it
  * alternates with the compaction counter — same single-threaded
  * input order ⇒ bit-identical sketch (engine-replayable, spec-
  * pinnable). Across a distributed aggregation merge ORDER still
  * varies run to run, so distributed estimates are pinned to the
  * error ENVELOPE, never to bytes — the same contract the HLL tier
  * declares (§5.1 sketch rule).
  *
  * Mass conservation: compacting an odd level retains one edge item
  * at the level (alternating min/max edge) so total carried weight
  * `Σ 2^h·|level_h|` is invariant — quantile walks normalize by that
  * carried weight.
  */
final class KllDoubles(val k: Int) extends Serializable {
  require(k >= 8, s"kll k=$k too small")
  var n: Long = 0L
  var minV: Double = Double.NaN
  var maxV: Double = Double.NaN
  var compactions: Long = 0L
  var levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)

  private def capacity(h: Int, numLevels: Int): Int = {
    val depth = numLevels - 1 - h
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
  }
  private def totalCapacity: Int =
    (0 until levels.length).map(capacity(_, levels.length)).sum
  private def totalItems: Int = {
    var s = 0; var i = 0
    while (i < levels.length) { s += levels(i).length; i += 1 }
    s
  }

  def update(v: Double): Unit = {
    if (java.lang.Double.isNaN(v)) return
    if (n == 0L || v < minV) minV = v
    if (n == 0L || v > maxV) maxV = v
    n += 1
    levels(0) += v
    if (totalItems > totalCapacity) compress()
  }

  def merge(other: KllDoubles): Unit = {
    if (other.n == 0L) return
    if (n == 0L || other.minV < minV) minV = other.minV
    if (n == 0L || other.maxV > maxV) maxV = other.maxV
    n += other.n
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty
    var h = 0
    while (h < other.levels.length) {
      levels(h) ++= other.levels(h); h += 1
    }
    compactions += other.compactions
    if (totalItems > totalCapacity) compress()
  }

  private def compress(): Unit = {
    var guard = 0
    while (totalItems > totalCapacity && guard < 256) {
      guard += 1
      val numL = levels.length
      var h = 0
      while (h < numL - 1 && levels(h).length < capacity(h, numL)) h += 1
      if (levels(h).length < 2) {
        // nothing compactable below: grow a level so capacities relax
        if (h == numL - 1) { levels += ArrayBuffer.empty }
        return
      }
      if (h + 1 >= levels.length) levels += ArrayBuffer.empty
      val sorted = levels(h).sortInPlace()
      val coin = (compactions & 1L).toInt
      compactions += 1
      var lo = 0
      var hi = sorted.length
      val retained = ArrayBuffer.empty[Double]
      if ((hi - lo) % 2 == 1) {
        // odd level: one edge item stays behind (alternating edge) so
        // carried weight is exactly conserved
        if (coin == 0) { retained += sorted(hi - 1); hi -= 1 }
        else { retained += sorted(lo); lo += 1 }
      }
      val promoted = ArrayBuffer.empty[Double]
      var i = lo + coin
      while (i < hi) { promoted += sorted(i); i += 2 }
      levels(h) = retained
      levels(h + 1) ++= promoted
    }
  }

  /** Total carried weight `Σ 2^h·|level_h|` (== n by construction). */
  def carriedWeight: Long = {
    var s = 0L; var h = 0
    while (h < levels.length) { s += levels(h).length.toLong << h; h += 1 }
    s
  }

  /** Quantile estimate at probability p: the smallest retained value
    * whose cumulative carried weight reaches p·W (clamped to the true
    * min/max the sketch tracks exactly).
    */
  def quantile(p: Double): Double = {
    require(p >= 0.0 && p <= 1.0, s"p=$p outside [0,1]")
    if (n == 0L) return Double.NaN
    if (p <= 0.0) return minV
    if (p >= 1.0) return maxV
    val total = totalItems
    val vals = new Array[Double](total)
    val wts = new Array[Long](total)
    var idx = 0; var h = 0
    while (h < levels.length) {
      val w = 1L << h
      val lvl = levels(h)
      var i = 0
      while (i < lvl.length) { vals(idx) = lvl(i); wts(idx) = w; idx += 1; i += 1 }
      h += 1
    }
    // indirect sort by value
    val order = (0 until total).sortBy(vals(_))
    val target = p * carriedWeight.toDouble
    var cum = 0L
    var j = 0
    while (j < total) {
      cum += wts(order(j))
      if (cum.toDouble >= target) return vals(order(j))
      j += 1
    }
    maxV
  }
}

/** Fixed binary codec for [[KllDoubles]] (magic `KLL1`). */
object KllCodec {
  private val Magic = 0x4b4c4c31 // "KLL1"

  def serialize(s: KllDoubles): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(s.k)
    out.writeLong(s.n)
    out.writeLong(s.compactions)
    out.writeDouble(s.minV)
    out.writeDouble(s.maxV)
    out.writeInt(s.levels.length)
    s.levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): KllDoubles = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val magic = in.readInt()
    require(magic == Magic, f"not a KLL1 sketch (magic 0x$magic%08x)")
    val s = new KllDoubles(in.readInt())
    s.n = in.readLong()
    s.compactions = in.readLong()
    s.minV = in.readDouble()
    s.maxV = in.readDouble()
    val numLevels = in.readInt()
    s.levels = ArrayBuffer.tabulate(numLevels) { _ =>
      val sz = in.readInt()
      val b = new ArrayBuffer[Double](sz)
      var i = 0
      while (i < sz) { b += in.readDouble(); i += 1 }
      b
    }
    if (s.levels.isEmpty) s.levels += ArrayBuffer.empty
    s
  }
}

/** `kll_sketch_agg(value, k)` — builds a [[KllDoubles]] over a double
  * column; evaluates to the serialized sketch (binary). Partial
  * aggregation merges sketches map-side like any imperative agg.
  */
@ExpressionDescription(usage = "kll_sketch_agg(expr, k) - KLL quantile sketch of expr")
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoubles]
    with UnaryLike[Expression] {

  // input must already be DoubleType — the Column wrapper casts
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoubles = new KllDoubles(k)
  override def update(buf: KllDoubles, input: InternalRow): KllDoubles = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(buf: KllDoubles, other: KllDoubles): KllDoubles = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoubles): Any = KllCodec.serialize(buf)
  override def serialize(buf: KllDoubles): Array[Byte] = KllCodec.serialize(buf)
  override def deserialize(storage: Array[Byte]): KllDoubles =
    KllCodec.deserialize(storage)
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge_agg(sketch)` — merges serialized KLL sketches (the
  * rollup aggregate: daily sketch column → weekly sketch).
  */
@ExpressionDescription(usage = "kll_merge_agg(sketch) - union of KLL sketches")
case class KllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoubles]
    with UnaryLike[Expression] {

  // input must be a serialized KLL1 sketch (BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  // the empty buffer's k is a placeholder: the FIRST merged sketch's
  // k is adopted wholesale (the empty buffer is replaced, not merged
  // into), so a rollup of k=1000 sketches keeps the k=1000 envelope
  // instead of silently re-compressing to a default
  override def createAggregationBuffer(): KllDoubles = new KllDoubles(200)
  override def update(buf: KllDoubles, input: InternalRow): KllDoubles = {
    val v = child.eval(input)
    if (v == null) buf
    else maxKMerge(buf, KllCodec.deserialize(v.asInstanceOf[Array[Byte]]))
  }
  override def merge(buf: KllDoubles, other: KllDoubles): KllDoubles =
    maxKMerge(buf, other)
  /** Result k = MAX k over the NON-EMPTY input sketches, regardless of
    * partition/merge order (empty sketches — including the pristine
    * k=200 default buffer — are k-neutral): the result K and N are
    * order-free on heterogeneous-k rollups. The serialized CONTENT is
    * not — at equal k the host is whichever buffer arrived first and
    * KLL merge is not bit-commutative (the reason KllMergePairExpr
    * carries a content tie-break) — so downstream consumers must read
    * the sketch through its estimates (rank-error envelope pinned),
    * never byte-compare aggregate outputs across runs.
    */
  private def maxKMerge(buf: KllDoubles, in: KllDoubles): KllDoubles =
    if (in.n == 0L) buf
    else if (buf.n == 0L) in
    else if (in.k > buf.k) { in.merge(buf); in }
    else { buf.merge(in); buf }
  override def eval(buf: KllDoubles): Any = KllCodec.serialize(buf)
  override def serialize(buf: KllDoubles): Array[Byte] = KllCodec.serialize(buf)
  override def deserialize(storage: Array[Byte]): KllDoubles =
    KllCodec.deserialize(storage)
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantiles(sketch, ps)` — quantile estimates from a serialized
  * sketch; array<double> aligned with `ps`. Panel-scale usage only
  * (one row per rollup grain), so eval-mode is fine.
  */
case class KllQuantilesExpr(child: Expression, ps: Seq[Double])
    extends UnaryExpression with CodegenFallback {
  require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
    s"probabilities outside [0,1]: $ps")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"
  override protected def nullSafeEval(input: Any): Any = {
    val s = KllCodec.deserialize(input.asInstanceOf[Array[Byte]])
    if (s.n == 0L) null
    else new GenericArrayData(ps.map(s.quantile).toArray)
  }
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesExpr =
    copy(child = newChild)
}

/** `kll_merge_pair(a, b)` — scalar union of two serialized sketches
  * (the stored-sketch-table fold; null-tolerant on either side).
  */
case class KllMergePairExpr(left: Expression, right: Expression)
    extends Expression with CodegenFallback with BinaryLike[Expression] {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_pair"
  override def nullable: Boolean = left.nullable && right.nullable
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null) b
    else if (b == null) a
    else {
      val ba = a.asInstanceOf[Array[Byte]]
      val bb = b.asInstanceOf[Array[Byte]]
      val sa = KllCodec.deserialize(ba)
      val sb = KllCodec.deserialize(bb)
      // merge into the larger-k side so the pair keeps the tighter
      // envelope and merge_pair(a,b) == merge_pair(b,a): levels sort
      // before every compaction and the compaction counters add, so
      // the host CHOICE (never argument order) fixes the result — and
      // at EQUAL k the tie breaks on content (n, then serialized
      // bytes), still symmetric in the arguments
      val hostIsB =
        if (sb.k != sa.k) sb.k > sa.k
        else if (sb.n != sa.n) sb.n > sa.n
        else java.util.Arrays.compare(bb, ba) > 0
      val (host, other) = if (hostIsB) (sb, sa) else (sa, sb)
      if (host.n == 0L) KllCodec.serialize(other)
      else { host.merge(other); KllCodec.serialize(host) }
    }
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): KllMergePairExpr =
    copy(left = newLeft, right = newRight)
}

/** `kll_n(sketch)` — the row count a serialized sketch has absorbed. */
case class KllNExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"
  override protected def nullSafeEval(input: Any): Any =
    KllCodec.deserialize(input.asInstanceOf[Array[Byte]]).n
  override protected def withNewChildInternal(newChild: Expression): KllNExpr =
    copy(child = newChild)
}

/** Column-API surface of the KLL kernels. */
object Kll {
  def sketchAgg(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(c.cast("double")), k)
        .toAggregateExpression())
  def mergeAgg(c: Column): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(c)).toAggregateExpression())
  def quantiles(c: Column, ps: Seq[Double]): Column =
    ColumnBridge.column(KllQuantilesExpr(ColumnBridge.expression(c), ps))
  def mergePair(a: Column, b: Column): Column =
    ColumnBridge.column(
      KllMergePairExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def n(c: Column): Column =
    ColumnBridge.column(KllNExpr(ColumnBridge.expression(c)))
}
