package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd predicate.
  *
  * The expression carries the SERIALIZED filter and deserializes once
  * per executor (lazy / codegen mutable state), so the plan tree stays
  * serializable and the per-row cost is a hash probe in a tight loop —
  * never a boxed UDF call.
  */
object BloomKernels {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}

/** `bloom_might_contain(key)` over a LONG key: false ⇒ the key is
  * definitely not in the built set (no false negatives — the property
  * join pruning relies on); true ⇒ probably present (fpp-bounded).
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom = BloomKernels.deserialize(bloomBytes)

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("graftBloomBytes", bloomBytes, "byte[]")
    val bloomVar = ctx.addMutableState(classOf[BloomFilter].getName, "graftBloom",
      v => s"$v = graft.expressions.BloomKernels.deserialize((byte[]) $bytesRef);")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $bloomVar.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
