package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot array kernels.
  *
  * The declarative versions of these (nested `transform`/`aggregate`
  * higher-order functions) are interpreted with per-element boxing; at
  * corpus scale the signature computation dominated whole queries.
  * Each expression here is a single tight JVM loop per row, wired into
  * whole-stage codegen via a static kernel call — the preference order
  * the engine follows everywhere: built-in functions, then a native
  * `Expression` with `doGenCode`, then (never, so far) a UDF.
  */
object ArrayKernels {

  // One MessageDigest per thread: getInstance per call costs more
  // than the digest itself on shingle-sized inputs.
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-register hash of a UTF8String — numerically equal to
    * the SQL `conv(substring(md5(s), 1, 15), 16, 10)` (DuckDB:
    * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`): the first 15
    * hex digits of the digest are the first 8 bytes big-endian,
    * unsigned-shifted right 4. This is [[graft.operators.Sampling
    * .md5Long60]]'s single-non-null-column case at kernel speed — the
    * engine-REPLAYABLE hash for tiers whose output exposes hash-
    * derived values (minhash signatures, simhash planes, fingerprints)
    * so the DuckDB oracle can recompute them as SQL relations. A null
    * element hashes as the empty string (tokenizers never emit null
    * elements; the total function keeps the kernel null-free).
    */
  def md5Long60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(if (s == null) Array.emptyByteArray else s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** MinHash kernel: one base hash per element TOTAL, then the affine
    * family (a_i·h + b_i) mod p per slot, tracking slot minimums.
    * `strings = false` accepts pre-hashed 64-bit elements (xxhash64 of
    * the shingle), producing identical signatures to the string path —
    * callers that also need the hashed set for verification then build
    * the shingle array exactly once.
    */
  def minhash(arr: ArrayData, a: Array[Long], b: Array[Long], prime: Long,
              strings: Boolean): ArrayData = {
    val n = arr.numElements()
    // Empty input has no defined minimum — return SQL NULL (the
    // declarative array_min path yields null slots; a MaxValue
    // sentinel would silently band-match every other empty doc).
    if (n == 0) return null
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // A null element hashes to the seed — exactly what the builtin
      // xxhash64(null) yields on the declarative path.
      val raw =
        if (strings) {
          val s = arr.getUTF8String(i)
          if (s == null) 42L else XxHash64Function.hash(s, StringType, 42L)
        } else if (arr.isNullAt(i)) 42L
        else arr.getLong(i)
      val h = java.lang.Math.floorMod(raw, prime)
      var j = 0
      while (j < k) {
        val v = java.lang.Math.floorMod(a(j) * h + b(j), prime)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** SimHash kernel: per-bit majority vote over element hashes.
    * A null element hashes to the seed (= builtin xxhash64(null));
    * the empty array votes every bit to 1, matching the declarative
    * fold from a zero accumulator. `md5 = true` votes over the 60
    * bits of [[md5Long60]] instead (the fingerprint is then a SQL
    * relation: 60 per-bit `SUM(CASE (h >> j) & 1 ...)` votes any
    * engine replays); band width drops 16 → 15 so four bands still
    * tile the fingerprint.
    */
  def simhash(arr: ArrayData, md5: Boolean): Long = {
    val bits = if (md5) 60 else 64
    val votes = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h =
        if (md5) md5Long60(s)
        else if (s == null) 42L
        else XxHash64Function.hash(s, StringType, 42L)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Fingerprint kernel: rolling polynomial over token hashes AND the
    * min-hash over n-token shingles, in one pass. Matches
    * TextOps.rollingFingerprint / minShingleFingerprint exactly
    * (same xxhash64 seed, same mod-prime arithmetic, same short-doc
    * whole-join shingle). `md5 = true` swaps the token/shingle hash
    * for [[md5Long60]] — identical structure, but the fingerprint
    * relation becomes SQL-replayable (the rolling fold expands to
    * `Σ hᵢ·31^(n−i) mod p`, a positional sum any engine computes).
    */
  def fingerprints(arr: ArrayData, n: Int, prime: Long, md5: Boolean): ArrayData = {
    val cnt = arr.numElements()
    @inline def hashOf(s: org.apache.spark.unsafe.types.UTF8String): Long =
      if (md5) md5Long60(s) else XxHash64Function.hash(s, StringType, 42L)
    var rolling = 0L
    var i = 0
    while (i < cnt) {
      val h = java.lang.Math.floorMod(hashOf(arr.getUTF8String(i)), prime)
      rolling = java.lang.Math.floorMod(rolling * 31 + h, prime)
      i += 1
    }
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var minShingle = Long.MaxValue
    if (cnt >= n) {
      val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var s = 0
      while (s + n <= cnt) {
        var j = 0
        while (j < n) { window(j) = arr.getUTF8String(s + j); j += 1 }
        val sh = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, window: _*)
        val h = java.lang.Math.floorMod(hashOf(sh), prime)
        if (h < minShingle) minShingle = h
        s += 1
      }
    } else {
      val all = new Array[org.apache.spark.unsafe.types.UTF8String](cnt)
      var j = 0
      while (j < cnt) { all(j) = arr.getUTF8String(j); j += 1 }
      val sh = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, all: _*)
      minShingle = java.lang.Math.floorMod(hashOf(sh), prime)
    }
    new GenericArrayData(Array(rolling, minShingle))
  }

  /** Hashed distinct n-gram shingles in one pass: xxhash64 (seed 42,
    * = the builtin `xxhash64` function) of each n-token window joined
    * with single spaces, first-occurrence-deduplicated — element for
    * element what `transform(array_distinct(transform(sequence(...),
    * i -> concat_ws(' ', slice(toks, i, n)))), s -> xxhash64(s))`
    * yields, minus its per-window interpreted-lambda overhead
    * (measured: the declarative chain was ~7 s of an 11 s pipeline at
    * sf0.1). Documents shorter than n tokens contribute their whole
    * token join, matching TextOps.shingles.
    */
  def shingleHashes(arr: ArrayData, n: Int, md5: Boolean): ArrayData = {
    val cnt = arr.numElements()
    @inline def hashOf(s: org.apache.spark.unsafe.types.UTF8String): Long =
      if (md5) md5Long60(s) else XxHash64Function.hash(s, StringType, 42L)
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    if (cnt < n) {
      val all = new Array[org.apache.spark.unsafe.types.UTF8String](cnt)
      var j = 0
      while (j < cnt) { all(j) = arr.getUTF8String(j); j += 1 }
      val h = hashOf(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, all: _*))
      return new GenericArrayData(Array(h))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var s = 0
    while (s + n <= cnt) {
      var j = 0
      while (j < n) { window(j) = arr.getUTF8String(s + j); j += 1 }
      val sh = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, window: _*)
      seen.add(hashOf(sh))
      s += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Left-fold double dot product — bit-identical to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and to the DuckDB
    * oracle's `list_reduce(list_prepend(0.0, ...))`.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** array<string> -> array<long>: MinHash signature of `numHashes`
  * slots with seed-derived affine coefficients.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  // null for empty input arrays, beyond child-null propagation
  override def nullable: Boolean = true

  // Interleaved draw order matches TextDedup.minhashSignature exactly,
  // so the declarative column version and this kernel agree slot for
  // slot on any input.
  @transient private lazy val (coefA, coefB) = {
    val rnd = new java.util.Random(seed)
    def coef(): Long = 1L + rnd.nextInt(Int.MaxValue - 1)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { a(i) = coef(); b(i) = coef(); i += 1 }
    (a, b)
  }

  @transient private lazy val stringInput: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case ArrayType(LongType, _) => false
    case other => throw new IllegalArgumentException(
      s"minhash_sig expects array<string> or array<bigint>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.minhash(input.asInstanceOf[ArrayData], coefA, coefB,
      MinHashSigExpr.Prime, stringInput)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coefA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("coefB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.ArrayKernels.minhash($c, $aRef, $bRef, ${MinHashSigExpr.Prime}L, $stringInput);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  val Prime = 1000000007L
}

/** array<string> -> array<long> of [fp_rolling, fp_min_shingle]:
  * both document fingerprints in one pass over the tokens.
  */
case class FingerprintsExpr(child: Expression, n: Int, md5: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.fingerprints(input.asInstanceOf[ArrayData], n, MinHashSigExpr.Prime, md5)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ArrayKernels.fingerprints($c, $n, ${MinHashSigExpr.Prime}L, $md5);")

  override protected def withNewChildInternal(newChild: Expression): FingerprintsExpr =
    copy(child = newChild)
}

/** array<string> tokens -> array<long>: distinct xxhash64 hashes of
  * the n-gram shingle windows (see ArrayKernels.shingleHashes).
  */
case class ShingleHashesExpr(child: Expression, n: Int, md5: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.shingleHashes(input.asInstanceOf[ArrayData], n, md5)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ArrayKernels.shingleHashes($c, $n, $md5);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** array<string> -> long: SimHash by per-bit majority vote — 64-bit
  * xxhash64 planes by default, 60-bit md5-register planes with
  * `md5 = true` (see ArrayKernels.simhash).
  */
case class SimHash64Expr(child: Expression, md5: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.simhash(input.asInstanceOf[ArrayData], md5)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ArrayKernels.simhash($c, $md5);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** (array<double>, array<double>) -> double: left-fold dot product. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ArrayKernels.dot($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
