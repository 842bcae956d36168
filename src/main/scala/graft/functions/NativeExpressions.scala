package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{GraftSqlShim => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the llmops hot paths.
  *
  * The higher-order-function formulations (see Fingerprints/Similarity) are
  * semantically identical but evaluate interpreted lambdas with per-element
  * array allocation — ~3 µs per hash. These expressions run the same math
  * as tight primitive loops (~20 ns per hash): MinHash over a 5000-doc
  * corpus drops from minutes to seconds, and the gap widens linearly with
  * corpus size, so at 100 TB this is the difference between feasible and
  * not. `CodegenFallback` keeps them pluggable into whole-stage-codegen'd
  * plans; only this expression falls back to eval.
  */
object native {

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def simhash56Md5(tokens: Column): Column =
    ExpressionUtils.column(SimHash56Md5(ExpressionUtils.expression(tokens)))

  def tokenShingles(tokens: Column, k: Int): Column =
    ExpressionUtils.column(TokenShingles(ExpressionUtils.expression(tokens), k))

  def arrayDot(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def arrayCosine(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayCosine(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** MinHash signature: sig[s] = min over shingles of xxhash64(shingle, seed=s).
  * Input array<string>, output array<long> of length `numHashes`.
  */
final case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def foldable: Boolean = child.foldable

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var h = 0
        while (h < numHashes) {
          val v = XxHash64Function.hash(s, StringType, h.toLong)
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct k-token shingles joined by single spaces, first-occurrence
  * order (identical to the `array_distinct(transform(...concat_ws...))`
  * HOF formulation and to DuckDB's `list_distinct(list_transform(...))`
  * oracle). Docs shorter than k tokens yield an empty array. Input
  * array<string>, output array<string>.
  */
final case class TokenShingles(child: Expression, k: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def foldable: Boolean = child.foldable

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "token_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        window(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per-token xxhash64 (seed 42, same as
  * the built-in `xxhash64`), each bit votes ±1, sign of the vote sets the
  * output bit. Input array<string>, output long.
  */
final case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def foldable: Boolean = child.foldable

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 56-bit portable SimHash over a token array: per-token hash = first 14
  * hex chars of MD5 as two 28-bit halves (bit-identical to Spark's
  * `conv(substring(md5(t),1,7),16,10) << 28 | conv(substring(md5(t),8,7),
  * 16,10)` and to DuckDB's equivalent — the cross-engine-reproducible
  * sibling of [[SimHash64]]). Each bit votes ±1; sign sets the bit. Input
  * array<string>, output long (always non-negative: 56 < 63 bits).
  */
final case class SimHash56Md5(child: Expression) extends UnaryExpression with CodegenFallback {

  override def foldable: Boolean = child.foldable

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash56_md5"

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](56)
    val md = digest.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 14 hex chars = bytes 0..6 (high nibble of byte 3 ends the
        // first half): h = hex[0:7] << 28 | hex[7:14]
        val b0 = d(0) & 0xffL; val b1 = d(1) & 0xffL; val b2 = d(2) & 0xffL
        val b3 = d(3) & 0xffL; val b4 = d(4) & 0xffL; val b5 = d(5) & 0xffL
        val b6 = d(6) & 0xffL
        val hi = (b0 << 20) | (b1 << 12) | (b2 << 4) | (b3 >>> 4)
        val lo = ((b3 & 0xfL) << 24) | (b4 << 16) | (b5 << 8) | b6
        val h = (hi << 28) | lo
        var b = 0
        while (b < 56) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 56) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash56Md5 =
    copy(child = newChild)
}

private[functions] trait ArrayNumericBinary extends BinaryExpression with CodegenFallback {

  // participate in Catalyst ConstantFolding: literal-argument calls
  // (e.g. plane signatures over literal hyperplanes in SQL) fold to
  // Literals at optimization time instead of evaluating per row
  override def foldable: Boolean = left.foldable && right.foldable

  override def dataType: DataType = DoubleType

  protected def elemGetter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _)  => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case ArrayType(LongType, _)   => (a, i) => a.getLong(i).toDouble
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported array type: $other")
  }
}

/** Dot product of two numeric arrays, accumulated left-to-right in double
  * (deterministic; identical order to the HOF `aggregate` formulation).
  * Null if either array, or any touched element, is null.
  */
final case class ArrayDot(left: Expression, right: Expression) extends ArrayNumericBinary {

  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    // length mismatch → null, matching the HOF reference (zip_with pads the
    // shorter side with null, nulling the whole sum) — never a silent
    // common-prefix result.
    if (a.numElements() != b.numElements()) return null
    val ga = elemGetter(left.dataType)
    val gb = elemGetter(right.dataType)
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += ga(a, i) * gb(b, i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity: dot / (sqrt(|a|²) * sqrt(|b|²)), all three sums
  * accumulated left-to-right in double — bit-identical to the HOF
  * formulation it replaces (association order preserved).
  */
final case class ArrayCosine(left: Expression, right: Expression) extends ArrayNumericBinary {

  override def prettyName: String = "array_cosine"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() != b.numElements()) return null // see ArrayDot
    val ga = elemGetter(left.dataType)
    val gb = elemGetter(right.dataType)
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = ga(a, i)
      val y = gb(b, i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}
