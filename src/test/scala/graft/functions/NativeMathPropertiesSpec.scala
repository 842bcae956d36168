package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the [[NativeMath]] numeric kernels (dot / cosine /
  * l2sq) against plain-Scala left-fold references — the same accumulation
  * order the HOF formulations use, so a pass here plus the HOF
  * bit-identity specs in LlmOpsSpec pins kernel == HOF == reference on
  * arbitrary inputs, not just the fixed fixtures. Pure kernel calls on
  * [[GenericArrayData]]: no Spark session, no jobs — milliseconds.
  */
class NativeMathPropertiesSpec extends AnyFunSuite {

  /** Deterministic scalacheck sampling (scalatestplus isn't in the offline
    * dependency cache — same manual driver as ConformancePropertiesSpec).
    */
  private def forAllSampled[A](gen: Gen[A], n: Int)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      body(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
      i += 1
    }
  }

  // mixed magnitudes incl. negatives, zeros, and values big enough to
  // exercise double rounding (so an association-order bug WOULD surface)
  private val elemGen: Gen[Double] =
    Gen.oneOf(
      Gen.choose(-1.0, 1.0),
      Gen.choose(-1e6, 1e6),
      Gen.const(0.0),
      Gen.choose(-127.0, 127.0).map(math.rint) // the quantized-int regime
    )

  private val pairGen: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.choose(1, 96)
    a <- Gen.listOfN(n, elemGen)
    b <- Gen.listOfN(n, elemGen)
  } yield (a.toArray, b.toArray)

  private def arr(a: Array[Double]): GenericArrayData = new GenericArrayData(a.map(x => x: Any))
  private def arrF(a: Array[Double]): GenericArrayData = new GenericArrayData(a.map(x => x.toFloat: Any))

  private val D = NativeMath.typeCode(ArrayType(DoubleType))
  private val F = NativeMath.typeCode(ArrayType(FloatType))

  // left-to-right fold references — the HOF aggregate's order
  private def refDot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def refL2sq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }
  private def refCosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("dot/l2sq/cosine kernels are bit-identical to left-fold references on random double arrays") {
    forAllSampled(pairGen, 300) { case (a, b) =>
      assert(NativeMath.dot(arr(a), arr(b), D, D).doubleValue() == refDot(a, b))
      assert(NativeMath.l2sq(arr(a), arr(b), D, D).doubleValue() == refL2sq(a, b))
      val c = NativeMath.cosine(arr(a), arr(b), D, D).doubleValue()
      val rc = refCosine(a, b)
      // NaN == NaN is false; zero vectors yield NaN on both sides
      assert(c == rc || (c.isNaN && rc.isNaN))
    }
  }

  test("kernels widen float elements to double exactly (same result as pre-widened doubles)") {
    forAllSampled(pairGen, 300) { case (a, b) =>
      val aw = a.map(x => x.toFloat.toDouble) // what float storage preserves
      val bw = b.map(x => x.toFloat.toDouble)
      assert(NativeMath.dot(arrF(a), arrF(b), F, F).doubleValue() == refDot(aw, bw))
      assert(NativeMath.l2sq(arrF(a), arrF(b), F, F).doubleValue() == refL2sq(aw, bw))
    }
  }

  test("length mismatch and null elements return null, never a common-prefix sum") {
    val a = arr(Array(1.0, 2.0))
    val b = arr(Array(1.0, 2.0, 3.0))
    assert(NativeMath.dot(a, b, D, D) == null)
    assert(NativeMath.l2sq(a, b, D, D) == null)
    assert(NativeMath.cosine(a, b, D, D) == null)
    val withNull = new GenericArrayData(Array[Any](1.0, null, 3.0))
    val clean = arr(Array(1.0, 2.0, 3.0))
    assert(NativeMath.dot(withNull, clean, D, D) == null)
    assert(NativeMath.l2sq(withNull, clean, D, D) == null)
    assert(NativeMath.cosine(clean, withNull, D, D) == null)
  }
}
