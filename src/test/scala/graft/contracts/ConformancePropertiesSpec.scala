package graft.contracts

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over random shape pairs:
  *   1. policy lattice — CS-unordered conformance implies Backward ∧
  *      Forward; ordered implies unordered and by-position; Full accepts
  *      everything (SURVEY.md §5).
  *   2. FastConforms ⇔ SchemaCompare.diff.conforms equivalence — the
  *      zero-allocation pin path must agree with the diff engine on every
  *      policy for arbitrary (including mutated) shape pairs.
  */
class ConformancePropertiesSpec extends AnyFunSuite {

  /** Deterministic scalacheck sampling (scalatestplus isn't in the offline
    * dependency cache, so Gens are driven manually with a fixed seed).
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

  private val leafGen: Gen[DataType] =
    Gen.oneOf(IntegerType, LongType, StringType, DoubleType, BooleanType, DateType)

  private val nameGen: Gen[String] = Gen.oneOf("a", "b", "c", "d", "id", "ID", "x", "y")

  private def shapeGen(depth: Int): Gen[TypeShape] =
    if (depth <= 0) leafGen.map(TypeShape.Leaf)
    else
      Gen.frequency(
        5 -> leafGen.map(TypeShape.Leaf),
        2 -> Gen.lzy(shapeGen(depth - 1).map(TypeShape.Sequence)),
        1 -> Gen.lzy(shapeGen(depth - 1).map(s => TypeShape.Sequence(TypeShape.Optional(s)))),
        1 -> Gen.lzy(shapeGen(depth - 1).map(v => TypeShape.MapOf(TypeShape.Leaf(StringType), v))),
        2 -> Gen.lzy(structGen(depth - 1))
      )

  private def fieldGen(depth: Int): Gen[FieldShape] =
    for {
      name <- nameGen
      shape <- shapeGen(depth)
      hasDefault <- Gen.oneOf(true, false)
      isOptional <- Gen.oneOf(true, false)
    } yield FieldShape(name, shape, hasDefault, isOptional)

  private def structGen(depth: Int): Gen[TypeShape.Struct] =
    Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, fieldGen(depth))).map(TypeShape.Struct)

  /** Mutations of a base struct: reorder / drop / rename-case / retype —
    * biased toward the interesting near-miss pairs independent sampling
    * rarely produces.
    */
  private def mutate(s: TypeShape.Struct): Gen[TypeShape.Struct] = {
    val fs = s.fields
    val reorder = Gen.const(TypeShape.Struct(fs.reverse))
    val drop = if (fs.isEmpty) Gen.const(s) else Gen.choose(0, fs.length - 1).map(i => TypeShape.Struct(fs.patch(i, Nil, 1)))
    val upcase =
      if (fs.isEmpty) Gen.const(s)
      else Gen.choose(0, fs.length - 1).map(i => TypeShape.Struct(fs.updated(i, fs(i).copy(name = fs(i).name.toUpperCase))))
    val retype =
      if (fs.isEmpty) Gen.const(s)
      else Gen.choose(0, fs.length - 1).map(i => TypeShape.Struct(fs.updated(i, fs(i).copy(shape = TypeShape.Leaf(BinaryType)))))
    val add = fieldGen(1).map(f => TypeShape.Struct(fs :+ f))
    Gen.oneOf(Gen.const(s), reorder, drop, upcase, retype, add)
  }

  private val pairGen: Gen[(TypeShape.Struct, TypeShape.Struct)] =
    for {
      base <- structGen(2)
      out <- Gen.oneOf(mutate(base), structGen(2))
      contract <- Gen.oneOf(Gen.const(base), mutate(base))
    } yield (out, contract)

  private val allPolicies: List[SchemaPolicy] =
    SchemaPolicy.all :+ SchemaPolicy.ExactUnorderedCS

  test("FastConforms agrees with the diff engine on every policy (random shape pairs)") {
    forAllSampled(pairGen, 500) { pair =>
      val (out, contract) = pair
      val outStruct = TypeShape.toStructType(out)
      val contractStruct = TypeShape.toStructType(contract)
      allPolicies.foreach { p =>
        val fast = FastConforms.ok(outStruct, contractStruct, p)
        val slow = SchemaCompare.diff(TypeShape.fromStructType(outStruct), TypeShape.fromStructType(contractStruct), p).conforms
        assert(fast == slow, s"policy ${p.name}: fast=$fast slow=$slow\nout=$out\ncontract=$contract")
      }
    }
  }

  /** Deep case-folded duplicate-name presence: ordered/by-position policies
    * tolerate duplicates while the unordered family rejects them, so the
    * lattice implications only hold on dup-free shapes.
    */
  private def hasDupsDeep(shape: TypeShape): Boolean = shape match {
    case TypeShape.Struct(fields) =>
      SchemaCompare.duplicateNames(fields, caseInsensitive = true).nonEmpty ||
        fields.exists(f => hasDupsDeep(f.shape))
    case TypeShape.Optional(inner)  => hasDupsDeep(inner)
    case TypeShape.Sequence(elem)   => hasDupsDeep(elem)
    case TypeShape.MapOf(_, value)  => hasDupsDeep(value)
    case TypeShape.Leaf(_)          => false
  }

  test("policy lattice: CS-unordered implies Backward and Forward; ordered implies unordered and by-position") {
    forAllSampled(pairGen, 500) { pair =>
      val (out, contract) = pair
      def ok(p: SchemaPolicy) = SchemaCompare.conforms(out, contract, p)
      val dupFree = !hasDupsDeep(out) && !hasDupsDeep(contract)
      if (ok(SchemaPolicy.ExactUnorderedCS)) {
        assert(ok(SchemaPolicy.Backward), s"CS-unordered but not Backward: $out vs $contract")
        assert(ok(SchemaPolicy.Forward), s"CS-unordered but not Forward: $out vs $contract")
      }
      if (ok(SchemaPolicy.ExactOrdered)) {
        if (dupFree)
          assert(ok(SchemaPolicy.ExactUnorderedCS), s"ordered but not CS-unordered: $out vs $contract")
        assert(ok(SchemaPolicy.ExactByPosition), s"ordered but not by-position: $out vs $contract")
        assert(ok(SchemaPolicy.ExactOrderedCI), s"ordered-CS but not ordered-CI: $out vs $contract")
      }
      if (ok(SchemaPolicy.Exact)) assert(ok(SchemaPolicy.ExactUnorderedCI))
    }
  }

  test("Full accepts everything") {
    forAllSampled(pairGen, 300) { pair =>
      val (out, contract) = pair
      assert(SchemaCompare.conforms(out, contract, SchemaPolicy.Full))
      assert(FastConforms.ok(TypeShape.toStructType(out), TypeShape.toStructType(contract), SchemaPolicy.Full))
    }
  }

  test("conformance is reflexive for every policy") {
    forAllSampled(pairGen, 300) { pair =>
      val (out, _) = pair
      if (!hasDupsDeep(out)) {
        allPolicies.foreach { p =>
          assert(SchemaCompare.conforms(out, out, p), s"not reflexive under ${p.name}: $out")
        }
      }
    }
  }
}
