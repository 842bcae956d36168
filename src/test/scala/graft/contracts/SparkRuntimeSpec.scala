package graft.contracts

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import ContractFixtures._
import SchemaPolicy._

/** Runtime pin layer against actual DataFrame schemas — mirrors the
  * reference's SparkRuntimeSpec technique: empty DataFrames with
  * hand-crafted StructTypes (no data needed; pins are plan-metadata-only).
  */
class SparkRuntimeSpec extends AnyFunSuite with SparkTestSession {

  private def emptyDf(schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private val customerNext = StructType(
    Seq(
      StructField("id", LongType, nullable = false),
      StructField("email", StringType, nullable = false),
      StructField("age", IntegerType, nullable = true)
    )
  )

  test("default pin accepts unordered case-twisted schema, ignores nullability") {
    val twisted = StructType(
      Seq(
        StructField("Email", StringType, nullable = true),
        StructField("ID", LongType, nullable = true),
        StructField("AGE", IntegerType, nullable = false)
      )
    )
    SchemaCheck.assertMatchesContract[CustomerNext](emptyDf(twisted))
  }

  test("default pin rejects missing column with drift detail") {
    val missing = StructType(customerNext.fields.take(2))
    val e = intercept[ContractViolation] {
      SchemaCheck.assertMatchesContract[CustomerNext](emptyDf(missing))
    }
    assert(e.getMessage.contains("age"))
    assert(e.getMessage.contains("Found:"))
    assert(e.getMessage.contains("Expected:"))
  }

  test("nested collection optionality drift rejected (Spark's comparators ignore it)") {
    // contract: tags ArrayType(containsNull = false); found: containsNull = true
    val found = StructType(Seq(StructField("tags", ArrayType(StringType, containsNull = true), nullable = false)))
    val e = intercept[ContractViolation] {
      SchemaCheck.assertMatchesContract[ReqTags](emptyDf(found))
    }
    assert(e.getMessage.contains("tags[]"))
    // and the Spark built-in would have accepted it:
    assert(DataType.equalsIgnoreCaseAndNullability(found, ShapeOf[ReqTags].struct))
  }

  test("duplicate case-insensitive names rejected with diagnostic") {
    val dup = StructType(
      Seq(
        StructField("id", LongType, nullable = false),
        StructField("email", StringType, nullable = false),
        StructField("Email", StringType, nullable = false),
        StructField("age", IntegerType, nullable = true)
      )
    )
    val e = intercept[ContractViolation] {
      SchemaCheck.assertMatchesContract[CustomerNext](emptyDf(dup))
    }
    assert(e.getMessage.toLowerCase.contains("duplicate"))
    assert(RuntimeSchemaComparator.duplicateNames(dup, caseInsensitive = true) === List(List("Email", "email")))
  }

  test("policy pin matrix: ordered / by-position / backward / forward / full") {
    val reordered = StructType(
      Seq(
        StructField("email", StringType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("age", IntegerType, nullable = true)
      )
    )
    val renamed = StructType(
      Seq(
        StructField("a", LongType, nullable = false),
        StructField("b", StringType, nullable = false),
        StructField("c", IntegerType, nullable = true)
      )
    )
    val widened = customerNext.add(StructField("extra", StringType, nullable = true))
    val narrowed = StructType(customerNext.fields.take(2))

    val df = emptyDf _

    // ExactOrdered rejects reorder; Exact accepts
    SchemaCheck.assertMatchesContract[CustomerNext, ExactT](df(reordered))
    intercept[ContractViolation](SchemaCheck.assertMatchesContract[CustomerNext, ExactOrderedT](df(reordered)))

    // ByPosition accepts renamed, rejects reorder (type drift at @0)
    SchemaCheck.assertMatchesContract[CustomerNext, ExactByPositionT](df(renamed))
    intercept[ContractViolation](SchemaCheck.assertMatchesContract[CustomerNext, ExactByPositionT](df(reordered)))

    // Backward: extras fine, missing optional fine; Forward: subset fine, extras rejected
    SchemaCheck.assertMatchesContract[CustomerNext, BackwardT](df(widened))
    SchemaCheck.assertMatchesContract[CustomerNext, ForwardT](df(narrowed))
    intercept[ContractViolation](SchemaCheck.assertMatchesContract[CustomerNext, ForwardT](df(widened)))
    // Backward: missing optional age is fine, missing required email is not
    SchemaCheck.assertMatchesContract[CustomerNext, BackwardT](df(narrowed))
    val noEmail = StructType(Seq(customerNext.fields(0), customerNext.fields(2)))
    intercept[ContractViolation](SchemaCheck.assertMatchesContract[CustomerNext, BackwardT](df(noEmail)))

    // Full accepts anything
    SchemaCheck.assertMatchesContract[CustomerNext, FullT](df(renamed))
    SchemaCheck.assertMatchesContract[CustomerNext, FullT](df(narrowed))
  }

  test("backward honors hasDefault metadata and nullable fallback") {
    // BackwardTarget: age optional, region has default -> both may be missing
    val onlyRequired = StructType(
      Seq(
        StructField("id", LongType, nullable = false),
        StructField("email", StringType, nullable = false)
      )
    )
    SchemaCheck.assertMatchesContract[BackwardTarget, BackwardT](emptyDf(onlyRequired))
  }

  test("deep 3-level accept and reject (F2/F3)") {
    val good = ShapeOf[ContractRoot].struct
    SchemaCheck.assertMatchesContract[ContractRoot](emptyDf(good))
    val bad = ShapeOf[BadRoot].struct
    val e = intercept[ContractViolation](SchemaCheck.assertMatchesContract[ContractRoot](emptyDf(bad)))
    assert(e.getMessage.contains("items[].payload<value>.code"))
  }

  test("RuntimeSchemaComparator boolean surface (O10-O16)") {
    val ref = ShapeOf[CustomerNext].struct
    assert(RuntimeSchemaComparator.unordered(customerNext, ref, caseInsensitive = true))
    assert(RuntimeSchemaComparator.ordered(customerNext, ref, caseInsensitive = false))
    assert(RuntimeSchemaComparator.byPosition(customerNext, ref))
    assert(RuntimeSchemaComparator.backward(customerNext, ref))
    assert(RuntimeSchemaComparator.forward(customerNext, ref))
    assert(RuntimeSchemaComparator.unordered(customerNext, ref, caseInsensitive = false))
  }
}
