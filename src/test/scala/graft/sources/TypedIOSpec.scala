package graft.sources

import graft.SparkTestSession
import graft.contracts.ContractViolation
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** O3 — Dataset read/write helpers: parquet ⇄ Dataset[A] round trip via
  * encoders (reference usage: SparkCore.scala:363-367), plus the typed-DF
  * endpoints against real files.
  */
object TypedIOSpec {
  final case class Person(id: Long, name: String, score: Double)
}

class TypedIOSpec extends AnyFunSuite with SparkTestSession {

  import TypedIOSpec.Person
  import spark.implicits._

  private implicit def s: SparkSession = spark

  test("Dataset round trip: write then read preserves rows and types") {
    val dir = Files.createTempDirectory("graft-typedio").toString
    val people = Seq(Person(1, "ada", 9.5), Person(2, "grace", 8.75), Person(3, "edsger", 7.0))
    TypedIO.write(people.toDS(), TypedSink[Person](s"$dir/people"))
    val back = TypedIO.read[Person](s"$dir/people").collect().sortBy(_.id)
    assert(back.toSeq == people)
  }

  test("readDF forces the contract schema (no inference) and returns pinned columns") {
    val dir = Files.createTempDirectory("graft-typedio2").toString
    Seq(Person(1, "ada", 9.5)).toDS().write.parquet(s"$dir/people")
    val df = TypedIO.readDF(TypedSource[Person]("parquet", s"$dir/people"))
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    assert(df.count() == 1)
  }

  test("writeDF pins the policy before writing") {
    val dir = Files.createTempDirectory("graft-typedio3").toString
    val df = Seq(Person(1, "ada", 9.5)).toDF()
    TypedIO.writeDF[Person, graft.contracts.SchemaPolicy.ExactT](df, TypedSink[Person](s"$dir/ok"))
    assert(spark.read.parquet(s"$dir/ok").count() == 1)
    intercept[ContractViolation] {
      TypedIO.writeDF[Person, graft.contracts.SchemaPolicy.ExactT](
        df.drop("score"),
        TypedSink[Person](s"$dir/never")
      )
    }
    assert(!new java.io.File(s"$dir/never").exists())
  }
}
