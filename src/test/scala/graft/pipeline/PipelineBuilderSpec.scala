package graft.pipeline

import graft.SparkTestSession
import graft.contracts._
import graft.contracts.ContractFixtures._
import graft.sources.{TypedSink, TypedSource}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end builder spec — mirrors the reference PipelineBuilderSpec:
  * real temp-dir CSV -> transform -> parquet round trips, construction-time
  * drift fuse (replacing the reference's compile fuse), typestate
  * violations as compile errors, Backward/Forward no-transform paths.
  */
class PipelineBuilderSpec extends AnyFunSuite with SparkTestSession {

  import SchemaPolicy._

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeCsv(dir: String, header: String, rows: String*): String = {
    val p = java.nio.file.Paths.get(dir, "in.csv")
    Files.writeString(p, (header +: rows).mkString("\n"))
    p.toString
  }

  // F1 CSV fixture (reference: src/main/resources/data/input/customer.csv)
  private def customerCsv(): String =
    writeCsv(tempDir("graft-csv"), "id,email,age,segment", "1,vim89@gmail.com,21,S", "2,vim07@c.com,,L")

  test("green path: CSV -> select -> parquet under ExactByPosition (reference :101-126)") {
    val out = tempDir("graft-out") + "/customers"
    val run = PipelineBuilder[Nothing]("customers")
      .addSource(TypedSource[CustomerProducer]("csv", customerCsv(), Map("header" -> "true")))
      .transformAs[CustomerNext]("drop segment")(_.select("id", "email", "age"))
      .addSink[CustomerContract, ExactByPositionT](TypedSink[CustomerContract](out))
      .build
    val df = run(spark)
    assert(df.columns.toSeq === Seq("id", "email", "age"))

    val back = spark.read.parquet(out)
    assert(back.count() === 2)
    assert(back.columns.sorted.toSeq === Seq("age", "email", "id"))
    assert(back.where("age IS NULL").count() === 1)
  }

  test("construction-time fuse: drifting sink contract throws while wiring (reference compile-fail :57-77)") {
    val e = intercept[ContractViolation] {
      PipelineBuilder[Nothing]("drift")
        .addSource(TypedSource[CustomerProducer]("csv", customerCsv(), Map("header" -> "true")))
        .transformAs[Narrow]("too narrow")(_.select("id", "email"))
        .addSink[CustomerContract, ExactT](TypedSink[CustomerContract](tempDir("graft-never")))
    }
    assert(e.getMessage.contains("Missing attributes: age"))
    // Importantly: no Spark action ran — the fuse fires before .build/.apply.
  }

  test("typestate violations do not compile (reference :79-99)") {
    assertDoesNotCompile("""
      import graft.pipeline._
      PipelineBuilder[Nothing]("bad").transformAs[graft.contracts.ContractFixtures.CustomerNext]("x")(identity)
    """)
    assertDoesNotCompile("""
      import graft.pipeline._
      PipelineBuilder[Nothing]("bad").build
    """)
    assertDoesNotCompile("""
      import graft.pipeline._
      import graft.sources._
      import graft.contracts.ContractFixtures._
      PipelineBuilder[Nothing]("bad")
        .addSource(TypedSource[CustomerProducer]("csv", "/tmp/x.csv"))
        .addSource(TypedSource[CustomerProducer]("csv", "/tmp/y.csv"))
    """)
  }

  test("red path: construction passes under ByPosition but runtime reorder throws (reference :128-151)") {
    // CustomerNext vs CustomerContract are position-compatible, so the fuse
    // passes; the runtime transform pin then catches the actual reorder.
    val builder = PipelineBuilder[Nothing]("red")
      .addSource(TypedSource[CustomerProducer]("csv", customerCsv(), Map("header" -> "true")))
      .transformAs[CustomerNext]("reorder!")(_.select("email", "id", "age"))
      .addSink[CustomerContract, ExactByPositionT](TypedSink[CustomerContract](tempDir("graft-red")))
    val e = intercept[ContractViolation](builder.build.apply(spark))
    assert(e.getMessage.contains("Runtime schema mismatch"))
  }

  test("Backward no-transform path (reference :153-186)") {
    // producer lacks age + region; contract defaults them
    val dir = tempDir("graft-back")
    val csv = writeCsv(dir, "id,email", "1,a@x.com", "2,b@y.com")
    val out = dir + "/out"
    val run = PipelineBuilder[Nothing]("backward")
      .addSource(TypedSource[SlimProducer]("csv", csv, Map("header" -> "true")))
      .noTransform
      .addSink[BackwardTarget, BackwardT](TypedSink[BackwardTarget](out))
      .build
    assert(run(spark).count() === 2)
    assert(spark.read.parquet(out).columns.toSeq === Seq("id", "email"))
  }

  test("Forward no-transform path (reference :188-221)") {
    val dir = tempDir("graft-fwd")
    val csv = writeCsv(dir, "id,email", "1,a@x.com", "2,b@y.com")
    val out = dir + "/out"
    val run = PipelineBuilder[Nothing]("forward")
      .addSource(TypedSource[SlimProducer]("csv", csv, Map("header" -> "true")))
      .noTransform
      .addSink[CustomerProducer, ForwardT](TypedSink[CustomerProducer](out))
      .build
    assert(run(spark).count() === 2)
  }

  test("addSourceDF pins an arbitrary upstream DataFrame") {
    import spark.implicits._
    val run = PipelineBuilder[Nothing]("mem")
      .addSourceDF[CustomerNext](s => {
        import s.implicits._
        Seq((1L, "a@x.com", Some(3)), (2L, "b@y.com", None)).toDF("id", "email", "age")
      })
      .noTransform
      .addSink[CustomerContract, ExactT](TypedSink[CustomerContract](tempDir("graft-mem") + "/out"))
      .build
    assert(run(spark).as[CustomerNext].collect().length === 2)
  }
}
