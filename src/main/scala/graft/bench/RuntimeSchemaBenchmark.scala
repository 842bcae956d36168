package graft.bench

import graft.contracts._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path}
import java.util.Locale

/** Comparator micro-benchmark (O23) + struct renamer util (O24), matching
  * the reference harness protocol exactly — 3 warmup + 8 measurement
  * iterations × 250k ops, volatile blackhole, CSV output, four cases:
  * custom unordered vs Spark's `DataType.equalsIgnoreCaseAndNullability`,
  * custom by-position (over a positionally renamed struct, proving
  * name-independence) vs `DataType.equalsStructurally`
  * (reference: bench/RuntimeSchemaBenchmark.scala:24-153).
  *
  * Usage: sbt "runMain graft.bench.RuntimeSchemaBenchmark [out.csv] [warmups] [iters] [ops]"
  */
object RuntimeSchemaBenchmark {

  private final case class BenchmarkCase(name: String, run: () => Boolean)
  private final case class BenchmarkResult(
      name: String,
      avgNsPerOp: Double,
      minNsPerOp: Double,
      maxNsPerOp: Double,
      measurementIterations: Int,
      opsPerIteration: Int
  )

  @volatile private var blackhole: Long = 0L

  // 3-level nested 6-field contract — the same benchmark shape family as
  // the reference fixture (bench/RuntimeSchemaBenchmark.scala:24-32).
  final case class Geo(lat: Double, lon: Double)
  final case class Address(street: String, city: String, zip: Option[Int], geo: Geo)
  final case class Event(kind: String, at: Long, tags: List[Option[String]], attrs: Map[String, String])
  final case class Contract(
      id: Long,
      email: String,
      age: Option[Int],
      address: Address,
      events: List[Event],
      metrics: Map[String, Option[Int]]
  )

  def main(args: Array[String]): Unit = {
    val outputPath = args.headOption.map(Path.of(_))
    val warmupIterations = args.lift(1).map(_.toInt).getOrElse(3)
    val measurementIterations = args.lift(2).map(_.toInt).getOrElse(8)
    val opsPerIteration = args.lift(3).map(_.toInt).getOrElse(250000)

    val exactRuntime = implicitly[PolicyRuntime[SchemaPolicy.ExactT]]
    val byPositionRuntime = implicitly[PolicyRuntime[SchemaPolicy.ExactByPositionT]]

    val expected = ShapeOf[Contract].struct
    val renamedExpected = renameStruct(expected, "col")

    val cases = List(
      BenchmarkCase("custom_exact_unordered_match", () => exactRuntime.ok(expected, expected)),
      BenchmarkCase(
        "spark_equals_ignore_case_and_nullability_match",
        () => DataType.equalsIgnoreCaseAndNullability(expected, expected)
      ),
      BenchmarkCase("custom_exact_by_position_match", () => byPositionRuntime.ok(renamedExpected, expected)),
      BenchmarkCase(
        "spark_equals_structurally_match",
        () => DataType.equalsStructurally(renamedExpected, expected, ignoreNullability = true)
      )
    )

    val results = cases.map(runBenchmark(_, warmupIterations, measurementIterations, opsPerIteration))

    val rendered = renderCsv(results)
    outputPath.foreach { path =>
      Option(path.getParent).foreach(Files.createDirectories(_))
      Files.writeString(path, rendered)
    }

    println("benchmark,avg_ns_per_op,min_ns_per_op,max_ns_per_op,measurement_iterations,ops_per_iteration")
    println(rendered)
  }

  private def runBenchmark(
      bench: BenchmarkCase,
      warmupIterations: Int,
      measurementIterations: Int,
      opsPerIteration: Int
  ): BenchmarkResult = {
    var warmup = 0
    while (warmup < warmupIterations) {
      runBatch(bench.run, opsPerIteration)
      warmup += 1
    }

    val measurements = Array.ofDim[Long](measurementIterations)
    var idx = 0
    while (idx < measurementIterations) {
      measurements(idx) = runBatch(bench.run, opsPerIteration)
      idx += 1
    }

    val nsPerOp = measurements.map(_.toDouble / opsPerIteration.toDouble)
    BenchmarkResult(
      name = bench.name,
      avgNsPerOp = nsPerOp.sum / nsPerOp.length.toDouble,
      minNsPerOp = nsPerOp.min,
      maxNsPerOp = nsPerOp.max,
      measurementIterations = measurementIterations,
      opsPerIteration = opsPerIteration
    )
  }

  private def runBatch(run: () => Boolean, opsPerIteration: Int): Long = {
    var matches = 0L
    var i = 0
    val start = System.nanoTime()
    while (i < opsPerIteration) {
      if (run()) matches += 1
      i += 1
    }
    val elapsed = System.nanoTime() - start
    blackhole = blackhole ^ matches
    elapsed
  }

  private def renderCsv(results: List[BenchmarkResult]): String =
    results
      .map { r =>
        f"${r.name},${r.avgNsPerOp}%.2f,${r.minNsPerOp}%.2f,${r.maxNsPerOp}%.2f,${r.measurementIterations},${r.opsPerIteration}"
      }
      .mkString("\n")

  /** O24: rename every field positionally (recursing into structs, array
    * elements, map key/values) so a by-position compare sees entirely
    * different names over identical types.
    */
  def renameStruct(struct: StructType, prefix: String): StructType =
    StructType(
      struct.fields.zipWithIndex.map { case (field, index) =>
        StructField(
          name = s"${prefix}_$index",
          dataType = renameDataType(field.dataType, s"${prefix}_$index"),
          nullable = field.nullable,
          metadata = field.metadata
        )
      }
    )

  private def renameDataType(dataType: DataType, prefix: String): DataType =
    dataType match {
      case struct: StructType =>
        renameStruct(struct, prefix.toLowerCase(Locale.ROOT))
      case ArrayType(elementType, containsNull) =>
        ArrayType(renameDataType(elementType, s"${prefix}_elem"), containsNull)
      case MapType(keyType, valueType, valueContainsNull) =>
        MapType(
          renameDataType(keyType, s"${prefix}_key"),
          renameDataType(valueType, s"${prefix}_value"),
          valueContainsNull
        )
      case other => other
    }
}
