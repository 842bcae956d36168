package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 measurement probe for the native `array_l2sq` expression vs
  * the HOF `aggregate(zip_with(...))` formulation it replaced in the PQ
  * fit/encode inner loop (Similarity.l2sq). Times a pure projection —
  * sum of l2sq over n rows of `dim`-element double arrays, no joins, no
  * shuffle — so the delta is the scalar kernel alone, not the plan
  * around it. Also asserts the two sums are bit-identical (the spec
  * checks small fixtures; this checks 2M rows of mixed magnitudes).
  *
  *   L2sqKernelProbe [rows] [dim]   → per-round timings on stdout
  */
object L2sqKernelProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark
      .range(rows)
      .select(
        transform(sequence(lit(0), lit(dim - 1)), i => (col("id") % 97 + i).cast("double")).as("va"),
        transform(sequence(lit(0), lit(dim - 1)), i => (col("id") % 89 - i).cast("double")).as("vb")
      )
      .localCheckpoint(true)

    def hof(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
    def native(a: Column, b: Column): Column = graft.functions.native.arrayL2Sq(a, b)
    def run(f: (Column, Column) => Column): Double =
      df.select(sum(f(col("va"), col("vb")))).head().getDouble(0)
    def time(label: String)(f: => Double): Double = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    println(s"rows=$rows dim=$dim (${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")} threads)")
    var h = 0.0
    var n = 0.0
    (1 to 3).foreach { r =>
      h = time(s"hof    round $r")(run(hof))
      n = time(s"native round $r")(run(native))
    }
    println(s"sums bit-identical: ${h == n} ($h)")
    spark.stop()
  }
}
