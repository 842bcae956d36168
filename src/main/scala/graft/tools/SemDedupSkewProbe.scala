package graft.tools

import graft.llmops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the `maxCell` skew cap of [[Similarity.semDedup]] on its design
  * failure mode: a DEGENERATE clustering where one cell catches the whole
  * corpus (cells = 1 forces it), making the uncapped within-cell pair join
  * exactly n². Synthesizes a deterministic dim-16 corpus of n near-identical
  * vectors (id-seeded jitter, every pair above tau), runs capped vs
  * uncapped, and prints wall seconds + survivor counts per n. Expectation:
  * uncapped degrades ~quadratically in n while capped grows ~linearly
  * (pair work n·maxCell), with both returning full-size results.
  *
  * Usage: SemDedupSkewProbe [n1,n2,...] (default 2000,8000)
  */
object SemDedupSkewProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(2000, 8000))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sizes.foreach { n =>
      // all vectors within a hair of (1, 1, ..., 1): every pair passes tau,
      // and any clustering puts everything in one cell — the worst case
      val fx = spark
        .range(n)
        .select(
          col("id").as("vec_id"),
          transform(
            sequence(lit(1), lit(16)),
            j => lit(1.0) + (pmod(col("id") * j, lit(97)) - lit(48.0)) / lit(10000.0)
          ).as("v")
        )
        .localCheckpoint(true)
      def run(maxCell: Int): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = Similarity
          .semDedup(fx, "vec_id", "v", tau = 0.99, cells = 1, iters = 1, seed = 42L, maxCell = maxCell)
          .count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val (tCap, survCap) = run(24)
      val (tRaw, survRaw) = run(0)
      println(
        s"""{"n":$n,"uncapped_sec":${"%.2f".format(tRaw)},"capped_sec":${"%.2f".format(tCap)},""" +
          s""""uncapped_survivors":$survRaw,"capped_survivors":$survCap}"""
      )
    }
    spark.stop()
  }
}
