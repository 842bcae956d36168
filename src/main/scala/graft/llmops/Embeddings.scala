package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines. Quantization is
  * the storage/bandwidth lever at 100 TB: an int8 vector is 4× smaller
  * than float32 and dot products on it vectorize; the scale factor rides
  * alongside for dequantization.
  *
  * Determinism: rounding is `floor(x + 0.5)` (half-up) on doubles — unlike
  * `round()`, whose half-even/half-up convention differs across engines —
  * so the DuckDB oracle reproduces every quantized byte exactly.
  */
object Embeddings {

  /** Per-vector symmetric max-abs scale (double; exact float→double). */
  def maxAbsScale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization: q_i = floor(x_i·127/scale + 0.5),
    * clipped implicitly by construction (|x_i| <= scale ⇒ |q_i| <= 127);
    * all-zero vectors quantize to zeros (scale 0 guard).
    */
  def quantizeInt8(vec: Column): Column = {
    val scale = maxAbsScale(vec)
    transform(
      vec,
      x =>
        when(scale === 0.0, lit(0))
          .otherwise(floor((x.cast("double") * lit(127.0)) / scale + lit(0.5)).cast("int"))
    )
  }

  /** Per-group centroids over int8-quantized vectors, one row per
    * (group, dimension): exact integer sums into one final division, so
    * the result is identical under ANY partitioning or reduction order —
    * float centroids can't promise that (fp addition isn't associative),
    * which is why the quantized path is both the verifiable one and the
    * scale-honest one (map-side partial integer sums, shuffle = groups ×
    * dims rows). Used for cluster representatives / class prototypes in
    * curation pipelines.
    */
  def quantizedCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(quantizeInt8(col(vecCol))).as(Seq("dim", "__q")))
      .groupBy(col(groupCol), col("dim").cast("long").as("dim"))
      .agg(
        sum(col("__q")).as("sum_q"),
        count(lit(1)).as("n"),
        (sum(col("__q")).cast("double") / count(lit(1))).as("centroid_q")
      )
}
