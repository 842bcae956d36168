package graft.llmops

import org.apache.spark.sql.Column
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
}
