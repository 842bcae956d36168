package graft.relational

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface demo: exact weighted average over (cents, weight)
  * pairs. The buffer is integral (cents × weight), so partial aggregation
  * is exact and order-independent — the final division is the only
  * floating-point step, making results reproducible under any
  * partitioning (and oracle-able in DuckDB with the same integer sums).
  */
object WeightedAvg extends Aggregator[(Long, Long), (Long, Long), (Long, Long)] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    (b._1 + a._1 * a._2, b._2 + a._2)

  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)

  /** Returns (weighted cents sum, weight sum); the caller divides. */
  override def finish(r: (Long, Long)): (Long, Long) = r

  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
}
