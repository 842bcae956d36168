package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the second time-series operator vanilla Spark
  * only offers as a theta-join (which plans a BroadcastNestedLoop /
  * cartesian and dies at scale): pairs every left row with the right rows
  * of the same key whose timestamp falls in `[lts + lower, lts + upper]`.
  *
  * Implementation is the binned equi-join: right rows land in time bins of
  * width `w = upper - lower + 1`; a left row's window overlaps at most two
  * consecutive bins, so the left side explodes to ≤ 2 (key, bin) probes,
  * the join is a plain equi-join on (key, bin), and an exact BETWEEN
  * filter trims bin-edge false positives. One shuffle, candidate volume
  * proportional to true matches + bin occupancy — the standard interval
  * join lowering (Flink's interval join and Databricks' range-join hint do
  * the same binning).
  *
  * `right` must carry the same-named `key` column and distinct other
  * names; output = left columns + right's non-key columns (inner join —
  * aggregate with a left join against the left table for outer counts).
  * Timestamps must be non-negative (µs/ms/s epochs); `div` truncation
  * equals floor there.
  */
object RangeJoin {

  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      lts: String,
      rts: String,
      lower: Long,
      upper: Long
  ): DataFrame = {
    require(upper >= lower, s"need lower <= upper, got [$lower, $upper]")
    require(
      right.columns.toSet.intersect(left.columns.toSet) == Set(key),
      s"left and right may only share the key column '$key' (rename the rest)"
    )
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"), "'__bin' is reserved")
    val w = math.max(1L, upper - lower + 1)
    val l0 = left.withColumn(
      "__bin",
      explode(sequence(expr(s"($lts + $lower) div $w"), expr(s"($lts + $upper) div $w")))
    )
    val r0 = right.withColumn("__bin", expr(s"$rts div $w"))
    val rightCols = right.columns.filterNot(_ == key)
    l0.join(r0, Seq(key, "__bin"))
      .filter(col(rts).between(col(lts) + lower, col(lts) + upper))
      .select((left.columns.map(l0(_)) ++ rightCols.map(r0(_))).toIndexedSeq: _*)
  }
}
