package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (time-series lookup) join — an operator Spark has no built-in
  * for: for every left row, attach the value of the *latest* right row
  * with `rightTs <= leftTs` in the same key group (inclusive match).
  *
  * Implementation is the scale-correct union + running-window form, NOT a
  * range theta-join: both sides are tagged and unioned, one shuffle
  * partitions by key, and a running `last(value, ignoreNulls)` over
  * (ts, tag) order carries the most recent right value forward into each
  * left row. Cost is one shuffle + one sort — no per-row range scan, no
  * BroadcastNestedLoopJoin, no row explosion on dense right sides; this is
  * the plan you want at 100 TB (same shape Flink/kdb asof and DuckDB's
  * native ASOF JOIN lower to).
  *
  * Determinism: right rows sharing (key, ts) resolve to the greatest
  * value (the window orders by (ts, tag, value)); a right row exactly at
  * `leftTs` matches, mirroring DuckDB `ASOF LEFT JOIN ... ON l.ts >= r.ts`
  * — which is exactly what the driver oracle runs.
  */
object AsOf {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      valCol: String,
      outCol: String
  ): DataFrame = {
    val reserved = Set("__k", "__ts", "__tag", "__val", "__lrow")
    require(
      !(left.columns ++ right.columns).exists(reserved),
      s"asofJoin reserves internal column names ${reserved.mkString(", ")}"
    )
    require(!left.columns.contains(outCol), s"left already has a column named '$outCol'")
    val valType = right.schema(valCol).dataType
    val lrowType = StructType(left.schema.fields)
    val l0 = left.select(
      col(key).as("__k"),
      col(leftTs).as("__ts"),
      lit(1).as("__tag"),
      lit(null).cast(valType).as("__val"),
      struct(left.columns.map(col): _*).as("__lrow")
    )
    val r0 = right.select(
      col(key).as("__k"),
      col(rightTs).as("__ts"),
      lit(0).as("__tag"),
      col(valCol).as("__val"),
      lit(null).cast(lrowType).as("__lrow")
    )
    // tag 0 < 1: right rows at ts == leftTs enter the frame before the left
    // row they match (inclusive as-of); __val in the order makes same-ts
    // right duplicates resolve deterministically to the greatest value.
    val w = Window
      .partitionBy("__k")
      .orderBy(col("__ts"), col("__tag"), col("__val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l0.unionByName(r0)
      .withColumn(outCol, last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__lrow.*"), col(outCol))
  }
}
