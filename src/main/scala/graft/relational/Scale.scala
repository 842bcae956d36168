package graft.relational

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class operators: skew-salted joins and
  * bucketed co-located joins. Both produce results identical to their
  * naive counterparts (oracled by the driver's DuckDB gate); what changes
  * is the shuffle structure at cluster scale.
  */
object Scale {

  /** Skew-salted broadcast-free equi-join: the big side gets a uniform
    * salt in [0, saltFactor); the small side is replicated once per salt
    * value; the join key becomes (key, salt), splitting each hot key's
    * rows across `saltFactor` tasks instead of one straggler.
    *
    * The salt is derived from `monotonically_increasing_id()` — its
    * per-row value is partition-dependent, but the JOIN RESULT is salt
    * invariant (every salt matches exactly one replicated small-side row),
    * so results stay deterministic.
    *
    * AQE's skew-join handling covers sort-merge joins automatically; this
    * operator is for the cases AQE can't split (e.g. aggregation-feeding
    * joins where one key dominates an entire partition).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int
  ): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    // rename the small-side key so equal key names can't make the join
    // condition ambiguous; the surrogate is dropped from the output.
    val saltedSmall = small
      .withColumnRenamed(smallKey, "__sjk")
      .withColumn("__salt2", explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig
      .join(saltedSmall, col("__salt") === col("__salt2") && col(bigKey) === col("__sjk"))
      .drop("__salt", "__salt2", "__sjk")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. For algebraic
    * aggregates Spark's own partial aggregation already does this
    * map-side; the explicit form exists for aggregates that need a
    * reduced-cardinality shuffle stage (e.g. collect-heavy combiners).
    */
  def saltedCount(df: DataFrame, keyCol: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("n"))

  /** Write both sides bucketed+sorted on the join key and join the bucketed
    * tables: co-located, shuffle-free at read time (the plan has no
    * Exchange before the join). This is the batch-layout answer to a join
    * repeated at 100 TB — pay the shuffle once at write time.
    */
  def bucketedJoin(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      leftName: String,
      rightName: String,
      key: String,
      buckets: Int
  ): DataFrame = {
    // Repartition on the bucket key before writing: without it every input
    // task writes a file per bucket it touches (tasks × buckets small
    // files — a metadata bomb at 100 TB); with it each bucket is written
    // by exactly one task and arrives pre-clustered for the sortBy.
    left
      .repartition(buckets, left(key))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(leftName)
    right
      .repartition(buckets, right(key))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(rightName)
    spark.table(leftName).join(spark.table(rightName), key)
  }
}
