package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** One driver-verifiable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet tables. Queries without an oracle get the driver's weaker
  * rows-only check.
  *
  * Oracle-match rules this codebase follows (the driver hash-compares values
  * after sorting columns by name):
  *   - alias every computed column identically on both sides;
  *   - cast Spark `length`/`size`/`row_number` (int) to long — DuckDB's
  *     equivalents return BIGINT;
  *   - wrap DuckDB integer `sum`s in `CAST(... AS BIGINT)` — DuckDB widens
  *     to HUGEINT, Spark stays long;
  *   - never hash an order-dependent float aggregate: sum doubles through
  *     `DECIMAL(18,2)` (exact, order-independent) and cast the final value
  *     back to double; per-row double arithmetic is fine (deterministic IEEE);
  *   - `coalesce(array_to_string(...), '')` when the list can be empty —
  *     DuckDB returns NULL for an empty list where Spark's `array_join`
  *     returns '' (found at sf0.1 on `llm_c4_clean`: invisible at any SF
  *     where the empty case never occurs).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame
)

object QueryDef {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Testdata-drift guard. `events.ts` has shipped both as parquet
    * TIMESTAMP(NANOS) (which Spark 4 reads as Long under
    * `legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS) (read as a
    * timestamp type, TIMESTAMP_NTZ when unadjusted). Every query in this
    * codebase — and every DuckDB oracle via `epoch_ns(ts)` — assumes the
    * SAME contract: `ts` is epoch NANOSECONDS as BIGINT. Normalizing here,
    * at the single shared read path, restores that contract for any
    * physical encoding. With `spark.sql.session.timeZone=UTC` (set by every
    * entrypoint) the NTZ→TIMESTAMP cast is wall-clock-identical to DuckDB's
    * `epoch_ns`, so both sides agree for adjusted and unadjusted encodings.
    * A pure projection, so it is valid on streaming DataFrames too.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn(
          "ts",
          (unix_micros(col("ts").cast(TimestampType)) * 1000L).cast(LongType)
        )
      case _ => df
    }

  /** Fresh scratch dir for sink round-trip queries. */
  def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
}
