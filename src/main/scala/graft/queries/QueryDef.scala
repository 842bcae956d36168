package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Fresh scratch dir for sink round-trip queries. */
  def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
}
