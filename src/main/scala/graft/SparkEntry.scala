package graft

import graft.contracts._
import graft.model.Tables.CustomerRow
import graft.pipeline.PipelineBuilder
import graft.queries.{ContractQueries, LlmQueries, QueryDef, RelationalQueries, StreamingQueries, TpchShapes}
import graft.sources.{TypedSink, TypedSource}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  import ContractQueries.CustomerSlim

  // private[graft] so RegistrySpec can assert the invariants the Map
  // construction below would otherwise hide (duplicate names silently
  // collapse in toMap — a dropped query must fail a spec, not vanish)
  private[graft] def registry: Seq[QueryDef] =
    ContractQueries.all ++ RelationalQueries.all ++ TpchShapes.all ++ LlmQueries.all ++ StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001: the green-path contract
    * pipeline (typed scan → pinned transform → policy sink), not a bare
    * parquet read — the driver smoke-check exercises the engine.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sf = "/root/testdata/sf0.001"
    val out = QueryDef.tmpDir("entry")
    val run = PipelineBuilder[Nothing]("flagship")
      .addSource(TypedSource[CustomerRow]("parquet", s"$sf/customer.parquet"))
      .transformAs[CustomerSlim]("project")(_.select("c_custkey", "c_name", "c_acctbal"))
      .addSink[CustomerSlim, SchemaPolicy.ExactT](TypedSink[CustomerSlim](s"$out/c"))
      .build
    run(spark)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ relational
    * surface + llmops).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
