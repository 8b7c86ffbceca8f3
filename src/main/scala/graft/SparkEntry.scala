package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.streaming.Streaming

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory
  * is the contract; every declared key has an implementation here and,
  * where SQL-expressible, a DuckDB oracle twin). */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    CellQueries,
    CellConnector,
    Relational,
    Aggregates,
    Joins,
    TpchShapes,
    Windows,
    Functions,
    Sources,
    TextOps,
    DedupOps,
    PipelineOps,
    Profiling,
    TimeSeries,
    Graph,
    SqlSurface,
    Layout,
    Multimodal,
    Similarity,
    Streaming,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole job in one plan: scan → parse embedded JSON →
    * flatten to HBase-model cells → aggregate readback (SURVEY §2.K). */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
