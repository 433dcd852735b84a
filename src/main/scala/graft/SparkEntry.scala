package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one verifiable entry per implemented operator from
  * SURVEY.md §2 plus the LLM-pipeline extension operators; `oracleSql` the
  * DuckDB-equivalent SQL for every oracle-expressible one.
  */
object SparkEntry {

  /** Query groups, each a themed slice of the operator inventory. */
  private def groups: Seq[QueryGroup] = Seq(
    RelationalQueries, TextQueries, DedupQueries, SimilarityQueries,
    PipelineQueries, StreamingQueries, MultimodalQueries, RegistryQueries,
    CurationQueries, QualityQueries, LayoutQueries, GraphQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full §3.2 nested entity assembly.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_f1_entity_nested")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracles).toMap
}
