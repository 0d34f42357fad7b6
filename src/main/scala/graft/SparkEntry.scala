package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized in [[graft.queries.QueryPack]]s, one per operator
  * domain; each query has a DuckDB-equivalent `oracleSql` entry (same column
  * names, periods cast to DATE, floats rounded to 6 dp) for the driver's
  * hash compare at sf0.01.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    PanelQueries,
    MetricQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    ExtensionQueries,
    RelationalQueries,
    MlQueries,
    VariantQueries,
    ScaleQueries,
    WorkflowQueries,
  )

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: expanding-window
    * panel CV of a mean regressor over daily events, per-fold MSE.
    */
  def entry(spark: SparkSession): DataFrame =
    PanelQueries.cvMse(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    require(all.map(_._1).distinct.size == all.size, "duplicate query names across packs")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = packs.flatMap(_.oracleSql).toMap
}
