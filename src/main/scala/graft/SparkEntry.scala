package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, transform}
import org.apache.spark.sql.types._

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
    WebQueries,
    SketchQueries,
    StatQueries,
    BehaviorQueries,
    CompareQueries,
  )

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: expanding-window
    * panel CV of a mean regressor over daily events, per-fold MSE.
    */
  def entry(spark: SparkSession): DataFrame =
    PanelQueries.cvMse(spark, "/root/testdata/sf0.001")

  /** IEEE sign-of-zero normalization: x + 0.0 leaves every double bit-identical
    * EXCEPT −0.0, which becomes +0.0. Round 2's only hash-fail was an
    * algebraically-zero explained_variance whose round-6 result flipped between
    * +0.0 (Spark) and −0.0 (DuckDB fold 2) — numerically equal, hash-distinct.
    * Applied to every float-typed column of every gate query; [[graft.Verify]]
    * wraps the DuckDB oracle SQL with the same `+ 0.0` so both engines agree.
    */
  private[graft] def normalizeZeroSign(df: DataFrame): DataFrame = {
    def needsFix(dt: DataType): Boolean = dt match {
      case DoubleType | FloatType => true
      case ArrayType(e, _) => needsFix(e)
      case _ => false
    }
    def fix(f: StructField): Column = f.dataType match {
      case DoubleType => (col(f.name) + lit(0.0)).as(f.name)
      case FloatType => (col(f.name) + lit(0.0f)).cast(FloatType).as(f.name)
      case ArrayType(DoubleType, _) =>
        transform(col(f.name), x => x + lit(0.0)).as(f.name)
      case ArrayType(FloatType, _) =>
        transform(col(f.name), x => (x + lit(0.0f)).cast(FloatType)).as(f.name)
      case _ => col(f.name)
    }
    if (df.schema.fields.exists(f => needsFix(f.dataType)))
      df.select(df.schema.fields.map(fix).toSeq: _*)
    else df
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    require(all.map(_._1).distinct.size == all.size, "duplicate query names across packs")
    all.toMap.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => normalizeZeroSign(fn(s, dir)))
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = packs.flatMap(_.oracleSql).toMap
}
