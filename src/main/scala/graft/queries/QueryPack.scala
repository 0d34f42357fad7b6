package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries with their DuckDB oracles.
  * `SparkEntry` aggregates all packs; names must be globally unique.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB-runnable ANSI SQL per query name; omit a key for rows-only checks. */
  def oracleSql: Map[String, String]
}
