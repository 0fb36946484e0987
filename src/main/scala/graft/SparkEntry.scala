package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{CurationOps, Funcs, LlmOps, LogOps, MultiModalOps, Q, Relational, SqlOps, StreamOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is one operator from SURVEY.md §2's inventory;
  * [[oracleSql]] carries the DuckDB-equivalent SQL for the hash-match gate.
  * Both maps are derived from one registry ([[graft.engine.Q]]) so query
  * names and column aliases cannot drift between the two sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    LogOps.errorRateDaily.build(spark, "/root/testdata/sf0.001")

  private def registry: Seq[Q] =
    Relational.all ++ LogOps.all ++ LlmOps.all ++ TextOps.all ++ CurationOps.all ++
      StreamOps.all ++ MultiModalOps.all ++ Funcs.all ++ SqlOps.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
