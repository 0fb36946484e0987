package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is one operator from SURVEY.md §2's inventory;
  * [[oracleSql]] carries the DuckDB-equivalent SQL for the hash-match gate.
  * Column names and row order are deliberately deterministic on both sides
  * (every query ends in a total ORDER BY over a unique column set).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Daily event volume + error rate over the `events` log table — the
    * classic log-analytics slice (scan → filter-free bucket agg → sort).
    */
  def entry(spark: SparkSession): DataFrame =
    flagshipErrorRate(spark, "/root/testdata/sf0.001")

  private def flagshipErrorRate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        round(avg(when(col("event_type") === "error", 1.0).otherwise(0.0)), 4).as("error_rate"))
      .orderBy("day")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "log_error_rate_daily" -> ((s, dir) => flagshipErrorRate(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "log_error_rate_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        |  ROUND(AVG(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END), 4) AS error_rate
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
