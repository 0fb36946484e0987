package graft.engine

import org.apache.spark.sql.functions._

/** Log-analytics operators (SURVEY.md §2.5, §2.7-ish): the reference's core
  * use-case — time bucketing, grep, parsing, windows, sessionization —
  * expressed as declarative Spark plans over the `events` log table.
  */
object LogOps {

  /** Flagship (S1+S2+F3+A6): daily event volume + error rate. Exercises the
    * nanosecond-timestamp read path and conditional aggregation.
    */
  val errorRateDaily = Q(
    "log_error_rate_daily",
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
      |  ROUND(AVG(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END), 4) AS error_rate
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        round(avg(when(col("event_type") === "error", 1.0).otherwise(0.0)), 4).as("error_rate"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(errorRateDaily)
}
