package graft.engine

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Inline data-quality monitoring via `Dataset.observe` — quality counters
  * computed as observed metrics ON the pass the pipeline already makes, not
  * as a second scan. At 100 TB a separate validation query doubles the IO
  * bill; observed metrics ride the existing job's accumulators (per-task
  * partials merged on the driver) for free, and in streaming they surface
  * per-micro-batch through the progress events.
  */
object Quality {

  /** Attach ingest-gate counters to an events-shaped frame: total rows,
    * rows with a null/negative measure, rows with a malformed JSON props
    * payload, and the event-time span. Read them after any action via
    * `obs.get`.
    */
  def observedIngest(events: DataFrame, obs: Observation): DataFrame =
    events.observe(
      obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull || col("value") < 0, 1L).otherwise(0L)).as("n_bad_value"),
      sum(when(try_parse_json(col("props")).isNull, 1L).otherwise(0L)).as("n_bad_props"),
      min("ts").as("min_ts"),
      max("ts").as("max_ts"))
}
