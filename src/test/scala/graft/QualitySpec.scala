package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Observed-metric quality gates: the counters must match a direct
  * aggregation of the same frame, and must arrive from the SAME job as the
  * pipeline action (no second scan).
  */
class QualitySpec extends SparkSpecBase {

  test("observed ingest metrics match a direct aggregation, from one pass") {
    val ev = graft.engine.Tables.events(spark, sfDir)
    val obs = Observation("ingest")
    // the "pipeline": any action over the observed frame
    val kept = graft.engine.Quality.observedIngest(ev, obs)
      .filter(col("event_type") =!= "click").count()
    val m = obs.get
    assert(m("n_rows") === ev.count())
    assert(kept < ev.count()) // the filter ran downstream of the observe
    val direct = ev.agg(
      sum(when(col("value").isNull || col("value") < 0, 1L).otherwise(0L)),
      sum(when(try_parse_json(col("props")).isNull, 1L).otherwise(0L))).head()
    assert(m("n_bad_value") === direct.getLong(0))
    assert(m("n_bad_props") === direct.getLong(1))
    assert(m("min_ts").asInstanceOf[java.sql.Timestamp]
      .before(m("max_ts").asInstanceOf[java.sql.Timestamp]))
  }

  test("observed metrics catch injected bad rows") {
    import spark.implicits._
    val good = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 5.0, "{\"k\": 1}"))
    val bad = Seq(
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "view", -3.0, "{\"k\": 2}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 1L, "view", 7.0, "not json"))
    val df = (good ++ bad)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val obs = Observation()
    graft.engine.Quality.observedIngest(df, obs).count()
    assert(obs.get("n_bad_value") === 1L)
    assert(obs.get("n_bad_props") === 1L)
  }
}
