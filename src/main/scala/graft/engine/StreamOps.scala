package graft.engine

import graft.streaming.Streaming
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch twins of the streaming transforms (SURVEY.md §2.8): each `stream_*`
  * query applies the exact transform StreamingSpec runs through
  * MemoryStream, but over the batch events table, which makes it
  * DuckDB-oracle-checkable. Batch≡stream parity is the verification trick:
  * the oracle pins the aggregation semantics, the MemoryStream spec pins
  * the incremental-execution wiring.
  */
object StreamOps {

  /** T1 twin: tumbling 1-hour windows == hour-truncated buckets. */
  val tumbling = Q(
    "stream_tumbling_1h",
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
      |  COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Streaming.tumblingCounts(Tables.events(s, dir)).orderBy("ws", "event_type")
  }

  /** T2 twin: each event lands in exactly four 15-min-slid 1-hour windows. */
  val sliding = Q(
    "stream_sliding_1h15m",
    """WITH cand AS (
      |  SELECT CAST(time_bucket(INTERVAL '15 minutes', ts)
      |           - o * INTERVAL '15 minutes' AS TIMESTAMP) AS ws,
      |         event_type, ts
      |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS o) t)
      |SELECT ws, event_type, COUNT(*) AS n
      |FROM cand WHERE ts < ws + INTERVAL '60 minutes'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Streaming.slidingCounts(Tables.events(s, dir)).orderBy("ws", "event_type")
  }

  /** T3 twin: session_window == the lag/cumsum sessionization, with the
    * session_window convention that the window end extends one gap past
    * the last event.
    */
  val sessionWindow = Q(
    "stream_session_window",
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL '30 minutes' AS session_end,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    Streaming.sessionStats(Tables.events(s, dir)).orderBy("user_id", "session_start")
  }

  /** T6 twin: the error-burst state machine replayed in batch — every user
    * gets floor(errors/3) alerts, the k-th after 3k errors.
    */
  val errorBurstsBatch = Q(
    "stream_error_bursts",
    """SELECT user_id, n_errors, alert_no FROM (
      |  SELECT user_id,
      |    CAST(3 * alert_no AS BIGINT) AS n_errors, CAST(alert_no AS BIGINT) AS alert_no
      |  FROM (SELECT user_id, COUNT(*) AS errs FROM events
      |        WHERE event_type = 'error' GROUP BY 1) e
      |  CROSS JOIN (SELECT unnest(range(1, 100000)) AS alert_no) n
      |  WHERE alert_no <= errs // 3) t
      |ORDER BY user_id, alert_no""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streaming.Ev]
    // The typed state machine itself, run over the batch Dataset. Row order
    // within a group is unspecified in batch mode, but the output depends
    // only on error COUNTS (alert k fires at the 3k-th error), so the
    // result is deterministic regardless.
    Streaming.errorBursts(ev).toDF().orderBy("user_id", "alert_no")
  }

  /** T7 twin: the watermarked stream-stream attribution join over the batch
    * table (watermarks are no-ops in batch; the join predicate is identical).
    */
  val clickAttrib = Q(
    "stream_click_attrib",
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
      |  ROUND(p.value, 4) AS purchase_value
      |FROM events c JOIN events p ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
      |ORDER BY click_id, purchase_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    Streaming.clickAttribution(ev, ev).orderBy("click_id", "purchase_id")
  }

  /** T1 × A4 twin (no oracle — HLL estimates are engine-specific): tumbling
    * approx-distinct users. StreamingSpec pins stream ≡ batch AND
    * estimate == exact at the hand-corpus cardinalities; LlmOpsSpec's hll
    * test pins the fixture-scale error bound for the same sketch family.
    */
  val hllTumbling = Q.noOracle("stream_hll_tumbling") { (s, dir) =>
    Streaming.tumblingDistinctUsers(Tables.events(s, dir)).orderBy("ws", "event_type")
  }

  /** T1 × template mining twin: per-hour masked-template volumes — the
    * saved-search dashboard fed continuously. Shares [[LogOps.lineCaseSql]]
    * with the batch miner so both formulations mask identical lines.
    */
  val templateTumbling = Q(
    "stream_template_1h",
    s"""WITH lines AS (
      |  SELECT ts, ${LogOps.lineCaseSql} AS line
      |  FROM events)
      |SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws,
      |  regexp_replace(line, '[0-9]+', '<*>', 'g') AS template,
      |  COUNT(*) AS n
      |FROM lines GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Streaming.templateCounts(Tables.events(s, dir)).orderBy("ws", "template")
  }

  /** T10 twin: hourly distribution drift vs the standing corpus as its
    * own baseline — the oracle-checkable face of
    * [[Streaming.driftAgainstBaseline]] (whose single-aggregation
    * histogram formulation StreamingSpec replays through MemoryStream,
    * including the unseen-bin signal the twin can't exercise: with
    * baseline == corpus, every populated bin is known, so n_unseen pins
    * at 0 here).
    */
  val driftTumbling = Q(
    "stream_drift_1h",
    """WITH bounds AS (
      |  SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events),
      |binned AS (
      |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws,
      |    CASE WHEN vmax > vmin
      |         THEN LEAST(9, CAST(floor((value - vmin) / (vmax - vmin) * 10) AS INTEGER))
      |         ELSE 0 END AS bin
      |  FROM events CROSS JOIN bounds),
      |d AS (SELECT ws, bin, COUNT(*) AS cd FROM binned GROUP BY 1, 2),
      |g AS (SELECT bin, CAST(SUM(cd) AS BIGINT) AS cg FROM d GROUP BY bin),
      |gn AS (SELECT CAST(SUM(cg) AS BIGINT) AS ng FROM g),
      |dn AS (SELECT ws, CAST(SUM(cd) AS BIGINT) AS nd FROM d GROUP BY ws)
      |SELECT d.ws, dn.nd AS n_events,
      |  ROUND(SUM((CAST(cd AS DOUBLE) / nd)
      |    * ln((CAST(cd AS DOUBLE) * ng) / (CAST(nd AS DOUBLE) * cg))), 4) + 0 AS kl,
      |  CAST(0 AS BIGINT) AS n_unseen
      |FROM d JOIN dn ON d.ws = dn.ws JOIN g ON d.bin = g.bin CROSS JOIN gn
      |GROUP BY d.ws, dn.nd ORDER BY d.ws""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    Streaming.driftAgainstBaseline(ev, ev).orderBy("ws")
  }

  /** T6 × W3 twin: hour-over-hour template momentum — the stateful LAG.
    * The batch form here IS the oracle's window-function shape; the
    * streaming form carries one (ws, n) pair per template across
    * micro-batches (StreamingSpec replays the same hours through
    * MemoryStream and pins stream ≡ batch, including the cross-batch
    * lag). Downstream of [[graft.streaming.Streaming.templateCounts]]'s
    * hourly rollup, so the stateful fold touches (hour × template) rows,
    * never raw events.
    */
  val templateMomentumQ = Q(
    "stream_template_momentum",
    s"""WITH lines AS (
      |  SELECT ts, ${LogOps.lineCaseSql} AS line FROM events),
      |h AS (
      |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws,
      |    regexp_replace(line, '[0-9]+', '<*>', 'g') AS template,
      |    COUNT(*) AS n
      |  FROM lines GROUP BY 1, 2)
      |SELECT ws, substr(md5(template), 1, 8) AS template_id, n,
      |  LAG(n) OVER (PARTITION BY template ORDER BY ws) AS prev_n,
      |  ROUND(CAST(n AS DOUBLE)
      |    / LAG(n) OVER (PARTITION BY template ORDER BY ws), 4) AS momentum
      |FROM h ORDER BY ws, template_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val hourly = Streaming.templateCounts(Tables.events(s, dir))
      .as[Streaming.TemplHour]
    Streaming.templateMomentum(hourly)
      .toDF()
      .select(col("ws"), substring(md5(col("template")), 1, 8).as("template_id"),
        col("n"), col("prev_n"), round(col("momentum"), 4).as("momentum"))
      .orderBy("ws", "template_id")
  }

  /** T1 × alerting twin: the saved-alert rule table evaluated by the
    * streaming transform over the batch corpus — same rule fixture, same
    * oracle SQL as `log_alert_rules`, proving the continuous formulation
    * (rules joined BEFORE the windowed count, threshold as a post-agg
    * filter) fires on exactly the (rule, day) facts the batch scan finds.
    * StreamingSpec replays the same transform through MemoryStream with a
    * watermark and pins the incremental path, including the
    * crosses-a-micro-batch-boundary count and the never-fires rule.
    */
  val alertRulesStream = Q("stream_alert_rules", LogOps.alertRulesSql) { (s, dir) =>
    import s.implicits._
    val rules = LogOps.alertRuleRows.toDF("rule_id", "rule_type", "min_n")
    Streaming.alertFirings(Tables.events(s, dir), rules)
      .orderBy("rule_id", "day")
  }

  /** T6 × registry twin: template debut detection by the STATEFUL
    * first-sighting fold — same oracle as `log_new_templates`, proving the
    * continuous formulation (one registry-sized state flag per template,
    * dedup-capped group iterators) reports exactly the (day, n_new,
    * first_ids) rows the batch corpus-wide MIN finds. StreamingSpec
    * replays the debut fold through MemoryStream and pins the cross-batch
    * guarantee: a template sighted in batch 1 never re-emits, and an
    * in-batch repeat reports its earliest day.
    */
  val newTemplatesStream = Q("stream_new_templates", LogOps.newTemplatesSql) { (s, dir) =>
    import s.implicits._
    val lines = Tables.events(s, dir)
      .select(date_trunc("day", col("ts")).as("day"),
        regexp_replace(LogOps.syntheticLine, "[0-9]+", "<*>").as("template"))
      .as[Streaming.DayTemplate]
    Streaming.templateDebuts(lines)
      .toDF()
      .withColumn("tid", substring(md5(col("template")), 1, 8))
      .groupBy("day")
      .agg(count(lit(1)).as("n_new"),
        array_join(array_sort(collect_list(struct(col("template"), col("tid"))))
          .getField("tid"), ",").as("first_ids"))
      .orderBy("day")
  }

  /** T1 × A4 twin: hourly p95 latency from the streaming DDSketch bucket
    * counts — [[Streaming.hourlySketchCounts]] is the (append-legal,
    * bounded-state) stateful half; the rank walk + midpoint estimate here
    * is the read-side extraction a dashboard runs over the emitted bucket
    * rows. Same bucket/estimate/guard machinery as
    * `log_latency_sketch_range` (see its scaladoc for the cross-engine
    * exactness argument); windows are (hour × type) so the extraction
    * windows run over metadata-sized rows.
    */
  val latencySketchHourly = Q(
    "stream_latency_sketch_1h",
    s"""WITH b AS (
      |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
      |    CASE WHEN value <= 0 THEN ${LogOps.sketchZeroBucket}
      |         ELSE CAST(CEILING(ln(value) / ln(${LogOps.sketchGamma})) AS BIGINT) END AS bucket,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT ws, event_type, bucket, n,
      |    CAST(SUM(n) OVER (PARTITION BY ws, event_type ORDER BY bucket)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(n) OVER (PARTITION BY ws, event_type) AS BIGINT) AS total,
      |    CASE WHEN bucket = ${LogOps.sketchZeroBucket} THEN 0.0
      |         ELSE 2 * power(${LogOps.sketchGamma}, bucket) / ${LogOps.sketchGammaDiv} END AS est
      |  FROM b)
      |SELECT ws, event_type, MAX(total) AS n_events,
      |  ROUND(MIN(CASE WHEN cum * 100 >= total * 95 THEN est END), 4) + 0 AS p95_est
      |FROM r GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
    val byBucket = Window.partitionBy("ws", "event_type").orderBy("bucket")
    val whole = Window.partitionBy("ws", "event_type")
    val est = when(col("bucket") === LogOps.sketchZeroBucket, lit(0.0))
      .otherwise(lit(2.0) * pow(lit(LogOps.sketchGamma), col("bucket")) / lit(LogOps.sketchGammaDiv))
    Streaming.hourlySketchCounts(Tables.events(s, dir))
      .withColumn("cum", sum("n").over(byBucket))
      .withColumn("total", sum("n").over(whole))
      .withColumn("est", est)
      .groupBy("ws", "event_type")
      .agg(max("total").as("n_events"),
        (round(min(when(col("cum") * 100 >= col("total") * 95, col("est"))), 4)
          + lit(0.0)).as("p95_est"))
      .orderBy("ws", "event_type")
  }

  val all: Seq[Q] = Seq(tumbling, sliding, sessionWindow, errorBurstsBatch, clickAttrib,
    hllTumbling, templateTumbling, driftTumbling, templateMomentumQ, alertRulesStream,
    newTemplatesStream, latencySketchHourly)
}
