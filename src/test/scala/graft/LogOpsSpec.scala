package graft

import java.sql.Timestamp
import graft.engine.LogOps
import org.apache.spark.sql.functions.{col, count, date_trunc, explode, hour, lit, lower, split}

/** Semantics checks for the log-analytics operators on hand-computable
  * inputs, plus invariants under permutation (shuffle order must not change
  * any result — the distributed-execution correctness property).
  */
class LogOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(1704067200000L + minute * 60000L)

  /** Build an events-shaped frame the LogOps builders can consume via a temp
    * parquet dir (they read `$dir/events.parquet`).
    */
  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("sessionize: 30-min gap starts a new session; stats are per session") {
    // user 0: events at minutes 0, 10, 50 (gap 40 > 30 → 2 sessions)
    // user 1: events at minutes 0, 29, 58 (gaps 29 < 30 → 1 session)
    val dir = eventsDir(Seq(
      (1L, ts(0), 0L, "view", 1.0, "{}"),
      (2L, ts(10), 0L, "view", 1.0, "{}"),
      (3L, ts(50), 0L, "view", 1.0, "{}"),
      (4L, ts(0), 1L, "view", 1.0, "{}"),
      (5L, ts(29), 1L, "view", 1.0, "{}"),
      (6L, ts(58), 1L, "view", 1.0, "{}")))
    val got = LogOps.winSessionize.build(spark, dir)
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 1L, 2L), (0L, 2L, 1L), (1L, 1L, 3L)))
  }

  test("sessionize: session count invariant under input permutation") {
    val base = (0 until 40).map { i =>
      (i.toLong, ts(i * 17 % 600), (i % 3).toLong, "view", 1.0, "{}")
    }
    val expected = LogOps.winSessionize.build(spark, eventsDir(base))
      .collect().map(_.toString).sorted.toSeq
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val shuffled = rnd.shuffle(base)
      val got = LogOps.winSessionize.build(spark, eventsDir(shuffled))
        .collect().map(_.toString).sorted.toSeq
      assert(got === expected)
    }
  }

  test("as-of join picks the latest purchase at or before each error") {
    val dir = eventsDir(Seq(
      (1L, ts(0), 0L, "purchase", 1.0, "{}"),
      (2L, ts(5), 0L, "purchase", 1.0, "{}"),
      (3L, ts(7), 0L, "error", 1.0, "{}"),   // latest purchase ≤ 7 is id 2
      (4L, ts(3), 0L, "error", 1.0, "{}"),   // latest purchase ≤ 3 is id 1
      (5L, ts(1), 1L, "error", 1.0, "{}")))  // user 1 has no purchase → dropped
    val got = LogOps.joinAsofEvents.build(spark, dir)
      .select("event_id", "purchase_id").as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 2L, 4L -> 1L))
  }

  test("range join pairs purchase→error only within the band") {
    val dir = eventsDir(Seq(
      (1L, ts(0), 0L, "purchase", 1.0, "{}"),
      (2L, ts(30), 0L, "error", 1.0, "{}"),    // within 1h of id 1 → pair
      (3L, ts(90), 0L, "error", 1.0, "{}"),    // 90 min after → no pair
      (4L, ts(10), 1L, "error", 1.0, "{}")))   // other user → no pair
    val got = LogOps.joinRangeEvents.build(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("resample fill: silent hours emit explicit zero rows for every type") {
    // events at hours 0 and 2 only; hour 1 must appear with n=0 for BOTH
    // types, and 'click' (absent after hour 0) must zero-fill hours 1-2.
    val dir = eventsDir(Seq(
      (1L, ts(0), 0L, "view", 2.0, "{}"),
      (2L, ts(125), 0L, "view", 3.0, "{}"),
      (3L, ts(5), 0L, "click", 1.5, "{}")))
    val got = LogOps.resampleFill.build(spark, dir)
      .select(hour($"h"), $"event_type", $"n", $"sum_value")
      .as[(Int, String, Long, Double)].collect().toSet
    assert(got === Set(
      (0, "click", 1L, 1.5), (1, "click", 0L, 0.0), (2, "click", 0L, 0.0),
      (0, "view", 1L, 2.0), (1, "view", 0L, 0.0), (2, "view", 1L, 3.0)))
  }

  test("tokenize never emits empty tokens and counts every word once") {
    val words = LogOps.tokenize.build(spark, sfDir).as[(String, Long)].collect()
    assert(words.forall(_._1.nonEmpty))
    val totalTokens = words.map(_._2).sum
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(lower($"text"), " ")).as("t"))
      .filter($"t" =!= "").count()
    assert(totalTokens === expected)
  }

  test("peak concurrency: sweep-line counts overlaps, closed intervals touch") {
    val dir = eventsDir(Seq(
      // u0 session [0,10], u1 session [5,15] → overlap in [5,10], conc 2
      (1L, ts(0), 0L, "view", 1.0, "{}"),
      (2L, ts(10), 0L, "view", 1.0, "{}"),
      (3L, ts(5), 1L, "view", 1.0, "{}"),
      (4L, ts(15), 1L, "view", 1.0, "{}"),
      // u2 point-session [20,20] — alone, conc 1
      (5L, ts(20), 2L, "view", 1.0, "{}"),
      // u3 [30,40] ends exactly where u4 [40,40] starts → closed-interval
      // semantics: they overlap at minute 40, conc 2
      (6L, ts(30), 3L, "view", 1.0, "{}"),
      (7L, ts(40), 3L, "view", 1.0, "{}"),
      (8L, ts(40), 4L, "view", 1.0, "{}")))
    val got = LogOps.peakConcurrency.build(spark, dir)
      .select("n_sessions", "peak_concurrent").as[(Long, Long)].collect().toSeq
    assert(got === Seq((5L, 2L)))
  }

  test("cumulative users: each user counts once, on their first day") {
    def day(d: Int, minute: Int) = new Timestamp(1704067200000L + d * 86400000L + minute * 60000L)
    val dir = eventsDir(Seq(
      (1L, day(0, 0), 0L, "view", 1.0, "{}"),
      (2L, day(0, 5), 1L, "view", 1.0, "{}"),
      (3L, day(1, 0), 0L, "view", 1.0, "{}"),  // u0 again — not new
      (4L, day(2, 0), 2L, "view", 1.0, "{}"),
      (5L, day(2, 1), 0L, "view", 1.0, "{}")))
    val got = LogOps.cumulativeUsers.build(spark, dir)
      .select("new_users", "cum_users").as[(Long, Long)].collect().toSeq
    assert(got === Seq((2L, 2L), (1L, 3L)))  // day0: u0,u1; day2: u2
  }

  test("value histogram: exact bin edges land in the upper bin, pcts sum to 100") {
    val dir = eventsDir(Seq(
      (1L, ts(0), 0L, "view", 0.0, "{}"),    // bin 0 (lo edge)
      (2L, ts(1), 0L, "view", 49.99, "{}"),  // bin 0
      (3L, ts(2), 0L, "view", 50.0, "{}"),   // bin 1 (exact edge → upper)
      (4L, ts(3), 0L, "view", 149.5, "{}"))) // bin 2
    val got = LogOps.valueHistogram.build(spark, dir)
      .select("bin", "n", "pct").as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((0L, 2L, 50.0), (1L, 1L, 25.0), (2L, 1L, 25.0)))
  }

  test("compaction keeps the latest version per key and counts the discards") {
    val dir = eventsDir(Seq(
      // user 0 "view": three versions → keep event 3 (minute 10), n=3
      (1L, ts(0), 0L, "view", 1.0, "{}"),
      (2L, ts(5), 0L, "view", 2.0, "{}"),
      (3L, ts(10), 0L, "view", 3.0, "{}"),
      // user 1 "view": exact timestamp tie → higher event_id wins
      (4L, ts(7), 1L, "view", 4.0, "{}"),
      (5L, ts(7), 1L, "view", 5.0, "{}"),
      // user 1 "click": single version survives untouched
      (6L, ts(2), 1L, "click", 6.0, "{}")))
    val got = LogOps.compactLatest.build(spark, dir)
      .select("user_id", "event_type", "last_event_id", "last_value", "n_versions")
      .as[(Long, String, Long, Double, Long)].collect().toSet
    assert(got === Set(
      (0L, "view", 3L, 3.0, 3L),
      (1L, "view", 5L, 5.0, 2L),
      (1L, "click", 6L, 6.0, 1L)))
  }

  test("event runs: islands cut on type change, short runs filtered, ts ties break on event_id") {
    // user 0: view view view (run 3 — events 2,3 share a ts, event_id
    // orders them into one island) | click (1) | view view (2 — under min)
    // user 1: error ×4 → one run of 4
    val dir = eventsDir(Seq(
      (1L, ts(0), 0L, "view", 1.0, "{}"),
      (2L, ts(1), 0L, "view", 1.0, "{}"),
      (3L, ts(1), 0L, "view", 1.0, "{}"),
      (4L, ts(2), 0L, "click", 1.0, "{}"),
      (5L, ts(3), 0L, "view", 1.0, "{}"),
      (6L, ts(4), 0L, "view", 1.0, "{}"),
      (7L, ts(0), 1L, "error", 1.0, "{}"),
      (8L, ts(1), 1L, "error", 1.0, "{}"),
      (9L, ts(2), 1L, "error", 1.0, "{}"),
      (10L, ts(3), 1L, "error", 1.0, "{}")))
    val got = LogOps.eventRuns.build(spark, dir)
      .select("user_id", "event_type", "run_len")
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((0L, "view", 3L), (1L, "error", 4L)))
  }

  test("multiline stitch: continuation lines attach to their header record, per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-ml").toString
    Seq(
      (4L, "alpha beta gamma", "en", "srcA", 16L),   // 4 % 4 → 0 continuations
      (5L, "one two three four", "en", "srcA", 18L), // 5 % 4 → 1 continuation
      (7L, "x y z w", "fr", "srcB", 7L))             // 7 % 4 → 3 continuations
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LogOps.multilineStitch.build(spark, dir)
      .select("source", "record_id", "n_lines", "header")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      ("srcA", 1L, 1L, "srcA [en] alpha beta gamma"),
      ("srcA", 2L, 2L, "srcA [en] one two three four"),
      ("srcB", 1L, 4L, "srcB [fr] x y z w")))
  }

  test("seasonality: day shares sum to 1 per dow; load factors average to 1") {
    val rows = LogOps.seasonality.build(spark, sfDir)
      .select("dow", "n", "day_share", "load_factor")
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (d, g) =>
      assert(math.abs(g.map(_._3).sum - 1.0) < 0.01, s"dow $d shares sum ${g.map(_._3).sum}")
    }
    val lf = rows.map(_._4)
    assert(math.abs(lf.sum / lf.length - 1.0) < 0.01, s"mean load factor ${lf.sum / lf.length}")
  }

  test("pagerank: hand graph with a dangling node matches the scalar recurrence") {
    // One user walks a → b → c, giving edges a→b and b→c (p = 1 each);
    // c has no out-edges, so its rank is dangling mass redistributed
    // uniformly. Expected values come from the identical synchronous
    // recurrence run in plain Scala doubles — an engine-independent oracle.
    val dir = eventsDir(Seq(
      (1L, ts(0), 0L, "a", 1.0, "{}"),
      (2L, ts(1), 0L, "b", 1.0, "{}"),
      (3L, ts(2), 0L, "c", 1.0, "{}")))
    var r = Map("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3)
    for (_ <- 1 to 12) {
      val dm = r("c")
      r = Map(
        "a" -> (0.15 / 3 + 0.85 * (dm / 3)),
        "b" -> (0.15 / 3 + 0.85 * (r("a") + dm / 3)),
        "c" -> (0.15 / 3 + 0.85 * (r("b") + dm / 3)))
    }
    val got = LogOps.pagerankTypes.build(spark, dir)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === Set("a", "b", "c"))
    for ((n, v) <- r) assert(math.abs(got(n) - v) < 1e-6, s"$n: ${got(n)} vs $v")
    assert(math.abs(got.values.sum - 1.0) < 1e-5)
    // the chain's tail accumulates rank: c > b > a
    assert(got("c") > got("b") && got("b") > got("a"), got.toString)
  }

  test("pagerank: 12 fixed rounds is past convergence; ranks sum to 1 exactly") {
    val r11 = LogOps.pagerankRanks(spark, sfDir, 11).as[(String, Double)].collect().toMap
    val r12 = LogOps.pagerankRanks(spark, sfDir, 12).as[(String, Double)].collect().toMap
    val delta = r11.map { case (k, v) => math.abs(v - r12(k)) }.max
    assert(delta < 1e-7, s"iter 11→12 delta $delta — raise prIters")
    assert(math.abs(r12.values.sum - 1.0) < 1e-9, s"mass leak: ${r12.values.sum}")
  }

  test("template mine: variable tokens mask away, lines collapse per shape") {
    val dir = eventsDir(Seq(
      (1L, ts(0), 7L, "error", 185.22, """{"k": 87}"""),
      (2L, ts(1), 3L, "purchase", 9.64, """{"k": 12}"""),
      (3L, ts(2), 12L, "click", 1.0, """{"k": 5}"""),
      (4L, ts(3), 1L, "view", 2.0, """{"k": 3}"""),
      (5L, ts(4), 8L, "error", 50.0, """{"k": 87}""")))
    val rows = LogOps.templateMine.build(spark, dir)
      .select("template_id", "template", "level", "n_lines", "n_users", "sample_line")
      .as[(String, String, String, Long, Long, String)].collect()
    assert(rows.length === 4) // error ×2 collapse; purchase/click/view distinct
    val err = rows.find(_._2 == "svc-<*> ERROR code=<*> failed after <*>ms").get
    assert(err._3 === "ERROR" && err._4 === 2L && err._5 === 2L)
    // exemplar is the lexicographic min of the two concrete lines
    assert(err._6 === "svc-2 ERROR code=87 failed after 185ms")
    // template_id is the stable md5-prefix join key
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(err._2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(err._1 === hex.substring(0, 8))
    assert(rows.map(_._3).toSet === Set("ERROR", "INFO", "DEBUG"))
  }

  test("interval overlap: closed-interval touch counts, bucket dupes collapse") {
    // incident 100 (min 8, window [6,10]) vs sessions: u0 [0,10] (owns the
    // error), u1 [7,7], u3 [6,6] (touches i_start exactly — closed
    // semantics), NOT u7 [55,65]. incident 101 (min 59, window [57,61])
    // spans the 1h-bucket boundary: u5 [59,59], u6 [61,61] (bucket 1 only),
    // u7 [55,65] — which meets the incident in BOTH buckets and must be
    // counted once (the distinct step).
    val dir = eventsDir(Seq(
      (1L, ts(0), 0L, "view", 1.0, "{}"),
      (2L, ts(10), 0L, "view", 1.0, "{}"),
      (100L, ts(8), 0L, "error", 200.0, "{}"),
      (3L, ts(7), 1L, "view", 1.0, "{}"),
      (4L, ts(100), 2L, "view", 1.0, "{}"),
      (5L, ts(6), 3L, "view", 1.0, "{}"),
      (101L, ts(59), 5L, "error", 200.0, "{}"),
      (6L, ts(61), 6L, "view", 1.0, "{}"),
      (7L, ts(55), 7L, "view", 1.0, "{}"),
      (8L, ts(65), 7L, "view", 1.0, "{}")))
    val got = LogOps.joinIntervalOverlap.build(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((100L, 3L, 3L), (101L, 3L, 3L)))
  }

  test("outage windows: overlapping and touching incidents merge, gaps split") {
    // incidents at minutes 10, 12, 16 → windows [8,12], [10,14], [14,18]:
    // the first two overlap and the third TOUCHES the running max end
    // (closed-interval semantics) → one outage [8,18] with 3 incidents.
    // Minute 40 → [38,42] stands alone. Low-value and non-error events
    // are not incidents.
    val dir = eventsDir(Seq(
      (1L, ts(10), 0L, "error", 200.0, "{}"),
      (2L, ts(12), 1L, "error", 200.0, "{}"),
      (3L, ts(16), 2L, "error", 200.0, "{}"),
      (4L, ts(40), 3L, "error", 200.0, "{}"),
      (5L, ts(11), 4L, "error", 50.0, "{}"),  // below the value threshold
      (6L, ts(13), 5L, "view", 200.0, "{}"))) // not an error
    val got = LogOps.outageWindows.build(spark, dir)
      .select("outage_id", "n_incidents", "duration_s")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 3L, 600.0), (2L, 1L, 240.0)))
  }

  test("merged outage windows: a midnight-spanning incident chain glues back into one outage") {
    // Incident chain across midnight: minutes -3, -1, +1, +3 around the
    // 1704067200 day boundary → windows [-5,-1]∪[-3,+1] (day A) and
    // [-1,+3]∪[+1,+5] (day B). The day-partitioned sweep reports TWO
    // outages (one per day); day A's piece ends at +1 ≥ day B's piece
    // start -1, so phase 2 must merge them into ONE outage spanning
    // [-5,+5] (600 s, 4 incidents, 2 spans). Minute +40 stands alone
    // (1 span) and the below-threshold event never becomes an incident.
    val dir = eventsDir(Seq(
      (1L, ts(-3), 0L, "error", 200.0, "{}"),
      (2L, ts(-1), 1L, "error", 200.0, "{}"),
      (3L, ts(1), 2L, "error", 200.0, "{}"),
      (4L, ts(3), 3L, "error", 200.0, "{}"),
      (5L, ts(40), 4L, "error", 200.0, "{}"),
      (6L, ts(0), 5L, "error", 50.0, "{}")))
    // phase 1 alone really does split at the seam (the repair is not vacuous)
    val split = LogOps.outageWindows.build(spark, dir)
      .select("outage_id", "n_incidents").as[(Long, Long)].collect().toSeq
    assert(split.length === 3, s"expected the seam split + the lone outage: $split")
    val got = LogOps.outageWindowsMerged.build(spark, dir)
      .select("outage_id", "n_incidents", "n_spans", "duration_s")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 4L, 2L, 600.0), (2L, 1L, 1L, 240.0)))
  }

  test("grep context: matches pull ±1 neighbors within their source only, once each") {
    // source A lines 1-5 with matches at 2 and 4: lines 1,2,3,4,5 all
    // covered (3 sits between two matches → exactly once). source B has
    // no match → nothing. A match on a source BOUNDARY line must not
    // leak into the other source.
    val dir = java.nio.file.Files.createTempDirectory("graft-grepctx").toString
    Seq(
      (1L, "start of a", "a"),
      (2L, "a slow join here", "a"),
      (3L, "between", "a"),
      (4L, "a slow scan there", "a"),
      (5L, "end of a", "a"),
      (6L, "first of b", "b"),
      (7L, "quiet line", "b"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LogOps.grepContext.build(spark, dir)
      .select("doc_id", "is_match").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L), (5L, 0L)))
  }

  test("drift: KL per day matches hand computation; identical days score 0") {
    def day(d: Int, m: Int) = new Timestamp(1704067200000L + (d * 1440 + m) * 60000L)
    // vmin=0, vmax=10 → values 0 and 10 land in bins 0 and 9.
    // day 1: 2@0 + 2@9 (p = .5/.5); day 2: 3@0 + 1@9 (p = .75/.25);
    // global: 5/8 and 3/8 → KL₁ = .5·ln(.5/.625)+.5·ln(.5/.375) = 0.0323,
    // KL₂ = .75·ln(.75/.625)+.25·ln(.25/.375) = 0.0354.
    val dir = eventsDir(Seq(
      (1L, day(0, 0), 0L, "view", 0.0, "{}"),
      (2L, day(0, 1), 0L, "view", 0.0, "{}"),
      (3L, day(0, 2), 0L, "view", 10.0, "{}"),
      (4L, day(0, 3), 0L, "view", 10.0, "{}"),
      (5L, day(1, 0), 0L, "view", 0.0, "{}"),
      (6L, day(1, 1), 0L, "view", 0.0, "{}"),
      (7L, day(1, 2), 0L, "view", 0.0, "{}"),
      (8L, day(1, 3), 0L, "view", 10.0, "{}")))
    val got = LogOps.driftDaily.build(spark, dir)
      .select("n_events", "kl").as[(Long, Double)].collect().toSeq
    assert(got === Seq((4L, 0.0323), (4L, 0.0354)))
    // two identically-distributed days: every p_day == p_global → KL 0
    val dir2 = eventsDir(Seq(
      (1L, day(0, 0), 0L, "view", 0.0, "{}"),
      (2L, day(0, 1), 0L, "view", 10.0, "{}"),
      (3L, day(1, 0), 0L, "view", 0.0, "{}"),
      (4L, day(1, 1), 0L, "view", 10.0, "{}")))
    val zeros = LogOps.driftDaily.build(spark, dir2)
      .select("kl").as[Double].collect().toSeq
    assert(zeros === Seq(0.0, 0.0))
  }

  test("ewma: fold matches an independent driver-side recurrence on the fixture") {
    // Independent reference: pull the (type, day, n) series with plain
    // aggregation and run the textbook recurrence in Scala; the engine's
    // aggregate-HOF fold must match to full double precision (same op
    // order), not just the rounded 4dp the report ships.
    val daily = graft.engine.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("day").cast("string"), col("n"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._2, x._3))).toMap
    val expect = daily.toSeq.flatMap { case (et, ser) =>
      var s = 0.0
      ser.zipWithIndex.map { case ((d, n), i) =>
        s = if (i == 0) n.toDouble else 0.3 * n + 0.7 * s
        // mirror Spark's round() HALF_UP (math.rint would be HALF_EVEN)
        (et, d, n, BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSet
    val got = LogOps.ewmaDaily.build(spark, sfDir)
      .select(col("event_type"), col("day").cast("string"), col("n"), col("ewma"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === expect)
    assert(got.nonEmpty)
    // smoothing sanity: the EWMA series varies strictly less than the raw
    // series for every type with >1 day (variance reduction is the point)
    for ((et, ser) <- daily if ser.length > 1) {
      val raw = ser.map(_._2.toDouble)
      val sm = got.filter(_._1 == et).toSeq.sortBy(_._2).map(_._4)
      def variance(xs: Seq[Double]) = {
        val m = xs.sum / xs.length; xs.map(x => (x - m) * (x - m)).sum / xs.length
      }
      assert(variance(sm) <= variance(raw), s"$et: smoothed variance grew")
    }
  }

  test("interval overlap: every incident overlaps at least its own session") {
    val out = LogOps.joinIntervalOverlap.build(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val nIncidents = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "error" && col("value") > 150).count()
    assert(out.count() === nIncidents)
    assert(out.filter(col("n_sessions") < 1).count() === 0)
  }

  test("schema infer: per-key presence, typing, and integer range on a mixed-key fixture") {
    // key a: ints 7 and -3 (one per row); key b: bool + decimal; key c: one
    // JSON null; key d appears once as a plain string.
    val dir = eventsDir(Seq(
      (1L, ts(0), 0L, "view", 1.0, """{"a": 7, "b": true}"""),
      (2L, ts(1), 0L, "view", 1.0, """{"a": -3, "b": 2.5, "c": null}"""),
      (3L, ts(2), 0L, "view", 1.0, """{"d": "free text"}""")))
    val got = LogOps.schemaInfer.build(spark, dir)
      .select("key", "n_present", "n_null", "n_int", "n_num", "n_bool", "n_values")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map { case (k, a, b, c, d, e, f) => k -> ((a, b, c, d, e, f)) }.toMap
    assert(got("a") === ((2L, 0L, 2L, 0L, 0L, 2L)))
    assert(got("b") === ((2L, 0L, 0L, 1L, 1L, 2L)))
    assert(got("c") === ((1L, 1L, 0L, 0L, 0L, 0L)))
    assert(got("d") === ((1L, 0L, 0L, 0L, 0L, 1L)))
    val ints = LogOps.schemaInfer.build(spark, dir)
      .filter(col("key") === "a").select("min_int", "max_int")
      .as[(Long, Long)].head()
    assert(ints === ((-3L, 7L)))
  }

  test("schema infer guard: no fixture props object has duplicate or non-path-safe keys " +
    "(oracle json_keys/'$.'||key agreement)") {
    // Mirrors the PCA quantization-guard pattern: every sf dir is swept, so
    // a regenerated fixture that breaks the oracle-agreement premise fails
    // loudly here, not as an opaque hash mismatch. Two premises:
    // (1) no duplicate keys within one object — Spark's from_json
    //     map<string,string> dedupes (last wins) while DuckDB's
    //     json_keys/unnest emits each occurrence, splitting n_present;
    // (2) keys are JSON-path-safe (no '.', quotes, brackets) — the oracle
    //     addresses values as '$.' || key, which breaks only on its side.
    import org.apache.spark.sql.functions.{col, expr}
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf")).map(_.getPath)
    assert(dirs.nonEmpty)
    dirs.foreach { dir =>
      val props = graft.engine.Tables.events(spark, dir).select("props")
      // json_object_keys preserves duplicate occurrences; the map dedupes —
      // equal sizes on every row means no object carries a duplicate key
      val dups = props.filter(expr(
        "size(json_object_keys(props)) != size(map_keys(from_json(props, 'map<string,string>')))"))
        .count()
      assert(dups === 0L, s"$dir: $dups props rows with duplicate JSON keys")
      val unsafe = props
        .select(expr("explode(json_object_keys(props))").as("key"))
        .filter(col("key").rlike("""[.'"\[\]]"""))
        .count()
      assert(unsafe === 0L, s"$dir: $unsafe non-path-safe props keys")
    }
  }

  test("schema drift: new/gone/stable statuses and coverage deltas on a two-period fixture") {
    // period a = before 2024-01-16, period b = after. Key `old` exists only
    // early (gone), `fresh` only late (new), `k` both sides with coverage
    // 100% -> 50% (delta -50).
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val dir = eventsDir(Seq(
      (1L, t(2), 0L, "view", 1.0, """{"k": 1, "old": true}"""),
      (2L, t(3), 0L, "view", 1.0, """{"k": 2}"""),
      (3L, t(20), 0L, "view", 1.0, """{"k": 3, "fresh": "x"}"""),
      (4L, t(21), 0L, "view", 1.0, """{"fresh": "y"}""")))
    val got = LogOps.schemaDrift.build(spark, dir)
      .as[(String, Long, Long, Double, Double, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("old") === (("old", 1L, 0L, 50.0, 0.0, -50.0, "gone")))
    assert(got("fresh") === (("fresh", 0L, 2L, 0.0, 100.0, 100.0, "new")))
    assert(got("k") === (("k", 2L, 1L, 100.0, 50.0, -50.0, "stable")))
  }

  test("latency sketch: every estimate within the DDSketch relative-error bound " +
    "of the exact range percentile") {
    // γ = 1.02 guarantees |est/v − 1| ≤ (γ−1)/(γ+1) ≈ 0.0099 for the value
    // at the selected rank; 0.011 adds headroom for the 4dp output rounding.
    val out = LogOps.latencySketchRange.build(spark, sfDir)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    val exact = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("ts") >= lit("2024-01-08") && col("ts") < lit("2024-01-22"))
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    for ((t, n, p50, p95, p99) <- out) {
      val vs = exact(t)
      assert(n === vs.length.toLong, s"$t: range row count")
      for ((p, est) <- Seq(50 -> p50, 95 -> p95, 99 -> p99)) {
        // rank semantics mirror the query: smallest value with
        // 100·rank ≥ p·n (1-based) — the INCLUSIVE discrete percentile
        val v = vs(math.ceil(p * vs.length / 100.0).toInt - 1)
        assert(math.abs(est / v - 1.0) <= 0.011,
          s"$t p$p: est=$est exact=$v rel=${est / v - 1.0}")
      }
    }
  }

  test("latency sketch: merging persisted daily bucket rows equals sketching the " +
    "whole range in one pass (count addition is the merge)") {
    import org.apache.spark.sql.functions.{ceil => sceil, log => slog, sum, when}
    val zeroB = -1000000L
    val bucket = when(col("value") <= 0, lit(zeroB))
      .otherwise(sceil(slog(col("value")) / slog(lit(1.02))).cast("long"))
    val whole = graft.engine.Tables.events(spark, sfDir)
      .filter(col("ts") >= lit("2024-01-08") && col("ts") < lit("2024-01-22"))
      .select(col("event_type"), bucket.as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    val daily = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        bucket.as("bucket"))
      .groupBy("event_type", "day", "bucket").agg(count(lit(1)).as("n"))
      .filter(col("day") >= lit("2024-01-08") && col("day") < lit("2024-01-22"))
      .groupBy("event_type", "bucket").agg(sum("n").as("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(daily === whole)
  }

  test("latency sketch guard: no fixture value's log-ratio sits within 1e-9 of a " +
    "bucket boundary (cross-libm ceiling agreement)") {
    // The PCA-quantization-guard pattern: Spark's Math.log and DuckDB's
    // libm ln can differ in the last ulp, so a value whose ln(v)/ln(γ)
    // is EXTREMELY close to an integer could bucket differently between
    // engines. The two exact hits are identical by IEEE construction:
    // v = 1.0 (ln 1 = 0 exactly) and v = γ itself (x/x = 1 exactly).
    import org.apache.spark.sql.functions.{abs => sabs, log => slog, round => sround}
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf")).map(_.getPath)
    assert(dirs.nonEmpty)
    dirs.foreach { dir =>
      val ratio = slog(col("value")) / slog(lit(1.02))
      val bad = graft.engine.Tables.events(spark, dir)
        .filter(col("value") > 0 && col("value") =!= 1.0 && col("value") =!= 1.02)
        .filter(sabs(ratio - sround(ratio, 0)) < 1e-9)
        .count()
      assert(bad === 0L, s"$dir: $bad values within 1e-9 of a log-bucket boundary")
    }
  }

  test("sla burn: fires only when the 1h AND trailing-6h burns both exceed 1.0; " +
    "hour gaps widen the lookback") {
    // hour 0 (minutes 0-59): 4 events, 1 error → burn_1h = (1/4)/0.25 = 1.0
    // hour 1: 4 events, 2 errors → burn_1h = 2.0; 6h window = hours 0-1:
    //   (3/8)/0.25 = 1.5 → fires
    // hour 9 (a 7-hour gap): 4 events, 0 errors → its 6h RANGE window must
    //   NOT reach back to hour 1 (hid distance 8 > 5) → burn_6h = 0
    def e(id: Long, min: Int, typ: String) = (id, ts(min), 0L, typ, 1.0, "{}")
    val dir = eventsDir(Seq(
      e(1, 0, "error"), e(2, 10, "view"), e(3, 20, "view"), e(4, 30, "view"),
      e(5, 60, "error"), e(6, 70, "error"), e(7, 80, "view"), e(8, 90, "view"),
      e(9, 540, "view"), e(10, 550, "view"), e(11, 555, "view"), e(12, 559, "view")))
    val got = LogOps.slaBurn.build(spark, dir)
      .select("burn_1h", "burn_6h", "firing")
      .as[(Double, Double, Boolean)].collect().toSeq
    assert(got === Seq((1.0, 1.0, true), (2.0, 1.5, true), (0.0, 0.0, false)))
  }

  test("cusum: closed-form windows match the textbook scalar recurrence; " +
    "a level shift raises the alert") {
    // 10 quiet days (1 error each) then 6 loud days (21 each): σ ≈ 9.68,
    // k = round(σ/2) = 5, h = round(4σ) = 39; the recurrence
    // S_t = max(0, S_{t-1} + x_t − μ − k) holds at 0 through the quiet run
    // (1 − 8.5 − 5 < 0) and climbs 7.5/day after the shift, crossing h on
    // the final day (45 > 39).
    val counts = Seq.fill(10)(1) ++ Seq.fill(6)(21)
    var id = 0L
    val rows = counts.zipWithIndex.flatMap { case (n, day) =>
      (0 until n).map { j =>
        id += 1
        (id, ts(day * 1440 + j), 0L, "error", 1.0, "{}")
      } :+ { id += 1; (id, ts(day * 1440 + 100), 0L, "view", 1.0, "{}") }
    }
    val got = LogOps.cusumChangepoint.build(spark, eventsDir(rows))
      .select("x", "cusum", "alert").as[(Long, Double, Boolean)].collect().toSeq
    assert(got.map(_._1) === counts.map(_.toLong))
    // driver-side scalar recurrence in the same integer domain
    val n = counts.length
    val sx = counts.sum
    val mean = sx.toDouble / n
    val sd = math.sqrt(counts.map(c => c * c).sum.toDouble / n - mean * mean)
    val k = math.round(0.5 * sd)
    val h = math.round(4.0 * sd)
    var s = 0.0
    val expect = counts.map { x =>
      s = math.max(0.0, s + x - mean - k)
      (BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s > h)
    }
    got.zip(expect).foreach { case ((_, c, a), (ec, ea)) =>
      assert(math.abs(c - ec) < 2e-4, s"cusum $c vs recurrence $ec")
      assert(a === ea)
    }
    assert(!got.take(10).exists(_._3) && got.last._3, "alert must fire only after the shift")
  }

  test("alert rules: a rule fires exactly on days at or over its threshold; " +
    "the absurd-threshold rule never fires") {
    // day 0: 5 errors (rule 1 fires, min 5); day 1: 4 errors (no fire);
    // day 0 also has 2 signups — rule 4 (min 1e6) must not fire.
    def e(id: Long, min: Int, typ: String) = (id, ts(min), 0L, typ, 1.0, "{}")
    val rows = (1 to 5).map(i => e(i, i, "error")) ++
      (6 to 9).map(i => e(i, 1440 + i, "error")) ++
      Seq(e(10, 20, "signup"), e(11, 21, "signup"))
    val got = LogOps.alertRules.build(spark, eventsDir(rows))
      .select("rule_id", "n").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L)))
  }

  test("new templates: a shape debuting on day 2 lands in day 2's row; " +
    "recurring shapes count only at first sight") {
    // Day 1: views and errors (two templates debut). Day 2: more views
    // (no debut) plus the corpus's first purchases (one debut). The
    // fixture corpus never exercises this split — every template debuts
    // on day 1 there — so the multi-day semantics are pinned here.
    // props must carry k: the error/view line shapes embed $.k, and a
    // missing key nulls the whole synthetic line (concat null-propagates)
    def e(id: Long, min: Int, typ: String) = (id, ts(min), 0L, typ, 1.0, """{"k":3}""")
    val rows = Seq(e(1, 0, "view"), e(2, 5, "error"), e(3, 10, "view"),
      e(4, 1440, "view"), e(5, 1450, "purchase"), e(6, 1460, "purchase"))
    val got = LogOps.newTemplates.build(spark, eventsDir(rows))
      .select("day", "n_new").as[(Timestamp, Long)].collect().toSeq
    assert(got.map(_._2) === Seq(2L, 1L))
    assert(got.map(_._1.getTime) === Seq(1704067200000L, 1704067200000L + 86400000L))
    // first_ids is sorted by template text and comma-joined 8-char md5 prefixes
    val ids = LogOps.newTemplates.build(spark, eventsDir(rows))
      .select("first_ids").as[String].collect()
    assert(ids.forall(_.split(",").forall(_.length === 8)))
  }

  test("corr matrix: perfectly co-moving types hit 1.0, and a type silent in " +
    "later hours correlates through its zero-filled series") {
    // hourly counts — a: (1,2,3); b: (2,4,6) ⇒ corr(a,b)=1; c fires only in
    // hour 0 (3 events) ⇒ series (3,0,0), which exists ONLY via the
    // zero-fill: corr(a,c) = −9/√(6·18) = −0.8660, corr(b,c) likewise
    def e(id: Long, min: Int, typ: String) = (id, ts(min), 0L, typ, 1.0, "{}")
    var id = 0L
    def burst(hour: Int, typ: String, n: Int) = (1 to n).map { _ =>
      id += 1; e(id, hour * 60, typ)
    }
    val rows = burst(0, "a", 1) ++ burst(0, "b", 2) ++ burst(0, "c", 3) ++
      burst(1, "a", 2) ++ burst(1, "b", 4) ++ burst(2, "a", 3) ++ burst(2, "b", 6)
    val got = LogOps.corrMatrix.build(spark, eventsDir(rows))
      .select("type_a", "type_b", "n_hours", "corr_v")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("a", "b", 3L, 1.0),
      ("a", "c", 3L, -0.866),
      ("b", "c", 3L, -0.866)))
  }

  test("forward as-of: same-ts purchase excluded (strict bound), equal-ts future " +
    "tie resolves to min event_id, trailing error unmatched") {
    def e(id: Long, min: Int, user: Long, typ: String) = (id, ts(min), user, typ, 1.0, "{}")
    val rows = Seq(
      // user 0: purchase at the error's OWN ts must not match; the next one does
      e(1, 10, 0, "error"), e(2, 10, 0, "purchase"), e(3, 20, 0, "purchase"),
      e(4, 30, 0, "error"), // no following purchase → dropped
      // user 1: two purchases at the same future ts → min event_id wins
      e(5, 0, 1, "error"), e(7, 5, 1, "purchase"), e(6, 5, 1, "purchase"))
    val got = LogOps.joinAsofForward.build(spark, eventsDir(rows))
      .select("event_id", "next_purchase_id", "wait_s")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 600L), (5L, 6L, 300L)))
  }
}
