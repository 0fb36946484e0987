package graft

import java.sql.Timestamp
import graft.engine.{LogOps, Skew}
import org.apache.spark.sql.functions._

/** The census-salted join guard: identical results to the plain equi-join
  * under a hot key, and the storm fixture the guard exists for — a
  * single-hour incident storm concentrating one time bucket — still
  * computes the exact interval-overlap answer.
  */
class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("censusSaltedJoin equals the plain join; hot and cold keys both covered") {
    // key 7 is hot (500 left rows > threshold 100); keys 1-3 are cold.
    // Right side carries multiple rows per key so the salted replication
    // path (hot) and the salt-0 path (cold) both produce every pairing
    // exactly once.
    val left = ((1 to 500).map(i => (7L, i.toLong)) ++
      (1 to 5).flatMap(k => (1 to 10).map(i => (k.toLong, (100 * k + i).toLong))))
      .toDF("k", "lv")
    val right = (1 to 8).flatMap(k => (1 to 3).map(j => (k.toLong, (10 * k + j).toLong)))
      .toDF("k", "rv")
    val salted = Skew.censusSaltedJoin(left, right, Seq("k"),
        saltBy = xxhash64(col("lv")), hotThreshold = 100L, salts = 4)
      .select("k", "lv", "rv").as[(Long, Long, Long)].collect().sorted.toSeq
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(salted === plain)
    assert(salted.nonEmpty)
    // the hot key really did exceed the census threshold (the test would
    // silently stop covering the salted path if the fixture shrank)
    assert(left.filter(col("k") === 7).count() > 100)
  }

  test("censusSaltedJoin salts keys made hot by the RIGHT side alone") {
    // The storm can come from either side: a few sessions (left cold)
    // meeting a million-incident hour (right hot). The census must trip
    // on the right side's count too — the per-task pairing bound is
    // |left_k|·|right_k| — and the salted result must still equal the
    // plain join exactly.
    val left = (1 to 5).map(i => (7L, i.toLong)).toDF("k", "lv")   // cold by itself
    val right = ((1 to 500).map(j => (7L, j.toLong)) ++            // right-hot key
      (1 to 3).map(j => (2L, (900 + j).toLong))).toDF("k", "rv")
    val salted = Skew.censusSaltedJoin(left, right, Seq("k"),
        saltBy = xxhash64(col("lv")), hotThreshold = 100L, salts = 4)
      .select("k", "lv", "rv").as[(Long, Long, Long)].collect().sorted.toSeq
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(salted === plain)
    assert(salted.size === 2500) // 5 × 500 pairings survived the salt split
  }

  test("interval overlap survives a single-hour incident storm with exact results") {
    // 1100 users, each one 3-event session spanning minutes 0-50 of the
    // same hour → 1100 sessions explode into ONE hour bucket, over the
    // 1000-row census threshold, so the guard engages. 3 incidents inside
    // the hour (±2 min windows stay inside it) overlap every session:
    // each must report exactly n_sessions = n_users = 1100.
    def ts(minute: Int): Timestamp = new Timestamp(1704067200000L + minute * 60000L)
    val storm =
      (0 until 1100).flatMap { u =>
        Seq(0, 25, 50).zipWithIndex.map { case (m, i) =>
          (u * 10L + i, ts(m), u.toLong, "view", 1.0, "{}")
        }
      } ++ Seq(
        (900001L, ts(10), 9000L, "error", 200.0, "{}"),
        (900002L, ts(20), 9001L, "error", 200.0, "{}"),
        (900003L, ts(30), 9002L, "error", 200.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-storm").toString
    storm.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = LogOps.joinIntervalOverlap.build(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    // error events are themselves 1-event sessions for users 9000-9002,
    // and each incident's ±2-min window overlaps the OTHER incidents'
    // zero-length sessions only when within 2 min — windows are 10/20/30
    // ± 2, pairwise 10 min apart, so each incident sees its own session
    // plus the 1100 spanning ones
    assert(got === Set(
      (900001L, 1101L, 1101L),
      (900002L, 1101L, 1101L),
      (900003L, 1101L, 1101L)))
  }
}
