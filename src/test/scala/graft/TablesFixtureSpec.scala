package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.engine.Tables

/** Fixture-drift canary: the driver has regenerated `events.parquet` with a
  * different physical `ts` encoding between rounds (INT64 TIMESTAMP(NANOS) in
  * rounds 1-2, TIMESTAMP(MICROS)/NTZ from round 3). `Tables.events` must
  * normalize every encoding the generator has ever produced — plus the LTZ
  * variant it could plausibly produce next — to the identical (ts, ts_ns)
  * pair, so a future regeneration surfaces here as one red test instead of
  * 36 crashed registry queries.
  */
class TablesFixtureSpec extends SparkSpecBase {

  // Two instants with sub-second parts; nanos variant carries extra
  // nanoseconds that µs encodings can't represent (truncation must match).
  private val microsA = 1704067201500000L // 2024-01-01T00:00:01.5Z
  private val microsB = 1706745600123456L // 2024-02-01T00:00:00.123456Z

  private def writeAndLoad(shape: String): Seq[(Timestamp, Long)] = {
    val dir = Files.createTempDirectory(s"graft_fixture_$shape").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val df = shape match {
      case "nanos_long" =>
        // TIMESTAMP(NANOS) arrives as epoch-nanos LongType under
        // spark.sql.legacy.parquet.nanosAsLong — physically indistinguishable
        // from a plain INT64 column, which is what we write here.
        val rows = Seq(Row(1L, microsA * 1000L + 789L), Row(2L, microsB * 1000L + 999L))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
      case "micros_ntz" =>
        val rows = Seq(
          Row(1L, LocalDateTime.of(2024, 1, 1, 0, 0, 1, 500000000)),
          Row(2L, LocalDateTime.of(2024, 2, 1, 0, 0, 0, 123456000)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampNTZType))))
      case "micros_ltz" =>
        val rows = Seq(
          Row(1L, new Timestamp(microsA / 1000)),
          Row(2L, new Timestamp(microsB / 1000)))
        val withMillis = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampType))))
        // java.sql.Timestamp construction above is millisecond-grained; patch
        // the full µs value through an expression to keep all three variants
        // on the same instants.
        import org.apache.spark.sql.functions._
        withMillis.withColumn(
          "ts",
          timestamp_micros(when(col("event_id") === 1L, microsA).otherwise(microsB)))
    }
    df.write.mode("overwrite").parquet(s"$path/events.parquet")
    Tables.events(spark, path)
      .select("ts", "ts_ns")
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
      .toSeq
      .sortBy(_._2)
  }

  test("nanos-long, µs-NTZ, and µs-LTZ events fixtures normalize identically") {
    val nanos = writeAndLoad("nanos_long")
    val ntz   = writeAndLoad("micros_ntz")
    val ltz   = writeAndLoad("micros_ltz")
    // µs variants have exact µs nanos; the nanos variant truncates sub-µs.
    val expectedTsNs = Seq(microsA * 1000L, microsB * 1000L)
    assert(ntz.map(_._2) == expectedTsNs, s"ntz ts_ns: $ntz")
    assert(ltz.map(_._2) == expectedTsNs, s"ltz ts_ns: $ltz")
    // nanos fixture keeps its sub-µs detail in ts_ns but truncates ts to µs
    assert(nanos.map(_._2) == Seq(microsA * 1000L + 789L, microsB * 1000L + 999L))
    assert(nanos.map(_._1) == ntz.map(_._1), s"nanos vs ntz ts: $nanos / $ntz")
    assert(ntz.map(_._1) == ltz.map(_._1), s"ntz vs ltz ts: $ntz / $ltz")
  }

  test("lineitem fixture guard: l_quantity is integer-valued in every sf dir " +
    "(sql_small_quantity_revenue's ROUND half-up vs half-even premise)") {
    // sql_small_quantity_revenue and sql_large_orders compare quantities in
    // exact integers via CAST(ROUND(l_quantity, 0) AS BIGINT); a fractional
    // quantity ending in .5 would round half-up in DuckDB and half-even in
    // Spark, silently splitting the engines. Sweep every fixture dir (the
    // latency-sketch / PCA-quantization guard pattern) so a regenerated
    // corpus that breaks the premise fails here, not in a hash mismatch.
    import org.apache.spark.sql.functions.{col, round => sround}
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf")).map(_.getPath)
    assert(dirs.nonEmpty)
    dirs.foreach { dir =>
      val bad = Tables.load(spark, dir, "lineitem")
        .filter(col("l_quantity") =!= sround(col("l_quantity"), 0))
        .count()
      assert(bad === 0L, s"$dir: $bad non-integer l_quantity values")
    }
  }

  test("real sf0.001 events fixture loads with the expected normalized schema") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType, ev.schema.treeString)
    assert(ev.schema("ts_ns").dataType == LongType, ev.schema.treeString)
    assert(ev.limit(1).count() == 1)
  }
}
