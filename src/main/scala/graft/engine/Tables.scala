package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  *
  * Design notes for 100 TB operation: each table here is a single parquet
  * file only because the test corpus is small. The loaders take a directory
  * and a table name, so pointing them at a date-partitioned parquet (or
  * Iceberg/Delta) root with thousands of files changes nothing in the query
  * code — partition pruning and row-group min/max pruning are applied by the
  * vectorized parquet reader as long as filters stay on raw columns.
  *
  * The one genuinely tricky source is `events`: the generator wrote its `ts`
  * column as parquet INT64 TIMESTAMP(NANOS), which Spark 4.x refuses to read
  * by default ([PARQUET_TYPE_ILLEGAL]). We flip the legacy conf (runtime
  * settable) so the column arrives as a plain long of epoch-nanos, then
  * convert with integer `div 1000` + `timestamp_micros` — bit-for-bit the
  * same µs truncation DuckDB applies when it reads the file natively, which
  * is what keeps the t2 oracle hash-match honest.
  */
object Tables {

  /** Confs every graft session needs regardless of who built it (the driver
    * builds sessions for Verify/Bench without them). All runtime-settable.
    */
  def prepare(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) would otherwise arrive
    // as TIMESTAMP_NTZ; reading it as TIMESTAMP (a pure reinterpretation under
    // the UTC session, matching DuckDB's naive read) keeps `ts` a *raw* scan
    // column, so time-range predicates push down to parquet row-group pruning
    // instead of evaluating post-scan — the difference between reading one
    // day and reading 100 TB.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark
  }

  /** Memoized per (session, path, file mtime+length) — the catalog
    * discipline (r12, guide §1.2): every `spark.read.parquet` call runs a
    * driver-side footer/schema-inference job (~65 ms per table measured at
    * sf0.1), and because each registered query rebuilds its plan from
    * `load`, that job was re-paid on every invocation — a fixed per-query
    * tax that at 242 registry queries dominated the sub-second tail. A
    * real engine resolves a table's schema once per session; the memo key
    * carries the file's (modification time, length) so a regenerated
    * fixture (or a different corpus root) re-reads the footer instead of
    * serving a stale plan. Only the LAZY DataFrame (schema + file index)
    * is memoized: execution still scans parquet every run.
    *
    * A stat failure (file deleted mid-session) falls through to the plain
    * read so the error surfaces as Spark's own path-not-found, not a
    * memo artifact.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    prepare(spark)
    val path = s"$dir/$name.parquet"
    val fp = try {
      val p = new org.apache.hadoop.fs.Path(path)
      val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
      s"$path:${st.getModificationTime}:${st.getLen}"
    } catch { case _: Throwable => null }
    if (fp == null) return spark.read.parquet(path)
    loadMemo.synchronized {
      val perSession = {
        val m = loadMemo.get(spark)
        if (m != null) m else {
          val fresh = scala.collection.mutable.HashMap.empty[String, DataFrame]
          loadMemo.put(spark, fresh)
          fresh
        }
      }
      perSession.getOrElseUpdate(fp, spark.read.parquet(path))
    }
  }

  /** session → (path fingerprint → lazy frame). Weak keys: an entry dies
    * with its session (the GraftSession `openedStores` convention).
    */
  private val loadMemo =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.HashMap[String, DataFrame]]()

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** The log/event stream table, with `ts` normalized to a microsecond
    * TimestampType column (matching DuckDB's native read) plus the epoch-nanos
    * long `ts_ns` for INT64 range arithmetic.
    *
    * The generator has shipped `ts` in three physical shapes across fixture
    * regenerations, so all three are normalized here to identical output:
    *   - INT64 TIMESTAMP(NANOS): read as epoch-nanos long via
    *     `spark.sql.legacy.parquet.nanosAsLong`, converted with integer
    *     `div 1000` (the same µs truncation DuckDB applies natively);
    *   - TIMESTAMP(MICROS) isAdjustedToUTC=false → Spark TIMESTAMP_NTZ:
    *     cast to TIMESTAMP — under the UTC session (set in `prepare`) this is
    *     a pure reinterpretation of the same instant, again matching DuckDB's
    *     naive read;
    *   - TIMESTAMP(MICROS) isAdjustedToUTC=true → Spark TIMESTAMP: as-is.
    * Anything else fails loudly so a future fixture regeneration surfaces as
    * one clear error instead of 36 downstream analysis exceptions.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
      case TimestampType =>
        raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts column has unsupported type $other — " +
            "expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP; " +
            "fixture schema drifted, update Tables.events")
    }
  }
}
