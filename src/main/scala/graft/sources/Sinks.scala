package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parquet sink layouts (SURVEY.md §2.1 S5) — the write side of the 100 TB
  * storage contract in SCALE.md §1. Queries never encode layout; these
  * writers produce the layouts the scale design assumes, and
  * StorageLayoutSpec proves each one delivers its plan shape (partition
  * pruning / shuffle-free joins) by reading them back.
  */
object Sinks {

  /** Date-partitioned log sink: `path/day=YYYY-MM-DD/...` from the event-time
    * column, so time-range queries prune whole directories before any IO.
    *
    * The pre-write shuffle is the small-files control: without it every task
    * writes a sliver of every day (tasks × days files); repartitioning on
    * (day, salt) bounds output to `filesPerDay` sized files per day while
    * still spreading one hot day over that many writers. `maxRecordsPerFile`
    * is the belt-and-braces cap under row-size skew.
    */
  def writeEventsByDay(events: DataFrame, path: String,
                       filesPerDay: Int = 1,
                       maxRecordsPerFile: Long = 5_000_000L): Unit = {
    val withDay = events.withColumn("day", to_date(col("ts")))
    withDay
      .repartition(col("day"), pmod(hash(col("event_id")), lit(filesPerDay)))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "zstd")
      .partitionBy("day")
      .parquet(path)
  }

  /** Bucketed + sorted fact sink: co-locates rows by join key so fact-fact
    * joins and key-grouped aggregations run with zero exchanges (proved by
    * StorageLayoutSpec). Bucketed writes go through the catalog — parquet
    * alone has nowhere to record bucket metadata — hence the table name.
    * At 100 TB the bucket count is chosen so each bucket file stays in the
    * hundreds of MB (e.g. 4096 for a 1 TB fact).
    */
  def writeBucketedFact(df: DataFrame, table: String, path: String,
                        key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("compression", "zstd")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Plain sized-parquet sink for dimension/corpus tables: exactly
    * `numFiles` output files (a dimension stays one broadcastable file; a
    * corpus gets files sized for `maxPartitionBytes`-friendly scans).
    */
  def writeSized(df: DataFrame, path: String, numFiles: Int): Unit =
    df.repartition(numFiles).write.mode("overwrite")
      .option("compression", "zstd").parquet(path)

  /** PQ ANN index sink: the trained per-subspace codebook (metadata-sized,
    * one broadcastable file) + the encoded corpus code table (the 32×
    * compressed corpus, split for parallel scans). This is the production
    * lifecycle the registered `llm_ann_ivfpq` query compresses into one
    * plan: build ONCE, persist, and serve every query batch from the
    * persisted index — LlmOpsSpec proves the parquet round-trip is
    * search-equivalent.
    */
  def writePqIndex(codebook: DataFrame, codes: DataFrame, path: String,
                   codeFiles: Int = 8): Unit = {
    writeSized(codebook, s"$path/codebook", 1)
    writeSized(codes, s"$path/codes", codeFiles)
  }

  /** HLL sketch store: persist (key…, day, sk: binary) daily Datasketches
    * HLL sketches, day-partitioned so a date-range union prunes whole
    * directories. This is the production range-query lifecycle behind
    * `agg_hll_union_daily`: sketches are built ONCE per day (~4 KB each),
    * and any "distinct users over [d1, d2]" is a union-merge over the
    * pruned sketch files — register-wise max is associative and
    * order-independent, so the merged estimate is byte-equivalent to
    * sketching the whole range (proved by SourcesAndUdafSpec's round-trip).
    */
  def writeHllSketches(sketches: DataFrame, path: String): Unit =
    sketches
      .withColumn("day_part", date_format(col("day"), "yyyy-MM-dd"))
      .repartition(col("day_part"))
      .write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy("day_part")
      .parquet(path)
}
