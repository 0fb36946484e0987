package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-log ingestion (SURVEY.md §2.1 S3/S4): the schema-on-read path — the
  * reference's core model, where a parse pattern turns unstructured lines
  * into columns at query time.
  *
  * Scale notes: `spark.read.text` splits large files on line boundaries
  * across executors, so a 100 TB log directory parallelizes for free; the
  * regex projection runs inside WholeStageCodegen on each partition. Keep
  * the raw `line` column alongside the parsed fields (cheap — column
  * pruning drops it when unused) so re-parsing with a better pattern never
  * requires re-ingesting.
  */
object LogSource {

  /** Default pattern: `2024-01-01T00:00:00 LEVEL component: message`. */
  val defaultPattern = "^(\\S+) (\\w+) ([\\w.-]+): (.*)$"

  /** S3: unstructured text lines → (ts, level, component, message, line). */
  def readTextLog(spark: SparkSession, path: String,
                  pattern: String = defaultPattern): DataFrame =
    parseLines(spark.read.text(path), pattern)

  /** The same projection applied to any (value: string) frame — used by the
    * streaming twin (`readStream.text`) and tests.
    */
  def parseLines(lines: DataFrame, pattern: String = defaultPattern): DataFrame =
    lines.select(
      // try_to_timestamp: unparseable lines yield NULL ts (ANSI mode would
      // abort the whole scan on the first malformed log line otherwise)
      try_to_timestamp(regexp_extract(col("value"), pattern, 1)).as("ts"),
      regexp_extract(col("value"), pattern, 2).as("level"),
      regexp_extract(col("value"), pattern, 3).as("component"),
      regexp_extract(col("value"), pattern, 4).as("message"),
      col("value").as("line"))

  /** S4: JSON-lines ingest with explicit schema (never inferSchema at
    * scale — inference is a full extra pass over 100 TB).
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S-family (CSV): delimited ingest with explicit schema — like
    * [[readJsonLines]], never inferSchema at scale (inference is a full
    * extra pass over the corpus). CSV files split on line boundaries
    * across executors exactly like raw text, so a 100 TB landing
    * directory parallelizes without any pre-splitting.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Streaming twin of S3: tail -f over a growing log directory. */
  def streamTextLog(spark: SparkSession, path: String,
                    pattern: String = defaultPattern): DataFrame =
    parseLines(spark.readStream.text(path), pattern)
}
