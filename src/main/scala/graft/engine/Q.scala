package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator from SURVEY.md §2's inventory: the Spark builder and
  * (when SQL-expressible) the DuckDB oracle the driver hash-matches against.
  * Keeping both in one value prevents name/column drift between the two maps
  * the contract exposes.
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val build: (SparkSession, String) => DataFrame)

object Q {
  /** Oracle-checked query. */
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle))(build)

  /** Non-SQL-expressible query (sketches, streaming twins): rows-only check. */
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, None)(build)
}
