package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for a comma-separated list of registered
  * queries — the evidence artifact behind each optimization round's
  * `plans/rNN/<query>_{before,after}.txt` files.
  *
  * Usage: `sbt "runMain graft.PlanDump <out_dir> <suffix> <q1,q2,...>"`
  * writes `<out_dir>/<query>_<suffix>.txt` per query. The session mirrors
  * `Plans` (local[4], 4 shuffle partitions, UTC) so dumps are comparable
  * across rounds.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <out_dir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, list) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Files.createDirectories(Paths.get(outDir))
    list.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"dumped $name")
    }
    spark.stop()
  }
}
