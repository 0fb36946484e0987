package graft

import org.apache.spark.sql.functions._

/** The 100 TB storage contract: a production log table is date-partitioned
  * (time-range queries prune whole directories) and fact tables are
  * bucketed on their join key (co-located joins skip the shuffle). The
  * query code never changes — these tests prove the *layouts* deliver the
  * plans the scale design assumes, which is exactly what breaks silently
  * when someone reorganizes storage.
  */
class StorageLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("date-partitioned events: a day filter prunes partitions at the scan") {
    val dir = s"$tmp/events_by_day"
    graft.sources.Sinks.writeEventsByDay(
      graft.engine.Tables.events(spark, sfDir), dir)

    val all = spark.read.parquet(dir)
    // one file per day partition (the writer's small-files contract)
    assert(all.inputFiles.length === all.select("day").distinct().count())
    val df = all.filter(col("day") === "2024-01-05").select("event_id")
    val executed = df.queryExecution.executedPlan
    assert(executed.toString.contains("PartitionFilters: [isnotnull(day"), executed.toString)
    // run THIS plan (df.count() would build a different one whose metrics
    // we don't hold) and read the scan's numFiles metric: pruning must cut
    // the 30 day-directories down to the one matching day
    val rows = executed.execute().count()
    assert(rows > 0)
    val numFiles = executed
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .head.metrics("numFiles").value
    val totalFiles = all.inputFiles.length
    assert(numFiles >= 1 && numFiles < totalFiles, s"files=$numFiles of $totalFiles")
  }

  test("posting store: term probe prunes to the terms' hash buckets, equals raw scan") {
    val dir = s"$tmp/postings"
    val docs = graft.engine.Tables.documents(spark, sfDir)
    graft.sources.Sinks.writePostings(docs, dir, buckets = 16)

    val terms = Seq("spark", "join", "window")
    val probe = graft.sources.Sinks.probePostings(spark, dir, terms)
    // the bucket predicate must land in the scan's PartitionFilters
    // (directory pruning), not a post-scan filter; sparkPlan is the
    // pre-AQE tree where the FileSourceScanExec is directly visible
    val scan = probe.queryExecution.sparkPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.head
    assert(scan.partitionFilters.exists(_.toString.contains("tok_bucket")),
      scan.partitionFilters.mkString("; "))
    val got = probe.as[Long].collect().sorted.toSeq
    // fewer files listed under the pruned directories than the full store
    val numFiles = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).map(_.files.size).sum
    val totalFiles = spark.read.parquet(s"$dir/postings").inputFiles.length
    assert(numFiles < totalFiles, s"probe read $numFiles of $totalFiles files")
    // the persisted-index probe answers exactly what the raw-scan
    // formulation answers
    val rawScan = graft.engine.LogOps.invertedSearch.build(spark, sfDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === rawScan)
    assert(got.nonEmpty)
  }

  test("bucketed fact-fact join: no exchange on either side") {
    graft.sources.Sinks.writeBucketedFact(
      graft.engine.Tables.orders(spark, sfDir),
      "orders_b", s"$tmp/orders_b", "o_orderkey", buckets = 8)
    graft.sources.Sinks.writeBucketedFact(
      graft.engine.Tables.lineitem(spark, sfDir),
      "lineitem_b", s"$tmp/lineitem_b", "l_orderkey", buckets = 8)
    // pin a shuffle-based join: at test scale AQE would broadcast instead,
    // hiding exactly the exchange this layout exists to elide
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located buckets: the join happens with zero shuffles; the only
      // exchange allowed is the one under the final small aggregation
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
             !plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    val salted = graft.engine.LogOps.saltedAgg.build(spark, sfDir)
      .as[(String, Long, Double, Double)].collect().toSet
    val direct = graft.engine.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"),
        round(sum("value") / count(lit(1)), 4).as("avg_value"))
      .as[(String, Long, Double, Double)].collect().toSet
    assert(salted === direct)
  }
}
