package graft

import org.apache.spark.sql.functions._

/** Runtime re-planning (SCALE.md §4): the scale design leans on AQE for
  * adaptivity — skew-join splitting and runtime broadcast conversion. These
  * tests manufacture the runtime conditions and assert the re-plan actually
  * fires in this engine's session configuration, so the claim is measured,
  * not assumed.
  */
class AqeSpec extends SparkSpecBase {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB") {
      import spark.implicits._
      // one hot key carrying ~95% of the left side's shuffle bytes
      val left = spark.range(0, 220000)
        .select(
          when(col("id") < 200000, 0L).otherwise(col("id") % 10).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("pay"))
      val right = spark.range(0, 10).select(col("id").as("rk"), col("id").as("rv"))
      val joined = left.join(right, col("k") === col("rk"))
      // drive THIS dataset's adaptive plan (df.count() would execute a
      // different QueryExecution and leave this one un-finalized)
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() > 0)
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("skew=true"), finalPlan)
    }
  }

  test("AQE converts a planned shuffle join to broadcast at runtime") {
    withConfs(
      // planner sees no stats worth broadcasting (threshold tiny), but AQE
      // re-examines actual shuffle sizes with the local-read threshold
      "spark.sql.autoBroadcastJoinThreshold" -> "1KB",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB") {
      import spark.implicits._
      val big = spark.range(0, 100000).select((col("id") % 1000).as("k"), col("id").as("v"))
      // small side disguised behind an aggregation: pre-shuffle size unknown,
      // post-shuffle it is tiny → AQE should convert SMJ → BHJ
      val small = spark.range(0, 100000).select((col("id") % 50).as("rk"))
        .groupBy("rk").agg(count(lit(1)).as("rn"))
      val joined = big.join(small, col("k") === col("rk"))
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() > 0)
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // At 100 TB the classic kill-shot for a fact⋈dim shuffle join is a
    // runtime semi-join filter: build a bloom filter from the dim side's
    // selective predicate, push it into the fact scan, and shuffle only
    // surviving rows. Spark's InjectRuntimeFilter does exactly this; the
    // production defaults gate it behind a 10 GB application-side scan, so
    // the thresholds are lowered here to prove the rewrite fires in this
    // engine's session, with the dim filter genuinely selective (1 brand
    // of 25).
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val part = spark.read.parquet(s"$sfDir/part.parquet")
        .filter(col("p_brand") === "Brand#11")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("l_quantity").as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized)
      // and the filtered result is still correct
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() === 1)
    }
  }
}
