package graft

import graft.engine.Relational
import org.apache.spark.sql.functions._

/** Semantics checks on small, hand-computable inputs. */
class RelationalSpec extends SparkSpecBase {
  import spark.implicits._

  test("argmax tiebreak is deterministic under duplicate ordering values") {
    val df = Seq(("a", 10.0, 1L), ("a", 10.0, 2L), ("a", 5.0, 3L))
      .toDF("g", "price", "key")
    val got = df.groupBy("g")
      .agg(max(struct($"price".as("p"), $"key".as("k"))).getField("k").as("argmax"))
      .collect()
    assert(got.head.getLong(1) === 2L) // the larger key wins the 10.0 tie
  }

  test("semi/anti joins partition the left side") {
    val semi = Relational.joinSemi.build(spark, sfDir).count()
    val anti = Relational.joinAnti.build(spark, sfDir).count()
    val customers = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(semi + anti === customers)
  }

  test("rollup emits leaf + subtotal + grand-total levels") {
    val rows = Relational.aggRollup.build(spark, sfDir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val subtotal = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length === 1)
    assert(subtotal.length === 5) // 5 regions
    assert(grand.head.getLong(2) === leaves.map(_.getLong(2)).sum)
  }

  test("union distinct ∪, intersect ∩ and except ∖ agree with set algebra") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_nationkey".cast("int")).as[Int].collect().toSet
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select($"s_nationkey".cast("int")).as[Int].collect().toSet
    val union = Relational.setUnion.build(spark, sfDir).as[Int].collect().toSet
    assert(union === (cust ++ supp))
    val ie = Relational.setIntersectExcept.build(spark, sfDir)
      .collect().groupBy(_.getString(0)).map { case (k, v) => k -> v.map(_.getInt(1)).toSet }
    assert(ie("both") === (cust intersect supp))
    assert(ie.getOrElse("cust_only", Set.empty[Int]) === (cust diff supp))
  }

  test("pricing summary matches a hand aggregation") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
    val expected = li.groupBy("l_returnflag", "l_linestatus").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = Relational.aggPricingSummary.build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(7)).toMap
    assert(got === expected)
  }

  test("column profile: nulls, distincts, and min/max are per column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prof").toString
    Seq(
      (1L, "bb", "en", "src0", 2L),
      (2L, null.asInstanceOf[String], "en", "src1", 0L),
      (3L, "aa", null.asInstanceOf[String], "src0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Relational.metaColumnProfile.build(spark, dir)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("doc_id") === ((3L, 0L, 3L, "1", "3")))
    assert(got("text") === ((3L, 1L, 2L, "aa", "bb"))) // null excluded from distinct/min/max
    assert(got("lang") === ((3L, 1L, 1L, "en", "en")))
    assert(got("source") === ((3L, 0L, 2L, "src0", "src1")))
    assert(got("n_chars") === ((3L, 0L, 2L, "0", "2")))
  }

  test("fk orphans: dangling and null child keys count as orphans, valid keys don't") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fk").toString
    def put(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    put("region", Seq(0L).toDF("r_regionkey"))
    put("nation", Seq((0L, 0L), (1L, 9L)).toDF("n_nationkey", "n_regionkey")) // 9 dangles
    put("customer",
      Seq[(Long, java.lang.Long)]((10L, 0L), (11L, 1L), (12L, null))
        .toDF("c_custkey", "c_nationkey")) // null FK = orphan
    put("supplier", Seq((20L, 0L)).toDF("s_suppkey", "s_nationkey"))
    put("orders", Seq((30L, 10L), (31L, 99L)).toDF("o_orderkey", "o_custkey")) // 99 dangles
    put("lineitem", Seq((30L, 1L), (30L, 2L), (31L, 1L)).toDF("l_orderkey", "l_linenumber"))
    val got = Relational.metaFkOrphans.build(spark, dir)
      .select("fk_name", "n_child", "n_orphans")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("customer.c_nationkey->nation") === ((3L, 1L)))
    assert(got("lineitem.l_orderkey->orders") === ((3L, 0L)))
    assert(got("nation.n_regionkey->region") === ((2L, 1L)))
    assert(got("orders.o_custkey->customer") === ((2L, 1L)))
    assert(got("supplier.s_nationkey->nation") === ((1L, 0L)))
  }

  test("equi-depth histogram: bins partition every row, depths are balanced, " +
    "and bin ranges are ordered and disjoint") {
    val out = Relational.aggEquidepthHistogram.build(spark, sfDir)
      .select("bin", "n", "lo", "hi").as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(out.map(_._1).toSeq === (1L to 8L))
    assert(out.map(_._2).sum === total)
    // equal depth up to quantile ties: no bin strays past ±25% of the ideal
    val ideal = total.toDouble / 8
    out.foreach { case (b, n, _, _) =>
      assert(math.abs(n - ideal) <= 0.25 * ideal, s"bin $b depth $n vs ideal $ideal")
    }
    // ranges ordered: each bin's hi is at most the next bin's lo
    out.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    out.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
  }
}
