package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core (SURVEY.md §2.2–§2.4, §2.6): projection, predicates,
  * the full join menu, hash aggregation, rollup, percentiles, set ops,
  * global sort and top-k.
  *
  * Scale notes (100 TB): every query here is a declarative DataFrame plan,
  * so Catalyst gives predicate pushdown, column pruning and join selection
  * for free. Dimension joins pin `broadcast()` (region/nation/supplier stay
  * tiny at any scale factor; customer/part grow but remain << fact tables).
  * Fact-fact joins shuffle on their keys — at cluster scale those tables
  * would be bucketed on the join key to elide the exchange; the query code
  * is unchanged either way. AQE (on by default in Spark 4) re-plans skew.
  */
object Relational {

  /** P1: projection + computed column; Catalyst prunes the parquet scan to
    * the four referenced columns (visible as ReadSchema in explain).
    */
  val selProject = Q(
    "sel_project",
    """SELECT l_orderkey, l_linenumber,
      |  ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P2: compound predicate (=, <, BETWEEN, IN, AND/OR/NOT) — pushed to the
    * parquet row-group stats.
    */
  val filterPredicates = Q(
    "filter_predicates",
    """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus = 'F'
      |  AND o_totalprice BETWEEN 1000 AND 150000
      |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  AND NOT (o_custkey < 10)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(
        col("o_orderstatus") === "F" &&
        col("o_totalprice").between(1000, 150000) &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        !(col("o_custkey") < 10))
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** P4/P5: LIKE substring match + null handling (nullif/coalesce). */
  val filterLikeNulls = Q(
    "filter_like_nulls",
    """SELECT p_partkey, p_type,
      |  COALESCE(NULLIF(p_brand, 'Brand#11'), 'OTHER') AS brand_bucket
      |FROM part WHERE p_type LIKE '%O%' ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_type").like("%O%"))
      .select(
        col("p_partkey"), col("p_type"),
        coalesce(nullif(col("p_brand"), lit("Brand#11")), lit("OTHER")).as("brand_bucket"))
      .orderBy("p_partkey")
  }

  /** J1: fact × two broadcast dims (nation, region are ≤25 rows at any SF —
    * always broadcast; the hint pins it so the plan never degrades to SMJ).
    */
  val joinBroadcastDim = Q(
    "join_broadcast_dim",
    """SELECT r_name, n_name,
      |  COUNT(*) AS n_customers,
      |  ROUND(AVG(c_acctbal), 4) AS avg_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"), round(avg("c_acctbal"), 4).as("avg_bal"))
      .orderBy("r_name", "n_name")
  }

  /** J-family (skew mitigation): the salted join — the manual fix when one
    * join key carries a disproportionate share of the fact rows and a
    * single reducer partition becomes the straggler. The fact side gets a
    * uniform salt (hash of its own row id, mod R) appended to the join
    * key; the dim side replicates R ways, one copy per salt value, so
    * every fact row still finds its match while each hot key's rows
    * spread over R partitions. R× dim replication is cheap (dims are
    * small by definition); the RESULT is exactly the unsalted join, which
    * is what the oracle computes — salting is a physical rewrite, not a
    * semantic one. (AQE's skew-split does this automatically for
    * sort-merge joins; the manual form composes with any join and is the
    * tool when the skew is known ahead of time.)
    */
  val joinSaltedSkew = Q(
    "join_salted_skew",
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_orders,
      |  ROUND(SUM(o_totalprice), 2) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val r = 8
    val facts = Tables.orders(s, dir)
      .withColumn("salt", pmod(xxhash64(col("o_orderkey")), lit(r)).cast("int"))
    val dim = Tables.customer(s, dir)
      .withColumn("salt", explode(sequence(lit(0), lit(r - 1))))
    facts
      .join(dim, facts("salt") === dim("salt") && col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("c_mktsegment")
  }

  /** J2: fact × fact equi-join (shuffle join; at cluster scale both sides
    * would be bucketed on the order key to make this exchange-free).
    */
  val joinFactFact = Q(
    "join_fact_fact",
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_lines,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** J2 served from the STANDING BUCKETED LAYOUT ([[graft.sources.Stores
    * .bucketedFacts]]): both facts were written once clustered + sorted on
    * the order key, so the fact×fact join runs with ZERO exchanges on
    * either input — the scans themselves satisfy the join's required
    * distribution (plan-pinned in PlanSpec; layout proved in
    * StorageLayoutSpec). The `merge` hint pins the co-located sort-merge
    * join at test scale, where AQE would otherwise broadcast the small
    * side and hide exactly the exchange this layout exists to elide. The
    * oracle reads the raw tables — the store holds the same rows, laid
    * out for the join.
    */
  val joinBucketed = Q(
    "join_bucketed",
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS n_lines,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val (ordersT, lineitemT) = graft.sources.Stores.bucketedFacts(s, dir)
    s.table(ordersT)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .join(s.table(lineitemT).hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A-family: sampling-based approximate aggregation with a CONFIDENCE
    * INTERVAL — the 10% sample is a deterministic hash of the row id
    * (md5-prefix mod 10, the cross-engine-reproducible idiom this repo
    * uses for all sampling), so the estimate is identical run-to-run and
    * engine-to-engine: the DuckDB oracle recomputes the SAME sample and
    * the SAME closed forms. Estimators: N̂ = n_s/p; per-type totals scale
    * by 1/p; the half-width is the Bernoulli-sampling normal
    * approximation 1.96·√(n_s(1−p))/p. At 100 TB the sample predicate
    * evaluates in the scan (one cheap hash per row, no shuffle of
    * unsampled rows) and the aggregation state shrinks 10× — the standard
    * first answer for interactive "roughly how many" questions before a
    * full pass is justified.
    */
  val aggSampleEstimate = Q(
    "agg_sample_estimate",
    """WITH s AS (
      |  SELECT event_type, value FROM events
      |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 0)
      |SELECT event_type, COUNT(*) AS n_sample,
      |  COUNT(*) * 10 AS est_n,
      |  ROUND(SUM(value) * 10, 2) AS est_sum,
      |  ROUND(1.96 * 10 * sqrt(COUNT(*) * 0.9), 2) AS ci_half
      |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(pmod(conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint"), lit(10)) === 0)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_sample"),
        (count(lit(1)) * 10).as("est_n"),
        round(sum("value") * 10, 2).as("est_sum"),
        round(lit(1.96) * lit(10) * sqrt(count(lit(1)) * lit(0.9)), 2).as("ci_half"))
      .orderBy("event_type")
  }

  /** J3 + P5: left outer join keeping customers with zero orders; COUNT over
    * the nullable side + COALESCE on the aggregated sum.
    */
  val joinOuter = Q(
    "join_outer",
    """SELECT c_custkey,
      |  COUNT(o_orderkey) AS n_orders,
      |  ROUND(COALESCE(SUM(o_totalprice), 0), 4) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0d)), 4).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** J4: left-semi (EXISTS) — customers holding at least one urgent order. */
  val joinSemi = Q(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** J5: left-anti (NOT EXISTS) — customers holding no urgent order
    * (complement of [[joinSemi]]; non-empty at every scale factor).
    */
  val joinAnti = Q(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** J8: cross join (tiny × tiny; the knn V1 path reuses this shape). */
  val joinCross = Q(
    "join_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")
  }

  /** A1/A2: TPC-H Q1-style pricing summary — multi-measure hash aggregate
    * with partial (map-side) aggregation; the whole scan→filter→agg pipeline
    * runs in one WholeStageCodegen span.
    */
  val aggPricingSummary = Q(
    "agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 4) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A3: exact distinct count (two-phase distinct aggregate). */
  val aggDistinct = Q(
    "agg_distinct",
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n_customers"), count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** A5: rollup subtotal hierarchy region → nation (NULL rows are the
    * subtotal/grand-total levels; both engines order them NULLS FIRST here).
    */
  val aggRollup = Q(
    "agg_rollup",
    """SELECT r_name, n_name,
      |  COUNT(*) AS n_customers,
      |  ROUND(SUM(c_acctbal), 4) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
      // grouping cols are aliased through the rollup: Spark 4's ambiguous-
      // self-join detector false-positives on rollup grouping attrs when the
      // input came through a multi-join (Expand duplicates the attr ids).
      .rollup(col("r_name").as("rname"), col("n_name").as("nname"))
      .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 4).as("sum_bal"))
      .orderBy(asc_nulls_first("rname"), asc_nulls_first("nname"))
      .select(
        col("rname").as("r_name"), col("nname").as("n_name"),
        col("n_customers"), col("sum_bal"))
  }

  /** A7: exact interpolating percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`).
    */
  val aggPercentile = Q(
    "agg_percentile",
    """SELECT l_returnflag,
      |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
      |  ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_price"))
      .orderBy("l_returnflag")
  }

  /** A8: arg-max with a deterministic tiebreak — MAX over a (price, key)
    * struct (lexicographic in both engines) makes the answer unique even
    * under double-valued ties, which plain arg_max/max_by would not.
    */
  val aggArgmax = Q(
    "agg_argmax",
    """SELECT o_orderpriority,
      |  MAX(o_totalprice) AS max_price,
      |  (MAX(struct_pack(p := o_totalprice, k := o_orderkey))).k AS max_orderkey
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        max("o_totalprice").as("max_price"),
        max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .getField("k").as("max_orderkey"))
      .orderBy("o_orderpriority")
  }

  /** A9: collect_list with a deterministic (sorted) order. The collected
    * array is dumped as its JSON rendering — a scalar string — because the
    * driver's compare harness sorts dump columns with pandas, which cannot
    * hash an array-valued cell; the array semantics are exercised fully
    * (collect_list → sort_array) before the final serialization.
    */
  val aggCollectList = Q(
    "agg_collect_list",
    """SELECT n_regionkey,
      |  to_json(list(n_name ORDER BY n_name)) AS nations
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
    Tables.nation(s, dir)
      .groupBy("n_regionkey")
      .agg(to_json(sort_array(collect_list("n_name"))).as("nations"))
      .orderBy("n_regionkey")
  }

  /** O1/O2: global sort + top-k. Spark plans TakeOrderedAndProject — no full
    * sort materialization; at cluster scale each partition computes a local
    * top-k and only k rows per partition reach the driver-side merge.
    */
  val topkGlobal = Q(
    "topk_global",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
  }

  /** O3: UNION (distinct) across differently-named key columns. */
  val setUnion = Q(
    "set_union",
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")
  }

  /** O4: INTERSECT / EXCEPT in one query via unionByName of the two results. */
  val setIntersectExcept = Q(
    "set_intersect_except",
    """SELECT 'both' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'cust_only' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT SELECT s_nationkey FROM supplier)
      |ORDER BY op, nationkey""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val supp = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    cust.intersect(supp).select(lit("both").as("op"), col("nationkey"))
      .unionByName(cust.except(supp).select(lit("cust_only").as("op"), col("nationkey")))
      .orderBy("op", "nationkey")
  }

  /** O4 (bag semantics): INTERSECT ALL / EXCEPT ALL — duplicates preserved
    * up to the matching multiplicity, unlike the distinct variants above.
    */
  val setOpsAll = Q(
    "set_ops_all",
    """SELECT 'inter_all' AS op, nationkey, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY 2
      |UNION ALL
      |SELECT 'except_all' AS op, nationkey, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT ALL SELECT s_nationkey FROM supplier) GROUP BY 2
      |ORDER BY op, nationkey""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val supp = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    val inter = cust.intersectAll(supp)
      .groupBy("nationkey").agg(count(lit(1)).as("n"))
      .select(lit("inter_all").as("op"), col("nationkey"), col("n"))
    val exc = cust.exceptAll(supp)
      .groupBy("nationkey").agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("nationkey"), col("n"))
    inter.unionByName(exc).orderBy("op", "nationkey")
  }

  /** J9: null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) — NULL keys
    * match each other instead of vanishing, the semantics ETL needs when a
    * key column is legitimately absent. Still a hash join: the null-safe
    * operator is a valid equi-key for hash partitioning (nulls co-locate),
    * so it plans exactly like J1/J2 — never a BNLJ.
    */
  val joinNullSafe = Q(
    "join_null_safe",
    """WITH l AS (
      |  SELECT nullif(o_orderstatus, 'P') AS k, COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT nullif(l_linestatus, 'F') AS k, COUNT(*) AS n_lines
      |  FROM lineitem GROUP BY 1)
      |SELECT l.k, l.n_orders, r.n_lines FROM l JOIN r
      |  ON l.k IS NOT DISTINCT FROM r.k
      |ORDER BY l.k NULLS FIRST""".stripMargin) { (s, dir) =>
    val l = Tables.orders(s, dir)
      .groupBy(nullif(col("o_orderstatus"), lit("P")).as("k"))
      .agg(count(lit(1)).as("n_orders"))
    val r = Tables.lineitem(s, dir)
      .groupBy(nullif(col("l_linestatus"), lit("F")).as("rk"))
      .agg(count(lit(1)).as("n_lines"))
    l.join(r, col("k") <=> col("rk"))
      .select(col("k"), col("n_orders"), col("n_lines"))
      .orderBy(asc_nulls_first("k"))
  }

  /** Key-skew diagnostic: the distribution of per-key group sizes — the
    * number the salting/AQE decisions hang on. Two-level agg: sizes per
    * key (the real shuffle), then one single-row profile over the key
    * population. `percentile` here is the exact interpolating aggregate
    * (matches DuckDB quantile_cont); at billions of keys swap the final
    * pass to approx_percentile (agg_approx_percentile) — the per-key sizes
    * stage is identical either way.
    */
  val aggKeySkewProfile = Q(
    "agg_key_skew_profile",
    """WITH sizes AS (
      |  SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey)
      |SELECT COUNT(*) AS n_keys,
      |  ROUND(AVG(n), 4) AS avg_n,
      |  ROUND(quantile_cont(n, 0.5), 4) AS p50_n,
      |  ROUND(quantile_cont(n, 0.99), 4) AS p99_n,
      |  CAST(MAX(n) AS BIGINT) AS max_n
      |FROM sizes""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        round(avg("n"), 4).as("avg_n"),
        round(expr("percentile(n, 0.5)"), 4).as("p50_n"),
        round(expr("percentile(n, 0.99)"), 4).as("p99_n"),
        max("n").as("max_n"))
  }

  /** Data-catalog column profiling — the `ANALYZE TABLE` statistics every
    * lakehouse keeps per column: row count, null count, distinct count,
    * min/max (stringified so one schema fits all types). Computed in ONE
    * corpus scan: a single aggregation row carries every column's stats,
    * then a metadata-sized reshape stacks it to one output row per column
    * (the unpivot is over the 1-row agg, not the data). Distincts are
    * exact here for oracle parity; production swaps in
    * approx_count_distinct and the plan shape does not change. This is
    * the stats source a cost-based optimizer and a data catalog both
    * read.
    */
  val metaColumnProfile = Q(
    "meta_column_profile",
    """WITH s AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS null_doc_id,
      |    COUNT(DISTINCT doc_id) AS nd_doc_id,
      |    CAST(MIN(doc_id) AS VARCHAR) AS min_doc_id, CAST(MAX(doc_id) AS VARCHAR) AS max_doc_id,
      |    SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS null_text,
      |    COUNT(DISTINCT text) AS nd_text,
      |    CAST(MIN(text) AS VARCHAR) AS min_text, CAST(MAX(text) AS VARCHAR) AS max_text,
      |    SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS null_lang,
      |    COUNT(DISTINCT lang) AS nd_lang,
      |    CAST(MIN(lang) AS VARCHAR) AS min_lang, CAST(MAX(lang) AS VARCHAR) AS max_lang,
      |    SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS null_source,
      |    COUNT(DISTINCT source) AS nd_source,
      |    CAST(MIN(source) AS VARCHAR) AS min_source, CAST(MAX(source) AS VARCHAR) AS max_source,
      |    SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS null_n_chars,
      |    COUNT(DISTINCT n_chars) AS nd_n_chars,
      |    CAST(MIN(n_chars) AS VARCHAR) AS min_n_chars, CAST(MAX(n_chars) AS VARCHAR) AS max_n_chars
      |  FROM documents)
      |SELECT col, CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,
      |  CAST(n_distinct AS BIGINT) AS n_distinct, min_v, max_v FROM (
      |  SELECT 'doc_id' AS col, n, null_doc_id AS n_null, nd_doc_id AS n_distinct,
      |    min_doc_id AS min_v, max_doc_id AS max_v FROM s
      |  UNION ALL SELECT 'lang', n, null_lang, nd_lang, min_lang, max_lang FROM s
      |  UNION ALL SELECT 'n_chars', n, null_n_chars, nd_n_chars, min_n_chars, max_n_chars FROM s
      |  UNION ALL SELECT 'source', n, null_source, nd_source, min_source, max_source FROM s
      |  UNION ALL SELECT 'text', n, null_text, nd_text, min_text, max_text FROM s) t
      |ORDER BY col""".stripMargin) { (s, dir) =>
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = count(lit(1)).as("n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1).otherwise(0)).as(s"null_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c")))
    val one = Tables.documents(s, dir).agg(aggs.head, aggs.tail: _*)
    // one output row per column via explode over the single agg row — a
    // STRUCTURAL one-scan guarantee (a 5-branch union of the same agg
    // would lean on ReuseExchange deduplication, which a planner/config
    // change could silently break; PlanSpec pins the scan count)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("col"), col("n"),
        col(s"null_$c").cast("long").as("n_null"),
        col(s"nd_$c").cast("long").as("n_distinct"),
        col(s"min_$c").as("min_v"), col(s"max_$c").as("max_v"))): _*)).as("kv"))
      .select("kv.*").orderBy("col")
  }

  /** Referential-integrity audit across the star schema's five FK edges —
    * the data-quality gate a 100 TB ingest pipeline runs before publishing
    * a snapshot. Each edge is ONE pass over the child side: a left outer
    * join against the parent's distinct key (Catalyst broadcasts the dim
    * sides; the two fact edges shuffle on their join key, which bucketing
    * co-locates at cluster scale) folded straight into a single-row count
    * aggregate — orphan ROWS never leave the join, only counts do. A null
    * child key counts as an orphan (it references nothing), matching the
    * LEFT JOIN null-probe semantics on both engines.
    */
  val metaFkOrphans: Q = {
    // (fk_name, child table, child key, parent table, parent key)
    val edges = Seq(
      ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
    val oracle = edges.map { case (nm, ct, ck, pt, pk) =>
      s"""SELECT '$nm' AS fk_name, COUNT(*) AS n_child,
         |  CAST(count_if($pk IS NULL) AS BIGINT) AS n_orphans,
         |  ROUND(100.0 * count_if($pk IS NULL) / nullif(COUNT(*), 0), 4) AS orphan_pct
         |FROM $ct LEFT JOIN (SELECT DISTINCT $pk FROM $pt) p ON $ck = $pk""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY fk_name")
    Q("meta_fk_orphans", oracle) { (s, dir) =>
      edges.map { case (nm, ct, ck, pt, pk) =>
        Tables.load(s, dir, ct).select(col(ck))
          .join(Tables.load(s, dir, pt).select(col(pk)).distinct(),
            col(ck) === col(pk), "left_outer")
          .agg(count(lit(1)).as("n_child"), count_if(col(pk).isNull).as("n_orphans"))
          // nullif guard on BOTH sides: an empty child table must audit as
          // NULL pct, not as an engine-dependent division-by-zero result
          .select(lit(nm).as("fk_name"), col("n_child"), col("n_orphans"),
            round(lit(100.0) * col("n_orphans") / nullif(col("n_child"), lit(0)), 4)
              .as("orphan_pct"))
      }.reduce(_ unionAll _).orderBy("fk_name")
    }
  }

  /** A7 at the distribution grain: EQUI-DEPTH histogram of `value` — 8
    * bins holding ~equal row counts, the shape query optimizers and SLO
    * dashboards actually want (equi-WIDTH bins hide the tail). Bin edges
    * are the exact 1/8-quantiles (the proven percentile ↔ quantile_cont
    * pair); every row is then assigned by counting edges it exceeds. The
    * assignment runs ENTIRELY in an exact integer domain: `value` is
    * 2-decimal money (FIXTURES.md), so cents = round(value·100) is an
    * exact BIGINT, and with eighth quantiles the interpolation fraction
    * is a multiple of 1/8 — cut·8 is an integer that ROUND recovers
    * identically on both engines. (The naive double compare genuinely
    * diverged at sf0.001: Spark interpolates lo+(hi−lo)·f, DuckDB
    * (1−f)·lo+f·hi — one ulp apart at a cut that EQUALS a data value,
    * which 2-decimal data makes common.) The cutpoint row is a
    * single-row aggregate broadcast over the assignment scan (metadata
    * rebase) — two scans total, no global sort: the ntile formulation
    * would drag the whole corpus through one ordered partition, THE
    * scale anti-pattern for 100 TB distributions.
    */
  val aggEquidepthHistogram = Q(
    "agg_equidepth_histogram",
    """WITH v AS (
      |  SELECT event_id, value, CAST(ROUND(value * 100, 0) AS BIGINT) AS vc
      |  FROM events),
      |cuts AS (
      |  SELECT unnest(quantile_cont(vc, [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])) AS c
      |  FROM v),
      |c8 AS (SELECT CAST(ROUND(c * 8, 0) AS BIGINT) AS c8 FROM cuts),
      |assigned AS (
      |  SELECT v.event_id, v.value,
      |    1 + CAST(count_if(v.vc * 8 > c8.c8) AS BIGINT) AS bin
      |  FROM v, c8
      |  GROUP BY v.event_id, v.value)
      |SELECT bin, COUNT(*) AS n,
      |  ROUND(MIN(value), 2) AS lo, ROUND(MAX(value), 2) AS hi
      |FROM assigned GROUP BY bin ORDER BY bin""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir).select(col("event_id"), col("value"),
      round(col("value") * 100, 0).cast("long").as("vc"))
    val cuts = ev.agg(expr(
      "percentile(vc, array(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875))").as("cuts"))
    ev.crossJoin(broadcast(cuts))
      .select(col("value"),
        (lit(1L) + expr(
          """aggregate(cuts, 0L, (a, c) ->
            |  a + CASE WHEN vc * 8 > CAST(ROUND(c * 8, 0) AS LONG) THEN 1L ELSE 0L END)
            |""".stripMargin)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(min("value"), 2).as("lo"), round(max("value"), 2).as("hi"))
      .orderBy("bin")
  }

  /** Benford first-digit audit of `l_extendedprice` — the fraud/corruption
    * smoke test a data-quality gate runs on any organically-grown money
    * column: first significant digits of natural data follow
    * P(d) = log10(1 + 1/d), and a synthesized or truncated feed shows up
    * as a skewed digit histogram long before row-level checks fire. The
    * digit extracts in an exact domain (prices are 2-dp: cents =
    * round(p·100) is a lossless BIGINT whose decimal leading digit both
    * engines read off the same string). The expected shares are inlined
    * as IDENTICAL literals on both engines — computed once here with
    * Java's log10 — because "the same formula" is not "the same double"
    * across engines, and the chi-square contribution would otherwise
    * ride a 1-ulp split through the 4-dp rounding. One scan, partial agg
    * onto 9 digit keys, single-row total broadcast (metadata rebase).
    */
  val metaBenfordDigits: Q = {
    val expPct = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d) * 100.0).toMap
    val expCaseSql = (1 to 9)
      .map(d => s"WHEN $d THEN ${expPct(d)}").mkString("CASE digit ", " ", " END")
    Q(
      "meta_benford_digits",
      s"""WITH digits AS (
        |  SELECT CAST(substr(CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM lineitem),
        |counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
        |tot AS (SELECT SUM(n) AS total FROM counts)
        |SELECT digit, n,
        |  ROUND(100.0 * n / total, 4) AS obs_pct,
        |  ROUND($expCaseSql, 4) AS exp_pct,
        |  ROUND(power(100.0 * n / total - ($expCaseSql), 2) / ($expCaseSql), 4)
        |    AS chi2_term
        |FROM counts, tot ORDER BY digit""".stripMargin) { (s, dir) =>
      val expCol = (1 to 9).foldLeft(lit(null).cast("double")) { (acc, d) =>
        when(col("digit") === d, lit(expPct(d))).otherwise(acc)
      }
      val counts = Tables.load(s, dir, "lineitem")
        .select(substring(round(col("l_extendedprice") * 100, 0).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum("n").as("total"))
      counts.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round(lit(100.0) * col("n") / col("total"), 4).as("obs_pct"),
          round(expCol, 4).as("exp_pct"),
          round(pow(lit(100.0) * col("n") / col("total") - expCol, 2) / expCol, 4)
            .as("chi2_term"))
        .orderBy("digit")
    }
  }

  /** A2+: per-group MODE — the most frequent order priority per customer
    * nation. Spelled as count → row_number rather than a native `mode()`
    * aggregate because mode's tiebreak is engine-defined; the explicit
    * (n DESC, value ASC) rank pins the winner identically on both engines.
    * Scale: the count partial-aggregates the fact scan onto
    * (nation × priority) keys; the rank window then runs over
    * group-cardinality rows (≤ 125 here), never the fact table.
    */
  val aggMode = Q(
    "agg_mode",
    """WITH c AS (
      |  SELECT c_nationkey, o_orderpriority, COUNT(*) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT c_nationkey, o_orderpriority, n,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY n DESC, o_orderpriority) AS rn
      |  FROM c)
      |SELECT c_nationkey, o_orderpriority AS modal_priority, CAST(n AS BIGINT) AS n
      |FROM r WHERE rn = 1 ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    val counts = Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("n").desc, col("o_orderpriority"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_nationkey"), col("o_orderpriority").as("modal_priority"), col("n"))
      .orderBy("c_nationkey")
  }

  val all: Seq[Q] = Seq(
    selProject, filterPredicates, filterLikeNulls,
    joinBroadcastDim, joinFactFact, joinBucketed, joinOuter, joinSemi, joinAnti, joinCross,
    joinNullSafe, joinSaltedSkew, aggPricingSummary, aggDistinct, aggRollup, aggPercentile,
    aggArgmax, aggCollectList, aggSampleEstimate, topkGlobal, setUnion, setIntersectExcept,
    setOpsAll, aggKeySkewProfile, metaColumnProfile,
    metaFkOrphans, aggEquidepthHistogram, metaBenfordDigits, aggMode)
}
