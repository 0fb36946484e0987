package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The raw-SQL entry surface: queries submitted as ANSI SQL text over
  * registered table views, planned by the same Catalyst session as the
  * DataFrame API (SURVEY.md §3.2 — logdb's query endpoint re-expressed as
  * `spark.sql`). The oracle strings here are intentionally (near-)identical
  * to the executed Spark SQL: the dialect overlap IS the feature.
  */
object SqlOps {

  /** Register every fixture table present under `dir` as a session view.
    * Tables whose parquet file is absent are skipped (partial corpus roots
    * — e.g. the 10× soak dir replicates only events/documents/embeddings);
    * a query touching a skipped table still fails loudly at name
    * resolution, so nothing silently reads stale state.
    *
    * Existence resolves through Hadoop's FileSystem so non-local corpus
    * roots (hdfs://, s3a://) probe the right filesystem — a bare
    * java.io.File check would report every remote table absent and
    * silently skip all views.
    *
    * Memoized per (session, corpus fingerprint) — the [[graft.GraftSession]]
    * `openedStores` discipline (r12, guide §1.2 "per-task work"): each
    * registration pays one `spark.read.parquet` footer/schema job per
    * table (~0.65 s for the ten fixture tables, measured sf0.1 local[32]),
    * and every `sql(...)` query build was re-paying it. A real engine
    * registers its catalog once per session, not once per query; the memo
    * key carries each table file's (mtime, length) so pointing the same
    * session at a different corpus root — or at the same root after a
    * fixture regeneration — re-registers instead of serving stale views.
    * Only plan METADATA is memoized: a temp view is a lazy plan, every
    * query still scans parquet at execution.
    */
  def registerViews(s: SparkSession, dir: String): Unit = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val hconf = s.sparkContext.hadoopConfiguration
    def stat(t: String): String = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) s"$t:absent"
      else { val st = fs.getFileStatus(p); s"$t:${st.getModificationTime}:${st.getLen}" }
    }
    val stats = names.map(t => t -> stat(t)).toMap
    val fingerprint = dir + "|" + names.map(stats).mkString(",")
    registeredViews.synchronized {
      if (registeredViews.get(s) == fingerprint) return
    }
    def reg(t: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      if (stats(t) != s"$t:absent") df.createOrReplaceTempView(t)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => reg(t)(Tables.load(s, dir, t)))
    reg("events")(Tables.events(s, dir))
    reg("documents")(Tables.documents(s, dir))
    reg("embeddings")(Tables.embeddings(s, dir))
    registeredViews.synchronized {
      registeredViews.put(s, fingerprint): Unit
    }
  }

  /** session → the corpus fingerprint its fixture views point at. Weak
    * keys so an entry dies with its session (the GraftSession
    * `openedStores` convention).
    */
  private val registeredViews =
    new java.util.WeakHashMap[SparkSession, String]()

  private def sql(name: String, oracle: String)(text: String): Q =
    Q(name, oracle) { (s, dir) => registerViews(s, dir); s.sql(text) }

  /** TPC-H Q3-shaped shipping-priority query, submitted as SQL text. The
    * one dialect split: Spark compares o_orderdate (a timestamp) against a
    * TIMESTAMP literal, DuckDB against the same literal — both written
    * identically below.
    */
  val shippingPriority: Q = {
    val text =
      """SELECT l_orderkey,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin
    sql("sql_shipping_priority", text)(text)
  }

  /** NOT IN with a nullable subquery — the null-aware anti-join semantics
    * SQL engines are most often wrong about: one NULL in the subquery set
    * empties the result. Both branches (null-free and null-poisoned set)
    * are counted so the oracle pins both behaviors.
    */
  val notInNulls: Q = {
    val text =
      """SELECT clean_n, poisoned_n FROM
        |  (SELECT COUNT(*) AS clean_n FROM orders
        |   WHERE o_orderstatus NOT IN
        |     (SELECT l_linestatus FROM lineitem WHERE l_linestatus = 'F')) a
        |CROSS JOIN
        |  (SELECT COUNT(*) AS poisoned_n FROM orders
        |   WHERE o_orderstatus NOT IN
        |     (SELECT nullif(l_linestatus, 'F') FROM lineitem)) b""".stripMargin
    sql("sql_not_in_nulls", text)(text)
  }

  /** TPC-H Q5-shaped local-supplier volume: the 6-table join that exercises
    * Catalyst's join reordering and broadcast selection end to end —
    * region/nation prune first (broadcastable dims), the customer⋈supplier
    * nation-equality rides the fact join, and only the date-windowed slice
    * of orders reaches the wide lineitem join. Submitted as SQL text;
    * identical text runs on both engines.
    */
  val localSupplierVolume: Q = {
    val text =
      """SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin
    sql("sql_local_supplier_volume", text)(text)
  }

  /** TPC-H Q8-shaped national market share: an 8-relation join (nation
    * aliased twice — customer's and supplier's sides resolve independently)
    * feeding a conditional-aggregate share per order year. The deepest
    * join-reorder exercise in the suite: part and region prune their fact
    * sides first, both nation aliases and region broadcast, and the
    * share division runs on two co-grouped conditional sums (one pass, no
    * self-join of the volume table). Identical text on both engines.
    */
  val marketShare: Q = {
    val text =
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
        |                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |        / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY year(o_orderdate)
        |ORDER BY o_year""".stripMargin
    sql("sql_market_share", text)(text)
  }

  /** WITH RECURSIVE (Spark 4's recursive CTE support) — BFS reachability
    * over the event-type transition graph: minimum hop count from 'signup'
    * to every reachable type. ONE SQL text runs verbatim in both engines —
    * the iterative-query surface PageRank needed 12 hand-unrolled CTEs for
    * is first-class SQL here, and the hops bound caps the path fan-out the
    * way every production recursive query must (the fixture graph is
    * cyclic; unbounded UNION ALL recursion would enumerate paths forever).
    * Self-loops are excluded from the edge set so a hop means a real
    * transition. Spark plans the recursion as iterative UnionLoop steps
    * over the same node-keyed join each round — the same shuffle shape as
    * the hand-rolled PageRank loop, chosen by the engine instead of the
    * author.
    *
    * Execution split (r12, guide §2.4/§3.3): Spark inlines the
    * single-reference CTE `e` into the recursive term, so every UnionLoop
    * round re-derived the edge set from raw events — scan + lag window +
    * DISTINCT, four times for a hops<3 recursion (the r12 before-plan
    * shows the LogicalRelation/Window/Aggregate subtree INSIDE the loop).
    * The edge derivation is loop-invariant, so the Spark side now
    * materializes it once (`localCheckpoint` — event-type-cardinality
    * rows, metadata-sized at any corpus scale) and recurses over the
    * checkpointed view; the recursion itself then joins tiny×tiny per
    * round instead of corpus×tiny. The ORACLE text is byte-identical to
    * before (DuckDB plans the same CTE its own way); result parity is the
    * t2 hash gate. Isolated sf0.1 local[32]: 2.44 s → 0.70 s median-of-5.
    */
  val recursiveReach: Q = {
    val edgeSql =
      """SELECT DISTINCT prev_type AS src, event_type AS dst FROM (
        |    SELECT event_type,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |    FROM events) t
        |  WHERE prev_type IS NOT NULL AND prev_type <> event_type""".stripMargin
    val oracle =
      s"""WITH RECURSIVE e AS (
        |  $edgeSql),
        |reach(node, hops) AS (
        |  SELECT CAST('signup' AS STRING) AS node, 0 AS hops
        |  UNION ALL
        |  SELECT e.dst AS node, r.hops + 1 AS hops
        |  FROM reach r JOIN e ON e.src = r.node
        |  WHERE r.hops < 3)
        |SELECT node, CAST(MIN(hops) AS BIGINT) AS min_hops
        |FROM reach GROUP BY node ORDER BY node""".stripMargin
    Q("sql_recursive_reach", oracle) { (s, dir) =>
      registerViews(s, dir)
      s.sql(edgeSql).localCheckpoint().createOrReplaceTempView("graft_reach_edges")
      s.sql(
        """WITH RECURSIVE reach(node, hops) AS (
          |  SELECT CAST('signup' AS STRING) AS node, 0 AS hops
          |  UNION ALL
          |  SELECT e.dst AS node, r.hops + 1 AS hops
          |  FROM reach r JOIN graft_reach_edges e ON e.src = r.node
          |  WHERE r.hops < 3)
          |SELECT node, CAST(MIN(hops) AS BIGINT) AS min_hops
          |FROM reach GROUP BY node ORDER BY node""".stripMargin)
    }
  }

  /** TPC-H Q4-shaped order-priority check: orders with any lineitem that
    * shipped more than 60 days after the order date, counted by priority.
    * The EXISTS decorrelates to a LEFT SEMI join on l_orderkey with the
    * date comparison riding the join — Catalyst never materializes the
    * subquery per row, and the semi join stops probing an order on its
    * first late lineitem. The fixture lacks TPC-H's commit/receipt dates,
    * so ship-vs-order lateness stands in for the spec's predicate; the
    * shape (correlated EXISTS over the fact-fact edge) is the point.
    * Identical text on both engines.
    */
  val orderPriority: Q = {
    val text =
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    sql("sql_order_priority", text)(text)
  }

  /** TPC-H Q13-shaped customer order-count distribution: orders-per-
    * customer histogram including the zero bucket — the LEFT JOIN keeps
    * order-less customers, COUNT(o_orderkey) (not COUNT(*)) zeroes them,
    * and the second aggregation collapses to count-cardinality rows.
    * Two hash aggs around one fact shuffle; the inner groupBy key is the
    * join key, so at cluster scale bucketing customer/orders on custkey
    * elides the exchange entirely. Identical text on both engines.
    */
  val customerDistribution: Q = {
    val text =
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin
    sql("sql_customer_distribution", text)(text)
  }

  /** TPC-H Q15-shaped top supplier: quarterly revenue per supplier, then
    * the supplier(s) AT the maximum via a scalar subquery over the same
    * derived view — Catalyst plans the max as a single-row broadcast
    * against the re-used revenue aggregate, never a per-row re-scan.
    * Revenue folds in an EXACT integer domain (price and discount are
    * 2-dp, so price×(1−disc) is 4-dp: ×10⁴ per row is a lossless BIGINT)
    * because the revenue = MAX(revenue) equality is the query's whole
    * point — double sums fold in engine-specific order, and a 1-ulp split
    * between engines at a near-tie would silently change WHICH supplier
    * wins. The per-row arithmetic is IEEE-identical on both engines; only
    * the fold order differs, and BIGINT addition is order-free.
    */
  val topSupplier: Q = {
    val text =
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS rev4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, ROUND(rev4 / 1e4, 2) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE rev4 = (SELECT MAX(rev4) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin
    sql("sql_top_supplier", text)(text)
  }

  /** TPC-H Q18-shaped large-volume orders: the HAVING-filtered quantity
    * rollup drives a semi-join back onto the order/customer detail — the
    * classic "aggregate once, then enrich the survivors" shape. The
    * filtered key set is tiny (top ~1% of orders), so at cluster scale
    * the enrichment join broadcasts the survivors while the corpus-sized
    * quantity rollup partial-aggregates map-side. Quantities are
    * integer-valued doubles in the fixture; the BIGINT cast makes the
    * sum and the 250 threshold exact on both engines.
    */
  val largeOrders: Q = {
    val text =
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
        |  ROUND(o_totalprice, 2) AS o_totalprice, CAST(sum_qty AS BIGINT) AS sum_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin
    sql("sql_large_orders", text)(text)
  }

  /** TPC-H Q22-shaped dormant high-balance customers: above-average
    * account balance AND no order since 1999 — scalar aggregate subquery
    * + NOT EXISTS, which Catalyst decorrelates to a single-row broadcast
    * and a LEFT ANTI join on the date-filtered order side. The
    * above-average comparison is cross-multiplied into integers
    * (bal_cents × n_pos > total_cents) because AVG is a fold-order-
    * dependent double: a customer sitting 1 ulp from the engine's mean
    * would otherwise flip membership between engines. The fixture lacks
    * Q22's phone column, so nationkey stands in for the country prefix;
    * the shape (scalar subquery + anti join + final rollup) is the point.
    */
  val dormantCustomers: Q = {
    val text =
      """WITH stats AS (
        |  SELECT COUNT(*) AS np,
        |    SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS tot
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  ROUND(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 1e2, 2) AS totacctbal
        |FROM customer, stats
        |WHERE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) * np > tot
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin
    sql("sql_dormant_customers", text)(text)
  }

  /** TPC-H Q10-shaped returned-item report: revenue lost to returns per
    * customer in a quarter, top 20. The ORDER BY ... LIMIT rides the
    * exact BIGINT revenue (ties broken by custkey), so the top-20 CUT
    * line is deterministic across engines — with double sums, two
    * customers straddling rank 20 by an ulp would make the page
    * contents engine-dependent. Catalyst plans the limit as
    * TakeOrderedAndProject (per-partition top-k, no global sort), and
    * the nation dim broadcasts.
    */
  val returnedItems: Q = {
    val text =
      """SELECT c_custkey, c_name, n_name,
        |  ROUND(rev4 / 1e4, 2) AS revenue, ROUND(c_acctbal, 2) AS c_acctbal
        |FROM (
        |  SELECT c_custkey, c_name, c_acctbal, c_nationkey,
        |    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS rev4
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |  GROUP BY c_custkey, c_name, c_acctbal, c_nationkey) t
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY rev4 DESC, c_custkey
        |LIMIT 20""".stripMargin
    sql("sql_returned_items", text)(text)
  }

  /** TPC-H Q6-shaped forecasting-revenue change: one map-only
    * filter + global sum over the fact table — the canonical "does the
    * predicate reach the scan" probe (all three filters are scan-pushable;
    * PLANS.md shows PushedFilters carrying every one). Revenue is summed
    * as exact 1e-4-quantized BIGINTs (fold-order-free) with ONE double
    * division at the end. The discount bounds compare the parquet doubles
    * both engines read identically — the fixture's discounts are 11
    * discrete values, so no boundary ulp exists to split on. 100 TB: no
    * shuffle at all beyond the single-row final combine.
    */
  val forecastRevenue: Q = {
    val text =
      """SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000, 0)
        |  AS BIGINT)) / 1e4, 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin
    sql("sql_forecast_revenue", text)(text)
  }

  /** TPC-H Q7-shaped volume shipping: bidirectional trade between two
    * nation groups by ship year (groups rather than Q7's single pair so
    * the tiny sf0.001 smoke fixture still populates every group key).
    * The nation dim joins twice under DIFFERENT aliases
    * (supplier's and customer's side); the pair predicate is an OR of the
    * two directions, evaluated after both broadcasts — the facts shuffle
    * only on their join keys, never on the nation filter. Revenue rides
    * the exact-BIGINT quantization; group keys (two names + year) are
    * discrete, so the whole row is deterministic.
    */
  val volumeShipping: Q = {
    val text =
      """SELECT supp_nation, cust_nation, l_year, ROUND(rev4 / 1e4, 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
        |      AS BIGINT)) AS rev4
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name IN ('NATION_20', 'NATION_21')
        |          AND n2.n_name IN ('NATION_11', 'NATION_19'))
        |      OR (n1.n_name IN ('NATION_11', 'NATION_19')
        |          AND n2.n_name IN ('NATION_20', 'NATION_21')))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1, 2, 3) t
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
    sql("sql_volume_shipping", text)(text)
  }

  /** TPC-H Q14-shaped promotion-revenue share: the month's revenue from
    * PROMO-type parts as a percentage of all revenue — a conditional
    * aggregate over ONE fact⋈dim join (part broadcasts; the date filter
    * prunes the fact scan first). Both numerator and denominator are
    * exact-BIGINT sums co-grouped in one pass (no second scan, no
    * self-join); the share is ONE double division rounded to 4 dp.
    */
  val promoRevenue: Q = {
    val text =
      """SELECT ROUND(1e2 * SUM(CASE WHEN p_type = 'PROMO' THEN r4 ELSE 0 END)
        |  / SUM(r4), 4) AS promo_revenue
        |FROM (
        |  SELECT l_partkey,
        |    CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT) AS r4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00') l
        |JOIN part ON l_partkey = p_partkey""".stripMargin
    sql("sql_promo_revenue", text)(text)
  }

  /** TPC-H Q17-shaped small-quantity-order revenue: lineitems of one
    * brand whose quantity is below 20% of that part's average quantity.
    * The correlated scalar subquery is spelled as a per-part (count, sum)
    * aggregate joined back — Catalyst's decorrelation target — and the
    * "below 20% of avg" test runs ENTIRELY in integers
    * (5·qty·n < Σqty, using the fixture's integer-valued quantities), so
    * no row can flip membership on a double-average ulp between engines.
    * Scale: the per-part aggregate partial-aggregates the fact scan onto
    * part keys before the join; the brand filter broadcasts through part.
    */
  val smallQuantityRevenue: Q = {
    val text =
      """WITH pq AS (
        |  SELECT l_partkey AS a_partkey, COUNT(*) AS n_li,
        |    SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS sum_q
        |  FROM lineitem GROUP BY 1)
        |SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT))
        |  / 7.0 / 1e4, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN pq ON a_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND CAST(ROUND(l_quantity, 0) AS BIGINT) * 5 * n_li < sum_q""".stripMargin
    sql("sql_small_quantity_revenue", text)(text)
  }

  /** TPC-H Q19-shaped discounted revenue: an OR-of-ANDs predicate mixing
    * part attributes (brand, size) with lineitem attributes (quantity) —
    * the disjunction cannot prune either scan alone, so the plan's shape
    * is the point: ONE part⋈lineitem hash join with the residual
    * disjunction evaluated post-join, never three unioned scans and never
    * a nested loop. Quantity bounds are integers; revenue is the exact
    * quantized sum.
    */
  val discountedRevenue: Q = {
    val text =
      """SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
        |  AS BIGINT)) / 1e4, 2) AS revenue
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin
    sql("sql_discounted_revenue", text)(text)
  }

  /** TPC-H Q21-shaped suppliers-who-kept-orders-waiting: for finalized
    * orders, count per supplier the late lineitems where that supplier was
    * the ONLY late one in a multi-supplier order — an EXISTS and a NOT
    * EXISTS against the SAME fact under different alias conditions, the
    * one classic join shape the suite still lacked. Catalyst decorrelates
    * both into hashed LEFT SEMI / LEFT ANTI joins on l_orderkey with the
    * supplier-inequality and lateness predicates riding the join — never a
    * per-row subquery. The fixture lacks commit/receipt dates, so
    * ship-more-than-60-days-after-order stands in for lateness (the
    * sql_order_priority convention); the shape is the point. At cluster
    * scale all three lineitem sides shuffle on the SAME l_orderkey key —
    * orderkey bucketing would make every probe co-located.
    */
  val waitingSuppliers: Q = {
    val text =
      """SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name, n_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin
    sql("sql_waiting_suppliers", text)(text)
  }

  /** TPC-H Q2-shaped minimum-cost supplier: for each small part, the
    * supplier(s) whose unit cost equals the part's minimum — the
    * correlated scalar-MIN-over-a-subquery shape Q2 exists to exercise.
    * Catalyst decorrelates the scalar subquery into a per-part MIN
    * aggregate joined back on p_partkey (never a per-row re-scan; the
    * registry-wide no-BNLJ gate pins it). The fixture lacks partsupp, so
    * per-(part, supplier) unit cost derives from lineitem as
    * MIN(l_extendedprice / l_quantity): each division runs on the same
    * parquet doubles in both engines (IEEE-identical per row) and MIN is
    * fold-order-free, so the equality against the correlated minimum can
    * never split on an ulp the way SUM/AVG comparisons would.
    */
  val minCostSupplier: Q = {
    val text =
      """WITH pcost AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p_partkey, s_suppkey, p_brand, s_name,
        |  ROUND(unit_cost, 4) AS unit_cost
        |FROM part
        |JOIN pcost ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE p_size <= 5
        |  AND unit_cost = (SELECT MIN(pc2.unit_cost) FROM pcost pc2
        |                   WHERE pc2.l_partkey = p_partkey)
        |ORDER BY p_partkey, s_suppkey
        |LIMIT 100""".stripMargin
    sql("sql_min_cost_supplier", text)(text)
  }

  /** TPC-H Q16-shaped parts/supplier relationship count: distinct
    * suppliers per (brand, type, size) bucket, excluding a NOT IN
    * supplier set — the count-distinct rollup over a semi-structured
    * exclusion that Q16 exercises. The fixture lacks partsupp, so the
    * part↔supplier relation derives from lineitem edges, and the
    * excluded set is low-balance suppliers (the fixture lacks comments).
    * The NOT IN subquery is null-free by construction (keys), so it
    * plans as a plain anti join, not the null-aware form; the final
    * ORDER BY carries every group key so the top-30 cut is deterministic.
    */
  val partsSupplierCount: Q = {
    val text =
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 30""".stripMargin
    sql("sql_parts_supplier_count", text)(text)
  }

  /** TPC-H Q20-shaped high-volume part suppliers: suppliers who shipped
    * more than a threshold quantity of some 'a'-named part in 1996 — the
    * NESTED IN-chain (supplier IN (fact rollup WHERE part IN (dim
    * filter))) Q20 exists to exercise, each level decorrelating to a
    * semi join (part filter broadcasts into the fact scan; the HAVING
    * rollup partial-aggregates onto (supp, part) keys before the outer
    * semi probe). Quantities are integer-exact BIGINTs, so the threshold
    * cannot ulp-split engines. The fixture lacks partsupp availqty; a
    * fixed threshold stands in for 50% of stock — the shape is the point.
    */
  val excessVolumeSuppliers: Q = {
    val text =
      """SELECT s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%a%')
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 80)
        |ORDER BY s_name""".stripMargin
    sql("sql_excess_volume_suppliers", text)(text)
  }

  /** TPC-H Q9-shaped product-type profit: per (supplier nation, order
    * year) profit on one part-name family — the 5-relation join whose
    * point is that the profit expression spans BOTH fact-side prices and
    * dim-side costs, so join order matters (part's name filter must prune
    * the fact first; nation broadcasts last). The fixture lacks
    * partsupp.ps_supplycost, so 0.6 × p_retailprice × quantity stands in
    * for cost. Profit is quantized to exact BIGINTs before the SUM (the
    * suite's fold-order-free revenue discipline — profit can be negative,
    * and ROUND-half-away agrees on both engines for either sign).
    */
  val productProfit: Q = {
    val text =
      """SELECT n_name, o_year, ROUND(profit4 / 1e4, 2) AS profit
        |FROM (
        |  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
        |          - 0.6 * p_retailprice * l_quantity) * 10000, 0) AS BIGINT)) AS profit4
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%blue%'
        |  GROUP BY 1, 2) t
        |ORDER BY n_name, o_year DESC""".stripMargin
    sql("sql_product_profit", text)(text)
  }

  /** TPC-H Q11-shaped value concentration: the (part) holdings worth more
    * than a fixed fraction of a nation group's TOTAL — the
    * scalar-subquery-in-HAVING shape (the group filter compares against a
    * global aggregate over the same derived view, which Catalyst plans as
    * a single-row broadcast over the reused rollup, never a re-scan).
    * Values are exact quantized BIGINTs and the fraction test is the
    * integer cross-product SUM(val)·1000 > total, so no group can flip on
    * a double ulp. The fixture lacks partsupp; lineitem revenue per
    * (supplier, part) stands in for stock value.
    */
  val valueConcentration: Q = {
    val text =
      """WITH v AS (
        |  SELECT l_suppkey, l_partkey,
        |    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS val4
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |  GROUP BY 1, 2)
        |SELECT l_partkey, CAST(SUM(val4) AS BIGINT) AS value4
        |FROM v
        |GROUP BY l_partkey
        |HAVING SUM(val4) * 1000 > (SELECT SUM(val4) FROM v)
        |ORDER BY value4 DESC, l_partkey""".stripMargin
    sql("sql_value_concentration", text)(text)
  }

  val all: Seq[Q] = Seq(shippingPriority, notInNulls, localSupplierVolume, marketShare,
    recursiveReach, orderPriority, customerDistribution,
    topSupplier, largeOrders, dormantCustomers, returnedItems,
    forecastRevenue, volumeShipping, promoRevenue, smallQuantityRevenue,
    discountedRevenue, waitingSuppliers, minCostSupplier,
    partsSupplierCount, excessVolumeSuppliers, productProfit, valueConcentration)
}
