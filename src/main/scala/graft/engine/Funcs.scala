package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function families (SURVEY.md §2.7 F4/F5) and the cube variant of
  * grouping sets (§2.4 A5) — the remaining function-surface coverage.
  * Everything here is a per-row map or a partially-aggregated groupBy;
  * nothing shuffles more than its grouping keys.
  */
object Funcs {

  /** F4: math family — abs/ln/pow/ceil/floor/sqrt/round, all double math
    * with identical evaluation shape both engines.
    */
  val mathFuncs = Q(
    "func_math",
    """SELECT l_orderkey, l_linenumber,
      |  ROUND(abs(l_discount - 0.05), 4) AS abs_disc,
      |  ROUND(ln(l_extendedprice), 4) AS ln_price,
      |  ROUND(pow(l_quantity, 2), 4) AS qty_sq,
      |  CAST(ceil(l_extendedprice / 100.0) AS BIGINT) AS ceil_h,
      |  CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS floor_h,
      |  ROUND(sqrt(l_quantity), 4) AS sqrt_qty
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 4).as("abs_disc"),
        round(log(col("l_extendedprice")), 4).as("ln_price"),
        round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
        ceil(col("l_extendedprice") / 100.0).as("ceil_h"),
        floor(col("l_extendedprice") / 100.0).as("floor_h"),
        round(sqrt(col("l_quantity")), 4).as("sqrt_qty"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** F5: array higher-order functions — size, transform, aggregate (fold),
    * array_max, element access — over the embedding vectors. (The hot-path
    * equivalents live in graft.functions.VectorExprs; this pins the HOF
    * surface itself.)
    */
  val arrayFuncs = Q(
    "func_array",
    """SELECT vec_id,
      |  CAST(len(embedding) AS INTEGER) AS dim,
      |  ROUND(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'), 4) AS sumsq,
      |  ROUND(list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'max'), 4) AS max_abs,
      |  ROUND(embedding[1]::DOUBLE, 4) + 0 AS first_val
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
    // `+ 0` on first_val: a tiny negative first element rounds to IEEE
    // -0.0 in DuckDB but to +0.0 through Spark's BigDecimal round; adding
    // positive zero maps -0.0 → +0.0 (IEEE addition) on both engines so
    // the dumped strings agree. Found at sf0.1 — sf0.01 has no such value,
    // which is why the gate alone can't be trusted for sign-of-zero.
    val asDouble = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(aggregate(transform(asDouble, x => x * x), lit(0.0), (acc, v) => acc + v), 4)
          .as("sumsq"),
        round(array_max(transform(asDouble, x => abs(x))), 4).as("max_abs"),
        (round(element_at(col("embedding"), 1).cast("double"), 4) + lit(0.0)).as("first_val"))
      .orderBy("vec_id")
  }

  /** F1: string family — case, pad, split_part, position, translate,
    * reverse, edit distance. Same names and 1-based indexing both engines.
    */
  val stringFuncs = Q(
    "func_string",
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_u,
      |  lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
      |  split_part(p_type, ' ', 1) AS type_head,
      |  CAST(strpos(p_type, 'BRUSHED') AS INTEGER) AS brushed_pos,
      |  translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
      |  reverse(p_brand) AS brand_rev,
      |  CAST(levenshtein(p_brand, 'Brand#11') AS INTEGER) AS lev_brand
      |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lpad(col("p_size").cast("string"), 3, "0").as("size_pad"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        instr(col("p_type"), "BRUSHED").cast("int").as("brushed_pos"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_tr"),
        reverse(col("p_brand")).as("brand_rev"),
        levenshtein(col("p_brand"), lit("Brand#11")).cast("int").as("lev_brand"))
      .orderBy("p_partkey")
  }

  /** F6 (map surface): `from_json` into MapType, then key/value access —
    * the schema-on-read shape for semi-structured props at query time.
    */
  val mapFuncs = Q(
    "func_map",
    """SELECT event_id,
      |  CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
      |  json_keys(props)[1] AS first_key,
      |  CAST(props->>'$.k' AS INT) AS k_val
      |FROM events WHERE event_id <= 1000 ORDER BY event_id""".stripMargin) { (s, dir) =>
    val m = from_json(col("props"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType))
    Tables.events(s, dir)
      .filter(col("event_id") <= 1000)
      .select(
        col("event_id"),
        size(map_keys(m)).as("n_keys"),
        element_at(map_keys(m), 1).as("first_key"),
        element_at(m, element_at(map_keys(m), 1)).as("k_val"))
      .orderBy("event_id")
  }

  /** A5 (grouping-sets variant): explicit subtotal lattice — (status,
    * priority), (status), () — i.e. rollup minus the priority-only level,
    * which neither rollup nor cube can express.
    */
  val aggGroupingSets = Q(
    "agg_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  ROUND(SUM(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  /** A1 (pivot variant): priority classes pivoted to columns. Pivot values
    * are pinned explicitly — at scale an unpinned pivot runs a distinct
    * scan first; pinning keeps it one pass.
    */
  val aggPivot = Q(
    "agg_pivot",
    """SELECT o_orderstatus,
      |  ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 0), 2) AS urgent,
      |  ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 0), 2) AS medium,
      |  ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 0), 2) AS low
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    // The 0-for-empty default must be applied AFTER the pivot: for a
    // (status, priority) combination with no input rows PivotFirst emits
    // NULL without ever running the inner aggregate, so a coalesce inside
    // the agg would never fire — while the oracle's conditional-SUM form
    // coalesces the final value.
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", Seq("1-URGENT", "3-MEDIUM", "5-LOW"))
      .agg(round(sum("o_totalprice"), 2))
      .withColumnsRenamed(Map("1-URGENT" -> "urgent", "3-MEDIUM" -> "medium", "5-LOW" -> "low"))
      .select(col("o_orderstatus"),
        coalesce(col("urgent"), lit(0d)).as("urgent"),
        coalesce(col("medium"), lit(0d)).as("medium"),
        coalesce(col("low"), lit(0d)).as("low"))
      .orderBy("o_orderstatus")
  }

  /** A1 (statistical): sample stddev/variance, correlation, covariance.
    * Computed over unit-scale columns (quantity, discount) — second-moment
    * aggregates over large-magnitude doubles would surface summation-order
    * noise above the 4-dp round that keeps the two engines hash-equal.
    */
  val aggStats = Q(
    "agg_stats",
    """SELECT l_returnflag,
      |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
      |  ROUND(var_samp(l_quantity), 4) AS var_qty,
      |  ROUND(corr(l_quantity, l_discount), 4) + 0 AS corr_qd,
      |  ROUND(covar_samp(l_quantity, l_discount), 4) + 0 AS cov_qd
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    // `+ 0` on the signed statistics: a correlation/covariance that rounds
    // to zero from below is IEEE -0.0 in DuckDB but +0.0 via Spark's
    // BigDecimal round; adding positive zero normalizes both (same fix as
    // func_array.first_val — see its comment).
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp("l_quantity"), 4).as("sd_qty"),
        round(var_samp("l_quantity"), 4).as("var_qty"),
        (round(corr("l_quantity", "l_discount"), 4) + lit(0.0)).as("corr_qd"),
        (round(covar_samp("l_quantity", "l_discount"), 4) + lit(0.0)).as("cov_qd"))
      .orderBy("l_returnflag")
  }

  /** A9 (string form): ordered string aggregation — deterministic because
    * the element order is pinned by the sort, not accumulation order.
    */
  val aggStringAgg = Q(
    "agg_string_agg",
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
    Tables.nation(s, dir)
      .groupBy("n_regionkey")
      .agg(array_join(sort_array(collect_list("n_name")), ",").as("nations"))
      .orderBy("n_regionkey")
  }

  /** F3: date/time arithmetic family — extract, shift, month end, day
    * diffs. Integer parts are cast to INTEGER on both sides (DuckDB
    * extracts as BIGINT, Spark as INT) and DuckDB's Sunday=0 weekday is
    * shifted to Spark's Sunday=1.
    */
  val dateFuncs = Q(
    "func_date",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(month(o_orderdate) AS INTEGER) AS mo,
      |  CAST(day(o_orderdate) AS INTEGER) AS dom,
      |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
      |  CAST(CAST(o_orderdate AS DATE) + 7 AS TIMESTAMP) AS ship_by,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95
      |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_add(col("o_orderdate"), 7).cast("timestamp").as("ship_by"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("int")
          .as("days_since_95"))
      .orderBy("o_orderkey")
  }

  /** P2 (scalar subquery): orders 1.5× above the average price. The
    * average joins in as a broadcast single-row aggregate (Catalyst plans
    * the subquery the same way), so the fact table is scanned once with
    * the comparison fused into the scan filter stage. The threshold is
    * rounded to cents on both sides so parallel-vs-sequential summation
    * noise in AVG cannot flip a boundary row.
    */
  val filterScalarSubquery = Q(
    "filter_scalar_subquery",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > ROUND((SELECT AVG(o_totalprice) FROM orders) * 1.5, 2)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val threshold = o.agg(round(avg("o_totalprice") * 1.5, 2).as("thr"))
    o.join(broadcast(threshold), col("o_totalprice") > col("thr"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** A5 (cube variant): all four grouping levels over status × priority. */
  val aggCube = Q(
    "agg_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  ROUND(SUM(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  /** A1 reshape: unpivot (melt) — the inverse of `agg_pivot`, turning the
    * per-flag sum columns into (metric, val) rows. Spark's `unpivot` is a
    * local per-row expansion (an Expand node — no shuffle, no join); the
    * oracle spells it as the portable UNION ALL.
    */
  val unpivotMetrics = Q(
    "func_unpivot",
    """WITH w AS (
      |  SELECT l_returnflag,
      |    ROUND(SUM(l_quantity), 4) AS sum_qty,
      |    ROUND(SUM(l_extendedprice), 4) AS sum_price
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, metric, val FROM (
      |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM w
      |  UNION ALL
      |  SELECT l_returnflag, 'sum_price' AS metric, sum_price AS val FROM w) u
      |ORDER BY l_returnflag, metric""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_price"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")),
        "metric", "val")
      .orderBy("l_returnflag", "metric")
  }

  /** A1 boolean family: bool_and / bool_or / conditional counts — the
    * assertion aggregates data-quality checks use ("EVERY partition row
    * passed"). All partial-aggregate-friendly.
    */
  val aggBool = Q(
    "agg_bool",
    """SELECT o_orderpriority,
      |  bool_and(o_totalprice > 1000) AS all_over_1k,
      |  bool_or(o_orderstatus = 'F') AS any_final,
      |  CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_orderstatus") === "F").as("any_final"),
        sum(when(col("o_totalprice") > 100000, 1L).otherwise(0L)).as("n_big"))
      .orderBy("o_orderpriority")
  }

  /** F4 bitwise family: and/or/xor/shifts/popcount — the primitives the
    * simhash and banding operators build on, exposed as a first-class
    * surface.
    */
  val bitwiseFuncs = Q(
    "func_bitwise",
    """SELECT event_id,
      |  event_id & 255 AS band,
      |  event_id | 4096 AS or_v,
      |  xor(event_id, 1023) AS xor_v,
      |  event_id << 2 AS shl,
      |  event_id >> 3 AS shr,
      |  CAST(bit_count(event_id) AS INTEGER) AS bits
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(col("event_id") < 200)
      .select(
        col("event_id"),
        col("event_id").bitwiseAND(255).as("band"),
        col("event_id").bitwiseOR(4096).as("or_v"),
        col("event_id").bitwiseXOR(1023).as("xor_v"),
        expr("shiftleft(event_id, 2)").as("shl"),
        expr("shiftright(event_id, 3)").as("shr"),
        bit_count(col("event_id")).as("bits"))
      .orderBy("event_id")
  }

  /** F-family (decimal): fixed-point money round-trip. The corpus stores
    * money as DOUBLE (FIXTURES choice); a warehouse user's first move is
    * CAST AS DECIMAL(12,2), so this pins that the double→decimal cast
    * rounds identically on both engines and that the decimal SUM is the
    * exact fixed-point one (no float association noise — hence no ROUND
    * on the aggregate). The dump itself serializes the decimal as its
    * canonical string ("…​.40", scale visible) plus a double: the compare
    * harness can hash neither engine's native decimal (DuckDB's pandas
    * bridge degrades DECIMAL to float64; Spark dumps Decimal objects), so
    * the string column is what proves scale-2 fidelity end to end.
    */
  val decimalMoney = Q(
    "func_decimal",
    """SELECT l_returnflag,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS total_str,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_dbl,
      |  CAST(CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS VARCHAR) AS min_str,
      |  CAST(CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS VARCHAR) AS max_str
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val dec = col("l_extendedprice").cast("decimal(12,2)")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        sum(dec).cast("decimal(18,2)").cast("string").as("total_str"),
        sum(dec).cast("double").as("total_dbl"),
        min(dec).cast("decimal(12,2)").cast("string").as("min_str"),
        max(dec).cast("decimal(12,2)").cast("string").as("max_str"))
      .orderBy("l_returnflag")
  }

  /** F-family nested data: build nested structs, serialize with to_json
    * (both engines emit identical compact JSON — verified for ints,
    * strings, arrays, nesting; doubles are deliberately EXCLUDED from the
    * JSON payload because the engines' shortest-float printers disagree),
    * extract a field by direct dot access, and re-extract one through a
    * JSON path — the full struct lifecycle a log/ETL user exercises.
    * Map-only, fused into the scan.
    */
  val structFuncs = Q(
    "func_struct",
    """SELECT o_orderkey,
      |  to_json(struct_pack(key := o_orderkey, status := o_orderstatus,
      |    meta := struct_pack(prio := o_orderpriority, cust := o_custkey)))
      |    AS js,
      |  struct_extract(struct_pack(prio := o_orderpriority,
      |    cust := o_custkey), 'prio') AS direct_prio,
      |  json_extract_string(to_json(struct_pack(meta := struct_pack(
      |    prio := o_orderpriority))), '$.meta.prio') AS rt_prio
      |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val meta = struct(col("o_orderpriority").as("prio"), col("o_custkey").as("cust"))
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"),
        to_json(struct(col("o_orderkey").as("key"),
          col("o_orderstatus").as("status"), meta.as("meta"))).as("js"),
        meta.getField("prio").as("direct_prio"),
        get_json_object(to_json(struct(struct(col("o_orderpriority").as("prio"))
          .as("meta"))), "$.meta.prio").as("rt_prio"))
      .orderBy("o_orderkey")
  }

  /** lgConfigK for the HLL sketches below — 2^12 registers ≈ 1.6% standard
    * error at ~4 KB per sketch. Shared with the spec's tolerance math.
    */
  val hllLgK = 12

  /** A4 at the re-aggregation grain — the 100 TB pattern the plain
    * `agg_approx_distinct` can't show: distinct-user sketches built ONCE per
    * (event_type, day) partition, then union-merged into the coarser
    * per-type total WITHOUT touching raw events again. This is how a real
    * deployment serves "distinct users, any date range" — daily Datasketches
    * HLL sketches persisted at ~4 KB each, range queries merging sketches
    * (register-wise max, associative and order-independent) instead of
    * rescanning 100 TB. Exact rolling distinct decomposes the same way only
    * via the fan-out trick `log_rolling_wau` uses; sketches make the
    * re-aggregation O(days × 4 KB).
    *
    * Both aggregations partial-combine map-side (sketches merge in the
    * combiner). No DuckDB oracle by design: the estimate is
    * Datasketches-binary-specific; the spec pins it within the published
    * error bound of the exact count and pins union-of-daily ≡
    * sketch-of-whole-range (merge losslessness at this scale).
    */
  val hllUnionDaily = Q.noOracle("agg_hll_union_daily") { (s, dir) =>
    unionDailySketches(dailyHllSketches(s, dir))
  }

  /** The persisted-sketch grain of [[hllUnionDaily]]: one ~4 KB
    * Datasketches HLL binary per (event_type, day). This is the frame a
    * production deployment WRITES (Sinks.writeHllSketches) — the
    * registered query compresses build + merge into one plan only because
    * a Q is self-contained; the spec proves a parquet round-trip of these
    * bytes is merge-equivalent.
    */
  private[graft] def dailyHllSketches(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), hllLgK).as("sk"))

  /** The range-query side: union-merge persisted daily sketches into
    * per-type distinct estimates without touching raw events.
    */
  private[graft] def unionDailySketches(sketches: DataFrame): DataFrame =
    sketches
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"), false)).as("approx_users"))
      .orderBy("event_type")

  val all: Seq[Q] = Seq(
    mathFuncs, arrayFuncs, stringFuncs, dateFuncs, mapFuncs, aggGroupingSets,
    aggPivot, aggCube, aggStats, aggStringAgg, filterScalarSubquery,
    unpivotMetrics, aggBool, bitwiseFuncs, decimalMoney, structFuncs,
    hllUnionDaily)
}
