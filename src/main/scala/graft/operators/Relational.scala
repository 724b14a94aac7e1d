package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.Lineage._

/** General relational/OLAP surface of the engine over the TPC-H-ish
  * tables. The reference exercises scan/filter/map/groupBy/sum/
  * distinct/sort/top-K/union (SURVEY.md §1); these queries cover that
  * operator set plus joins, windows, rollup/pivot, JSON and time
  * windows — the general engine a search pipeline sits on.
  *
  * Determinism rule for money math (SURVEY.md §6): doubles are
  * quantized per row with floor(x * 1e6) into exact BIGINT "micros"
  * before any aggregation — floor over the same IEEE double is
  * bit-identical in Spark and DuckDB, integer sums are
  * order-independent, and the single final division is deterministic.
  *
  * Scale notes per query are on each method; fixed-size dims
  * (nation/region) broadcast explicitly, while SF-scaled tables
  * (customer/supplier/part) are left to AQE/size estimates —
  * broadcast when they fit, shuffle join at large SF.
  */
object Relational {

  /** floor(x * 1e6) as exact BIGINT micros (oracle: floor(x*1000000)::BIGINT). */
  private def micros(c: org.apache.spark.sql.Column) = floor(c * lit(1000000.0)).cast("long")

  /** TPC-H Q1 shape: scan-filter + hash aggregate, fully codegen'd;
    * partial aggregation makes this a single map-side-combining
    * shuffle of 6 groups at any scale. */
  def pricingSummary(li: DataFrame): DataFrame =
    li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(micros(col("l_quantity"))).as("sum_qty_micros"),
        sum(micros(col("l_extendedprice"))).as("sum_base_micros"),
        sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_micros"),
        count(lit(1)).as("n"))

  /** Correlated-subquery shape: orders above their own customer's
    * average order value. Decorrelated into a single window pass —
    * what Catalyst does to the EXISTS/scalar-subquery form anyway,
    * written directly so the plan is one shuffle on o_custkey. */
  def aboveCustomerAverage(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
    orders
      .select(col("o_orderkey"), col("o_custkey"),
        micros(col("o_totalprice")).as("totalprice_micros"))
      // EXACT average: sum(long)/count — Spark's avg() over integral
      // input accumulates in a DOUBLE buffer, so past 2^53 total
      // micros per customer the merge order would leak ulps into the
      // > comparison; an exact long sum divided once matches DuckDB's
      // integer-accumulated avg at any magnitude
      .withColumn("cust_avg_micros",
        sum("totalprice_micros").over(w).cast("double") / count(lit(1)).over(w))
      .filter(col("totalprice_micros") > col("cust_avg_micros"))
      .select(col("o_orderkey"), col("o_custkey"), col("totalprice_micros"),
        round(col("cust_avg_micros"), 2).as("cust_avg_micros"))
  }

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    * date-filtered orders ⋈ date-filtered lineitems → per-order
    * revenue → top 10. Both date predicates push to the parquet scans;
    * the customer dim broadcasts. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01 00:00:00").cast("timestamp")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
      .filter(col("l_shipdate") > cutoff)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"))
      .select(col("l_orderkey"), col("revenue_micros"),
        // o_orderdate is TIMESTAMP_NTZ; session TZ is pinned to UTC so
        // the cast to instant is exact
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_orderpriority"))
      .orderBy(col("revenue_micros").desc, col("o_orderdate_ms").asc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q18 shape (large-volume orders): orders whose total line
    * quantity exceeds the threshold — join + aggregate + HAVING. */
  def largeVolumeOrders(spark: SparkSession, dir: String, minQty: Double = 300.0): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    li.groupBy("l_orderkey")
      .agg(sum(micros(col("l_quantity"))).as("sum_qty_micros"))
      .filter(col("sum_qty_micros") > (minQty * 1e6).toLong)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        micros(col("o_totalprice")).as("totalprice_micros"), col("sum_qty_micros"))
  }

  /** TPC-H Q5 shape. Catalyst does not reorder user joins, so the
    * ASIA restriction is applied BEFORE any fact shuffle (the
    * [[localSupplierVolume]] pattern): region⋈nation collapses to a
    * handful of ASIA nation keys computed once and broadcast into a
    * LEFT SEMI restriction of customer; orders joins the restricted
    * customer FIRST, so only ~1/5 of orders (and then of lineitem
    * rows) ride the big orderkey shuffle — at 100 TB that is the
    * difference between shuffling 20 TB and 100 TB of fact rows. The
    * nation-name decode is a final broadcast lookup on the already
    * -reduced rows. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val asiaN = n.join(broadcast(r.filter(col("r_name") === "ASIA")),
        n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(asiaN.select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"), "left_semi")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(li, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"),
        count(lit(1)).as("n_items"))
  }

  /** Global top-N: per-partition top-N then driver merge (TakeOrdered). */
  def topOrders(orders: DataFrame, n: Int = 10): DataFrame =
    orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(n)

  /** Window functions: rank + running micros sum per customer. The
    * running sum is ordered (ts, key) so it is deterministic; micros
    * keep it engine-portable (DuckDB windows may tree-aggregate). */
  def customerOrderWindows(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders
      .withColumn("order_rank", row_number().over(w))
      .withColumn("running_spend_micros",
        sum(micros(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("o_custkey", "o_orderkey", "order_rank", "running_spend_micros")
  }

  /** distinct + countDistinct per group. */
  def eventTypeStats(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))

  /** EXISTS — left-semi join (never materializes the right side). */
  def customersWithBigOrders(spark: SparkSession, dir: String, minTotal: Double = 450000.0): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name")
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > minTotal).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
  }

  /** NOT EXISTS — left-anti join: orders that shipped nothing. */
  def emptyOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, dir).select("l_orderkey")
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
  }

  /** UNION + dedup across two filtered scans. */
  def activeUsers(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "signup").select("user_id")
      .union(events.filter(col("event_type") === "purchase").select("user_id"))
      .distinct()

  /** ROLLUP hierarchy over (returnflag, linestatus). */
  def returnsRollup(li: DataFrame): DataFrame =
    li.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(micros(col("l_quantity"))).as("sum_qty_micros"))

  /** PIVOT via conditional aggregation (portable to ANSI SQL). */
  def statusPivot(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(
        sum(when(col("l_linestatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("n_finished"))

  /** JSON extraction from events.props. */
  def propsK(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))

  /** Tumbling 1-hour window aggregation over events. `ts` is epoch
    * nanos (long); window start in epoch millis. Batch analogue of the
    * streaming windowed word count. */
  def hourlyEventStats(events: DataFrame): DataFrame =
    events
      .withColumn("win_start_ms", expr("ts div 3600000000000") * lit(3600000L))
      .groupBy("win_start_ms", "event_type")
      .agg(count(lit(1)).as("n"), sum(micros(col("value"))).as("sum_value_micros"))

  /** (win_start_ms, event_type, n, sum_value_micros): HOPPING (sliding)
    * 1-hour windows every 30 minutes via Spark's native `window()` —
    * each event lands in exactly windowLen/slide = 2 windows, which the
    * planner expands inline (no self-join). Same shuffle profile as the
    * tumbling [[hourlyEventStats]], at 2× the pre-aggregation rows —
    * the standard trade for overlap-smoothed time series. */
  def hoppingEventStats(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour", "30 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(micros(col("value"))).as("sum_value_micros"))
      .select(unix_millis(col("win.start")).as("win_start_ms"), col("event_type"),
        col("n"), col("sum_value_micros"))

  /** As-of (point-in-time) join: for each `left` event, the latest
    * `right` event at or before it per user — here, the latest click
    * before each purchase. Spark has no asof-join operator; the
    * scalable formulation is a tagged union + one window pass: a
    * single shuffle on user_id, running max(struct(ts, event_id)) over
    * the click rows, no range-join row explosion. Ties are totally
    * ordered by (ts, event_id), so the result is deterministic. */
  def asOfJoin(events: DataFrame,
               leftType: String = "purchase", rightType: String = "click"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col("event_type").isin(leftType, rightType))
      .select("user_id", "event_id", "ts", "event_type")
      .withColumn("click_ref",
        max(when(col("event_type") === rightType,
          struct(col("ts"), col("event_id")))).over(w))
      .filter(col("event_type") === leftType)
      .select(col("user_id"),
        col("event_id").as("purchase_event_id"),
        expr("ts div 1000000").as("purchase_ts_ms"),
        col("click_ref.event_id").as("click_event_id"),
        expr("click_ref.ts div 1000000").as("click_ts_ms"))
  }

  /** CUBE over (returnflag, linestatus): all 2^2 grouping combinations
    * in ONE pass — Catalyst expands the cube into a single Expand +
    * hash aggregate, so the data is scanned once however many grouping
    * sets there are. grp_id is computed from the ANSI convention
    * (bit = 1 when the column is aggregated away) via explicit CASE so
    * the oracle is engine-convention-independent (the source columns
    * are non-null, so NULL marks the aggregated dimension). */
  def returnsCube(li: DataFrame): DataFrame =
    li.cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(micros(col("l_quantity"))).as("sum_qty_micros"))
      .withColumn("grp_id",
        (when(col("l_returnflag").isNull, 2L).otherwise(0L) +
          when(col("l_linestatus").isNull, 1L).otherwise(0L)))
      .select("l_returnflag", "l_linestatus", "grp_id", "n", "sum_qty_micros")

  /** GROUPING SETS ((returnflag), (linestatus), ()): the general form
    * cube/rollup specialize. Same single-scan Expand plan — NOT a
    * union of three aggregations (which would scan three times). */
  def groupingSetsAgg(li: DataFrame): DataFrame =
    li.groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(micros(col("l_quantity"))).as("sum_qty_micros"))

  /** FULL OUTER join: per-day order counts vs per-day ship counts —
    * days with orders but no ships and vice versa both survive with
    * nulls. Both sides pre-aggregate to day cardinality BEFORE the
    * join (aggregate-then-join), so the shuffle moves day-level rows,
    * not fact rows. */
  def dailyOrderShipBalance(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val l = Tables.lineitem(spark, dir)
      .groupBy(expr("unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000").as("day"))
      .agg(count(lit(1)).as("n_ships"))
    o.join(l, Seq("day"), "full_outer")
      .select(col("day"), col("n_orders"), col("n_ships"))
  }

  /** Point-in-interval (range) join via spatial BINNING: each band
    * interval is exploded to the fixed-width buckets it covers, the
    * probe side computes its bucket, and the join becomes an EQUI-join
    * on bucket plus a residual filter. The bands here are broadcast-
    * small, but the binning shape is the 100 TB contract: when BOTH
    * sides are large an interval join degenerates to a nested-loop
    * unless it is re-keyed to something shuffle-partitionable — the
    * bucket is that key, and bucket width tunes fan-out vs selectivity. */
  def priceBandJoin(li: DataFrame): DataFrame = {
    val spark = li.sparkSession
    import spark.implicits._
    val bands = Seq(
      (1L, 0.0, 20000.0), (2L, 20000.0, 55000.0),
      (3L, 55000.0, 90000.0), (4L, 90000.0, 200000.0))
      .toDF("band_id", "lo", "hi")
    val width = 5000.0
    // hi is EXCLUSIVE, so its bucket is ceil(hi/width)-1 — covers any
    // band definition, aligned to the bucket width or not
    val bandBuckets = bands.withColumn("bucket",
      explode(sequence(floor(col("lo") / width).cast("long"),
        (ceil(col("hi") / width) - lit(1)).cast("long"))))
    li.select(col("l_orderkey"), col("l_extendedprice"))
      .withColumn("bucket", floor(col("l_extendedprice") / width).cast("long"))
      .join(broadcast(bandBuckets), "bucket")
      .filter(col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"), sum(micros(col("l_extendedprice"))).as("sum_price_micros"))
  }

  /** The shared corr/covar arithmetic: one double expression over the
    * exact DECIMAL sums, written ONCE so the Spark plan and the DuckDB
    * oracle evaluate the identical IEEE expression tree. */
  private[graft] val CorrExpr =
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
  private[graft] val CovarExpr =
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))"

  /** Pearson correlation + sample covariance of (quantity, price) per
    * returnflag — computed from EXACT decimal sums (sum/sum-of-squares
    * /cross-sum are order-independent integers in scaled decimal), with
    * ONE double expression at the end. The built-in corr() streams
    * doubles and its result depends on partition merge order — fine for
    * analytics, wrong for a cross-engine hash gate; this formulation is
    * deterministic at any parallelism, the same trick as floor-micros
    * money math (SURVEY §6). */
  def quantityPriceCorr(li: DataFrame): DataFrame =
    li.select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round(expr(CorrExpr), 6).as("corr_qty_price"),
        round(expr(CovarExpr), 6).as("covar_qty_price"))

  /** Window-function breadth: quartile bucket (ntile), percent_rank
    * and gap-to-previous (lag) per customer, all over ONE window sort —
    * a single shuffle on o_custkey serves all three. Ordering is total
    * (micros, orderkey) so every function is deterministic. */
  def orderQuartiles(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("totalprice_micros").desc, col("o_orderkey").asc)
    orders
      .select(col("o_orderkey"), col("o_custkey"),
        micros(col("o_totalprice")).as("totalprice_micros"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("gap_micros",
        lag(col("totalprice_micros"), 1).over(w) - col("totalprice_micros"))
  }

  /** Per-group z-score outliers (|x − μ| > 2σ) with NO floating-point
    * statistics: the predicate (n·x − S1)² > 4·(n·S2 − S1²) is algebra
    * over exact integer sums of milli-quantized values, evaluated in
    * doubles only at the final comparison (IEEE ops over identical
    * exact inputs → identical in any engine). Group stats are
    * group-cardinality rows → broadcast back into the scan; the whole
    * operator is two passes and zero wide shuffles. */
  def valueOutliers(events: DataFrame): DataFrame = {
    val e = events.select(col("event_id"), col("event_type"),
      floor(col("value") * lit(1000.0)).cast("long").as("v_milli"))
    // s2 sums SQUARES of milli values: a long sum overflows around
    // 3e7 rows/group at value≈1000, where DuckDB's sum(BIGINT)
    // silently promotes to HUGEINT — sum in DECIMAL(38,0) so both
    // engines stay exact to ~1e38 and the final double comparison
    // sees identical inputs at any group size
    val stats = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v_milli").as("s1"),
        sum(expr("CAST(v_milli AS DECIMAL(19,0)) * v_milli")).as("s2"))
    e.join(broadcast(stats), "event_type")
      .filter(expr(
        "CAST(n * v_milli - s1 AS DOUBLE) * CAST(n * v_milli - s1 AS DOUBLE) > " +
          "4.0 * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"))
      .select("event_id", "event_type", "v_milli")
  }

  /** SCD-2 style change intervals (gaps-and-islands): collapse each
    * user's consecutive run of the same event_type into one validity
    * interval. The island id is the row_number difference trick — two
    * window functions over the SAME (user_id, ts) sort share one
    * shuffle+sort. This is how a mutable dimension's change history is
    * reconstructed from an append-only event log at scale. */
  def typeIntervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val wt = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").asc, col("event_id").asc)
    events.select("user_id", "event_type", "ts", "event_id")
      .withColumn("island", row_number().over(w) - row_number().over(wt))
      .groupBy("user_id", "event_type", "island")
      .agg(min(expr("ts div 1000000")).as("valid_from_ms"),
        max(expr("ts div 1000000")).as("valid_to_ms"),
        count(lit(1)).as("n_events"))
      .select("user_id", "event_type", "valid_from_ms", "valid_to_ms", "n_events")
  }

  /** EXACT percentiles per group (p50/p90/p99 with linear
    * interpolation) over micro-quantized values — the exact
    * counterpart of the GK-sketch approxQuantiles: a full sort per
    * group, affordable when group cardinality is low and exactness is
    * required (the sketch is the 100 TB default). */
  def exactPercentiles(events: DataFrame): DataFrame =
    events.select(col("event_type"), micros(col("value")).as("v_micros"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(v_micros, 0.5D)"), 4).as("p50_micros"),
        round(expr("percentile(v_micros, 0.9D)"), 4).as("p90_micros"),
        round(expr("percentile(v_micros, 0.99D)"), 4).as("p99_micros"))

  /** TPC-H Q7 shape (volume shipping): the SAME dimension table joined
    * in TWO roles — supplier's nation and customer's nation — with the
    * nation-pair filter applied post-join in both directions. Both
    * nation copies broadcast (dims); the only fact-fact shuffle is
    * lineitem⋈orders on orderkey. */
  def nationVolume(spark: SparkSession, dir: String,
                   n1: String = "NATION_1", n2: String = "NATION_2"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      // each broadcast copy is pre-filtered to the two nations of
      // interest: the cross-side disjunction below cannot be pushed
      // into either join by Catalyst, and without the prefilter ~92%
      // of post-shuffle fact rows ride through both joins only to be
      // discarded (the standard Q7 formulation filters both sides)
      .join(broadcast(n.filter(col("n_name").isin(n1, n2))
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        s("s_nationkey") === col("sn_key"))
      .join(broadcast(n.filter(col("n_name").isin(n1, n2))
          .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
        c("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate").cast("timestamp")).cast("long").as("l_year"))
      .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"))
  }

  /** TPC-H Q15 shape (top supplier): global argmax WITHOUT a driver
    * collect and WITHOUT a window — the scalar max rides a partial-agg
    * tree (map-side combine all the way down) and re-joins the
    * supplier-revenue relation as a broadcast single row; a
    * partition-less window max would instead drag every supplier row
    * to one partition. Keeps ALL suppliers tied at the max, like the
    * Q15 HAVING = (SELECT max(...)) formulation. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy("l_suppkey")
      .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    val mx = rev.agg(max("revenue_micros").as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("revenue_micros") === col("max_rev"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_micros"))
  }

  /** TPC-H Q16 shape (parts/supplier relationship): count DISTINCT
    * suppliers per part attribute, excluding a supplier denylist via
    * anti-join (the NOT IN subquery form). The distinct-count shuffles
    * on the group key after the semi/anti pruning — denylists are
    * broadcast-small by nature. */
  def partSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    li.join(bad, li("l_suppkey") === bad("s_suppkey"), "left_anti")
      .join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** INTERSECT (distinct) — users present in BOTH event populations.
    * Plans as a left-semi over distinct sets; same single shuffle
    * shape as the semi-join, different dedup semantics. */
  def convertedUsers(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "signup").select("user_id")
      .intersect(events.filter(col("event_type") === "purchase").select("user_id"))

  /** EXCEPT (distinct) — users in the first population and not the
    * second (left-anti over distinct sets): clickers with no
    * high-value purchase. */
  def windowShoppers(events: DataFrame, minPurchase: Double = 150.0): DataFrame =
    events.filter(col("event_type") === "click").select("user_id")
      .except(events.filter(col("event_type") === "purchase" &&
        col("value") > minPurchase).select("user_id"))

  /** Boolean aggregates (bool_or / bool_and): per-customer order
    * profile flags. Booleans short-circuit in partial aggregation, so
    * these are as cheap as count at any scale. */
  def orderBoolProfile(orders: DataFrame): DataFrame =
    orders.groupBy("o_custkey")
      .agg(expr("bool_or(o_totalprice > 300000.0)").as("has_big_order"),
        expr("bool_and(o_orderstatus = 'O')").as("all_open"),
        count(lit(1)).as("n_orders"))

  /** Edit-distance fuzzy match against a pattern — the dedup-adjacent
    * string similarity primitive (catalog/entity reconciliation).
    * levenshtein is codegen'd and runs per row map-side; for
    * fuzzy SELF-joins at scale the LSH/banding dedup family is the
    * right tool, not a quadratic distance join. */
  def fuzzyParts(part: DataFrame, pattern: String = "red widget",
                 maxDist: Int = 5): DataFrame =
    part.select(col("p_partkey"), col("p_name"),
        levenshtein(col("p_name"), lit(pattern)).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)

  /** Ordered funnel (signup → click → purchase): each step's entry
    * time is the first qualifying event STRICTLY AFTER the previous
    * step. Three filtered aggregates chained by broadcast-sized
    * per-user timestamps — never a fact-fact shuffle beyond the
    * groupBys, and each stage's population only shrinks. */
  def funnel(events: DataFrame): DataFrame = {
    val t1 = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = events.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val t3 = events.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    t1.agg(count(lit(1)).as("n_users")).select(lit("1_signup").as("step"), col("n_users"))
      .unionByName(t2.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("step"), col("n_users")))
      .unionByName(t3.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("step"), col("n_users")))
  }

  /** Cohort retention: users bucketed by first-activity day, counted
    * per (cohort_day, day_offset). Two aggregations; the per-user
    * first-day table joins back in at user cardinality. */
  def retention(events: DataFrame): DataFrame = {
    val day = expr("ts div 86400000000000")
    val firstDay = events.groupBy("user_id").agg(min(day).as("cohort_day"))
    events.select(col("user_id"), day.as("day"))
      .join(firstDay, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Time-series gap fill: a complete daily grid per user (sequence +
    * explode between the user's first and last active day), left-join
    * the day's closing value, forward-fill with last-non-null over an
    * ordered window. Grid size is bounded by span×users, not events —
    * the standard alignment step before any per-entity time-series
    * modeling. */
  def gapFill(events: DataFrame): DataFrame = {
    val day = expr("ts div 86400000000000")
    val wDayPick = Window.partitionBy("user_id", "day")
      .orderBy(col("ts").desc, col("event_id").desc)
    val dayValue = events.select(col("user_id"), day.as("day"),
        col("ts"), col("event_id"), col("value"))
      .withColumn("__rn", row_number().over(wDayPick))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("day"), col("value").as("day_value"))
    val grid = events.groupBy("user_id")
      .agg(min(day).as("d0"), max(day).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val wFill = Window.partitionBy("user_id").orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(dayValue, Seq("user_id", "day"), "left")
      .withColumn("filled_value",
        round(last(col("day_value"), ignoreNulls = true).over(wFill), 6))
      .select(col("user_id"), col("day"), (col("day_value").isNotNull).as("observed"),
        col("filled_value"))
  }

  /** 7-day rolling revenue with RANGE semantics (value-based, so
    * missing days still count as a 6-day lookback — a ROWS frame would
    * silently widen across gaps). Instead of a partition-less RANGE
    * window (single-partition sort), each day's aggregate is EXPLODED
    * into the 7 target days it contributes to and re-aggregated on the
    * day key — a plain distributed shuffle whose width is 7× a
    * day-cardinality relation (thousands of rows at any corpus size).
    * The inner join back to `byDay` keeps exactly the observed days,
    * matching RANGE-frame output row-for-row; the rolling average
    * divides two exact integer sums (deterministic). */
  def movingRevenue(orders: DataFrame): DataFrame = {
    val byDay = orders
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000").as("day"))
      .agg(sum(micros(col("o_totalprice"))).as("rev_micros"))
    val contrib = byDay
      .select(explode(sequence(col("day"), col("day") + lit(6L))).as("day"),
        col("rev_micros").as("c_micros"))
      .groupBy("day").agg(count(lit(1)).as("n_days_in_window"),
        sum("c_micros").as("wsum_micros"))
    byDay.join(contrib, "day")
      .select(col("day"), col("rev_micros"), col("n_days_in_window"),
        round(col("wsum_micros").cast("double") / col("n_days_in_window"), 4).as("ma7_micros"))
  }

  /** Session windows via gap analysis: a new session starts after a
    * >30 min silence; one shuffle on user_id, then ordered window
    * scans (no state explosion — sessions are bounded per user). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapNs = gapMinutes * 60L * 1000000000L
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(expr("ts div 1000000")).as("start_ms"),
        max(expr("ts div 1000000")).as("end_ms"))
  }

  /** TPC-H Q5 shape (local supplier volume): 6-table join where the
    * customer's and the supplying line's nation must COINCIDE — the
    * same dim joined in two roles with an equality across the roles.
    * The region predicate is applied to supplier AND customer BEFORE
    * the fact joins (nation⋈region is a broadcast-tiny dim product):
    * Catalyst does not reorder user joins, so filtering r_name after
    * the fact joins would ride every non-ASIA supplier/customer row
    * through both fact shuffles only to discard ~80 % of them — the
    * same pre-restriction Q7 ([[nationVolume]]) and Q8
    * ([[TpcH.marketShare]]) apply. lineitem⋈orders⋈supplier shuffle on
    * their keys; customer/supplier join strategy left to AQE/size
    * estimates; the nation-equality stays a post-join filter on
    * already-restricted columns, never its own shuffle. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    // ASIA nation keys: a handful of rows, computed once and broadcast
    // into both dim restrictions below
    val asiaN = n.join(broadcast(r.filter(col("r_name") === "ASIA")),
        n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(asiaN.select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"), "left_semi")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(asiaN.select(col("n_nationkey").as("sn_key"))),
        col("s_nationkey") === col("sn_key"), "left_semi")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"))
  }

  /** TPC-H Q4 shape (order priority checking): EXISTS-subquery as a
    * LEFT SEMI join (here: orders with at least one line shipped >60
    * days after the order date), then a tiny priority rollup. The
    * semi join shuffles both sides on orderkey once; the aggregate is
    * on a 5-value key — map-side partials collapse it. */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    val late = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(late,
      o("o_orderkey") === late("l_orderkey") &&
        late("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
      "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q10 shape (returned-item reporting): revenue of RETURNED
    * lines per customer, top-20. The returnflag filter is pushed to
    * the lineitem scan (only ~25 % of rows survive), the join
    * shuffles on orderkey; customer joins AFTER the aggregate — one
    * row per customer on each side, and the strategy is left to
    * AQE/size estimates (customer is SF-scaled: broadcast when it
    * fits, shuffle join at large SF). */
  def returnedItemReporting(spark: SparkSession, dir: String, n: Int = 20): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_acctbal")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"),
        count(lit(1)).as("n_lines"))
      .join(c, col("o_custkey") === c("c_custkey"))
      .select(col("o_custkey").as("custkey"), col("c_name"),
        micros(col("c_acctbal")).as("acctbal_micros"),
        col("revenue_micros"), col("n_lines"))
      .orderBy(col("revenue_micros").desc, col("custkey").asc)
      .limit(n)
  }

  /** TPC-H Q14 shape (promotion effect): a conditional aggregate
    * ratio — promo revenue share per ship month. One scan, one
    * shuffle on the month key; the part dim rides a broadcast. The
    * share divides two exact micros sums (single final division). */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).otherwise(lit(0L)))
          .as("promo_micros"),
        sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("total_micros"))
      .withColumn("promo_share", round(col("promo_micros").cast("double") / col("total_micros"), 6))
  }

  /** Per-group argmax/argmin WITHOUT a window sort: max_by/min_by over
    * a single composite BIGINT key (acctbal micros ⋅ 2^29 + custkey).
    * One hash aggregate, map-side partials, no per-group row_number
    * pass — the cheap form of "top-1 per group" at scale.
    *
    * Determinism envelope: the key is injective (ties impossible, so
    * Spark's max_by and DuckDB's arg_max agree) while custkey < 2^29
    * (~5.4·10^8 customers ≈ TPC-H sf 3500) and |acctbal| ≤ 10^4
    * (micros ≤ 10^10, so the product stays < 2^63). Beyond that
    * envelope switch to the window-argmax form ([[topSupplier]]),
    * which has no key-packing bound. */
  def richestCustomerPerNation(customer: DataFrame): DataFrame = {
    val key = micros(col("c_acctbal")) * lit(536870912L) + col("c_custkey")
    customer.groupBy("c_nationkey")
      .agg(max_by(col("c_name"), key).as("richest"),
        min_by(col("c_name"), key).as("poorest"),
        count(lit(1)).as("n_customers"))
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("richest"), col("poorest"), col("n_customers"))
  }

  /** Running DISTINCT count over an ordered per-user window: the
    * "how many distinct event kinds has this user produced so far"
    * profile. Spark has no COUNT(DISTINCT) OVER — the same semantics
    * is an ordered collect_set whose SIZE grows monotonically; state
    * per key is bounded by the kind cardinality (5 here), so the
    * window never holds unbounded state. */
  def runningDistinctKinds(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("n_kinds", size(collect_set(col("event_type")).over(w)).cast("long"))
      .select("event_id", "user_id", "n_kinds")
  }

  /** (l_returnflag, metric, value): UNPIVOT/melt — the inverse of
    * [[statusPivot]]. A wide per-flag metric block (price micros, whole
    * quantity units, row count) folds into long (key, metric, value)
    * form — the shape feature stores and metric sinks ingest. The
    * expensive part is the upstream 6-group aggregate (one map-side
    * combining shuffle); the unpivot itself is a pure row-local
    * Expand — 3 output rows per input row, zero shuffle, never
    * corpus-sized because it runs on the aggregate. */
  def returnFlagUnpivot(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(
        sum(micros(col("l_extendedprice"))).as("price_micros"),
        sum(floor(col("l_quantity")).cast("long")).as("qty_units"),
        count(lit(1)).as("n_rows"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("price_micros"), col("qty_units"), col("n_rows")),
        "metric", "value")

  /** (lang, source, doc_ids, n_docs): sorted LISTAGG/string_agg per
    * group — the "give me the member list per dimension cell" export
    * shape. The list is ORDERED (ascending doc_id) and TRUNCATED to
    * the first `cap` members — the ANSI LISTAGG ... ON OVERFLOW
    * TRUNCATE discipline: per-group state is O(cap), so a pathological
    * group cannot balloon an aggregation buffer; n_docs still counts
    * ALL members, so truncation is visible, not silent. One hash
    * aggregate (collect_list partials combine map-side), then a pure
    * projection does sort/slice/join — no window, no second shuffle. */
  def docListBySource(docs: DataFrame, cap: Int = 100): DataFrame =
    docs.groupBy("lang", "source")
      .agg(collect_list(col("doc_id")).as("ids"), count(lit(1)).as("n_docs"))
      .select(col("lang"), col("source"),
        array_join(
          transform(slice(array_sort(col("ids")), 1, cap), _.cast("string")),
          ",").as("doc_ids"),
        col("n_docs"))

  /** (first_type, n_users): first-touch attribution — which event
    * kind FIRST touched each user, then how many users each kind
    * acquired. Per-user first op by (ts, event_id) via a rank-1
    * window: WindowGroupLimit keeps per-key state O(1) (same shape as
    * [[cdcApply]]'s last-wins, flipped to first-wins), then a 5-group
    * hash aggregate. One shuffle on user_id, one on event_type —
    * both unavoidable for the semantics. */
  def firstTouch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("event_type").as("first_type"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** (bucket, n_active): concurrency profile — how many 5-minute
    * activity intervals overlap each 1-minute wall-clock bucket. Each
    * event opens the interval [ts, ts+hold); the interval explodes
    * into the ≤ ceil(hold/bucket)+1 buckets it covers (bounded
    * fan-out — sequence() of at most 6 elements, NOT a range join),
    * then one hash aggregate counts actives per bucket. The classic
    * +1/−1 sweep needs a GLOBAL ordered window (single-partition
    * chokepoint); this bounded-explode form is a pure map + one
    * shuffle on the bucket key and holds at any event volume. `ts` is
    * epoch nanos (the [[graft.sources.Tables.events]] contract). */
  def activeIntervals(events: DataFrame,
                      holdSeconds: Long = 300L, bucketSeconds: Long = 60L): DataFrame = {
    val ns = 1000000000L
    val bucketNs = bucketSeconds * ns
    // `div`, not `/`: epoch nanos exceed 2^53, so double division
    // could land a boundary event in the wrong bucket
    val b0 = expr(s"ts div ${bucketNs}L")
    val b1 = expr(s"(ts + ${holdSeconds * ns - 1L}L) div ${bucketNs}L")
    events.select(explode(sequence(b0, b1)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_active"))
  }

  /** (hour, n_sessions, n_users): BINNED interval-overlap join — user
    * sessions ([[sessionize]] intervals) joined to "hot hours" (hour
    * buckets whose event count is ≥ 1.25× the mean non-empty-hour count)
    * on temporal OVERLAP. The generic interval-overlap predicate
    * (a.start ≤ b.end AND b.start ≤ a.end) is not an equi-join — naive
    * Spark falls back to BroadcastNestedLoopJoin, O(N·M). The scale
    * plan bins the session side by covered hour (explode bounded by
    * session span / bin width; sessions are gap-bounded) and joins on
    * the bin key — an EQUI-join that shuffles on a uniform time key.
    * A hot window is exactly one bin, so each overlapping
    * (session, window) pair materializes exactly once and no
    * post-join dedup shuffle is needed (windows spanning several bins
    * would need a distinct — the documented general form). The
    * overlap guard stays as a cheap post-join filter (here implied by
    * bin co-membership, load-bearing under wider windows). Mean
    * threshold rides a broadcast scalar. Same binning answers
    * point-in-interval and interval-interval joins at any scale. */
  def intervalJoin(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val hourMs = 3600000L
    val sessions = sessionize(events, gapMinutes)
    val hourly = events.select(expr("ts div 3600000000000").as("hour"))
      .groupBy("hour").agg(count(lit(1)).as("cnt"))
    val avgC = hourly.agg(avg(col("cnt")).as("avg_cnt"))
    val hot = hourly.crossJoin(broadcast(avgC))
      .filter(col("cnt") >= lit(1.25) * col("avg_cnt"))
      .select(col("hour"), (col("hour") * hourMs).as("w_start_ms"),
        ((col("hour") + 1) * hourMs - 1).as("w_end_ms"))
    val binned = sessions.select(col("user_id"), col("session_id"),
      col("start_ms"), col("end_ms"),
      explode(sequence(expr("start_ms div 3600000"), expr("end_ms div 3600000"))).as("hour"))
    binned.join(hot, Seq("hour"))
      .filter(col("start_ms") <= col("w_end_ms") && col("w_start_ms") <= col("end_ms"))
      .groupBy("hour")
      .agg(count(lit(1)).as("n_sessions"), countDistinct(col("user_id")).as("n_users"))
  }

  /** (user_id, a_event_id, a_ts_ms, b_event_id, b_ts_ms, c_event_id,
    * c_ts_ms, span_ms): CEP sequence-pattern matching — every match of
    * signup → click → purchase per user completing within `withinMs`
    * (default 24 h — matched to the corpus's ~11 h inter-event gaps),
    * under MATCH_RECOGNIZE "AFTER MATCH SKIP TO NEXT ROW" semantics:
    * each signup anchors its own match attempt, each later step binds
    * the EARLIEST qualifying event after the previous step (the
    * reference's Flink lineage makes CEP a first-class ask; Spark has
    * no MATCH_RECOGNIZE, so this is the scalable re-expression). Plan:
    * ONE shuffle on user_id computing, per event, the earliest
    * following b and earliest following c via forward-window
    * min(struct(ts, event_id)) (the [[asOfJoin]] trick mirrored
    * forward); the b→c chain step is an equi-join back on the bound
    * b event id — pair-bounded, no row explosion, ties totally
    * ordered by (ts, event_id). */
  def cepMatch(events: DataFrame, a: String = "signup", b: String = "click",
               c: String = "purchase", withinMs: Long = 86400000L): DataFrame = {
    val wNext = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val e = events.filter(col("event_type").isin(a, b, c))
      .select("user_id", "event_id", "ts", "event_type")
      .withColumn("next_b", min(when(col("event_type") === b,
        struct(col("ts"), col("event_id")))).over(wNext))
      .withColumn("next_c", min(when(col("event_type") === c,
        struct(col("ts"), col("event_id")))).over(wNext))
      .cutLineage()
    val anchors = e.filter(col("event_type") === a && col("next_b").isNotNull)
      .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"),
        col("next_b.event_id").as("b_id"), col("next_b.ts").as("b_ts"))
    val atB = e.filter(col("event_type") === b && col("next_c").isNotNull)
      .select(col("user_id"), col("event_id").as("b_id"),
        col("next_c.event_id").as("c_id"), col("next_c.ts").as("c_ts"))
    anchors.join(atB, Seq("user_id", "b_id"))
      .filter(col("c_ts") - col("a_ts") <= withinMs * 1000000L)
      .select(col("user_id"), col("a_id").as("a_event_id"),
        expr("a_ts div 1000000").as("a_ts_ms"),
        col("b_id").as("b_event_id"), expr("b_ts div 1000000").as("b_ts_ms"),
        col("c_id").as("c_event_id"), expr("c_ts div 1000000").as("c_ts_ms"),
        expr("(c_ts - a_ts) div 1000000").as("span_ms"))
  }

  /** (user_id, n_blocks, covered_ms): INTERVAL UNION (coverage sweep) —
    * total wall-clock each user's [ts, ts+5 min) activity intervals
    * cover once overlaps merge, plus the merged-block count (true
    * "active time" vs the naive n_events × 5 min overcount; the
    * interval-algebra complement of [[intervalJoin]]). The classic
    * sweep is sequential; the scalable form is two per-user windows:
    * a block opens where an interval's start clears the running max
    * of all PRIOR ends (strictly-before frame), block ids are the
    * running sum of those opens, and each block reduces to
    * max(end) − min(start). Work is one shuffle on user_id; every
    * window is user-partitioned — no global order anywhere. */
  def intervalUnion(events: DataFrame, lenMs: Long = 300000L): DataFrame = {
    val wPrev = Window.partitionBy("user_id")
      .orderBy(col("s").asc).rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("user_id")
      .orderBy(col("s").asc).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col("user_id"), expr("ts div 1000000").as("s"))
      .withColumn("e", col("s") + lenMs)
      .withColumn("pmax", max("e").over(wPrev))
      .withColumn("opens",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("block", sum("opens").over(wRun))
      .groupBy("user_id", "block")
      .agg(min("s").as("bs"), max("e").as("be"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_blocks"), sum(col("be") - col("bs")).as("covered_ms"))
  }

  /** (event_id, user_id, n_1h, sum_micros_1h): VALUE-RANGE window
    * frame — for each event, the count and exact micro-sum of the
    * same user's events in the PRECEDING hour (ts-3600s, ts],
    * rangeBetween on the epoch-nanos ordering column. RANGE frames
    * include peers of the current ts, so tied timestamps cannot make
    * the result order-dependent (a ROWS frame would). One shuffle on
    * user_id + an ordered scan whose frame state is bounded by the
    * per-user event rate within the hour — the sliding-metric shape
    * (rate limiting, rolling spend) that tumbling windows can't
    * express. */
  def slidingHourStats(events: DataFrame): DataFrame = {
    val hourNs = 3600L * 1000000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc)
      .rangeBetween(-hourNs, 0L)
    events.select(col("event_id"), col("user_id"), col("ts"),
        micros(col("value")).as("v_micros"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_micros_1h", sum(col("v_micros")).over(w))
      .select("event_id", "user_id", "n_1h", "sum_micros_1h")
  }

  /** (o_orderkey, o_orderpriority, pr, cd): percent_rank + cume_dist
    * of order value within each priority class — the relative-standing
    * analytics pair (q_ntile buckets; this is the continuous form).
    * Ordering runs on the EXACT micros key, so ranks are tie-stable
    * and engine-identical; both functions depend only on rank/peer
    * counts, never row order within ties. One shuffle on the priority
    * key; 5 partitions at any scale — a skew-safe partition column
    * because priorities are few AND each window is rank-only state. */
  def priceStanding(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("price_key").asc)
    orders.select(col("o_orderkey"), col("o_orderpriority"),
        micros(col("o_totalprice")).as("price_key"))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .select("o_orderkey", "o_orderpriority", "pr", "cd")
  }

  /** (from_type, to_type, n, p): first-order Markov transition profile
    * of the event stream — which kind follows which, per user, with
    * the row-conditional probability p = n / Σ_from. The lead() pass
    * is one shuffle on user_id (ordered scan, O(1) state); the
    * transition matrix is kinds² rows (25 here), so the probability
    * normalization joins a broadcast-sized aggregate. The
    * session-analysis / UX-funnel primitive that generalizes
    * [[funnel]]'s fixed path to ALL observed paths. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val trans = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type").as("ft"))
      .agg(sum("n").as("n_from"))
    trans.join(broadcast(totals), col("from_type") === col("ft"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
  }

  /** (state, pi): STATIONARY DISTRIBUTION of the first-order event
    * chain after 8 power iterations from uniform — where the session
    * process settles if it keeps running, the long-run behavior mix
    * that [[eventTransitions]]'s one-step matrix only implies (the
    * PageRank idea applied to the session chain, minus damping;
    * states without outgoing transitions leak their mass, which is
    * exactly the observed chain's "session ends here" probability —
    * reported as-is, not patched). Scale split: the corpus-scaled
    * work is ONE lead() pass + the kinds² transition rollup (the
    * [[eventTransitions]] plan); the matrix is then state²-bounded
    * METADATA (gated ≤ 1024 states) and the iteration runs
    * driver-side like the k-means centroid sync. Engine-exact: each
    * π'_j folds its incoming terms π_i·(n_ij/n_from_i) in sorted
    * from-state order (the ordered-fold contract), 8 unrolled
    * iterations, round(·,6) last. */
  def markovStationary(events: DataFrame, iters: Int = 8,
                       maxStates: Int = 1024): DataFrame = {
    val spark = events.sparkSession
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val edges = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val states = edges.flatMap { case ((a, b), _) => Seq(a, b) }.distinct.sorted
    require(states.length <= maxStates,
      s"${states.length} states > cap $maxStates — the stationary iteration " +
        "is metadata-sized by design; bucket the event types first")
    val rowSum = edges.groupBy(_._1._1).map { case (f, xs) => f -> xs.map(_._2).sum }
    var pi: Map[String, Double] =
      states.map(_ -> 1.0 / states.length).toMap
    for (_ <- 1 to iters) {
      pi = states.map { j =>
        j -> edges.filter(_._1._2 == j).sortBy(_._1._1)
          .foldLeft(0.0) { case (acc, ((i, _), n)) =>
            acc + pi(i) * (n.toDouble / rowSum(i)) }
      }.toMap
    }
    import spark.implicits._
    states.map(s => (s, pi(s))).toSeq.toDF("state", "pi_raw")
      .select(col("state"), round(col("pi_raw"), 6).as("pi"))
  }

  /** (state, p_continue, t_expected): EXPECTED REMAINING SESSION
    * LENGTH from each state — the companion reading to
    * [[markovStationary]] (π says where sessions SIT in the long run;
    * this says how much LONGER one runs from here — the
    * engagement-by-entry-point number a funnel owner actually asks
    * for). The chain made absorbing explicitly: an occurrence with no
    * successor IS an observed session end, so state i continues with
    * p_cont(i) = n_out(i)/n_occ(i) and routes with
    * P'(i,j) = n_ij/n_occ(i) (sub-stochastic — the stationary key's
    * leaked mass, now the absorption probability). t is the
    * TRUNCATED Neumann expectation over `iters` steps:
    * t_k(i) = p_cont(i) + Σ_j P'(i,j)·t_{k-1}(j) — expected further
    * events within k steps, monotone in k; the truncation is the
    * determinism bound and the oracle replays it round for round
    * (each fold in ascending to-state order — the ordered-fold
    * contract). Corpus-scaled work is ONE lead() pass + the kinds²
    * rollup; the iteration is states²-bounded driver metadata (gated
    * ≤ `maxStates`, fail-loud). */
  def absorbingTime(events: DataFrame, iters: Int = 12,
                    maxStates: Int = 1024): DataFrame = {
    val spark = events.sparkSession
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val trans = events.withColumn("to_type", lead(col("event_type"), 1).over(w))
    val occ = trans.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_occ"),
        sum(when(col("to_type").isNotNull, 1L).otherwise(0L)).as("n_out"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val edges = trans.filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val states = occ.keys.toSeq.sorted
    require(states.length <= maxStates,
      s"${states.length} states > cap $maxStates — the absorption iteration " +
        "is metadata-sized by design; bucket the event types first")
    var t: Map[String, Double] = states.map(_ -> 0.0).toMap
    for (_ <- 1 to iters) {
      t = states.map { i =>
        val (nOcc, nOut) = occ(i)
        i -> (nOut.toDouble / nOcc +
          edges.filter(_._1._1 == i).sortBy(_._1._2)
            .foldLeft(0.0) { case (acc, ((_, j), n)) =>
              acc + (n.toDouble / nOcc) * t(j) })
      }.toMap
    }
    import spark.implicits._
    states.map { s =>
      val (nOcc, nOut) = occ(s)
      (s, nOut.toDouble / nOcc, t(s))
    }.toDF("state", "p_raw", "t_raw")
      .select(col("state"), round(col("p_raw"), 6).as("p_continue"),
        round(col("t_raw"), 6).as("t_expected"))
  }

  /** (event_type, n, wins_mean_micros): winsorized mean — values
    * clipped at the type's exact DISCRETE p05/p95 before averaging
    * (robust location estimate; the outlier-tolerant sibling of
    * [[valueOutliers]]). Determinism: percentiles are NEAREST-RANK
    * (position = ceil(q·n) in pure integer arithmetic — no 0.05·n
    * float boundary), found on a per-(type, value) HISTOGRAM with a
    * running-count window — the window runs over distinct values per
    * type (value cardinality, not row count), so no type ever sorts
    * its full row set on one partition; the clip is long-vs-long and
    * the mean divides an exact integer sum once. */
  def winsorizedMean(events: DataFrame): DataFrame = {
    val v = events.select(col("event_type"), micros(col("value")).as("v"))
    val hist = v.groupBy("event_type", "v").agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy("event_type").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("c").over(wcum))
      .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
    // element AT integer position p of the sorted multiset is the
    // value whose cumulative range covers p: cum - c < p <= cum
    def at(posSql: String) = cum
      .withColumn("p", expr(posSql))
      .filter(col("cum") - col("c") < col("p") && col("p") <= col("cum"))
      .groupBy(col("event_type").as("et")).agg(min("v"))
    val bounds = at("(5 * n + 99) div 100").withColumnRenamed("min(v)", "lo")
      .join(at("(95 * n + 99) div 100").withColumnRenamed("min(v)", "hi"), "et")
    v.join(broadcast(bounds), col("event_type") === col("et"))
      .select(col("event_type"), greatest(col("lo"), least(col("hi"), col("v"))).as("wv"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("wv").as("s"))
      .select(col("event_type"), col("n"),
        round(col("s").cast("double") / col("n"), 4).as("wins_mean_micros"))
  }

  /** (event_type, n, med_micros, mad_micros, n_outliers): robust
    * outlier detection by modified z-score (Iglewicz & Hoaglin 1993) —
    * med = nearest-rank median of value micros per type, MAD = median
    * of |v − med|, flag when 0.6745·|v − med|/MAD > 3.5. Unlike the
    * mean/stddev rule in [[valueOutliers]], both location and scale
    * are breakdown-0.5 robust: the outliers themselves cannot mask
    * the threshold. Determinism: both medians are nearest-rank
    * position (n+1) div 2 on per-(type, value) HISTOGRAMS (the
    * [[winsorizedMean]] machinery — windows run over distinct values
    * per type, never row count), and the flag comparison is the
    * integer cross-multiplication 6745·|v−med| > 35000·MAD — no FP
    * anywhere. A zero MAD (majority-tied values) flags every
    * deviating row, the rule's documented degenerate case. */
  def madOutliers(events: DataFrame): DataFrame = {
    val v = events.select(col("event_type"), micros(col("value")).as("v"))
    // nearest-rank median of `valCol` per type over a value histogram
    def medianOf(rel: DataFrame, valCol: String): DataFrame = {
      val hist = rel.groupBy("event_type", valCol).agg(count(lit(1)).as("c"))
      val wcum = Window.partitionBy("event_type").orderBy(col(valCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum("c").over(wcum))
        .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
        .filter(col("cum") - col("c") < expr("(n + 1) div 2") &&
          expr("(n + 1) div 2") <= col("cum"))
        .groupBy(col("event_type").as("et")).agg(min(valCol).as("med"))
    }
    val med = medianOf(v, "v")
    val dev = v.join(broadcast(med), col("event_type") === col("et"))
      .select(col("event_type"), col("v"), abs(col("v") - col("med")).as("d"))
    val mad = medianOf(dev.select(col("event_type"), col("d")), "d")
      .withColumnRenamed("med", "mad").withColumnRenamed("et", "et2")
    dev.join(broadcast(med), col("event_type") === col("et"))
      .join(broadcast(mad), col("event_type") === col("et2"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("med").as("med_micros"),
        min("mad").as("mad_micros"),
        sum(when(col("d") * 6745 > col("mad") * 35000, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** (path, n_sessions): CLICKSTREAM PATH analysis — the top-k most
    * common session journeys, where a journey is the session's first
    * `cap` event types in (ts, event_id) order joined with '>'
    * (the "what do users actually do" product-analytics staple; the
    * sequence sibling of [[eventTransitions]]' one-step matrix). Same
    * gap-based session assignment as [[sessionize]]; the path
    * aggregates per session via sort_array over a collected struct
    * list — per-session state is the session's own events, capped at
    * emission, and the path relation is path-cardinality (tiny) for
    * the final count. One user shuffle + one path shuffle. */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30, cap: Int = 5,
                   k: Int = 10): DataFrame = {
    val gapNs = gapMinutes * 60L * 1000000000L
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val paths = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(array_join(
        slice(expr("transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"),
          1, cap), ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }

  /** (digit, n, freq, benford_p, chi2): BENFORD first-significant-digit
    * profile of order totals — the classic bulk data-quality / fraud
    * screen: organically-generated money amounts follow
    * P(d) = log₁₀(1 + 1/d); synthetic, capped, or fabricated values
    * bend the curve. The digit is exact integer arithmetic: first
    * char of the price-micros BIGINT (scaling by 10⁶ preserves the
    * leading significant digit of a positive value — no log/pow in
    * the digit path). One digit-keyed aggregation (9 groups); the
    * chi-squared statistic against the Benford expectation rides a
    * broadcast scalar and repeats per row (digit rows + the corpus
    * verdict in one relation). */
  def benford(orders: DataFrame): DataFrame = {
    val d = orders.filter(col("o_totalprice") > 0)
      .select(substring(micros(col("o_totalprice")).cast("string"), 1, 1)
        .cast("long").as("digit"))
      // a value in (0, 1e-6) rounds to micros 0 → digit 0, which would
      // divide by zero in the Benford expectation; guard it out (latent
      // on TPC-H money, where the minimum price is ≫ 1e-6)
      .filter(col("digit") >= 1)
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = d.agg(sum("n").as("t"))
    val withP = d.crossJoin(broadcast(tot))
      .withColumn("p", log(10.0, lit(1.0) + lit(1.0) / col("digit")))
    val chi2 = withP
      .select(((col("n") - col("t") * col("p")) * (col("n") - col("t") * col("p")) /
        (col("t") * col("p"))).as("c"))
      .agg(round(sum("c"), 4).as("chi2"))
    withP.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("t"), 4).as("freq"),
        round(col("p"), 4).as("benford_p"), col("chi2"))
  }

  /** (split_day, n_before, n_after, mean_before, mean_after, score):
    * CHANGE-POINT detection on the daily event-volume series — the
    * binary-segmentation first split (Scott & Knott / CUSUM family):
    * the day boundary maximizing the standardized mean gap
    * sqrt(n₁·n₂/n)·|mean_before − mean_after| over daily counts. The
    * pipeline-health question "did ingest volume shift, and when".
    * The series is DAY-cardinality (bounded at any event scale —
    * centuries are ~10⁴ rows), so the prefix sums ride a triangle
    * self-join on the aggregated relation rather than any global
    * window; the event-scale work is the one day-keyed count. Argmax
    * is a 1-row TakeOrdered on (rounded score desc, day asc). */
  def changepoint(events: DataFrame): DataFrame = {
    val daily = events.groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val tot = daily.agg(sum("x").as("t"), count(lit(1)).as("n"))
    val pre = daily.as("a").join(daily.as("b"), col("b.day") <= col("a.day"))
      .groupBy(col("a.day").as("day"))
      .agg(sum("b.x").as("s"), count(lit(1)).as("n1"))
    pre.crossJoin(broadcast(tot))
      .filter(col("n1") < col("n")) // a split needs a non-empty right side
      .select(col("day").as("split_day"), col("n1").as("n_before"),
        (col("n") - col("n1")).as("n_after"),
        round(col("s").cast("double") / col("n1"), 4).as("mean_before"),
        round((col("t") - col("s")).cast("double") / (col("n") - col("n1")), 4)
          .as("mean_after"),
        round(sqrt(col("n1") * (col("n") - col("n1")) / col("n").cast("double")) *
          abs(col("s").cast("double") / col("n1") -
            (col("t") - col("s")).cast("double") / (col("n") - col("n1"))), 4)
          .as("score"))
      .orderBy(col("score").desc, col("split_day").asc)
      .limit(1)
  }

  /** (n_a, n_b, conv_a, conv_b, rate_a, rate_b, z): two-proportion
    * A/B test — users split into deterministic cohorts by user_id
    * parity, conversion = the user made ≥ `minPurchases` purchase
    * events (14 splits this corpus near 50/50 at every scale factor;
    * "≥1" saturates to p=1 and degenerates the statistic), z =
    * (p_a − p_b)/sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) with the pooled p̂ (the
    * standard two-proportion z statistic; |z| > 1.96 ⇒ the split
    * behaves differently at α = 0.05 — on a parity split it should
    * NOT, making this the A/A sanity check experiment platforms run).
    * A saturated pool (p̂ ∈ {0, 1}) yields NULL z — undefined, not a
    * crash. One user-keyed aggregation, then scalar arithmetic on a
    * 2-row relation. */
  def abTest(events: DataFrame, minPurchases: Int = 14): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .select((col("user_id") % 2).as("cohort"),
        when(col("np") >= minPurchases, 1L).otherwise(0L).as("conv"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
    val a = users.filter(col("cohort") === 0).select(col("n").as("n_a"), col("c").as("conv_a"))
    val b = users.filter(col("cohort") === 1).select(col("n").as("n_b"), col("c").as("conv_b"))
    a.crossJoin(b)
      .withColumn("pa", col("conv_a").cast("double") / col("n_a"))
      .withColumn("pb", col("conv_b").cast("double") / col("n_b"))
      .withColumn("pp",
        (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b")))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(col("pa"), 4).as("rate_a"), round(col("pb"), 4).as("rate_b"),
        when(col("pp") > 0.0 && col("pp") < 1.0,
          round((col("pa") - col("pb")) /
            sqrt(col("pp") * (lit(1.0) - col("pp")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4)).as("z"))
  }

  /** (user_id, last_value_micros, n_ops): CDC APPLY — reduce an
    * ordered change log to final table state. The event stream is read
    * as a changelog on the user_id key: 'error' events are DELETEs,
    * everything else an UPSERT carrying `value`; ops apply in
    * (ts, event_id) order and the LAST op wins — a key whose last op
    * is a delete is absent from the result. This is the batch apply
    * step of any CDC ingestion (Debezium → table) and the
    * delete-aware superset of the q_idf_upsert last-wins merge.
    * Scale shape: one window over the key partition (same
    * shuffle+sort any per-key reduction pays), rn=1 filter is a
    * WindowGroupLimit — per-key state is O(1), no re-sort of history
    * per key. */
  def cdcApply(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", lit("delete")).otherwise(lit("upsert")).as("op"),
        col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1 && col("op") === "upsert")
      .select(col("user_id"),
        floor(col("value") * 1000000.0).cast("long").as("last_value_micros"),
        col("n_ops").cast("long").as("n_ops"))
  }

  /** (r_score, f_score, m_score, n_customers, sum_monetary_micros):
    * RFM customer segmentation — recency (last order day), frequency
    * (order count) and monetary (lifetime spend micros) per customer,
    * each scored 1-4 by quartile. The quartile boundaries are ONE
    * tiny 9-double scalar aggregate broadcast back over the customer
    * relation — the textbook `ntile(4)` formulation is a
    * partition-less global window (the whole customer relation sorted
    * on one partition, the anti-pattern this engine bans); comparing
    * against broadcast boundary literals gives the same quartile
    * semantics as a pure map stage. A score counts the boundaries the
    * customer strictly beats, so ties at a boundary land LOW
    * deterministically in both engines. Inputs to the percentiles are
    * exact integers (epoch days / counts / micros), so the
    * interpolated boundaries and the compares replay bit-identically
    * in the DuckDB oracle. Scale shape: one shuffle on o_custkey,
    * one scalar agg, one map, one 64-key agg. */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy("o_custkey").agg(
      max(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")).as("last_day"),
      count(lit(1)).as("freq"),
      sum(micros(col("o_totalprice"))).as("mon_micros"))
      // customer-cardinality, feeds BOTH the boundary aggregate and
      // the scoring map — checkpointing avoids a second orders scan
      .cutLineage()
    val bounds = perCust.agg(
      expr("percentile(last_day, array(0.25D, 0.5D, 0.75D))").as("rq"),
      expr("percentile(freq, array(0.25D, 0.5D, 0.75D))").as("fq"),
      expr("percentile(mon_micros, array(0.25D, 0.5D, 0.75D))").as("mq"))
    def score(v: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
      (lit(1) + when(v > q.getItem(0), 1).otherwise(0)
        + when(v > q.getItem(1), 1).otherwise(0)
        + when(v > q.getItem(2), 1).otherwise(0)).cast("long")
    perCust.crossJoin(broadcast(bounds))
      .select(score(col("last_day"), col("rq")).as("r_score"),
        score(col("freq"), col("fq")).as("f_score"),
        score(col("mon_micros"), col("mq")).as("m_score"),
        col("mon_micros"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        sum("mon_micros").as("sum_monetary_micros"))
  }

  /** (n_name, o_year, rev_micros, prev_micros, delta_micros):
    * year-over-year revenue growth per customer nation — the time-
    * intelligence complement of the Q7/Q8 share queries. Revenue
    * aggregates once on (nation, year); the lag window then runs over
    * the TINY aggregated relation partitioned by nation (bounded by
    * |nations|×|years|, never corpus-sized). Only years with a
    * predecessor appear. nation broadcasts; customer joins by AQE
    * size estimate. */
  def yoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_custkey", "o_orderdate", "o_totalprice")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val byYear = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(micros(col("o_totalprice"))).as("rev_micros"))
    val w = Window.partitionBy("n_name").orderBy(col("o_year").asc)
    byYear
      .withColumn("prev_micros", lag(col("rev_micros"), 1).over(w))
      .withColumn("prev_year", lag(col("o_year"), 1).over(w))
      // a gap year breaks the chain: growth is only vs the DIRECTLY
      // preceding calendar year
      .filter(col("prev_year") === col("o_year") - 1)
      .select(col("n_name"), col("o_year"), col("rev_micros"),
        col("prev_micros"), (col("rev_micros") - col("prev_micros")).as("delta_micros"))
  }

  /** (o_custkey, n_orders, n_gaps, min_gap_days, max_gap_days,
    * sum_gap_days): inter-order cadence per repeat customer — the
    * purchase-rhythm profile behind churn/idle detection (the
    * continuous complement of Q22's cutoff rule). One shuffle on
    * o_custkey; the lag window is per-customer (bounded partitions);
    * all outputs are exact integer day arithmetic. */
  def orderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("day").asc, col("o_orderkey").asc)
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000").as("day"))
      .withColumn("gap", col("day") - lag(col("day"), 1).over(w))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        count(col("gap")).as("n_gaps"),
        min(col("gap")).as("min_gap_days"),
        max(col("gap")).as("max_gap_days"),
        sum(col("gap")).as("sum_gap_days"))
      .filter(col("n_gaps") >= 1)
  }

  /** (status, n_docs, n_sources): corpus SNAPSHOT DIFF — the audit a
    * pipeline runs between two corpus versions before retraining:
    * per-doc status added / removed / changed / unchanged from a
    * full-outer join on doc_id with content compared BY HASH (the
    * 16-byte digests shuffle and compare; the texts never pairwise
    * compare), rolled up with how many distinct sources each status
    * touches. One shuffle per side on doc_id, 4-key rollup. */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text")).as("h1"), col("source").as("s1"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("h2"), col("source").as("s2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("changed").as("status"),
        coalesce(col("s2"), col("s1")).as("source"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"), countDistinct("source").as("n_sources"))
  }

  /** (event_type, day, n_events, n_users): K-ANONYMITY release gate —
    * publish an aggregate view of the event log only for
    * quasi-identifier groups (kind × day) carried by at least `k`
    * DISTINCT users; smaller groups are suppressed entirely (the
    * standard re-identification guard before event data leaves the
    * pipeline). One aggregation on the quasi-identifier; the distinct-
    * user count rides the same shuffle. HAVING-style filter — no
    * second pass. */
  /** (event_type, day, n_events, n_users, n_items): the k-anonymity +
    * l-DIVERSITY release gate — groups must contain ≥ k distinct users
    * (re-identification) AND ≥ l distinct sensitive values (the item
    * acted on: homogeneous groups leak the attribute even when the
    * user set is large — Machanavajjhala et al. 2007). Same
    * group-cardinality shape as [[kAnonymize]] with one more distinct
    * aggregate riding the identical shuffle. */
  def lDiversity(events: DataFrame, k: Int = 5, l: Int = 3): DataFrame =
    events
      .withColumn("item", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"),
        countDistinct("item").as("n_items"))
      .filter(col("n_users") >= k && col("n_items") >= l)

  /** (event_type, day, n_users, n_items, tv, released): T-CLOSENESS
    * audit — the third leg of the release-gate family after
    * [[kAnonymize]] (class size) and [[lDiversity]] (sensitive-value
    * count): per equivalence class, the TOTAL VARIATION distance
    * between the class's sensitive-item distribution and the global
    * one (the categorical EMD with unit ground distance), because a
    * class can be k-anonymous AND l-diverse while still leaking via a
    * badly skewed item mix. tv folds per class over ONLY the class's
    * own items — the complement mass enters closed form as
    * 1 − Σ_class p_global — so work is class-item-cardinality-scaled.
    * `released` = n_users ≥ k AND tv ≤ t. */
  def tCloseness(events: DataFrame, k: Int = 5, t: Double = 0.5): DataFrame = {
    val e = events
      .withColumn("item", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("day", expr("ts div 86400000000000"))
    val cls = e.groupBy("event_type", "day", "item").agg(count(lit(1)).as("n"))
    val users = e.groupBy("event_type", "day")
      .agg(countDistinct("user_id").as("n_users"))
    val tot = cls.groupBy("event_type", "day").agg(sum("n").as("nc"))
    val glob = e.groupBy("item").agg(count(lit(1)).as("g"))
    val nAll = e.agg(count(lit(1)).as("nn"))
    cls.join(tot, Seq("event_type", "day"))
      .join(glob, "item").crossJoin(broadcast(nAll))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_items"),
        sum(abs(col("n").cast("double") / col("nc") -
          col("g").cast("double") / col("nn"))).as("s1"),
        sum(col("g").cast("double") / col("nn")).as("s2"))
      .join(users, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n_users"), col("n_items"),
        round(lit(0.5) * (col("s1") + lit(1.0) - col("s2")), 6).as("tv"),
        (col("n_users") >= k &&
          lit(0.5) * (col("s1") + lit(1.0) - col("s2")) <= t).as("released"))
  }

  def kAnonymize(events: DataFrame, k: Int = 5): DataFrame =
    events
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
      .filter(col("n_users") >= k)

  /** (event_type, day, n_noisy): ε-differential-privacy Laplace count
    * release — per (kind, day) event counts with Laplace(1/ε) noise
    * (Dwork et al. 2006; sensitivity 1 for a count), the noisy sibling
    * of the [[kAnonymize]] suppression gate. The noise is DETERMINISTIC
    * inverse-CDF sampling: u = md5(kind:day) first-15-hex / 16¹⁵ − 0.5
    * ∈ [−0.5, 0.5), noise = −(1/ε)·sign(u)·ln(1 − 2|u|) — the engine's
    * standard replayable-randomness trick (same as the train-split and
    * KMV hashes), so the oracle re-derives the identical release and
    * the key stays hash-checked. Per-group work is one md5 + one ln on
    * the AGGREGATED relation (group-cardinality, not event count); a
    * real release would emit n_noisy alone — the determinism is a
    * test-harness property, swap the hash for a secret seed in
    * production. round(·,4) absorbs libm ulp differences. */
  def dpCounts(events: DataFrame, epsilon: Double = 1.0): DataFrame = {
    val g = events
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val u = conv(substring(md5(concat_ws(":", col("event_type"), col("day"))), 1, 15), 16, 10)
      .cast("double") / lit(1.152921504606846976e18) - lit(0.5)
    g.select(col("event_type"), col("day"),
      round(col("n") +
        lit(-1.0 / epsilon) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u)), 4)
        .as("n_noisy"))
  }

  /** (p_partkey, p_retailprice, p_size): 2-D SKYLINE (Pareto frontier)
    * of parts — minimize price, maximize size; a part survives iff no
    * other part is at-least-as-good on both axes and strictly better
    * on one. Grid-pruned, never all-pairs: prices quantize to exact
    * micros, collapse to one row per distinct price (max size), and
    * the strict-lower-price running max splits into (a) a cross-BUCKET
    * prefix via bounded explode-contributions over ~price-range/W
    * integer buckets and (b) a within-bucket window PARTITIONED BY
    * bucket (bounded partitions — no global sort at any scale). A row
    * is dominated iff a strictly cheaper price reached its size, or an
    * equal price exceeded it. Duplicated (price, size) points all
    * survive (neither dominates: no strict axis), matching the
    * NOT-EXISTS oracle. */
  def skyline(part: DataFrame, bucketMicros: Long = 10000000L): DataFrame = {
    val pm = part.select(col("p_partkey"), col("p_retailprice"), col("p_size"),
      micros(col("p_retailprice")).as("pmm"))
    val g = pm.groupBy("pmm").agg(max("p_size").as("gmax"))
      .withColumn("b", expr(s"pmm div $bucketMicros"))
    val maxB = g.agg(max("b").as("maxb"))
    // collapse to ONE row per bucket before exploding the contribution
    // ranges: the explode volume is O(buckets²), independent of how
    // many distinct prices share a bucket (the weightedPercentiles /
    // gini prefix shape — exploding per distinct price would scale
    // with the price domain)
    val bAgg = g.groupBy("b").agg(max("gmax").as("bmax"))
    val preOff = bAgg.crossJoin(broadcast(maxB))
      .filter(col("b") < col("maxb"))
      .select(explode(sequence(col("b") + 1, col("maxb"))).as("b"),
        col("bmax").as("c"))
      .groupBy("b").agg(max("c").as("pre"))
    val wIn = Window.partitionBy("b").orderBy("pmm")
      .rowsBetween(Window.unboundedPreceding, -1)
    val gL = g.withColumn("lin", max("gmax").over(wIn))
      .join(preOff, Seq("b"), "left")
      .withColumn("lmax", greatest(coalesce(col("pre"), lit(-1)),
        coalesce(col("lin"), lit(-1))))
    pm.join(gL.select("pmm", "gmax", "lmax"), "pmm")
      .filter(col("p_size") === col("gmax") && col("p_size") > col("lmax"))
      .select("p_partkey", "p_retailprice", "p_size")
  }

  /** (l_returnflag, total_qty, p25_micros, p50_micros, p75_micros):
    * EXACT weighted percentiles of extended price, weighted by
    * quantity, per return flag — the order-statistic the approximate
    * sketches (q_approx_quantiles) trade away, computed without a
    * per-flag global sort: values quantize to micros and collapse to
    * one (flag, value) row with its weight sum, the cross-bucket
    * running-weight offset rides bounded explode-contributions over
    * ~value-range/W buckets, and the within-bucket prefix is a window
    * PARTITIONED BY (flag, bucket) — bounded partitions, so three
    * enormous flag groups never serialize through one task. The
    * percentile is min(value | k·cum ≥ m·total) in exact BIGINT
    * arithmetic; collapsing equal values first cannot move the answer
    * (if any row of a value crosses the threshold, that value's last
    * row does). */
  def weightedPercentiles(li: DataFrame, bucketMicros: Long = 1000000000L): DataFrame = {
    // cut the two grid relations once: gv feeds the bucket rollup AND
    // the in-bucket window, bsum feeds maxB/off/tot — without the cuts
    // each branch re-runs the full lineitem aggregation (measured:
    // 11.0 CPU-s at sf0.1 for a value-grid-sized result; 4.1 after).
    // Both are value-cardinality-bounded, never corpus-row-sized.
    val gv = li.select(col("l_returnflag").as("flag"),
        micros(col("l_extendedprice")).as("v"),
        col("l_quantity").cast("long").as("w"))
      .groupBy("flag", "v").agg(sum("w").as("wv"))
      .withColumn("b", expr(s"v div $bucketMicros"))
      .cutLineage()
    val bsum = gv.groupBy("flag", "b").agg(sum("wv").as("bw")).cutLineage()
    val maxB = bsum.groupBy("flag").agg(max("b").as("maxb"))
    val off = bsum.join(maxB, "flag")
      .filter(col("b") < col("maxb"))
      .select(col("flag"), explode(sequence(col("b") + 1, col("maxb"))).as("b"),
        col("bw").as("c"))
      .groupBy("flag", "b").agg(sum("c").as("off"))
    val tot = bsum.groupBy("flag").agg(sum("bw").as("tot"))
    val wIn = Window.partitionBy("flag", "b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    gv.withColumn("cin", sum("wv").over(wIn))
      .join(off, Seq("flag", "b"), "left")
      .join(tot, "flag")
      .withColumn("cum", coalesce(col("off"), lit(0L)) + col("cin"))
      .groupBy(col("flag").as("l_returnflag"))
      .agg(min("tot").as("total_qty"),
        min(when(col("cum") * 4 >= col("tot"), col("v"))).as("p25_micros"),
        min(when(col("cum") * 2 >= col("tot"), col("v"))).as("p50_micros"),
        min(when(col("cum") * 4 >= col("tot") * 3, col("v"))).as("p75_micros"))
  }

  /** (month, n_days, mau, avg_dau, stickiness): DAU/MAU engagement
    * ratio per calendar month — the standard product-health metric
    * beside cohort retention. Two distinct-user aggregations (per day,
    * per month) and one day-cardinality roll-up; user ids shuffle once
    * per aggregation, nothing serializes through a global sort. */
  def stickiness(events: DataFrame): DataFrame = {
    val mo = trunc(timestamp_micros(expr("ts div 1000")).cast("date"), "month").as("month")
    val dau = events.select(mo, expr("ts div 86400000000000").as("day"), col("user_id"))
      .groupBy("month", "day").agg(countDistinct("user_id").as("dau"))
    val daily = dau.groupBy("month")
      .agg(count(lit(1)).as("n_days"), sum("dau").as("sum_dau"))
    val mau = events.select(mo, col("user_id"))
      .groupBy("month").agg(countDistinct("user_id").as("mau"))
    daily.join(mau, "month")
      .select(col("month"), col("n_days"), col("mau"),
        round(col("sum_dau").cast("double") / col("n_days"), 6).as("avg_dau"),
        round(col("sum_dau").cast("double") / (col("n_days") * col("mau")), 6)
          .as("stickiness"))
  }

  /** (part_a, part_b, n_ab, na, nb, lift): MARKET-BASKET pair mining —
    * the top co-purchased part pairs with their lift
    * (P(a,b) / (P(a)·P(b)), support counted over distinct orders).
    * The pair explosion is an order-keyed self-join whose per-order
    * fan-out is bounded by items-per-order (single digits on order
    * data) — O(orders · k²), never part×part; the final top-K is a
    * distributed TakeOrderedAndProject under a total order. */
  def basketPairs(li: DataFrame, topK: Int = 20): DataFrame = {
    val items = li.select(col("l_orderkey"), col("l_partkey")).distinct()
    val supp = items.groupBy("l_partkey").agg(count(lit(1)).as("n"))
    val nOrders = items.select("l_orderkey").distinct().agg(count(lit(1)).as("n_orders"))
    items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(supp.select(col("l_partkey").as("part_a"), col("n").as("na")), "part_a")
      .join(supp.select(col("l_partkey").as("part_b"), col("n").as("nb")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("na"), col("nb"),
        round(col("n_ab").cast("double") * col("n_orders") /
          (col("na") * col("nb")), 6).as("lift"))
      .orderBy(col("n_ab").desc, col("part_a").asc, col("part_b").asc)
      .limit(topK)
  }

  /** [[basketPairs]] served from a STAGED pair substrate (pairs /
    * supports / order count materialized once — the DedupStore
    * consolidation repeated on the retail side): ranking and lift are
    * pure arithmetic over the stored exact counts, so every consumer
    * skips the order-keyed self-join. Results are count-identical to
    * the live plan by construction. */
  def basketPairsFromStore(spark: org.apache.spark.sql.SparkSession, path: String,
                           topK: Int = 20): DataFrame = {
    val pairs = spark.read.parquet(s"$path/pairs")
    val supp = spark.read.parquet(s"$path/supp")
    val nOrders = spark.read.parquet(s"$path/norders")
    pairs.select(col("pa").as("part_a"), col("pb").as("part_b"), col("n_both").as("n_ab"))
      .join(supp.select(col("l_partkey").as("part_a"), col("n").as("na")), "part_a")
      .join(supp.select(col("l_partkey").as("part_b"), col("n").as("nb")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("na"), col("nb"),
        round(col("n_ab").cast("double") * col("n_orders") /
          (col("na") * col("nb")), 6).as("lift"))
      .orderBy(col("n_ab").desc, col("part_a").asc, col("part_b").asc)
      .limit(topK)
  }

  /** [[assocRules]] from the same staged substrate — both rule
    * directions, confidence and lift by arithmetic over stored
    * counts. */
  def assocRulesFromStore(spark: org.apache.spark.sql.SparkSession, path: String,
                          minBoth: Long = 2, topK: Int = 15): DataFrame = {
    val pairs = spark.read.parquet(s"$path/pairs").filter(col("n_both") >= minBoth)
    val supp = spark.read.parquet(s"$path/supp")
    val nOrders = spark.read.parquet(s"$path/norders")
    val rules = pairs.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("n_both"))
      .union(pairs.select(col("pb"), col("pa"), col("n_both")))
    rules
      .join(supp.select(col("l_partkey").as("antecedent"), col("n").as("n_ante")), "antecedent")
      .join(supp.select(col("l_partkey").as("consequent"), col("n").as("n_cons")), "consequent")
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"), col("n_both"), col("n_ante"),
        round(col("n_both").cast("double") / col("n_ante"), 6).as("confidence"),
        round(col("n_both").cast("double") * col("n_orders") /
          (col("n_ante") * col("n_cons")), 6).as("lift"))
      .orderBy(col("confidence").desc, col("antecedent").asc, col("consequent").asc)
      .limit(topK)
  }

  /** (n_customers, total_rev_micros, gini): GINI COEFFICIENT of the
    * per-customer revenue distribution — the whole-distribution
    * inequality stat behind q_revenue_concentration's top-k share.
    * Sorted-formula G = Σ_i (2i − n − 1)·x_(i) / (n·Σx), computed
    * WITHOUT a global sort: revenues collapse to distinct values with
    * counts, the strictly-lower prefix count p(v) rides the
    * cross-bucket explode-contribution + within-bucket-partitioned
    * window pattern, and a value's positions p+1..p+c contribute
    * v·c·(2p + c − n) in closed form. All integer arithmetic in
    * decimal(38,0) (micros × counts × ranks overflow BIGINT at
    * warehouse scale); one final double division. */
  def gini(orders: DataFrame, bucketMicros: Long = 10000000000L): DataFrame = {
    val rev = orders.groupBy("o_custkey").agg(sum(micros(col("o_totalprice"))).as("x"))
    val g = rev.groupBy("x").agg(count(lit(1)).as("c"))
      .withColumn("b", expr(s"x div $bucketMicros"))
    val bsum = g.groupBy("b").agg(sum("c").as("bc"))
    val maxB = bsum.agg(max("b").as("maxb"))
    val off = bsum.crossJoin(broadcast(maxB))
      .filter(col("b") < col("maxb"))
      .select(explode(sequence(col("b") + 1, col("maxb"))).as("b"), col("bc").as("cc"))
      .groupBy("b").agg(sum("cc").as("off"))
    val wIn = Window.partitionBy("b").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = g.agg(sum("c").as("n"),
      sum(col("x").cast("decimal(38,0)") * col("c")).as("sx"))
    g.withColumn("pin", coalesce(sum("c").over(wIn), lit(0L)))
      .join(off, Seq("b"), "left")
      .withColumn("p", coalesce(col("off"), lit(0L)) + col("pin"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("sx"),
        (col("x").cast("decimal(38,0)") * col("c") *
          (col("p") * 2 + col("c") - col("n")).cast("decimal(38,0)")).as("term"))
      .groupBy("n", "sx").agg(sum("term").as("num"))
      .select(col("n").as("n_customers"), col("sx").cast("long").as("total_rev_micros"),
        round(col("num").cast("double") /
          (col("n").cast("double") * col("sx").cast("double")), 6).as("gini"))
  }

  /** (type_a, type_b, inter, na, nb, jaccard): pairwise AUDIENCE
    * OVERLAP between event types — Jaccard of the distinct-user sets,
    * the segmentation view behind "do purchasers also browse".
    * Distinct (type, user) first, then a user-keyed self-join whose
    * per-user fan-out is bounded by the type cardinality (a handful),
    * never a type×type cross of user sets. */
  def audienceOverlap(events: DataFrame): DataFrame = {
    val au = events.select(col("event_type"), col("user_id")).distinct()
    val sizes = au.groupBy("event_type").agg(count(lit(1)).as("n"))
    au.as("a").join(au.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"), col("n").as("na"))),
        "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"), col("n").as("nb"))),
        "type_b")
      .select(col("type_a"), col("type_b"), col("inter"), col("na"), col("nb"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
  }

  /** (name_a, name_b, n_a, n_b, jw): RECORD LINKAGE over part names —
    * the classic blocked fuzzy-match shape: collapse to DISTINCT name
    * strings with occurrence counts first (linkage cost scales with
    * the name vocabulary, not row count), generate candidate pairs
    * ONLY through a blocking join (pairs sharing ≥ 1 DISCRIMINATING
    * name token — never vocab², the same candidates-first economics as
    * MinHash banding), then score each candidate with the native
    * [[graft.functions.JaroWinkler]] codegen expression and keep pairs
    * at or above `threshold`. Blocking tokens with document frequency
    * above `dfCap` are DROPPED before the self-join — the production
    * record-linkage convention: a token shared by more than `dfCap`
    * names carries no discriminating power, and without the cap block
    * sizes grow linearly with the catalog and the self-join
    * quadratically (the full-shuffle-on-skewed-key pathology at
    * 100 TB). With it, worst-case candidate volume is bounded by
    * dfCap² per surviving block regardless of catalog size. Both
    * sides of the blocking join carry the same token key, so the join
    * shuffles name-sized rows on a bounded-frequency key; scores
    * round to 4 decimals for engine-portable hashing (oracle: DuckDB's
    * built-in `jaro_winkler_similarity`, semantics probed to match,
    * replaying the identical df-capped candidate generation). */
  def recordLinkage(part: DataFrame, threshold: Double = 0.8,
                    dfCap: Long = 100L): DataFrame = {
    val names = part.groupBy(lower(col("p_name")).as("name"))
      .agg(count(lit(1)).as("n"))
    val rawToks = names.select(col("name"), col("n"),
        explode(split(col("name"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    // df over DISTINCT names (the relation being self-joined): one
    // vocabulary-sized aggregate, broadcast back as the cap filter
    val tokDf = rawToks.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val toks = rawToks.join(broadcast(tokDf.select("tok")), Seq("tok"), "left_semi")
    toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .distinct()
      .withColumn("jw",
        round(graft.functions.Native.jaroWinkler(col("name_a"), col("name_b")), 4))
      .filter(col("jw") >= threshold)
  }

  /** (event_type, n_touches, credit_micros): LINEAR MULTI-TOUCH
    * ATTRIBUTION — every purchase splits one unit of credit equally
    * across the user's click/view touches in the preceding
    * `windowDays`; credit is ledgered per touch channel. The join is
    * user-keyed (per-user event volumes are bounded), the per-purchase
    * touch count rides one aggregation, and credit is FIXED-POINT:
    * each touch books round(1e6 / n) micros, an exact BIGINT both
    * engines sum order-independently — no float accumulation anywhere
    * (the repo's money-micros determinism rule, SURVEY.md §6). */
  def linearAttribution(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val spanNs = windowDays * 86400000000000L
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val touches = events.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("channel"), col("ts").as("t_ts"))
    val attributed = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") && col("p_ts") - col("t_ts") <= lit(spanNs))
    val perPurchase = attributed.groupBy("p_id")
      .agg(count(lit(1)).as("n"))
    attributed.join(perPurchase, "p_id")
      .groupBy(col("channel").as("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(round(lit(1000000.0) / col("n"), 0).cast("long")).as("credit_micros"))
  }

  /** (dow, hour, n_events, share): SEASONALITY PROFILE — the
    * day-of-week × hour-of-day event heat map, the first diagnostic
    * over any clickstream. Time fields derive from epoch-nanos by
    * PURE INTEGER arithmetic (day 0 = 1970-01-01 = Thursday, so
    * dow = (epoch_day + 4) mod 7 with 0 = Sunday) — no calendar
    * library, no timezone, identical in any engine; share is one exact
    * division per output row. One aggregation to a ≤ 168-row result:
    * map-side partials collapse every partition to profile-sized
    * state, so the shuffle is O(168 · partitions) at any corpus size. */
  /** One row (n_months, n_pairs, slope, intercept): Theil-Sen robust
    * trend of monthly shipped revenue — the median of all pairwise
    * month-to-month slopes (up to ~29% outlier months cannot move
    * it, unlike the least-squares line a forecast would naively fit).
    * Money lands on the micros grid per line BEFORE aggregation (the
    * [[TpcH]] exact-money discipline), so monthly revenues are exact
    * BIGINTs; each pairwise slope is ONE division of exact-integer-
    * valued doubles (bit-identical across engines), the median picks
    * by (slope, month-pair) row_number — deterministic under ties —
    * and the intercept is the median of (rev − slope·month) residual
    * offsets. Scale shape: the corpus-scaled work is ONE scan +
    * month-keyed aggregation (the calendar bounds the month domain at
    * ANY corpus size, TPC-H ships 1992-1998 ≈ 84 months), so the
    * pairwise self-join and its windows run on a calendar-bounded
    * relation — never data-sized. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.lineitem(spark, dir)
      .select(
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast("long").as("mi"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(1000000.0))
          .cast("long").as("v"))
      .groupBy("mi").agg(sum("v").as("rev"))
    val a = monthly.select(col("mi").as("mi_a"), col("rev").as("rev_a"))
    val b = monthly.select(col("mi").as("mi_b"), col("rev").as("rev_b"))
    val slopes = a.join(b, col("mi_a") < col("mi_b"))
      .select(col("mi_a"), col("mi_b"),
        ((col("rev_b") - col("rev_a")).cast("double") /
          (col("mi_b") - col("mi_a")).cast("double")).as("slope"))
    // median WITHOUT a partition-less window (the engine-wide plan
    // invariant): rank = 1 + count of rows strictly before in the
    // (value, tie...) struct order, via a triangular join — the
    // relation is calendar-bounded (≤ ~3.5k slope rows at ANY corpus
    // size), so the O(rows²) comparison set is a constant
    def medianOf(df: DataFrame, v: String, tie: Seq[String]): DataFrame = {
      val key = struct((v +: tie).map(col): _*)
      val a = df.select(key.as("ka"), col(v).as("va"))
      val b = df.select(key.as("kb"))
      a.join(b, col("kb") < col("ka"), "left")
        .groupBy(col("ka"), col("va"))
        .agg((count(col("kb")) + 1L).as("rn"))
        .crossJoin(broadcast(df.agg(count(lit(1)).as("np"))))
        .filter(col("rn") === expr("(np + 1) div 2") ||
          col("rn") === expr("np div 2 + 1"))
        .agg(avg(col("va")).as(v), first(col("np")).as("np"))
    }
    val med = medianOf(slopes, "slope", Seq("mi_a", "mi_b"))
    val resid = monthly.crossJoin(broadcast(med.select("slope")))
      .select(col("mi"),
        (col("rev").cast("double") - col("slope") * col("mi").cast("double")).as("ic"))
    val icMed = medianOf(resid, "ic", Seq("mi"))
    monthly.agg(count(lit(1)).as("n_months"))
      .crossJoin(broadcast(med))
      .crossJoin(broadcast(icMed.select(col("ic"))))
      .select(col("n_months"), col("np").as("n_pairs"),
        round(col("slope"), 4).as("slope"), round(col("ic"), 4).as("intercept"))
  }

  def seasonality(events: DataFrame): DataFrame = {
    val day = 86400000000000L
    // `div` = exact integral division: epoch-nanos overflow the double
    // mantissa, so a float divide here would misplace slot boundaries
    val withSlots = events.select(
      expr(s"(ts div ${day}L + 4L) % 7").as("dow"),
      expr(s"(ts % ${day}L) div 3600000000000L").as("hour"))
    val total = events.agg(count(lit(1)).as("total"))
    withSlots.groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(total)) // 1-row scalar
      .select(col("dow"), col("hour"), col("n_events"),
        round(col("n_events").cast("double") / col("total"), 6).as("share"))
  }

  /** (antecedent, consequent, n_both, n_ante, confidence, lift):
    * DIRECTED association rules over the order baskets — the rule-
    * mining step on top of [[basketPairs]]'s symmetric co-occurrence:
    * each qualifying pair emits BOTH directions, confidence =
    * P(consequent | antecedent) = n_both / n_ante, lift shared with
    * the pair. Same order-keyed self-join (per-order fan-out is
    * basket-size-bounded, not data-sized); support floor `minBoth`
    * prunes the singleton noise before ranking. Top-k under rounded
    * confidence with id tiebreaks. */
  def assocRules(li: DataFrame, minBoth: Long = 2, topK: Int = 15): DataFrame = {
    val items = li.select(col("l_orderkey"), col("l_partkey")).distinct()
    val supp = items.groupBy("l_partkey").agg(count(lit(1)).as("n"))
    val nOrders = items.select("l_orderkey").distinct().agg(count(lit(1)).as("n_orders"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minBoth)
    val rules = pairs.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("n_both"))
      .union(pairs.select(col("pb"), col("pa"), col("n_both")))
    rules
      .join(supp.select(col("l_partkey").as("antecedent"), col("n").as("n_ante")), "antecedent")
      .join(supp.select(col("l_partkey").as("consequent"), col("n").as("n_cons")), "consequent")
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"), col("n_both"), col("n_ante"),
        round(col("n_both").cast("double") / col("n_ante"), 6).as("confidence"),
        round(col("n_both").cast("double") * col("n_orders") /
          (col("n_ante") * col("n_cons")), 6).as("lift"))
      .orderBy(col("confidence").desc, col("antecedent").asc, col("consequent").asc)
      .limit(topK)
  }

  /** (day, rev_micros, med7_micros): EXACT trailing-7-day median of
    * the daily-revenue series — the robust twin of [[movingRevenue]]'s
    * mean (a single flash-sale day drags a mean for a week; the
    * median shrugs). Same window-FREE shape as the mean: each day's
    * revenue is exploded into the ≤7 trailing windows it serves, and
    * the exact `percentile` aggregate folds each window's ≤7
    * contributions under a day-keyed groupBy — no global-ORDER window
    * (which would single-partition the series), everything stays
    * days-sized and shuffle-partitioned. */
  def rollingMedian(orders: DataFrame): DataFrame = {
    val byDay = orders
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000").as("day"))
      .agg(sum(micros(col("o_totalprice"))).as("rev_micros"))
    val med = byDay
      .select(explode(sequence(col("day"), col("day") + lit(6L))).as("day"),
        col("rev_micros").as("c_micros"))
      .groupBy("day")
      .agg(round(expr("percentile(c_micros, 0.5)"), 4).as("med7_micros"))
    byDay.join(med, "day")
      .select(col("day"), col("rev_micros"), col("med7_micros"))
  }

  /** (lag, n_pairs, acf): AUTOCORRELATION function of the daily
    * revenue series at lags 1..maxLag — the seasonality detector
    * (weekly cadence shows as a lag-7 spike). Calendar-exact: lag
    * pairs come from a self-equi-join on day+lag (a LAG window over
    * ROWS would silently misalign across missing days), then one
    * sample-correlation aggregate per lag. The series is day-keyed,
    * so the join and agg are days×lags-sized. Micros scaled to
    * dollars before the correlation for conditioning; corr is
    * scale-invariant so the result is unchanged. */
  def acf(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    val byDay = orders
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000").as("day"))
      .agg((sum(micros(col("o_totalprice"))).cast("double") / 1e6).as("rev"))
    val lagged = byDay
      .select(col("day"), col("rev"), explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
      .withColumn("day2", col("day") + col("lag"))
    lagged.as("a")
      .join(byDay.as("b"), col("a.day2") === col("b.day"))
      .groupBy(col("a.lag").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        round(corr(col("a.rev"), col("b.rev")), 6).as("acf"))
  }

  /** (n_langs, n_sources, dof, chi2, cramers_v): CHI-SQUARE test of
    * independence between document language and source — the
    * composition-drift screen (a training mix where language depends
    * on source needs per-source language caps, not a global one).
    * Observed counts are one exact groupBy; expected counts are the
    * margin product join (langs × sources cells, all tiny); the
    * statistic and Cramér's V are one final double fold. */
  def chi2LangSource(docs: DataFrame): DataFrame = {
    val obs = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy("lang").agg(sum("o").as("rt"))
    val colT = obs.groupBy("source").agg(sum("o").as("ct"))
    val n = obs.agg(sum("o").as("n"))
    val cells = rowT.crossJoin(colT).crossJoin(broadcast(n))
      .join(obs, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"), col("rt"), col("ct"), col("n"),
        coalesce(col("o"), lit(0L)).as("o"),
        (col("rt").cast("double") * col("ct") / col("n")).as("e"))
    cells.agg(
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum((col("o") - col("e")) * (col("o") - col("e")) / col("e")).as("x2"),
        first(col("n")).as("nn"))
      .select(col("n_langs"), col("n_sources"),
        ((col("n_langs") - 1) * (col("n_sources") - 1)).as("dof"),
        round(col("x2"), 6).as("chi2"),
        round(sqrt(col("x2") / (col("nn") *
          least(col("n_langs") - 1, col("n_sources") - 1))), 6).as("cramers_v"))
  }

  /** (day, wau): ROLLING 7-DAY ACTIVE USERS by day — the trailing-
    * window engagement series between DAU and MAU ("WAU by day").
    * Exact distinct over a sliding window without re-scanning seven
    * days per output row: each (user, day) pair is collapsed once,
    * exploded into the ≤7 trailing windows it serves, and distinct-
    * counted per target day — user-days × 7 rows, never events × 7.
    * Only days present in the data are reported (the gap-fill key
    * owns grid densification). */
  def rollingActives(events: DataFrame): DataFrame = {
    val day = 86400000000000L
    val userDays = events
      .select(col("user_id"), expr(s"ts div ${day}L").as("day")).distinct()
    val days = userDays.select("day").distinct()
    val contrib = userDays
      .select(col("user_id"), explode(sequence(col("day"), col("day") + lit(6L))).as("day"))
    days.join(contrib, "day")
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("wau"))
  }

  /** (step, n_users, median_us, avg_us): FUNNEL LATENCY — how long
    * converting users take between consecutive funnel steps (first
    * signup → first later click → first later purchase), the timing
    * companion to the step-count funnel. Deltas are exact integer
    * nanos; the median interpolates at p=0.5 (midpoint of two exact
    * ints — engine-portable, unlike arbitrary quantiles whose 0.9·pos
    * arithmetic differs across engines) and both stats are reported
    * in micros rounded to 0.1. Per-step state is one min() per user —
    * three user-keyed aggregations, no window. */
  def funnelLatency(events: DataFrame): DataFrame = {
    val t1 = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = events.join(t1, "user_id")
      .filter(col("event_type") === "click" && col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"), first("t1").as("t1"))
    val t3 = events.join(t2.select("user_id", "t2"), "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val d12 = t2.select(lit("1_signup_to_click").as("step"), (col("t2") - col("t1")).as("d"))
    val d23 = t3.join(t2.select("user_id", "t2"), "user_id")
      .select(lit("2_click_to_purchase").as("step"), (col("t3") - col("t2")).as("d"))
    d12.union(d23)
      .groupBy("step")
      .agg(count(lit(1)).as("n_users"),
        round(expr("percentile(d, 0.5)") / 1000.0, 1).as("median_us"),
        round(sum("d").cast("double") / count(lit(1)) / 1000.0, 1).as("avg_us"))
  }

  /** (user_id, n_events, span_sec, twa): TIME-WEIGHTED average of the
    * event `value` per user — each reading weighted by how long it
    * was the latest one (the metering convention; a plain mean
    * over-counts bursts). One shuffle on user_id, a lead window for
    * the holding duration, users below two events dropped (no
    * interval to weight). Durations in double seconds; the ratio is
    * magnitude-stable. */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
      .filter(col("next_ts").isNotNull)
      .withColumn("dt", (col("next_ts") - col("ts")).cast("double") / 1e9)
      .groupBy("user_id")
      .agg((count(lit(1)) + 1).as("n_events"),
        // span folded as EXACT integer nanos (engine-portable; a
        // double fold would land on the round-6 boundary, since true
        // spans are exact micro multiples), one division at the end
        sum(col("next_ts") - col("ts")).as("span_ns"),
        sum(col("value") * col("dt")).as("vdt"))
      .select(col("user_id"), col("n_events"),
        round(col("span_ns").cast("double") / 1e9, 6).as("span_sec"),
        round(col("vdt") / (col("span_ns").cast("double") / 1e9), 6).as("twa"))
  }

  /** (cohort_month, months_since, n_customers, n_orders,
    * revenue_micros): customer-cohort LTV matrix — customers grouped
    * by the calendar month of their FIRST order (cohort_month =
    * year·12+month, an exact integer month index), each later order
    * bucketed by whole months since that cohort; the classic
    * retention-revenue triangle a subscription/commerce team reads
    * before any retention claim. Money in exact floor-micros
    * (SURVEY §6), month arithmetic pure integers. Two shuffles: the
    * per-customer min (first order) and the cohort-cell rollup. */
  def cohortRevenue(orders: DataFrame): DataFrame = {
    val o = orders.select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("m"),
      floor(col("o_totalprice") * 1000000.0).cast("long").as("micros"))
    val cohort = o.groupBy("o_custkey").agg(min("m").as("cohort_month"))
    o.join(cohort, "o_custkey")
      .groupBy(col("cohort_month"), (col("m") - col("cohort_month")).as("months_since"))
      .agg(countDistinct("o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum("micros").as("revenue_micros"))
  }

  /** (user_id, n_active_days, longest_streak): GAPS-AND-ISLANDS
    * activity streaks — distinct active days per user and the longest
    * run of CONSECUTIVE days, via the classic day − row_number island
    * key (consecutive days share it; any gap starts a new island).
    * The engagement metric behind "N-day streak" product features and
    * retention-quality cuts. One user-partitioned window + two
    * rollups; integer-exact day arithmetic. */
  def activityStreaks(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    events.select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum("len").as("n_active_days"), max("len").as("longest_streak"))
  }

  /** (fanout, n_keys): the JOIN-KEY FANOUT HISTOGRAM of lineitem's
    * order key — how many order keys carry 1, 2, … line items. The
    * skew diagnostic read BEFORE sizing a shuffle join: a long tail
    * here is what decides salting / AQE skew-join handling, and the
    * max bucket bounds any key's worst partition. Two exact
    * aggregations, nothing else. */
  def fanoutHistogram(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_orderkey").agg(count(lit(1)).as("fanout"))
      .groupBy("fanout").agg(count(lit(1)).as("n_keys"))

  /** (user_id, n_events, score): RECENCY-DECAYED engagement score —
    * each event's value counts at weight 2^(8−age_weeks) (halving per
    * week of age, floored at weight 1 after 8 weeks), ages measured
    * back from the corpus max timestamp. The decay is INTEGER-EXACT:
    * value in floor-micros, weights exact powers of two, so the score
    * replays bit-for-bit in any engine (an exp() decay would not).
    * One broadcast max-ts, one user rollup. */
  def decayScore(events: DataFrame): DataFrame = {
    val maxTs = events.agg(max("ts").as("max_ts"))
    events.select(col("user_id"), col("ts"), col("value"))
      .crossJoin(broadcast(maxTs))
      .withColumn("w", expr(
        "CAST(pow(2.0, 8 - least((max_ts - ts) div 604800000000000, 8)) AS BIGINT)"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000000.0).cast("long") * col("w")).as("score"))
  }
}
