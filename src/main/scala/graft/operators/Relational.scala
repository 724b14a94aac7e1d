package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

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
  * Scale notes per query are on each method; dims (nation/region/
  * customer) are always the broadcast side.
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

  /** TPC-H Q5 shape: fact⋈fact shuffle join on orderkey, then
    * broadcast joins against customer/nation/region (dims). */
  /** Correlated-subquery shape: orders above their own customer's
    * average order value. Decorrelated into a single window pass —
    * what Catalyst does to the EXISTS/scalar-subquery form anyway,
    * written directly so the plan is one shuffle on o_custkey. */
  def aboveCustomerAverage(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
    orders
      .select(col("o_orderkey"), col("o_custkey"),
        micros(col("o_totalprice")).as("totalprice_micros"))
      // average over exact integer micros: the sum is order-independent,
      // so the avg (one double division) is engine-deterministic —
      // avg over raw doubles would vary in the last ulp with partition
      // row order and could flip the > comparison at the boundary
      .withColumn("cust_avg_micros", avg("totalprice_micros").over(w))
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
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
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

  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(col("r_name") === "ASIA")
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
}
