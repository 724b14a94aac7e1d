package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The remaining TPC-H query shapes (Q2/Q6/Q8/Q9/Q11/Q12/Q13/Q17/
  * Q19/Q20/Q21/Q22), re-expressed over the driver's TPC-H-ish schema.
  * The testdata has no partsupp table, ship modes, or phone columns,
  * so the shapes that need them are re-keyed onto available columns —
  * the PLAN SHAPE (correlated min, scalar-subquery HAVING, disjunctive
  * pushdown, double-correlated EXISTS, ...) is what each query
  * exercises, per the round-plan focus on Catalyst behavior at scale.
  *
  * Money math follows the engine-wide exact-micros rule (SURVEY §6):
  * floor(x·1e6) per row into BIGINT before any aggregation, single
  * final division if a ratio is needed.
  */
object TpcH {

  private def micros(c: org.apache.spark.sql.Column) = floor(c * lit(1000000.0)).cast("long")
  private def ts(s: String) = lit(s + " 00:00:00").cast("timestamp")

  /** TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate
    * — every predicate reaches the parquet scan (shipdate/discount/
    * quantity are all pushable), then one partial-aggregated sum. The
    * canonical "does the filter push down" probe: at 100 TB this reads
    * only the row groups whose min/max overlap 1997. */
  def revenueForecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(sum(micros(col("l_extendedprice") * col("l_discount"))).as("revenue_micros"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q2 shape (minimum-cost supplier): the correlated-min
    * subquery, decorrelated to one window pass. No partsupp table →
    * the "offer" is each supplier's best observed unit price
    * (extendedprice/quantity) per part. The supplier⋈nation⋈region dim
    * and the small-part subset are SF-scaled, so no forced broadcast —
    * AQE/size estimates pick broadcast when they fit and fall back to
    * shuffle joins when they don't; the heavy shuffle is the per-(part,
    * supplier) offer aggregate, then a part-keyed window picks the
    * cheapest supplier — rank-1 rows only, no self-join. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"),
      floor(col("l_extendedprice") / col("l_quantity") * lit(1000000.0)).cast("long").as("unit_micros"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(spark, dir).filter(col("r_name") === "EUROPE").select("r_regionkey")
    val euroSupp = s.join(n, s("s_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .select("s_suppkey", "s_name", "n_name")
    val p = Tables.part(spark, dir).filter(col("p_size") <= 10).select("p_partkey", "p_name")
    val offers = li
      .join(euroSupp, li("l_suppkey") === euroSupp("s_suppkey"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "n_name")
      .agg(min(col("unit_micros")).as("offer_micros"))
    val w = Window.partitionBy("p_partkey")
      .orderBy(col("offer_micros").asc, col("s_suppkey").asc)
    offers.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("p_partkey").as("partkey"), col("p_name"), col("s_name"),
        col("n_name"), col("offer_micros"))
  }

  /** TPC-H Q8 (national market share): one nation's share of AMERICA-
    * customer ECONOMY-part revenue per order year. Fact joins once on
    * orderkey (shuffle); the AMERICA-customer set, supplier⋈nation map
    * and the part subset are all SF-scaled, so strategy is left to
    * AQE/size estimates — broadcast when they fit, shuffle join when
    * they don't (a forced hint would OOM at large SF). The share is a
    * conditional sum over the same rows as the total (one aggregate,
    * two exact micros sums, single final division). */
  def marketShare(spark: SparkSession, dir: String, nation: String = "NATION_1"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(spark, dir).filter(col("r_name") === "AMERICA").select("r_regionkey")
    val amerCust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(n.select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region")),
        col("c_nationkey") === col("cn_key"))
      .join(r, col("cn_region") === col("r_regionkey"))
      .select("c_custkey")
    val suppNation = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(n.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val p = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY").select("p_partkey")
    val rev = micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(amerCust, o("o_custkey") === amerCust("c_custkey"))
      .join(suppNation, li("l_suppkey") === suppNation("s_suppkey"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(when(col("supp_nation") === nation, rev).otherwise(lit(0L))).as("nation_micros"),
        sum(rev).as("total_micros"))
      .withColumn("mkt_share",
        round(col("nation_micros").cast("double") / col("total_micros"), 6))
  }

  /** TPC-H Q9 shape (product-type profit): profit per supplier nation
    * per order year for parts matching a name pattern. No partsupp →
    * cost is proxied at 10 % of retail per unit, kept exact with one
    * floor per row. The part subset and supplier⋈nation map scale with
    * SF — join strategy left to AQE; the orderkey join is the single
    * guaranteed fact shuffle, then a 25×#years aggregate. */
  def productProfit(spark: SparkSession, dir: String, pattern: String = "%red%"): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey", "l_suppkey",
      "l_quantity", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val p = Tables.part(spark, dir).filter(col("p_name").like(pattern))
      .select("p_partkey", "p_retailprice")
    val sn = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(Tables.nation(spark, dir).select("n_nationkey", "n_name"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val amount = micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
      floor(col("p_retailprice") * col("l_quantity") * lit(100000.0)).cast("long")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .join(sn, li("l_suppkey") === sn("s_suppkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).as("profit_micros"), count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q11 shape (important stock): groups whose revenue exceeds a
    * threshold derived from the GLOBAL aggregate — the scalar-subquery
    * HAVING. The threshold is 1.05× the MEAN supplier share (Q11's
    * `sum(...) * fraction` with the fraction tied to supplier count,
    * as the spec scales it by SF), kept exact by integer
    * cross-multiplication: rev·n·20 > total·21 ⟺ rev > 1.05·total/n.
    * A fixed-share cut would return zero rows once the supplier count
    * outgrows it — vacuous at every gated scale. The global total is a
    * second aggregate over the same per-supplier partials, broadcast
    * back as one literal row (always safe — one row at any SF), so the
    * fact scans once; the supplier-name join is SF-scaled and left to
    * AQE.
    *
    * The cross-multiplication runs in DECIMAL(38,0): rev·n·20 crosses
    * 2^63 already at ~10^3 suppliers × ~10^14 micros (the 20× probe
    * found the BIGINT form overflowing right at that edge); decimal128
    * keeps the comparison exact on both engines at any SF. */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val bySupp = Tables.lineitem(spark, dir)
      .groupBy("l_suppkey")
      .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_micros"))
    val total = bySupp.agg(sum("rev_micros").as("total_micros"), count(lit(1)).as("n_supp"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    bySupp.crossJoin(broadcast(total))
      .filter(col("rev_micros").cast("decimal(38,0)") * col("n_supp") * lit(20L) >
        col("total_micros").cast("decimal(38,0)") * lit(21L))
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .select(col("l_suppkey").as("suppkey"), col("s_name"), col("rev_micros"))
  }

  /** TPC-H Q12 shape (shipping priority split): late lines (shipped
    * > 60 days after order) in 1997, split urgent/non-urgent per line
    * status. No ship-mode column → l_linestatus keys the groups. One
    * orderkey join (AQE-broadcastable after the date filter), then a
    * two-conditional-sum aggregate of 2 groups. */
  def latePrioritySplit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .select("l_orderkey", "l_linestatus", "l_shipdate")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .groupBy("l_linestatus")
      .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!urgent, 1L).otherwise(0L)).as("low_line_count"))
  }

  /** TPC-H Q13 (customer order-count distribution): the left-outer
    * aggregate-of-aggregate. Orders filtered (priority analogue of the
    * comment filter), left join preserves order-less customers at
    * count 0, then the distribution aggregate runs at per-count
    * cardinality. Two shuffles total (custkey, then c_count — the
    * second over ≤ max-order-count rows). */
  def orderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_orderkey", "o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q17 (small-quantity-order revenue): the correlated
    * per-part average, decorrelated to a per-part aggregate joined
    * back to the fact. The avg comparison qty < 0.2·avg(qty) is kept
    * EXACT by cross-multiplying integers (5·qty·n < Σqty — quantities
    * are integral), so Spark and the oracle agree bit-for-bit with no
    * FP average. The small-part subset and the per-part stats both
    * scale with SF, so join strategy is left to AQE (broadcast when
    * they fit, shuffle otherwise); the fact scans twice (stats pass +
    * probe pass), standard for Q17. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val small = Tables.part(spark, dir).filter(col("p_type") === "SMALL").select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(small, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), floor(col("l_quantity")).cast("long").as("qty"),
        col("l_extendedprice"))
    val stats = li.groupBy(col("l_partkey").as("sp_key"))
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("n_li"))
    li.join(stats, col("l_partkey") === col("sp_key"))
      .filter(col("qty") * lit(5L) * col("n_li") < col("sum_qty"))
      .agg(sum(micros(col("l_extendedprice"))).as("revenue_micros"),
        count(lit(1)).as("n_lines"))
      .withColumn("avg_yearly_micros", expr("revenue_micros div 7"))
  }

  /** TPC-H Q19 (discounted revenue, disjunctive predicates): the
    * OR-of-ANDs filter. Catalyst extracts the common l_partkey join
    * and pushes the brand/size disjunction to the part scan and the
    * quantity bounds (1..30 across branches) to the fact scan; the
    * residual OR evaluates post-join inside codegen. The part side is
    * SF-scaled (strategy left to AQE), then one global sum. */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1.0, 11.0)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10.0, 20.0)) ||
      (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20.0, 30.0))
    li.join(p, li("l_partkey") === p("p_partkey"))
      .filter(cond)
      .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q20 shape (potential promotion suppliers): the nested
    * semi-join chain — suppliers in an ASIA nation who moved > 50
    * units of some PROMO part in 1997. The PROMO partkey set is
    * SF-scaled (AQE picks broadcast vs shuffle), the (supplier, part)
    * aggregate applies the HAVING, and the distinct supplier set
    * semi-joins the dim. Only the nation⋈region map (≤ 25 rows at any
    * SF) is force-broadcast. */
  def promoSuppliers(spark: SparkSession, dir: String, minQty: Long = 50L): DataFrame = {
    val promo = Tables.part(spark, dir).filter(col("p_type") === "PROMO").select("p_partkey")
    val qualified = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .join(promo, col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(floor(col("l_quantity")).cast("long")).as("qty"))
      .filter(col("qty") > minQty)
      .select("l_suppkey").distinct()
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    Tables.supplier(spark, dir)
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === qualified("l_suppkey"), "left_semi")
      .select(col("s_suppkey").as("suppkey"), col("s_name"), col("n_name"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the
    * double-correlated EXISTS / NOT EXISTS. A line is "late" when
    * shipped > 90 days after the order date; a supplier waits an
    * 'F'-status order when it was late AND another supplier
    * participated AND no other supplier was late. Both correlations
    * become orderkey-keyed semi/anti self-joins on the SAME
    * repartitioning of lineitem — three shuffles on one key, no
    * cartesian work. */
  def waitingOrders(spark: SparkSession, dir: String, n: Int = 20): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    // late lines of F orders, with the order date attached once
    val late = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
      .select("l_orderkey", "l_suppkey")
    val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val othersLate = late.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    // group by s_name (after the supplier dim join — SF-scaled, so
    // strategy is AQE's call), exactly like the oracle: grouping by
    // suppkey would split two suppliers that happen to share a name
    // into separate rows the oracle merges
    late
      .join(others, col("ok2") === col("l_orderkey") && col("sk2") =!= col("l_suppkey"), "left_semi")
      .join(othersLate, col("ok3") === col("l_orderkey") && col("sk3") =!= col("l_suppkey"), "left_anti")
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(n)
  }

  /** TPC-H Q22 shape (global sales opportunity): customers richer than
    * the positive-balance average with no RECENT orders (the testdata
    * has no order-less customers), rolled up per nation (no phone
    * column → nationkey prefixes the account). The average comparison
    * cross-multiplies exact micros (bal·n > Σ) — no FP mean; the
    * recent-order set anti-joins after its date filter.
    *
    * Envelope: bal_micros·n_pos < 2^63 holds to ~9·10^8 positive-
    * balance customers at |bal| ≤ 10^4 — beyond that, compare against
    * a precomputed integer mean with remainder instead. */
  def idleRichCustomers(spark: SparkSession, dir: String,
                        since: String = "2000-01-01"): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), micros(col("c_acctbal")).as("bal_micros"))
    val pos = c.filter(col("bal_micros") > 0L)
      .agg(sum("bal_micros").as("sum_pos"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts(since)).select("o_custkey")
    c.crossJoin(broadcast(pos))
      .filter(col("bal_micros") * col("n_pos") > col("sum_pos"))
      .join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"), sum("bal_micros").as("total_bal_micros"))
  }
}
