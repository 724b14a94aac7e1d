package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val events = Tables.events(spark, sf)

  test("asOfJoin: every matched click is the latest one at or before its purchase") {
    val rows = Relational.asOfJoin(events).collect()
    assert(rows.nonEmpty)
    val clicks = events.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val purchases = rows.filter(!_.isNullAt(3))
    assert(purchases.nonEmpty)
    purchases.foreach { r =>
      val (user, pTs, cId, cTs) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cTs <= pTs)
      // no strictly-later click still at/before the purchase (ms granularity check)
      val better = clicks.filter(c => c._1 == user && c._3 / 1000000 > cTs && c._3 / 1000000 <= pTs)
      assert(better.isEmpty, s"user $user purchase@$pTs matched click $cId@$cTs but later exists: ${better.take(2).toSeq}")
    }
  }

  test("asOfJoin: purchases with no prior click keep null click columns") {
    val all = Relational.asOfJoin(events)
    val nP = events.filter(col("event_type") === "purchase").count()
    assert(all.count() == nP) // left outer semantics: every purchase survives
  }

  test("cube has every grouping combination, in one scan") {
    val li = Tables.lineitem(spark, sf)
    val rows = Relational.returnsCube(li).collect()
    val byGrp = rows.groupBy(_.getAs[Long]("grp_id")).view.mapValues(_.length).toMap
    val nFlag = li.select("l_returnflag").distinct().count().toInt
    val nStat = li.select("l_linestatus").distinct().count().toInt
    assert(byGrp(3L) == 1) // grand total
    assert(byGrp(1L) == nFlag) // per flag (status aggregated)
    assert(byGrp(2L) == nStat)
    // total row count in the grand-total cell equals the table size
    val total = rows.filter(_.getAs[Long]("grp_id") == 3L).head.getAs[Long]("n")
    assert(total == li.count())
    // single scan: the cube expands in-plan, it does not union scans
    val scans = Relational.returnsCube(li).queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Scan parquet"))
    assert(scans == 1, "cube must not re-scan per grouping set")
  }

  test("grouping sets = the union of the three separate aggregations") {
    val li = Tables.lineitem(spark, sf)
    val gs = Relational.groupingSetsAgg(li).collect()
    assert(gs.count(r => !r.isNullAt(0) && r.isNullAt(1)) ==
      li.select("l_returnflag").distinct().count())
    assert(gs.count(r => r.isNullAt(0) && !r.isNullAt(1)) ==
      li.select("l_linestatus").distinct().count())
    assert(gs.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
  }

  test("full outer day balance keeps unmatched days from both sides") {
    val rows = Relational.dailyOrderShipBalance(spark, sf).collect()
    assert(rows.exists(_.isNullAt(1)) || rows.exists(_.isNullAt(2)),
      "expected at least one one-sided day")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "day key must be unique")
  }

  test("band range join assigns every row to exactly one covering band") {
    val li = Tables.lineitem(spark, sf)
    val got = Relational.priceBandJoin(li).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.sum == li.count(), "bands must partition the price domain")
    // spot-check band boundaries against a direct filter
    assert(got(1L) == li.filter(col("l_extendedprice") < 20000.0).count())
  }

  test("deterministic corr matches Spark's corr() to 1e-6") {
    val li = Tables.lineitem(spark, sf)
    val ours = Relational.quantityPriceCorr(li).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ref = li.groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-6, s"$k: $v vs ${ref(k)}") }
  }

  test("quartiles: ntile buckets are balanced and pct_rank is monotone") {
    val rows = Relational.orderQuartiles(Tables.orders(spark, sf)).collect()
    val byCust = rows.groupBy(_.getLong(1))
    byCust.values.foreach { g =>
      val sizes = g.groupBy(_.getAs[Long]("quartile")).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, "ntile must balance bucket sizes within 1")
      val sorted = g.sortBy(r => (-r.getAs[Long]("totalprice_micros"), r.getLong(0)))
      assert(sorted.map(_.getAs[Double]("pct_rank")).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true
      })
    }
  }

  test("outliers are exactly the >2-sigma rows") {
    val e = events.select(col("event_id"), col("event_type"),
      floor(col("value") * 1000).cast("long").as("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = e.groupBy(_._2).values.flatMap { g =>
      val n = g.length.toDouble
      val mean = g.map(_._3).sum / n
      val variance = g.map(x => (x._3 - mean) * (x._3 - mean)).sum / n
      g.filter(x => math.abs(x._3 - mean) > 2 * math.sqrt(variance)).map(_._1).toSeq
    }.toSet
    val got = Relational.valueOutliers(events).collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("scd2 intervals cover all events and never overlap per user") {
    val rows = Relational.typeIntervals(events).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == events.count())
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("valid_from_ms"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_ms") <= b.getAs[Long]("valid_from_ms"),
            s"overlapping intervals for user ${a.getLong(0)}")
          // consecutive islands must switch type, else they'd be one island
          assert(a.getString(1) != b.getString(1) ||
            a.getAs[Long]("valid_to_ms") < b.getAs[Long]("valid_from_ms"))
        case _ =>
      }
    }
  }

  test("exact percentiles are ordered and bracket the data") {
    Relational.exactPercentiles(events).collect().foreach { r =>
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p90 && p90 <= p99)
    }
  }
}
