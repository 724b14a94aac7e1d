package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.sources.Tables

/** Sketch aggregates must stay within their advertised error of the
  * exact forms. */
class SketchesSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val events = Tables.events(spark, sf)

  test("HLL distinct counts are within 5% of exact") {
    val rows = Sketches.approxDistinct(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / math.max(1.0, exact) <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("BottomK aggregator equals the unbounded collect_set route") {
    val viaAggregator = Sketches.kmvSample(events, k = 8).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val viaCollectSet = events
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type")
      .agg(array_join(slice(sort_array(collect_set(col("h"))), 1, 8), ",").as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaAggregator.nonEmpty && viaAggregator == viaCollectSet)
  }

  test("approximate quantiles are ordered and satisfy the rank-error guarantee") {
    val approx = Sketches.approxQuantiles(events).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.nonEmpty)
    // the sketch guarantee is on RANK, not value: the returned element's
    // empirical CDF position must be within eps of the requested q
    // (value distance can be arbitrarily large in a heavy tail)
    val values = events.select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    def cdf(xs: Array[Double], v: Double): Double =
      xs.count(_ <= v).toDouble / xs.length
    val eps = 0.02
    approx.foreach { case (k, (p50, p90, p99)) =>
      assert(p50 <= p90 && p90 <= p99, s"$k quantiles out of order")
      val xs = values(k)
      assert(cdf(xs, p50) >= 0.5 - eps && cdf(xs, p50) <= 0.5 + eps + 1.0 / xs.length, s"$k p50 rank ${cdf(xs, p50)}")
      assert(cdf(xs, p90) >= 0.9 - eps && cdf(xs, p90) <= 0.9 + eps + 1.0 / xs.length, s"$k p90 rank ${cdf(xs, p90)}")
      assert(cdf(xs, p99) >= 0.99 - eps, s"$k p99 rank ${cdf(xs, p99)}")
    }
  }
}
