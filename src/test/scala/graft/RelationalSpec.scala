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
}
