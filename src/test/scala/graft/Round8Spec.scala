package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Round-8 pins: the events.ts layout normalizer (the testdata regen
  * changed events.ts from TIMESTAMP(NANOS)-as-long to timestamp[us],
  * silently breaking every `ts div N` consumer) and its contract that
  * every layout converges to the SAME epoch-nanos long column. */
class Round8Spec extends AnyFunSuite {
  import SparkTestSession._

  test("events.ts normalizer: long, timestamp and ntz layouts converge to identical nanos") {
    import spark.implicits._
    // one instant, three physical layouts
    val micros = Seq(0L, 1L, 1700000000000000L, 1700000123456789L)
    val asLong = micros.map(u => (u * 1000L, "x")).toDF("ts", "event_type")
    val asTs = micros.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"), lit("x").as("event_type"))
    val asNtz = micros.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        lit("x").as("event_type"))
    def nanos(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val out = Tables.normalizeEventTs(df)
      assert(out.schema("ts").dataType == LongType)
      // column order and the other columns survive untouched
      assert(out.columns.toSeq == Seq("ts", "event_type"))
      out.collect().map(_.getLong(0)).toSeq.sorted
    }
    val want = micros.map(_ * 1000L).sorted
    assert(nanos(asLong) == want)
    assert(nanos(asTs) == want)   // session tz pinned UTC
    assert(nanos(asNtz) == want)  // NTZ treated as UTC = DuckDB epoch_ns
  }

  test("events.ts normalizer rejects layouts it cannot make sense of") {
    import spark.implicits._
    val bad = Seq(("2024-01-01", "x")).toDF("ts", "event_type")
    intercept[IllegalStateException] { Tables.normalizeEventTs(bad) }
  }

  test("events table arrives ts-normalized for batch consumers") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType == LongType)
    // sane epoch-nanos range (year 2000..2100) — catches unit slips
    // (micros-as-nanos would land centuries off)
    val mm = e.agg(min("ts"), max("ts")).collect()(0)
    assert(mm.getLong(0) > 946684800L * 1000000000L)
    assert(mm.getLong(1) < 4102444800L * 1000000000L)
  }
}
