package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.{Bucketed, Tables}

/** Skew + storage-layout scale paths: salted aggregation/join must be
  * result-identical to the plain forms; bucketed tables must join
  * WITHOUT a shuffle. */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)

  private def countShuffles(df: DataFrame): Int = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => 0
      }
      self + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("salted word count equals plain word count") {
    val plain = graft.operators.Bm25.tokenize(docs)
      .groupBy("term").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedWordCount(docs, salts = 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join equals plain join") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey", salts = 8)
      .select("o_orderkey", "c_name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketed fact-fact join runs with zero shuffles") {
    Bucketed.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 4)
    Bucketed.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.table(spark, "b_orders")
        .join(Bucketed.table(spark, "b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "l_quantity")
      assert(countShuffles(joined) == 0, "bucketed join should be co-located (no exchange)")
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
