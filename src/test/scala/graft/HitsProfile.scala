package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc q_hits end-to-end profiler (round-15 work, not library
  * surface): times Graph.hitsFrom on the sf0.1 purchase graph, twice
  * (cold + warm), matching the Bench harness shape. */
object HitsProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    for (pass <- 1 to 3) {
      val li = graft.sources.Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey").as("s"))
      val o = graft.sources.Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey").as("c"))
      val edges = li.join(o, col("l_orderkey") === col("o_orderkey")).select("c", "s")
      val e0 = t(s"p$pass edge ckpt")(edges.select(col("c"), col("s")).distinct().localCheckpoint())
      t(s"p$pass counts")(e0.agg(count(lit(1)), countDistinct("c"), countDistinct("s")).head)
      t(s"p$pass init collect")(e0.coalesce(3).select("c").distinct().collect())
      val one = t(s"p$pass one halfstep collect") {
        val hub = e0.coalesce(3).select("c").distinct().withColumn("hub", lit(1000000L))
        e0.coalesce(3).join(broadcast(hub), "c").groupBy("s").agg(sum("hub").as("raw")).collect()
      }
      println(s"[prof] rows=${one.length}")
      t(s"p$pass full hitsFrom")(graft.operators.Graph.hitsFrom(edges).count())
      t(s"p$pass full hitsFrom 1-part")(graft.operators.Graph.hitsFrom(edges,
        edgesPerPartition = 1000000L).count())
    }
    spark.stop()
  }
}
