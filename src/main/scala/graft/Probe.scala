package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect()
      println(s"========== $n (executed) ==========")
      println(df.queryExecution.executedPlan.toString.linesIterator.take(60).mkString("\n"))
    }
    spark.stop()
  }
}
