package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc parity harness for round work (not part of the library
  * surface): compares a scale-shaped operator against its exact
  * baseline at the gate SFs. */
object Scratch {
  private def sorted(df: DataFrame): Array[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.sources.Tables.embeddings(spark, sf)
      val a1 = sorted(graft.operators.Ann.cosinePairs(emb))
      val b1 = sorted(graft.operators.Ann.lshCosinePairs(emb))
      println(s"$sf embcos: exact=${a1.length} lsh=${b1.length} equal=${a1.sameElements(b1)}")
      val a2 = sorted(graft.operators.Vectors.knnClassify(emb))
      val b2 = sorted(graft.operators.Vectors.knnClassifyIvf(emb, minIvfReps = 0L))
      println(s"$sf knn:    exact=${a2.length} ivf=${b2.length} equal=${a2.sameElements(b2)}")
      val c2 = sorted(graft.operators.Vectors.knnClassifyIvf(emb))
      println(s"$sf knnD:   exact=${a2.length} direct=${c2.length} equal=${a2.sameElements(c2)}")
      if (!a2.sameElements(b2))
        a2.diff(b2).take(5).foreach(r => println(s"  only-exact: $r"))
    }
    spark.stop()
  }
}
