package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("warmup")(docs.count())
    time("shingles_rowlocal")(graft.operators.Dedup.shingles(docs).count())
    val parts = (0 until 3).map(j => s"element_at(words, CAST(i+$j AS INT))").mkString(", ")
    time("shingles_explode_distinct")(
      docs.select(col("doc_id"), split(lower(col("text")), " ").as("words"))
        .filter(size(col("words")) >= 3)
        .select(col("doc_id"), explode(expr(s"transform(sequence(1, size(words)-2), i -> concat_ws(' ', $parts))")).as("shingle"))
        .distinct().count())
    time("minhash_sigs")(graft.operators.Dedup.minhashSignatures(docs).count())
    time("minhash_cand")(graft.operators.Dedup.minhashCandidates(docs).count())
    time("ngram_jaccard")(graft.operators.Dedup.ngramJaccard(docs).count())
    spark.stop()
  }
}
