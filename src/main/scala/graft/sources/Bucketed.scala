package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (hash-clustered, sorted) table storage — the co-located
  * join path of SURVEY.md §5. Writing both sides of a recurring join
  * bucketed by the join key with the same bucket count lets every
  * subsequent join run shuffle-free: each task reads matching buckets
  * from both tables. At 100 TB this converts the fact⋈fact join from
  * an every-query shuffle of the big table into a one-time layout
  * decision — the classic warehouse trade.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table `name` (hash of
    * `bucketCol` → `numBuckets` files per partition, rows sorted by
    * the key inside each bucket so merge joins need no sort). */
  def writeBucketed(df: DataFrame, name: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(name)

  /** Read a bucketed table back (bucket metadata rides the catalog). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
