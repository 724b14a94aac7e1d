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
    * the key inside each bucket so merge joins need no sort). Replaces
    * any previous incarnation — including a location left behind by an
    * earlier session, which the in-memory catalog no longer knows but
    * would refuse to overwrite. */
  def writeBucketed(df: DataFrame, name: String, bucketCol: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + name)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(name)
  }

  /** Read a bucketed table back (bucket metadata rides the catalog). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
