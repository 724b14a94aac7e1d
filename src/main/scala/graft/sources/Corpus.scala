package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Corpus ingestion from the formats the engine supports beyond
  * parquet. The reference ingests from a MongoDB collection with a
  * projection (BatchBM25PreMain.java:155-164) and from text files /
  * sockets in its streaming variants; a shared-nothing engine ingests
  * the same shapes as schema'd file scans — every reader here yields
  * the canonical (doc_id, text) corpus frame with column pruning and
  * predicate pushdown intact.
  */
object Corpus {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Tab-separated `doc_id \t text` lines (the common at-scale text
    * corpus layout — ids travel with the data, no order dependence). */
  def tsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("sep", "\t").csv(path)

  /** CSV with header (doc_id, text, ...). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(col("doc_id").cast("long"), col("text"))

  /** JSON-lines with doc_id/text fields. */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Parquet (the primary columnar path — see [[Tables.documents]]). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("doc_id", "text")
}
