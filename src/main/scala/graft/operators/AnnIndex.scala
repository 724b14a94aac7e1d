package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized ANN index — the vector-side sibling of [[Bm25Index]]:
  * build once, query without touching the raw corpus.
  *
  *   <path>/vectors  (vec_id, v, nrm)        — double vectors + norms
  *   <path>/buckets  (t, bucket, vec_id)     — LSH bucket membership,
  *                   repartitioned + sorted by (t, bucket) so a
  *                   query's bucket predicate prunes row groups
  *
  * Query cost: read the query's own bucket rows (pushed-down scan on
  * the tiny bucket table), semi-join candidates against the vector
  * store, rescore exactly. At 100 TB the buckets relation is ~numTables
  * rows per vector and each query touches only its own (t, bucket)
  * row groups — never the corpus.
  */
object AnnIndex {

  def build(embeddings: DataFrame, path: String,
            numTables: Int = 8, bitsPerTable: Int = 4): Unit = {
    val e = embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(graft.functions.Native.dot(col("v"), col("v"))))
    e.write.mode(SaveMode.Overwrite).parquet(s"$path/vectors")
    Ann.lshBuckets(embeddings, numTables, bitsPerTable)
      .repartition(col("t"), col("bucket"))
      .sortWithinPartitions("t", "bucket")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/buckets")
  }

  /** (vec_id, cos): top-k neighbors of `queryId` from the staged
    * index — matches [[Ann.lshTopK]] on the same data exactly. */
  def searchTopK(spark: SparkSession, path: String,
                 queryId: Long = 0L, k: Int = 10): DataFrame = {
    val vectors = spark.read.parquet(s"$path/vectors")
    val buckets = spark.read.parquet(s"$path/buckets")
    val qb = buckets.filter(col("vec_id") === queryId)
      .select(col("t").as("qt"), col("bucket").as("qbucket"))
    val candidates = buckets
      .join(broadcast(qb), col("t") === col("qt") && col("bucket") === col("qbucket"))
      .select("vec_id").distinct()
    val q = vectors.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    vectors.join(candidates, "vec_id")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(
        graft.functions.Native.dot(col("va"), col("v")) / (col("na") * col("nrm")), 4))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "cos")
  }
}
