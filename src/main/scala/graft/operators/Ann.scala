package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (array<float>[64]).
  *
  * Brute-force cosine is the correctness baseline (all-pairs /
  * one-vs-all with higher-order array functions, fully codegen-able);
  * random-hyperplane LSH bucketing is the scale path: at 100 TB the
  * bucket id is the shuffle key and each query only scans its own
  * buckets' candidates instead of the full corpus.
  *
  * Hyperplane weights are md5-derived (plane p, dim i →
  * uniform[-0.5, 0.5]) so signatures are reproducible in the DuckDB
  * oracle with no shipped random state.
  */
object Ann {

  /** Embeddings with double-cast vector `v` and its L2 norm. */
  private def withNorm(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(expr("aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)")))

  private val dotExpr =
    "aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"

  /** (vec_a, vec_b, cos): all pairs with rounded cosine ≥ threshold.
    * O(n²) — the exactness baseline for near-dup detection; LSH below
    * is what runs at scale. */
  def cosinePairs(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val e = withNorm(embeddings)
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", round(expr(dotExpr) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  /** (vec_id, cos): exact top-k cosine neighbors of `queryId` —
    * one-vs-all with the single query row broadcast. */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    e.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("v").as("vb"), col("nrm").as("nb"))
      .crossJoin(broadcast(q))
      .withColumn("cos", round(expr(dotExpr) / (col("na") * col("nb")), 4))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "cos")
  }

  /** (vec_id, t, bucket): random-hyperplane LSH — `numTables` tables
    * of `bitsPerTable` sign bits each (OR-amplification). With cosine
    * c, P(table hit) = (1 - acos(c)/pi)^bits; 8 tables × 4 bits gives
    * ~0.7 recall at c≈0.35 while scanning ~1/3 of the corpus. */
  def lshBuckets(spark: SparkSession, embeddings: DataFrame,
                 numTables: Int = 8, bitsPerTable: Int = 4): DataFrame = {
    val numPlanes = numTables * bitsPerTable
    val planes = spark.range(0, numPlanes).select(col("id").as("p"))
      .crossJoin(spark.range(1, 65).select(col("id").as("i")))
      .withColumn("w",
        expr("CAST(conv(substr(md5(concat(p, '_', i)), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0 - 0.5"))
    val e = embeddings.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).as("i"), col("x").cast("double").as("val"))
    e.join(broadcast(planes), "i")
      .groupBy("vec_id", "p")
      .agg(sum(col("w") * col("val")).as("s"))
      .groupBy(col("vec_id"), expr(s"p div $bitsPerTable").as("t"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(p, CASE WHEN s > 0 THEN '1' ELSE '0' END AS bit))), x -> x.bit), '')").as("bucket"))
  }

  /** (vec_id, cos): LSH-approximated top-k neighbors of `queryId` —
    * candidates = vectors sharing any table bucket with the query,
    * then exact cosine on candidates only. */
  def lshTopK(spark: SparkSession, embeddings: DataFrame,
              queryId: Long = 0L, k: Int = 10,
              numTables: Int = 8, bitsPerTable: Int = 4): DataFrame = {
    val buckets = lshBuckets(spark, embeddings, numTables, bitsPerTable)
    val qb = buckets.filter(col("vec_id") === queryId)
      .select(col("t").as("qt"), col("bucket").as("qbucket"))
    val candidates = buckets
      .join(broadcast(qb), col("t") === col("qt") && col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= queryId)
      .select("vec_id").distinct()
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("va"), col("nrm").as("na"))
    e.join(candidates, "vec_id")
      .select(col("vec_id"), col("v").as("vb"), col("nrm").as("nb"))
      .crossJoin(broadcast(q))
      .withColumn("cos", round(expr(dotExpr) / (col("na") * col("nb")), 4))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "cos")
  }
}
