package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized SEMANTIC near-duplicate pair substrate — the
  * [[DedupStore]] idea applied to the embedding side: the value
  * collapse and the LSH-bucketed + exact-verified cosine pair relation
  * are derived once and staged; the SemDeDup decisions (cluster
  * labeling, keep-one-per-cluster drop) serve from the staged
  * relations by CC + id joins, never re-touching a vector.
  *
  * Store layout (delta-committed via [[graft.sources.DeltaStore]]):
  *
  *   <path>/delta-<tag>/members  (vec_id, rep, n_copies) — value
  *       collapse: every nonzero vector → the min-vec_id rep of its
  *       byte-identical value group (zero-norm/null vectors are
  *       excluded — cosine is undefined for them, they cannot pair)
  *   <path>/delta-<tag>/pairs    (vec_a, vec_b, cos) — rep-level
  *       verified cosine pairs from [[Ann.lshCosinePairs]] at the
  *       build configuration below
  *
  * The threshold/banding are BAKED into the staged pairs (the verify
  * filter ran on the exact cosine at build); serving a different
  * threshold needs a rebuild — same contract as [[DedupStore]]'s
  * banding constants.
  */
object SemanticStore {

  import graft.sources.DeltaStore

  /** Build configuration: the engine's wired semantic-dedup defaults
    * ([[Clustering.semanticClusters]]). */
  val Threshold = 0.45
  val NumTables = 24
  val BitsPerTable = 4

  private def dot(a: Column, b: Column): Column = graft.functions.Native.dot(a, b)

  /** Full (re)build — [[Clustering.semanticClusters]]'s substrate
    * portion verbatim: value collapse, hyperplane buckets, candidate
    * equi-join, exact-cosine verify over candidates only. */
  def build(embeddings: DataFrame, path: String): Unit = {
    val spark = embeddings.sparkSession
    DeltaStore.reset(spark, path)
    val keyed = embeddings.filter(col("embedding").isNotNull)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .filter(dot(col("v"), col("v")) > 0.0)
      .select(col("vec_id"), col("embedding"), md5(to_json(col("v"))).as("vk"))
      .localCheckpoint()
    val reps = keyed.groupBy("vk")
      .agg(min("vec_id").as("rep"), count(lit(1)).as("n_copies"),
        min("embedding").as("embedding"))
      .localCheckpoint()
    val members = keyed.select(col("vec_id"), col("vk"))
      .join(reps.select(col("vk"), col("rep"), col("n_copies")), Seq("vk"))
      .select("vec_id", "rep", "n_copies")
    val pairs = Ann.lshCosinePairs(
      reps.select(col("rep").as("vec_id"), col("embedding")),
      Threshold, NumTables, BitsPerTable)
    DeltaStore.commit(spark, path, "00000", None) { staging =>
      members.write.mode(SaveMode.Overwrite).parquet(s"$staging/members")
      pairs.write.mode(SaveMode.Overwrite).parquet(s"$staging/pairs")
    }
  }

  private def read(spark: SparkSession, path: String, sub: String): DataFrame = {
    val deltas = DeltaStore.committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    spark.read.parquet(deltas.map(d => s"$d/$sub"): _*)
  }

  def members(spark: SparkSession, path: String): DataFrame = read(spark, path, "members")
  def pairs(spark: SparkSession, path: String): DataFrame = read(spark, path, "pairs")

  /** [[Clustering.semanticClusters]] served from the store: CC over the
    * staged rep pairs, labels fanned to every value copy. */
  def semanticClusters(spark: SparkSession, path: String,
                       maxIter: Int = 20): DataFrame = {
    val repClusters = Dedup.propagateMinLabels(
      pairs(spark, path).select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")),
      maxIter)
    members(spark, path)
      .join(repClusters.select(col("doc_id").as("rep"), col("cluster_id")),
        Seq("rep"), "left")
      .filter(col("cluster_id").isNotNull || col("n_copies") > 1)
      .select(col("vec_id"), coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
  }

  /** [[Clustering.semanticDrop]] served from the store (`embeddings`
    * supplies the surviving rows; the decision is staged-pair work). */
  def semanticDrop(embeddings: DataFrame, path: String): DataFrame = {
    val losers = semanticClusters(embeddings.sparkSession, path)
      .filter(col("vec_id") =!= col("cluster_id"))
      .select("vec_id")
    embeddings.filter(col("embedding").isNotNull)
      .join(losers, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label").cast("long").as("label"))
  }
}
