package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Materialized near-duplicate PAIR substrate — the staged form of the
  * work every near-dup decision shares. A production dedup pipeline
  * derives its signatures, LSH candidates and exact-verify
  * intersections ONCE and then serves every downstream decision
  * (pair report, clusters, keep/drop, containment) from the staged
  * relation — the same intermediate-persistence idea as the reference
  * pipeline, which writes its TF/IDF intermediates to MongoDB and
  * serves queries from the store (BatchBM25PreMain.java:106-122,
  * MongoTFSink.java) rather than re-running the corpus pass per
  * consumer. Before this store, the six wired dedup decisions each
  * re-derived the identical substrate from the raw corpus (~6× the
  * banding + verify cost — the largest redundant cluster in the
  * engine's benchmark).
  *
  * Store layout (delta-committed via [[graft.sources.DeltaStore]],
  * same atomic-rename protocol as [[Bm25Index]] / [[AnnIndex]]):
  *
  *   <path>/delta-<tag>/members  (doc_id, rep, m)  — exact-collapse map:
  *       every doc → the min-doc_id representative of its identical-text
  *       group (null texts form one group, null-safe), m = group size
  *   <path>/delta-<tag>/reps     (rep, shingleable) — one row per
  *       canonical doc; shingleable = the text has ≥ 3 raw tokens
  *       (shorter texts produce no shingles and can never pair)
  *   <path>/delta-<tag>/cands    (doc_a, doc_b) — the RAW LSH
  *       candidate pairs over the canonical corpus (banding collisions
  *       included, before any verify) — the substrate of the
  *       candidate-graph consumers (link-prediction review queues)
  *   <path>/delta-<tag>/pairs    (doc_a, doc_b, inter, na, nb) —
  *       for every LSH candidate pair of CANONICAL docs (16-perm
  *       MinHash, 4 rows/band) with a non-empty shingle intersection:
  *       exact 3-gram shingle-set intersection size and both set sizes.
  *       Jaccard (inter/(na+nb−inter)) and directional containment
  *       (inter/na, inter/nb) are both pure arithmetic over this row —
  *       one staged relation serves every decision family.
  *
  * Scale shape: the build is exactly one run of the engine's
  * exact-collapse-first banded pipeline (the [[Dedup.verifiedNearDups]]
  * plan, preserving its candidates-first semi-joins); the staged
  * relations are pair-/corpus-id-sized — texts and shingles never land
  * in the store. Serving is arithmetic + id joins: no tokenization, no
  * signatures, no shingle joins at query time.
  */
object DedupStore {

  import graft.sources.DeltaStore

  /** Banding configuration baked into the staged pairs (the engine
    * default: S-curve midpoint ≈ 0.71, matching verify thresholds
    * ≥ 0.7). A different banding needs a different store. */
  val NumPerm = 16
  val RowsPerBand = 4

  /** Full (re)build: reset the store and stage the substrate as one
    * delta. The plan is [[Dedup.verifiedNearDups]]'s substrate portion
    * verbatim — exact collapse, zero-shuffle banding, candidate
    * equi-join, shingle intersection over candidate docs only. */
  def build(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    DeltaStore.reset(spark, path)
    val withH = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val groups = withH.groupBy("h")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("m"))
      .withColumnRenamed("h", "gh")
    // null-safe: null-text docs share the null hash group (GROUP BY
    // null parity with the oracles); their rep never shingles, so they
    // can never pair — but cluster membership (m > 1) needs them mapped
    val members = withH.join(groups, col("h") <=> col("gh"))
      .select("doc_id", "rep", "m")
      .localCheckpoint()
    val canon = docs.join(
      members.filter(col("doc_id") === col("rep")).select("doc_id"),
      Seq("doc_id"), "left_semi").localCheckpoint()
    val reps = canon.select(col("doc_id").as("rep"),
      coalesce(size(graft.functions.Text.rawTokens(col("text"))) >= 3, lit(false))
        .as("shingleable"))
    val cand = Dedup.minhashCandidates(canon, NumPerm, RowsPerBand).localCheckpoint()
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sh = Dedup.shingles(canon.join(candDocs, Seq("doc_id"), "left_semi"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val stats = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
      .join(sizes.select(col("doc_id"), col("n_sh").as("na")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("n_sh").as("nb")),
        col("doc_b") === col("doc_id")).drop("doc_id")
    DeltaStore.commit(spark, path, "00000", None) { staging =>
      members.write.mode(SaveMode.Overwrite).parquet(s"$staging/members")
      reps.write.mode(SaveMode.Overwrite).parquet(s"$staging/reps")
      cand.write.mode(SaveMode.Overwrite).parquet(s"$staging/cands")
      stats.write.mode(SaveMode.Overwrite).parquet(s"$staging/pairs")
    }
  }

  private def read(spark: SparkSession, path: String, sub: String): DataFrame = {
    val deltas = DeltaStore.committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    spark.read.parquet(deltas.map(d => s"$d/$sub"): _*)
  }

  def members(spark: SparkSession, path: String): DataFrame = read(spark, path, "members")
  def reps(spark: SparkSession, path: String): DataFrame = read(spark, path, "reps")
  def pairStats(spark: SparkSession, path: String): DataFrame = read(spark, path, "pairs")
  def candidates(spark: SparkSession, path: String): DataFrame = read(spark, path, "cands")

  /** Same S-curve sanity gate as [[Dedup.verifiedNearDups]]: the staged
    * banding's candidate recall must cover the requested threshold. */
  private def requireThreshold(threshold: Double): Unit = {
    val bands = NumPerm / RowsPerBand
    val midpoint = math.pow(1.0 / bands, 1.0 / RowsPerBand)
    require(threshold >= midpoint - 0.05,
      f"verify threshold $threshold%.2f is far below the staged banding's " +
        f"S-curve midpoint $midpoint%.2f (numPerm=$NumPerm, rowsPerBand=$RowsPerBand): " +
        "the staged candidates would miss most boundary pairs — rebuild with more/narrower bands")
  }

  /** Rep-level verified pairs at `threshold` — pure arithmetic over the
    * staged stats ([[Dedup.ngramJaccard]]'s exact ratio and rounding). */
  private def repPairsAt(spark: SparkSession, path: String, threshold: Double): DataFrame =
    pairStats(spark, path)
      .withColumn("j_exact",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("j_exact") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("j_exact"), 4).as("jaccard"))

  /** [[Dedup.verifiedNearDups]] served from the store: rep pairs by
    * arithmetic, then the two exact-copy expansions (cross-group via
    * the members map, within-group Jaccard-1.0 for shingleable reps). */
  def verifiedNearDups(spark: SparkSession, path: String,
                       threshold: Double = 0.8): DataFrame = {
    requireThreshold(threshold)
    val repPairs = repPairsAt(spark, path, threshold)
    val mem = members(spark, path)
    val ma = mem.select(col("rep").as("doc_a"), col("doc_id").as("a"))
    val mb = mem.select(col("rep").as("doc_b"), col("doc_id").as("b"))
    val cross = repPairs.join(ma, "doc_a").join(mb, "doc_b")
      .select(least(col("a"), col("b")).as("doc_a"),
        greatest(col("a"), col("b")).as("doc_b"), col("jaccard"))
    val shingleableReps = reps(spark, path).filter(col("shingleable")).select("rep")
    val memA = mem.filter(col("m") >= 2).join(shingleableReps, "rep")
      .select(col("rep"), col("doc_id").as("a"))
    val within = memA.as("x")
      .join(memA.as("y"), col("x.rep") === col("y.rep") && col("x.a") < col("y.a"))
      .select(col("x.a").as("doc_a"), col("y.a").as("doc_b"), lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** [[Dedup.nearDupClusters]] served from the store: connected
    * components over the rep-level verified pair graph (the only
    * iterative work — pair-sized, not corpus-sized), then the members
    * map fans labels out to every exact copy. */
  def nearDupClusters(spark: SparkSession, path: String,
                      threshold: Double = 0.8, maxIter: Int = 20): DataFrame = {
    requireThreshold(threshold)
    val canonClusters = Dedup.propagateMinLabels(
      repPairsAt(spark, path, threshold).select("doc_a", "doc_b"), maxIter)
    members(spark, path)
      .join(canonClusters.select(col("doc_id").as("rep"), col("cluster_id")),
        Seq("rep"), "left")
      .filter(col("cluster_id").isNotNull || col("m") > 1)
      .select(col("doc_id"), coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
  }

  /** [[Dedup.keepBest]] served from the store (`docs` supplies the
    * ranking feature n_chars; all pairwise work is staged). */
  def keepBest(docs: DataFrame, path: String, threshold: Double = 0.8): DataFrame = {
    val spark = docs.sparkSession
    val clusters = nearDupClusters(spark, path, threshold).localCheckpoint()
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val best = clusters
      .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("doc_id", "cluster_id")
    val loners = docs.join(clusters, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    best.unionByName(loners)
  }

  /** [[Dedup.dropDuplicates]] served from the store: the canonical
    * corpus minus every rep-level pair's doc_b. */
  def dropDuplicates(docs: DataFrame, path: String,
                     threshold: Double = 0.8): DataFrame = {
    requireThreshold(threshold)
    val spark = docs.sparkSession
    val canonCorpus = docs.join(
      members(spark, path).filter(col("doc_id") === col("rep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val losers = repPairsAt(spark, path, threshold)
      .select(col("doc_b").as("doc_id")).distinct()
    canonCorpus.join(losers, Seq("doc_id"), "left_anti")
  }

  /** [[Dedup.containmentPairs]] served from the store — the staged
    * stats carry both directions' denominators. */
  def containmentPairs(spark: SparkSession, path: String,
                       threshold: Double = 0.5): DataFrame =
    pairStats(spark, path)
      .withColumn("ca", col("inter").cast("double") / col("na"))
      .withColumn("cb", col("inter").cast("double") / col("nb"))
      .filter(col("ca") >= threshold || col("cb") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("ca"), 4).as("cont_a"), round(col("cb"), 4).as("cont_b"))

  /** [[Dedup.dropContained]] served from the store: the more-contained
    * (smaller-shingle-set) side of every clearing pair drops. */
  def dropContained(spark: SparkSession, path: String,
                    threshold: Double = 0.9): DataFrame = {
    val losers = pairStats(spark, path)
      .filter(col("inter").cast("double") / least(col("na"), col("nb")) >= threshold)
      .select(when(col("na") < col("nb"), col("doc_a"))
        .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
    reps(spark, path).select(col("rep").as("doc_id"))
      .join(losers, Seq("doc_id"), "left_anti")
  }
}
