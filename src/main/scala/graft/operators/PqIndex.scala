package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.DeltaStore

/** Staged product-quantization index — the TRAINED-ANN sibling of
  * [[AnnIndex]] (which stages the training-free LSH family). PQ and
  * IVF+PQ pay a real training cost (sampled k-means codebooks, coarse
  * quantizer); that cost belongs in an offline index build, not in
  * every query. `build`/`buildIvf` run the exact [[Ann.pqTopK]] /
  * [[Ann.ivfPqTopK]] training+encode recipe once (same samples, same
  * seeds) and commit the artifacts as one [[DeltaStore]] delta:
  *
  *   <path>/delta-00000/codebooks (j, c, center)    — m×ksub rows, ~KB
  *   <path>/delta-00000/centers   (list_id, center) — IVF coarse (ivf only)
  *   <path>/delta-00000/codes     (vec_id[, list_id], code0..code{m-1})
  *   <path>/delta-00000/vectors   (vec_id, v, nrm)  — exact-rerank store
  *   <path>/delta-00000/pq.params — loud layout/param guard
  *
  * Serving loads codebooks/centers into driver literals (bounded:
  * m×ksub×(dim/m) + nLists×dim doubles — the k-means-sync collect
  * shape), builds the query's ADC table(s) on the driver, and scores
  * the codes relation with a pure map + TakeOrdered + candidates-only
  * exact rerank — zero shuffles of the encoded corpus and ZERO
  * training at query time. Staged == live is spec-pinned: because the
  * build trains with the live operators' recipe on the same data, the
  * staged search returns the SAME rows [[Ann.pqTopK]]/[[Ann.ivfPqTopK]]
  * return.
  *
  * Codebooks are train-once/frozen (the standard add-to-trained-index
  * contract): a new batch would encode against the STORED codebooks
  * and land as another delta; codebook drift is a rebuild, by design.
  * The incremental-NATIVE family (no trained state to drift) is
  * [[AnnIndex]] — that split is the index-maintenance story.
  *
  * Reference anchor: serves the reference's batch scoring loop
  * (BatchBM25PreMain.java:140-247's score-then-rank shape) on the
  * dense side, with the training staged the way its index prep stages
  * IDF state.
  */
object PqIndex {

  /** Build the PQ store: train codebooks ([[Ann.pqTopK]] recipe —
    * sample seed 7, k-means seeds 42+j), encode the corpus, commit. */
  def build(embeddings: DataFrame, path: String,
            m: Int = 8, ksub: Int = 16): Unit = {
    val spark = embeddings.sparkSession
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim does not split into $m subspaces")
    val sub = dim / m
    val v = Ann.doubleVecs(embeddings)
    val n = v.count()
    val codebooks = Ann.pqFitCodebooks(v, "v", m, sub, ksub, n,
      sampleSeed = 7L, kmeansSeedBase = 42L)
    DeltaStore.reset(spark, path)
    DeltaStore.commit(spark, path, "00000", None) { staging =>
      writeCodebooks(spark, codebooks, s"$staging/codebooks")
      v.select(col("vec_id") +: Ann.pqCodeCols(codebooks, "v", m, sub, ksub): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/codes")
      Ann.withNorm(embeddings)
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
      writeParams(spark, staging, s"pq,$m,$ksub,$dim")
    }
  }

  /** Build the IVF+PQ store: coarse quantizer + residual codebooks
    * ([[Ann.ivfPqTopK]] recipe — seeds 7/42 coarse, 9/71+j residual),
    * encode, commit. */
  def buildIvf(embeddings: DataFrame, path: String,
               nLists: Int = 16, m: Int = 8, ksub: Int = 16): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embeddings.sparkSession
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim does not split into $m subspaces")
    val sub = dim / m
    val v = Ann.doubleVecs(embeddings)
    val n = v.count()
    val feats = v.select(col("vec_id"), array_to_vector(col("v")).as("features"))
    val cFrac = math.min(1.0, nLists * 200.0 / math.max(1L, n))
    val cFit = if (cFrac < 1.0) feats.sample(withReplacement = false, cFrac, seed = 7L) else feats
    val coarse = new KMeans().setK(nLists).setSeed(42L).setMaxIter(3).fit(cFit)
    val centers = coarse.clusterCenters.map(_.toArray)
    val assigned = Ann.ivfAssignResiduals(coarse.transform(feats), centers)
    val codebooks = Ann.pqFitCodebooks(assigned, "r", m, sub, ksub, n,
      sampleSeed = 9L, kmeansSeedBase = 71L)
    DeltaStore.reset(spark, path)
    DeltaStore.commit(spark, path, "00000", None) { staging =>
      writeCodebooks(spark, codebooks, s"$staging/codebooks")
      writeCenters(spark, centers, s"$staging/centers")
      assigned.select(col("vec_id") +: col("list_id") +:
          Ann.pqCodeCols(codebooks, "r", m, sub, ksub): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/codes")
      Ann.withNorm(embeddings)
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
      writeParams(spark, staging, s"ivfpq,$nLists,$m,$ksub,$dim")
    }
  }

  /** Build the flat IVF store with the DETERMINISTIC integer-grid
    * coarse quantizer ([[Clustering.fit]]: seeded by the nLists lowest
    * vec_ids, exact BIGINT Lloyd's, `iters` rounds — the
    * [[Ann.ivfExactTopK]] recipe): coarse centers in exact millis,
    * per-vector list assignments, and the exact-rescore vector store.
    * Because every build step is integer-exact and seed-free, the
    * whole index — training included — replays relationally (the
    * q_ann_ivf oracle re-derives centers, lists, probes and the
    * rescore in DuckDB), which is what promotes the staged IVF from
    * rows-only to hash-checked. */
  def buildIvfFlat(embeddings: DataFrame, path: String,
                   nLists: Int = 16, iters: Int = 2): Unit = {
    val spark = embeddings.sparkSession
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    val centers = Clustering.fit(embeddings, nLists, iters)
    DeltaStore.reset(spark, path)
    DeltaStore.commit(spark, path, "00000", None) { staging =>
      writeCentersLong(spark, centers, s"$staging/centers")
      Clustering.assignVectors(embeddings, centers)
        .select(col("vec_id"), col("cluster_id").as("list_id"))
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/lists")
      Ann.withNorm(embeddings)
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
      writeParams(spark, staging, s"ivf,$nLists,$dim")
    }
  }

  /** (vec_id, cos): serve a flat-IVF top-k from the staged store —
    * matches [[Ann.ivfExactTopK]] on the same data exactly. Query-time
    * work: bounded center collect, probed-lists candidate filter
    * (probe selection under the quantizer's own exact-integer metric),
    * exact rescore on probed lists only. */
  def searchIvfFlat(spark: SparkSession, path: String, queryId: Long = 0L,
                    k: Int = 10, nProbe: Int = 4): DataFrame = {
    val d = firstDelta(spark, path, "ivf")
    val centers = readCentersLong(spark, d)
    val vectors = spark.read.parquet(s"$d/vectors")
    val lists = spark.read.parquet(s"$d/lists")
    val q = queryVec(vectors, queryId)
    val probes = Ann.ivfProbesForExact(q, centers, nProbe)
    val cand = lists
      .filter(col("list_id").isin(probes.map(Integer.valueOf): _*))
      .select("vec_id")
    val qn = vectors.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    vectors.join(cand, "vec_id")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round(graft.functions.Native.dot(col("va"), col("v")) /
          (col("na") * col("nrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** (vec_id, adc, cos): serve a PQ top-k from the staged store —
    * matches [[Ann.pqTopK]] on the same data exactly. Query-time work:
    * one bounded codebook collect, one pushed-down single-row vector
    * read, a map-stage ADC scan of the codes relation, TakeOrdered
    * candidates, exact rerank on candidates only. */
  def searchTopK(spark: SparkSession, path: String, queryId: Long = 0L,
                 k: Int = 10, nCandidates: Int = 100): DataFrame = {
    val (codebooks, _, vectors, codes) = load(spark, path, "pq")
    val m = codebooks.length; val sub = codebooks(0)(0).length
    val q = queryVec(vectors, queryId)
    val table = Ann.pqAdcTable(q, codebooks, m, sub)
    val cand = codes.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(Ann.pqAdcCol(table, m), 6).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(nCandidates)
    rerank(vectors, cand, queryId, k)
  }

  /** (vec_id, adc, cos): serve an IVF+PQ top-k from the staged store —
    * matches [[Ann.ivfPqTopK]] on the same data exactly. Scan cost =
    * probed-lists fraction of the codes relation × m lookups. */
  def searchIvfTopK(spark: SparkSession, path: String, queryId: Long = 0L,
                    k: Int = 10, nProbe: Int = 4,
                    nCandidates: Int = 100): DataFrame = {
    val (codebooks, centers, vectors, codes) = load(spark, path, "ivfpq")
    val m = codebooks.length; val sub = codebooks(0)(0).length
    val q = queryVec(vectors, queryId)
    val probes = Ann.ivfProbesFor(q, centers, nProbe)
    val adcByList = Ann.ivfAdcByList(q, centers, codebooks, probes, m, sub)
    val cand = codes
      .filter(col("list_id").isin(probes.map(Integer.valueOf): _*))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(adcByList, 6).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(nCandidates)
    rerank(vectors, cand, queryId, k)
  }

  // ---- store plumbing ----

  private def writeCodebooks(spark: SparkSession,
      codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (center, c) => (j, c, center.toSeq) }
    }.toSeq.toDF("j", "c", "center")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  private def writeCenters(spark: SparkSession,
      centers: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    centers.zipWithIndex.map { case (ctr, i) => (i, ctr.toSeq) }.toSeq
      .toDF("list_id", "center")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Exact-millis (BIGINT) centers — the deterministic flat-IVF
    * quantizer's artifact (lossless, so the oracle re-derives the
    * identical table). */
  private def writeCentersLong(spark: SparkSession,
      centers: Array[Array[Long]], path: String): Unit = {
    import spark.implicits._
    centers.zipWithIndex.map { case (ctr, i) => (i, ctr.toSeq) }.toSeq
      .toDF("list_id", "center")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  private def readCentersLong(spark: SparkSession, delta: String): Array[Array[Long]] =
    spark.read.parquet(s"$delta/centers").select("list_id", "center").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Long](1).toArray)

  private def writeParams(spark: SparkSession, staging: String,
                          params: String): Unit = {
    val fs = DeltaStore.fsOf(spark, staging)
    val out = fs.create(new org.apache.hadoop.fs.Path(staging, "pq.params"), true)
    try out.write(params.getBytes("UTF-8")) finally out.close()
  }

  /** First committed delta, with a loud kind check against the
    * pq.params sidecar. Single-delta store by construction (build
    * resets), so the first committed delta IS the index. */
  private def firstDelta(spark: SparkSession, path: String,
                         expectKind: String): String = {
    val deltas = DeltaStore.committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    val d = deltas.head
    val fs = DeltaStore.fsOf(spark, path)
    val pp = new org.apache.hadoop.fs.Path(d, "pq.params")
    require(fs.exists(pp), s"$d has no pq.params — not a staged vector index")
    val in = fs.open(pp)
    val params = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                 finally in.close()
    val kind = params.split(",")(0)
    require(kind == expectKind, s"store at $path is '$kind', expected '$expectKind'")
    d
  }

  /** Bounded collect of the nLists coarse centers. */
  private def readCenters(spark: SparkSession, delta: String): Array[Array[Double]] =
    spark.read.parquet(s"$delta/centers").select("list_id", "center").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)

  /** Load the trained PQ state (bounded collects: m×ksub codebook
    * rows, nLists center rows — the k-means-sync shape) and open the
    * codes/vectors relations. */
  private def load(spark: SparkSession, path: String, expectKind: String)
      : (Array[Array[Array[Double]]], Array[Array[Double]], DataFrame, DataFrame) = {
    val d = firstDelta(spark, path, expectKind)
    val cbRows = spark.read.parquet(s"$d/codebooks")
      .select("j", "c", "center").collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val ksub = cbRows.map(_.getInt(1)).max + 1
    val codebooks = Array.ofDim[Array[Double]](m, ksub)
    cbRows.foreach(r => codebooks(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    val centers: Array[Array[Double]] =
      if (expectKind == "ivfpq") readCenters(spark, d) else Array.empty
    (codebooks, centers, spark.read.parquet(s"$d/vectors"),
      spark.read.parquet(s"$d/codes"))
  }

  private def queryVec(vectors: DataFrame, queryId: Long): Array[Double] =
    vectors.filter(col("vec_id") === queryId)
      .select("v").head().getSeq[Double](0).toArray

  /** Candidates-only exact rerank against the staged vector store —
    * the [[Ann]] scoring contract (round(cos,4), cos desc / vec_id asc). */
  private def rerank(vectors: DataFrame, cand: DataFrame,
                     queryId: Long, k: Int): DataFrame = {
    val qn = vectors.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    vectors.join(cand, "vec_id")
      .crossJoin(broadcast(qn))
      .select(col("vec_id"), col("adc"),
        round(graft.functions.Native.dot(col("va"), col("v")) /
          (col("na") * col("nrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}
