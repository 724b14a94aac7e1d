package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Similarity search over the embeddings table (array<float>[64]).
  *
  * Brute-force cosine is the correctness baseline (all-pairs /
  * one-vs-all); random-hyperplane LSH bucketing and IVF inverted
  * lists are the scale paths: at 100 TB the bucket/list id is the
  * shuffle key and each query only scans its own candidates instead
  * of the full corpus.
  *
  * All dot products go through the codegen'd native expression
  * `graft_dot` (graft.functions.DotProduct) — a primitive loop per
  * row, no interpreted lambdas. Hyperplane weights are md5-derived
  * (plane p, dim i → uniform[-0.5, 0.5]) and materialized as LITERAL
  * arrays in the plan, so bucketing is a pure map stage: zero shuffle,
  * reproducible with no shipped random state.
  */
object Ann {

  /** Codegen'd dot product (graft_dot is registered by GraftExtensions). */
  private def dot(a: Column, b: Column): Column = graft.functions.Native.dot(a, b)

  /** Embeddings as (vec_id, v: array<double>). */
  private[operators] def doubleVecs(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  /** Embeddings with double-cast vector `v` and its L2 norm. */
  private[operators] def withNorm(embeddings: DataFrame): DataFrame =
    doubleVecs(embeddings)
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** The shared exact-rescore stage: cosine of `queryId` against every
    * vector (restricted to `candidates` when given), deterministic
    * (score desc, vec_id asc) top-k. Every topK variant ends here so
    * the scoring contract lives in exactly one place. */
  private def exactTopK(embeddings: DataFrame, candidates: Option[DataFrame],
                        queryId: Long, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    val pool = candidates.fold(e)(c => e.join(c, "vec_id"))
    pool.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("v").as("vb"), col("nrm").as("nb"))
      .crossJoin(broadcast(q))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "cos")
  }

  /** (vec_id, ip): exact top-k MAXIMUM INNER PRODUCT search (MIPS) —
    * the retrieval objective of recommender/two-tower models, where
    * un-normalized magnitude IS signal and cosine's normalization is
    * wrong. Same scan shape as [[bruteForceTopK]]: one broadcast query
    * row, codegen'd graft_dot over the corpus, distributed
    * TakeOrdered on (rounded ip desc, vec_id asc). The scale path is
    * the classic norm-augmentation REDUCTION to cosine (Bachrach et
    * al. 2014): append sqrt(M² − ‖x‖²) to each vector (M = max norm)
    * and 0 to the query — augmented-cosine order equals inner-product
    * order, so every ANN structure in this file (LSH buckets, IVF
    * lists) serves MIPS unchanged; the reduction's order-equivalence
    * is spec-asserted against this exact baseline. */
  def mipsTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = doubleVecs(embeddings)
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("va"))
    e.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("v").as("vb"))
      .crossJoin(broadcast(q))
      .withColumn("ip", round(dot(col("va"), col("vb")), 4))
      .orderBy(col("ip").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "ip")
  }

  /** The norm-augmentation transform backing the MIPS→cosine
    * reduction: (vec_id, v) with sqrt(M² − ‖x‖²) appended, M = max
    * corpus norm (a broadcast scalar). Exposed for the spec that
    * proves augmented-cosine order == inner-product order. */
  private[graft] def normAugmented(embeddings: DataFrame): DataFrame = {
    val e = withNorm(embeddings)
    val m = e.agg(max("nrm").as("m"))
    e.crossJoin(broadcast(m))
      .select(col("vec_id"),
        concat(col("v"), array(sqrt(col("m") * col("m") - col("nrm") * col("nrm"))))
          .as("v"))
  }

  /** (vec_a, vec_b, cos): all pairs with cosine ≥ threshold. O(n²) —
    * the exactness baseline for near-dup detection; LSH below is what
    * runs at scale. The threshold applies to the EXACT cosine
    * (deterministic: same fold order in both engines); rounding is
    * output-only. */
  def cosinePairs(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val e = withNorm(embeddings)
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("c_exact", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("c_exact") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("c_exact"), 4).as("cos"))
  }

  /** (vec_a, vec_b, cos): [[cosinePairs]] re-shaped for scale — the
    * semantic-dedup pair surface as a hyperplane-LSH bucket self-join
    * for candidates plus an exact-cosine verify over candidates only
    * (the [[Dedup.verifiedNearDups]] shape applied to vectors). The
    * plan never materializes the N² cross product: buckets come from a
    * pure map stage over literal planes, the candidate join shuffles on
    * the (table, bucket) key, and the float math runs on candidate
    * pairs only.
    *
    * Recall contract (same family as the MinHash banding guard): a pair
    * at cosine c survives candidate generation with probability
    * 1-(1-p^b)^T where p = 1-acos(c)/π; thresholds below the S-curve's
    * 50% midpoint are rejected loudly. The 24×4 default holds every
    * ≥0.45 pair of the test corpus; for production semantic dedup at
    * cosine ≥0.8 RAISE bitsPerTable (8-16) — more bits shrink buckets
    * (candidate volume) exponentially while the higher threshold keeps
    * per-table hit probability up. bitsPerTable 4 at a 0.45 threshold
    * is the recall-safe floor, not the throughput point. */
  def lshCosinePairs(embeddings: DataFrame, threshold: Double = 0.45,
                     numTables: Int = 24, bitsPerTable: Int = 4): DataFrame = {
    val pMid = math.pow(1.0 - math.pow(0.5, 1.0 / numTables), 1.0 / bitsPerTable)
    val cMid = math.cos(math.Pi * (1.0 - pMid))
    require(threshold >= cMid - 0.05,
      f"verify threshold $threshold%.2f is below the hyperplane-LSH S-curve " +
        f"midpoint $cMid%.2f (numTables=$numTables, bitsPerTable=$bitsPerTable): " +
        "candidate generation would miss most boundary pairs — add tables or drop bits")
    val buckets = lshBuckets(embeddings, numTables, bitsPerTable)
    val cand = buckets.select(col("vec_id").as("vec_a"), col("t"), col("bucket"))
      .join(buckets.select(col("vec_id").as("vec_b"), col("t"), col("bucket")),
        Seq("t", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val e = withNorm(embeddings)
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na")),
        Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")),
        Seq("vec_b"))
      .withColumn("c_exact", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("c_exact") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("c_exact"), 4).as("cos"))
  }

  /** (vec_id, cos): exact top-k cosine neighbors of `queryId` —
    * one-vs-all with the single query row broadcast. */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame =
    exactTopK(embeddings, None, queryId, k)

  /** (vec_id, cos): FILTERED vector search — exact top-k cosine among
    * vectors satisfying a metadata predicate (here label = `label`),
    * the "vector search with a WHERE clause" every retrieval stack
    * ships. The predicate prunes the pool BEFORE scoring (predicate
    * pushdown reaches the parquet scan), so the scan is
    * selectivity-scaled; scoring and ranking are [[bruteForceTopK]]'s
    * broadcast-query plan on the surviving pool. */
  def filteredTopK(embeddings: DataFrame, label: Int = 3,
                   queryId: Long = 0L, k: Int = 10): DataFrame =
    exactTopK(embeddings,
      Some(embeddings.filter(col("label") === label).select("vec_id")), queryId, k)

  /** (vec_id, cos): cosine of `queryId` against EVERY other vector,
    * unranked (rounded to 4 dp — the scoring contract shared with the
    * top-k variants). The rank-fusion input for [[Hybrid.rrfSearch]]. */
  def cosineAll(embeddings: DataFrame, queryId: Long = 0L): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    e.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("v").as("vb"), col("nrm").as("nb"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cos"))
  }

  /** (vec_id, cos): RANGE search — every vector within cosine ≥
    * `minCos` of the query, the "all sufficiently-similar neighbors"
    * complement of top-k (dedup radius queries, recall-at-threshold
    * eval). Exact form: one broadcast of the query row + a codegen'd
    * map-filter over the corpus — zero shuffles, and unlike top-k
    * there is no ordering step at all, so the plan is scan-shaped and
    * embarrassingly parallel. At 100 TB, when the full scan itself is
    * too much, route the same predicate through the probed IVF lists
    * ([[ivfTopK]]'s substrate) and accept list-recall — this exact
    * form stays the oracle-checkable baseline. */
  def rangeSearch(embeddings: DataFrame, queryId: Long = 0L,
                  minCos: Double = 0.2): DataFrame =
    cosineAll(embeddings, queryId).filter(col("cos") >= minCos)

  /** (vec_id, t, bucket): random-hyperplane LSH — `numTables` tables
    * of `bitsPerTable` sign bits each (OR-amplification). With cosine
    * c, P(table hit) = (1 - acos(c)/pi)^bits; 8 tables × 4 bits gives
    * ~0.7 recall at c≈0.35 while scanning ~1/3 of the corpus. Pure map
    * stage — no join, no shuffle: ALL table buckets come from the
    * fused native [[graft.functions.HyperplaneBuckets]] expression
    * (one pass over the vector, md5-derived planes baked in; the
    * previous per-plane dot-expression forest blew past codegen
    * limits at production plane counts and ran interpreted). A NULL
    * embedding yields no bucket rows. */
  def lshBuckets(embeddings: DataFrame,
                 numTables: Int = 8, bitsPerTable: Int = 4): DataFrame =
    embeddings.select(col("vec_id"),
      posexplode(graft.functions.Native.hyperplaneBuckets(
        col("embedding"), numTables, bitsPerTable)).as(Seq("t", "bucket")))

  /** (vec_id, cos): LSH-approximated top-k neighbors of `queryId` —
    * candidates = vectors sharing any table bucket with the query,
    * then the exact rescore on candidates only. */
  def lshTopK(embeddings: DataFrame,
              queryId: Long = 0L, k: Int = 10,
              numTables: Int = 8, bitsPerTable: Int = 4): DataFrame = {
    val buckets = lshBuckets(embeddings, numTables, bitsPerTable)
    val qb = buckets.filter(col("vec_id") === queryId)
      .select(col("t").as("qt"), col("bucket").as("qbucket"))
    val candidates = buckets
      .join(broadcast(qb), col("t") === col("qt") && col("bucket") === col("qbucket"))
      .select("vec_id").distinct()
    exactTopK(embeddings, Some(candidates), queryId, k)
  }

  /** (vec_id, cos): MULTIPROBE LSH top-k — [[lshTopK]] with HALF the
    * tables (4 vs 8) and, per table, the query probing its own bucket
    * PLUS every Hamming-1 neighbor (one hyperplane's sign flipped):
    * the classic memory/recall trade (Lv et al. 2007) — a vector that
    * misses the query's bucket by ONE marginal hyperplane is still
    * found, so fewer tables buy the recall that extra tables
    * otherwise pay for in index size. At 100 TB the bucket relation
    * is the index: halving tables halves the stored rows AND the
    * candidate-join input, while the probe expansion touches only
    * the query side (1 + bits rows per table, broadcast like
    * [[lshTopK]]'s buckets). Buckets are bit STRINGS (the
    * HyperplaneBuckets output), so a probe flips one character —
    * the identical expansion the oracle runs. Exact rescore on
    * candidates only, the family contract. */
  def lshMultiprobeTopK(embeddings: DataFrame,
                        queryId: Long = 0L, k: Int = 10,
                        numTables: Int = 4, bitsPerTable: Int = 4): DataFrame = {
    val buckets = lshBuckets(embeddings, numTables, bitsPerTable)
    val qb = buckets.filter(col("vec_id") === queryId)
      .select(col("t").as("qt"), col("bucket").as("qbucket"))
    val probes = qb.select(col("qt"), explode(expr(
        s"transform(sequence(0, $bitsPerTable), " +
          "i -> CASE WHEN i = 0 THEN qbucket " +
          "ELSE concat(substring(qbucket, 1, i - 1), " +
          "CASE WHEN substring(qbucket, i, 1) = '1' THEN '0' ELSE '1' END, " +
          s"substring(qbucket, i + 1, $bitsPerTable)) END)")).as("qbucket"))
      .distinct()
    val candidates = buckets
      .join(broadcast(probes),
        col("t") === col("qt") && col("bucket") === col("qbucket"))
      .select("vec_id").distinct()
    exactTopK(embeddings, Some(candidates), queryId, k)
  }

  /** (vec_id, cos): IVF-approximated top-k neighbors of `queryId` —
    * a k-means coarse quantizer (MLlib, fixed seed) partitions the
    * corpus into nLists inverted lists; the query probes the nProbe
    * centroids nearest to it and the exact rescore runs over those
    * lists only. The 100 TB shape: train on a sample, assign in one
    * map pass, store lists partitioned by list id, touch
    * nProbe/nLists of the data per query. */
  def ivfTopK(embeddings: DataFrame,
              queryId: Long = 0L, k: Int = 10,
              nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = embeddings.select(col("vec_id"),
      array_to_vector(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as("features"))
    // the quantizer only needs representative centroids: fit on a
    // deterministic sample of ~200 points per centroid (the 100 TB
    // norm — training the coarse quantizer on the full corpus would be
    // a full extra pass), then assign every vector in one map stage
    val n = feats.count()
    val frac = math.min(1.0, nLists * 200.0 / math.max(1L, n))
    val fitSet = if (frac < 1.0) feats.sample(withReplacement = false, frac, seed = 7L) else feats
    val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(3).fit(fitSet)
    val assigned = model.transform(feats).select(col("vec_id"), col("prediction").as("list_id"))
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).head().getSeq[Double](0).toArray
    val probes = model.clusterCenters.zipWithIndex
      .sortBy { case (c, _) => -cosineSim(c.toArray, qVec) }
      .take(nProbe).map(_._2)
    val candidates = assigned
      .filter(col("list_id").isin(probes.map(Integer.valueOf): _*))
      .select("vec_id")
    exactTopK(embeddings, Some(candidates), queryId, k)
  }

  /** (vec_id, hamming, cos): binary-quantized ANN — every vector is
    * collapsed to a 64-bit SIGN signature (stored as 4×16-bit chunks
    * so the bit arithmetic never touches the sign bit of a 64-bit
    * int), candidates are the `nCandidates` smallest hamming
    * distances to the query signature, and the exact cosine rerank
    * runs on candidates only. This is the 1-bit extreme of the
    * quantization ladder ([[Vectors.quantizeInt8]] is the 8-bit rung):
    * a 64-dim float vector becomes 8 BYTES, hamming is two
    * instructions (xor + popcount, both codegen'd here), and the
    * expensive float math touches only the candidate set — the memory
    * /compute shape billion-vector first-pass retrieval uses.
    * Signature construction is a pure map stage (zero shuffles);
    * candidate selection is a size-nCandidates TakeOrdered. */
  def hammingTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10,
                  nCandidates: Int = 100): DataFrame = {
    val sigCols = (0 until 4).map { c =>
      expr(s"aggregate(zip_with(slice(embedding, ${c * 16 + 1}, 16), sequence(0, 15), " +
        "(x, i) -> IF(x > CAST(0 AS FLOAT), shiftleft(1L, i), 0L)), 0L, (a, b) -> a + b)")
        .as(s"s$c")
    }
    val sigs = embeddings.select(col("vec_id") +: sigCols: _*)
    val q = sigs.filter(col("vec_id") === queryId)
      .select((0 until 4).map(c => col(s"s$c").as(s"q$c")): _*)
    val hamming = (0 until 4)
      .map(c => bit_count(col(s"s$c").bitwiseXOR(col(s"q$c"))).cast("long"))
      .reduce(_ + _)
    val cand = sigs.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), hamming.as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id").asc).limit(nCandidates)
    // exact rerank inlined (not exactTopK) so the signature/candidate
    // subtree is referenced ONCE — routing through exactTopK's semi
    // -join and re-joining cand for the hamming column would evaluate
    // the candidate TakeOrdered (and its corpus signature pass) twice
    val e = withNorm(embeddings)
    val qn = e.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    e.join(cand, "vec_id")
      .crossJoin(broadcast(qn))
      .select(col("vec_id"), col("hamming"),
        round(dot(col("va"), col("v")) / (col("na") * col("nrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** (bin, n_pairs): the PAIRWISE-COSINE HISTOGRAM over a bounded
    * deterministic sample — embedding-geometry health at a glance
    * (hubness / collapsed-embedding pathologies show up as mass
    * piling near bin 9-10; a healthy space spreads). The sample is
    * two independent md5-keyed TakeOrdered draws of `perSide`
    * vectors, so the pair count is CONSTANT (perSide²/2-ish) at any
    * corpus size — never an all-pairs or even quadratic-in-n scan.
    * bin = floor(round(cos, 4)·10) ∈ [-10, 10]; zero-norm vectors
    * excluded (cosine undefined). */
  def pairCosHistogram(embeddings: DataFrame, perSide: Int = 100): DataFrame = {
    require(perSide > 0, s"perSide must be positive, got $perSide")
    val nz = withNorm(embeddings).filter(col("nrm") > 0.0)
    def side(prefix: String, idCol: String, vCol: String, nCol: String) = nz
      .withColumn("hk", md5(concat(lit(prefix), col("vec_id").cast("string"))))
      .orderBy(col("hk").asc).limit(perSide)
      .select(col("vec_id").as(idCol), col("v").as(vCol), col("nrm").as(nCol))
    side("pa:", "aid", "va", "na")
      .crossJoin(broadcast(side("pb:", "bid", "vb", "nb")))
      .filter(col("aid") < col("bid"))
      .select(round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cos"))
      .select(floor(col("cos") * 10).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
  }

  // ---- shared PQ machinery (live paths here + the staged PqIndex) ----
  // Everything below runs on the repo's exact integer-millis grid
  // (SURVEY §6): coordinates quantize ONCE to floor(x·1000) BIGINT,
  // every subspace distance is an exact integer sum of squared millis
  // differences, and every trained centroid coordinate is
  // floor(Σmillis/n) — one IEEE division of two exact integers. That
  // makes the WHOLE pipeline (training included) bit-replayable in
  // any engine, which is what promotes the staged PQ / IVF+PQ keys
  // from rows-only to hash-checked (the q_ann_ivf precedent applied
  // to the fine quantizer).

  /** Embeddings on the exact integer-millis grid: (vec_id, qv
    * array<bigint>). NULL embeddings are excluded — a missing vector
    * encodes to nothing. The grid's overflow bound is ENFORCED, not
    * assumed: |x| ≤ 10³ per coordinate (millis ≤ 10⁶), so every
    * squared-millis difference is ≤ 4·10¹² and a sub-dimensional sum
    * stays ≪ 2⁶³ — an out-of-range coordinate would otherwise wrap
    * silently in Spark's BIGINT aggregate while DuckDB promotes to
    * HUGEINT, breaking hash parity instead of failing loudly. The
    * guard is a per-element branch (no extra corpus pass). */
  private[operators] def millisVecs(embeddings: DataFrame): DataFrame =
    embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        expr("""transform(embedding, x -> CASE
                  WHEN abs(CAST(x AS DOUBLE)) > 1000.0D THEN CAST(raise_error(concat(
                    'embedding coordinate ', CAST(x AS STRING),
                    ' exceeds the exact-millis grid bound 1000 (squared-millis sums must stay below 2^63)')) AS BIGINT)
                  ELSE CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) END)""")
          .as("qv"))

  /** SQL literal for a BIGINT array / nested arrays: trained state
    * ships as plan literals, never as shuffled relations. */
  private[operators] def lit1dL(a: Array[Long]): String =
    "array(" + a.map(x => s"${x}L").mkString(",") + ")"
  private[operators] def lit2dL(cb: Array[Array[Long]]): String =
    cb.map(lit1dL).mkString("array(", ",", ")")
  private[operators] def lit3dL(cb: Array[Array[Array[Long]]]): String =
    cb.map(lit2dL).mkString("array(", ",", ")")

  /** Per-subspace codebooks by EXACT integer Lloyd's: seeds are the
    * ksub lowest vec_ids' subvectors (in vec_id order — the oracle's
    * ORDER BY vec_id LIMIT ksub), every assignment is an exact BIGINT
    * argmin (ties to the lower code), every update floor(Σ/n). All m
    * subspaces train TOGETHER: one (vec_id, j, sv) relation, one
    * assignment map stage per iteration against the 3-d literal
    * codebook, one (j, code, dim)-cell aggregate — the driver sync is
    * m×ksub×sub integers, the k-means-sync shape. `src` must carry
    * `srcCol`: array<bigint> of length m·sub. Empty codes keep their
    * previous centroid (the [[Clustering]] convention). */
  private[operators] def pqFitCodebooksExact(src: DataFrame, srcCol: String,
      m: Int, sub: Int, ksub: Int, iters: Int): Array[Array[Array[Long]]] = {
    require(ksub > 0 && iters >= 0, s"need ksub > 0, iters >= 0; got $ksub, $iters")
    val sv = (0 until m).map { j =>
      src.select(col("vec_id"), lit(j).as("j"),
        expr(s"slice($srcCol, ${j * sub + 1}, $sub)").as("sv"))
    }.reduce(_ unionByName _).cutLineage()
    val seedIds = src.select("vec_id").orderBy("vec_id").limit(ksub)
      .collect().map(_.getLong(0))
    require(seedIds.nonEmpty, "PQ training needs at least one non-NULL vector")
    val idRank = seedIds.zipWithIndex.toMap
    var cb: Array[Array[Array[Long]]] = Array.ofDim[Array[Long]](m, seedIds.length)
    sv.filter(col("vec_id").isin(seedIds.map(java.lang.Long.valueOf): _*))
      .collect().foreach { r =>
        cb(r.getInt(1))(idRank(r.getLong(0))) = r.getSeq[Long](2).toArray
      }
    for (_ <- 1 to iters) {
      val sums = sv
        .select(col("j"), pqAssignCol(cb, "sv").as("cid"),
          posexplode(col("sv")).as(Seq("dim", "mm")))
        .groupBy("j", "cid", "dim")
        .agg(sum("mm").as("sm"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      cb = cb.zipWithIndex.map { case (cbj, j) =>
        cbj.zipWithIndex.map { case (old, c) =>
          if (!sums.contains((j, c, 0))) old // empty code: keep centroid
          else old.indices.map { d =>
            val (sm, n) = sums((j, c, d))
            math.floor(sm.toDouble / n).toLong
          }.toArray
        }
      }
    }
    cb
  }

  /** Exact-BIGINT argmin over the row's own subspace (`j` column
    * selects the codebook), ties to the lower code via the (d, c)
    * struct min. Squared-millis terms stay ≪ 2^63: |millis| ≤ ~10⁶
    * per coordinate → ≤ 4·10¹²·sub per distance. */
  private def pqAssignCol(cb: Array[Array[Array[Long]]], svCol: String): Column =
    expr(
      s"""array_min(transform(sequence(0, ${cb(0).length - 1}), c ->
         |  struct(aggregate(zip_with($svCol, element_at(element_at(${lit3dL(cb)}, j + 1), c + 1),
         |           (x, y) -> (x - y) * (x - y)),
         |         CAST(0 AS BIGINT), (a, b) -> a + b) AS d,
         |         c AS c))).c""".stripMargin)

  /** Encode columns code0..code{m-1}: exact-integer argmin centroid
    * per subspace, ties to the lower index — a pure map stage over
    * literal codebooks, zero shuffles. `srcCol`: array<bigint>. */
  private[operators] def pqCodeColsExact(cb: Array[Array[Array[Long]]],
      srcCol: String, m: Int, sub: Int): Seq[Column] =
    (0 until m).map { j =>
      expr(
        s"""array_min(transform(sequence(0, ${cb(j).length - 1}), c ->
           |  struct(aggregate(zip_with(slice($srcCol, ${j * sub + 1}, $sub),
           |           element_at(${lit2dL(cb(j))}, c + 1),
           |           (x, y) -> (x - y) * (x - y)),
           |         CAST(0 AS BIGINT), (a, b) -> a + b) AS d,
           |         c AS c))).c""".stripMargin).as(s"code$j")
    }

  /** Driver-computed m×ksub asymmetric-distance lookup table for a
    * query (or query-residual) millis vector — exact BIGINT. */
  private[operators] def pqAdcTableExact(qm: Array[Long],
      cb: Array[Array[Array[Long]]], m: Int, sub: Int): Array[Array[Long]] =
    (0 until m).map { j =>
      cb(j).map { c =>
        var s = 0L; var i = 0
        while (i < sub) { val d = qm(j * sub + i) - c(i); s += d * d; i += 1 }
        s
      }
    }.toArray

  /** ADC score column: m literal-table lookups over code0..code{m-1},
    * summed in BIGINT. */
  private[operators] def pqAdcColExact(table: Array[Array[Long]], m: Int): Column =
    (0 until m).map(j => expr(s"element_at(${lit1dL(table(j))}, code$j + 1)")).reduce(_ + _)

  /** One map-only coarse assignment + residual against literal
    * integer centers: list_id = exact argmin (ties low), rv = qv −
    * center (exact BIGINT) — the residual-encode stage with zero
    * shuffles and no corpus re-join. */
  private[operators] def ivfAssignExact(mv: DataFrame,
      cents: Array[Array[Long]]): DataFrame = {
    val c2 = lit2dL(cents)
    mv.withColumn("list_id", expr(
        s"""array_min(transform(sequence(0, ${cents.length - 1}), c ->
           |  struct(aggregate(zip_with(qv, element_at($c2, c + 1),
           |           (x, y) -> (x - y) * (x - y)),
           |         CAST(0 AS BIGINT), (a, b) -> a + b) AS d,
           |         c AS c))).c""".stripMargin))
      .withColumn("rv",
        expr(s"zip_with(qv, element_at($c2, list_id + 1), (x, c) -> x - c)"))
  }

  /** The nProbe list ids nearest the query under the DETERMINISTIC
    * integer-millis quantizer's own metric (exact squared millis
    * distance, ties to the lower list id — the same argmin
    * [[Clustering.assignVectors]] runs, so probe selection and list
    * assignment replay identically in any engine). */
  private[operators] def ivfProbesForExact(q: Array[Double],
      centers: Array[Array[Long]], nProbe: Int): Array[Int] =
    ivfProbesForExactMillis(q.map(x => math.floor(x * 1000).toLong), centers, nProbe)

  /** [[ivfProbesForExact]] with the query already on the millis grid. */
  private[operators] def ivfProbesForExactMillis(qm: Array[Long],
      centers: Array[Array[Long]], nProbe: Int): Array[Int] =
    centers.zipWithIndex
      .map { case (c, i) =>
        (c.indices.map { d => val diff = qm(d) - c(d); diff * diff }.sum, i)
      }
      .sortBy(identity)
      .take(nProbe).map(_._2)

  /** (vec_id, cos): flat-IVF top-k under the DETERMINISTIC
    * integer-grid coarse quantizer ([[Clustering.fit]]: seeded by the
    * k lowest vec_ids, exact BIGINT Lloyd's) — the fully replayable
    * sibling of [[ivfTopK]] (whose MLlib k-means quantizer is
    * sampling-seeded and float-iterated, so its list boundaries
    * cannot be re-derived relationally). Same serving shape: probe
    * the nProbe nearest lists (exact integer d2, ties to the lower
    * id), exact-cosine rescore on probed lists only. The staged form
    * is [[PqIndex.buildIvfFlat]]/[[PqIndex.searchIvfFlat]]. */
  def ivfExactTopK(embeddings: DataFrame,
                   queryId: Long = 0L, k: Int = 10,
                   nLists: Int = 16, iters: Int = 2, nProbe: Int = 4): DataFrame = {
    val cents = Clustering.fit(embeddings, nLists, iters)
    val assigned = Clustering.assignVectors(embeddings, cents)
      .select(col("vec_id"), col("cluster_id").as("list_id"))
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .head().getSeq[Double](0).toArray
    val probes = ivfProbesForExact(qVec, cents, nProbe)
    val candidates = assigned
      .filter(col("list_id").isin(probes.map(Integer.valueOf): _*))
      .select("vec_id")
    exactTopK(embeddings, Some(candidates), queryId, k)
  }

  /** Per-probed-list ADC dispatch: each probed list gets its own
    * m×ksub exact-integer table from the query's PER-LIST residual
    * (query millis − list center millis, exact BIGINT), selected by a
    * literal list-keyed CASE. */
  private[operators] def ivfAdcByListExact(qm: Array[Long],
      centers: Array[Array[Long]], codebooks: Array[Array[Array[Long]]],
      probes: Array[Int], m: Int, sub: Int): Column =
    probes.map { list =>
      val qres = qm.indices.map(i => qm(i) - centers(list)(i)).toArray
      (col("list_id") === list, pqAdcColExact(pqAdcTableExact(qres, codebooks, m, sub), m))
    }.foldRight(lit(null).cast("bigint")) {
      case ((cond, e), acc) => when(cond, e).otherwise(acc)
    }

  /** (vec_id, adc, cos): product-quantization ANN — the
    * memory-compression rung between int8 ([[graft.operators.Vectors]]
    * symmetric quantization) and the 1-bit sign signature
    * ([[hammingTopK]]): each `dim/m`-dim subspace of a vector collapses
    * to one byte code against a `ksub`-centroid codebook, so a 64-dim
    * float vector becomes m=8 bytes and query-time scoring never reads
    * the float corpus. Codebooks are trained per subspace by the
    * DETERMINISTIC exact-integer Lloyd's ([[pqFitCodebooksExact]]:
    * millis grid, lowest-vec_id seeds, BIGINT argmin, floor-division
    * updates — the [[ivfExactTopK]] recipe applied to the fine
    * quantizer; driver sync = m×ksub×sub integers, shipped as plan
    * LITERALS), so the whole operator — training included — replays
    * relationally and the staged key is HASH-checked. Encoding is a
    * pure map stage (argmin centroid, ties to the lower index via the
    * (dist, idx) struct min — zero shuffles); a query scores the
    * corpus by ASYMMETRIC distance: an m×ksub exact-integer lookup
    * table computed once on the driver from the query vector,
    * per-vector cost = m table lookups. The nCandidates smallest ADC
    * distances are a TakeOrdered, and exact cosine reranks candidates
    * only (the repo-wide candidates-first shape). */
  def pqTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10,
             m: Int = 8, ksub: Int = 16, nCandidates: Int = 100,
             iters: Int = 2): DataFrame = {
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim does not split into $m subspaces")
    val sub = dim / m
    val mv = millisVecs(embeddings)
    val codebooks = pqFitCodebooksExact(mv, "qv", m, sub, ksub, iters)
    val codes = mv.select(col("vec_id") +: pqCodeColsExact(codebooks, "qv", m, sub): _*)
    val qm = mv.filter(col("vec_id") === queryId).select("qv")
      .head().getSeq[Long](0).toArray
    val table = pqAdcTableExact(qm, codebooks, m, sub)
    val cand = codes.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), pqAdcColExact(table, m).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(nCandidates)
    // exact rerank inlined for the same single-reference reason as
    // hammingTopK: exactTopK's semi-join would re-evaluate the encode
    // pass and the candidate TakeOrdered twice
    val e = withNorm(embeddings)
    val qn = e.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    e.join(cand, "vec_id")
      .crossJoin(broadcast(qn))
      .select(col("vec_id"), col("adc"),
        round(dot(col("va"), col("v")) / (col("na") * col("nrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** (query_id, vec_id, cos, rk): exact cosine top-k for a TABLE of
    * query vectors in ONE plan — the ANN sibling of
    * [[Bm25.batchSearch]]. `queries` is (query_id, embedding); it is
    * broadcast (query batches are small next to the corpus), the
    * corpus is scanned ONCE however many queries arrive, and the
    * per-query ranking is a window over query_id — at 1000 executors
    * the scan×queries product parallelizes over corpus partitions.
    * Shared scoring contract with [[bruteForceTopK]] (same rounding,
    * same tiebreak). */
  def batchTopKFrom(embeddings: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val e = withNorm(embeddings)
    val q = queries
      .select(col("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("va"))
      .withColumn("na", sqrt(dot(col("va"), col("va"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    e.select(col("vec_id"), col("v").as("vb"), col("nrm").as("nb"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rk").cast("long").as("rk"))
  }

  /** [[batchTopKFrom]] with the query batch drawn from the corpus
    * itself by id (the driver-entry form). */
  def batchTopK(embeddings: DataFrame, queryIds: Seq[Long] = Seq(0L, 1L, 2L),
                k: Int = 10): DataFrame =
    batchTopKFrom(embeddings,
      embeddings.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("embedding")), k)

  private[operators] def cosineSim(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / math.sqrt(na * nb)
  }

  /** (vec_id, adc, cos): IVF+PQ — the canonical billion-vector index
    * shape, composing the two trained stages: a coarse quantizer
    * routes every vector to an inverted list ([[ivfExactTopK]]'s
    * deterministic integer Lloyd's — [[Clustering.fit]]), and PQ
    * codebooks trained on the RESIDUALS (qv − its list centroid in
    * exact millis — residuals concentrate near zero, so the same ksub
    * centroids quantize far more finely than on raw vectors) collapse
    * each vector to m byte codes. Every stage is exact-integer
    * ([[pqFitCodebooksExact]]), so training + encode + probe + scan
    * replay relationally and the staged key is HASH-checked. A query
    * probes the nProbe nearest lists only (the quantizer's own exact
    * metric, ties low) and scores each probed vector by asymmetric
    * distance against the table of ITS list (query residual differs
    * per list — nProbe driver-computed m×ksub tables dispatched by a
    * literal list-keyed CASE). Scan cost per query = probed-lists
    * fraction of the corpus × m lookups; candidates-first exact
    * rerank as everywhere. All trained state (centroids, codebooks,
    * tables) ships as plan literals — the scoring stage is a pure
    * map + TakeOrdered, zero shuffles of the encoded corpus. */
  def ivfPqTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10,
                nLists: Int = 16, nProbe: Int = 4,
                m: Int = 8, ksub: Int = 16, nCandidates: Int = 100,
                iters: Int = 2): DataFrame = {
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim does not split into $m subspaces")
    val sub = dim / m
    // coarse quantizer: the deterministic integer Lloyd's, then one
    // map-only assignment + residual against literal integer centers
    val centers = Clustering.fit(embeddings, nLists, iters)
    val mv = millisVecs(embeddings)
    val assigned = ivfAssignExact(mv, centers)
    // PQ codebooks on the exact-integer residuals, all subspaces at once
    val codebooks = pqFitCodebooksExact(assigned, "rv", m, sub, ksub, iters)
    val codes = assigned.select(
      col("vec_id") +: col("list_id") +: pqCodeColsExact(codebooks, "rv", m, sub): _*)
    // query: probe the nProbe nearest lists under the quantizer's own
    // exact metric; one ADC table per probe from the PER-LIST residual
    val qm = mv.filter(col("vec_id") === queryId).select("qv")
      .head().getSeq[Long](0).toArray
    val probes = ivfProbesForExactMillis(qm, centers, nProbe)
    val adcByList = ivfAdcByListExact(qm, centers, codebooks, probes, m, sub)
    val cand = codes
      .filter(col("list_id").isin(probes.map(Integer.valueOf): _*))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), adcByList.as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(nCandidates)
    val e = withNorm(embeddings)
    val qn = e.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    e.join(cand, "vec_id")
      .crossJoin(broadcast(qn))
      .select(col("vec_id"), col("adc"),
        round(dot(col("va"), col("v")) / (col("na") * col("nrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** (query_id, vec_id, cos, rk): HARD-NEGATIVE mining for contrastive
    * retrieval training — per query, the top-k most similar vectors
    * that are NOT near-duplicates (rounded cosine < `dupCos`): similar
    * enough to be hard, distinct enough to be true negatives (the
    * batch-mining shape behind DPR/contrastive embedding training).
    * Same plan as [[batchTopKFrom]] — queries broadcast, corpus
    * scanned once, per-query rank window — with the near-dup cutoff
    * applied to the ROUNDED score BEFORE ranking, so the boundary
    * decision replays exactly in the oracle. At scale the scan side
    * swaps for ANN candidates ([[lshTopK]]) unchanged. */
  def hardNegatives(embeddings: DataFrame, queryIds: Seq[Long] = Seq(0L, 1L, 2L),
                    k: Int = 10, dupCos: Double = 0.95): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("na"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    e.select(col("vec_id"), col("v").as("vb"), col("nrm").as("nb"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cos"))
      .filter(col("cos") < dupCos)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rk").cast("long").as("rk"))
  }

  /** (vec_id, cos, pick_order): MAXIMAL MARGINAL RELEVANCE rerank —
    * diversity-aware top-k: greedily pick argmax of
    * λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s), so each pick trades
    * query relevance against redundancy with what's already chosen
    * (Carbonell & Goldstein '98; the result-diversification pass after
    * any dense retrieval). Candidate generation is the DISTRIBUTED
    * part (exact top-`nCandidates` here, ANN at scale — TakeOrdered,
    * zero extra shuffles); the greedy loop then runs on the BOUNDED
    * collected candidate set (nCandidates × dim doubles — the same
    * bounded-driver-sync contract as k-means' k×dim centroid
    * collect), because greedy selection is inherently sequential in k.
    * All scores round to 4 before comparison; ties break on vec_id
    * asc — fully deterministic. Rows-only key: the iterative greedy
    * argmax has no SQL replay; the spec pins first-pick-is-top-1,
    * pool membership and the diversity improvement over plain top-k. */
  def mmrTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10,
              nCandidates: Int = 50, lambda: Double = 0.7): DataFrame = {
    val spark = embeddings.sparkSession
    val cand = exactTopK(embeddings, None, queryId, nCandidates)
      .join(doubleVecs(embeddings), "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    // HALF_UP on the exact decimal expansion = Spark's round() =
    // DuckDB's round(): the greedy decisions replay in the oracle
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = scala.collection.mutable.LinkedHashMap(
      cand.map(c => c._1 -> c).toSeq: _*)
    while (picked.length < math.min(k, cand.length)) {
      val best = remaining.values.minBy { case (id, rel, v) =>
        val maxSim = if (pickedVecs.isEmpty) 0.0
          else pickedVecs.map(p => r4(cosineSim(v, p))).max
        (-r4(lambda * rel - (1.0 - lambda) * maxSim), id)
      }
      picked += ((best._1, best._2, picked.length + 1L))
      pickedVecs += best._3
      remaining.remove(best._1)
    }
    import spark.implicits._
    picked.toSeq.toDF("vec_id", "cos", "pick_order")
  }

  /** (k, n_lsh, n_hits, recall): ANN QUALITY EVALUATION as a query —
    * recall@k of the hyperplane-LSH path against the exact brute-force
    * ranking, the continuous-monitoring number every approximate index
    * ships with (run it per index build; alert when the bucket config
    * drifts below target). Both sides are deterministic plans
    * (md5-derived hyperplanes are plan literals), so even this
    * EVALUATION replays exactly in the oracle. The join is k×k ids —
    * driver-free, all-integer. */
  /** (k, n_hits, recall): the RECALL CURVE of the LSH serve against
    * the exact ranking at k = 1, 5, 10, 20 — [[recallAtK]]'s single
    * point widened into the read an ANN rollout decision actually
    * uses (recall@1 gates dedup/lookup use-cases, recall@20 gates
    * retrieval; where the curve flattens tells you whether more
    * candidates or more tables is the lever). One candidate
    * generation + TWO depth-20 ranked lists (distributed TopK, the
    * run-comparison discipline) + one ≤20-row join exploded over the
    * k grid — the curve costs one search, not four. Counts exact;
    * one rounded division per row; k rows with zero hits kept via
    * the grid left-join. */
  def recallCurve(embeddings: DataFrame, queryId: Long = 0L,
                  ks: Seq[Int] = Seq(1, 5, 10, 20)): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val kmax = ks.max
    val a = TopK.rankedTopN(lshTopK(embeddings, queryId, kmax),
        "cos", "vec_id", kmax, "ra")
      .select(col("vec_id"), col("ra").cast("long").as("ra"))
    val b = TopK.rankedTopN(bruteForceTopK(embeddings, queryId, kmax),
        "cos", "vec_id", kmax, "rb")
      .select(col("vec_id"), col("rb").cast("long").as("rb"))
    val grid = ks.map(_.toLong).toDF("k")
    val hits = a.join(b, "vec_id")
      .crossJoin(broadcast(grid))
      .filter(col("ra") <= col("k") && col("rb") <= col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_hits"))
    grid.join(hits, Seq("k"), "left")
      .select(col("k"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("k"), 4)
          .as("recall"))
  }

  def recallAtK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val lsh = lshTopK(embeddings, queryId, k).select("vec_id")
    val brute = bruteForceTopK(embeddings, queryId, k).select("vec_id")
    val nL = lsh.agg(count(lit(1)).as("n_lsh"))
    lsh.join(brute, "vec_id")
      .agg(count(lit(1)).as("n_hits"))
      .crossJoin(broadcast(nL))
      .select(lit(k.toLong).as("k"), col("n_lsh"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 4).as("recall"))
  }

  // ---- SQ8 scalar quantization (the int8 rung of the ladder) ----

  /** Embeddings scalar-quantized to int8: (vec_id, qv array<bigint>,
    * qn2 bigint). Per-vector SYMMETRIC quantization — qval =
    * clamp(floor(x·127/maxabs), −127, 127) — the exact grid
    * `q_emb_quantize` already publishes, here carried as a whole
    * vector plus its integer squared norm. Cosine needs NO scale
    * sidecar: the per-vector scale cancels between the integer dot
    * and the two integer norms, so the serve math is pure int64.
    * Zero vectors (maxabs = 0) quantize to all-zeros and are dropped
    * from the searchable pool (qn2 = 0 ⇒ cosine undefined). */
  private[graft] def sqVecs(embeddings: DataFrame): DataFrame =
    doubleVecs(embeddings)
      .withColumn("maxabs", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("qv",
        expr("""transform(v, x -> CASE WHEN maxabs = 0.0D THEN CAST(0 AS BIGINT)
                ELSE greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
                     CAST(floor(x * 127.0D / maxabs) AS BIGINT))) END)"""))
      .withColumn("qn2",
        expr("aggregate(qv, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
      .select("vec_id", "qv", "qn2")

  /** (vec_id, cos): top-k by INT8 scalar-quantized cosine — the SQ8
    * rung of the quantization ladder (between full-precision flat and
    * PQ): 4× less scan bandwidth than float32 with near-exact
    * ranking, the default first compression step of every production
    * vector store. The whole hot loop is int64 arithmetic (quantized
    * dot + two quantized squared norms; the per-vector scales cancel
    * for cosine), so the ranking replays bit-exactly in any engine —
    * the same property that promoted the PQ family to hash-checked.
    * At 100 TB the qv relation is what sits on disk (the store
    * format); the float corpus is only touched at encode time. */
  def sqTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val sq = sqVecs(embeddings)
    val q = sq.filter(col("vec_id") === queryId)
      .select(col("qv").as("qa"), col("qn2").as("qan2"))
    sq.filter(col("vec_id") =!= queryId && col("qn2") > 0L)
      .crossJoin(broadcast(q))
      .withColumn("idot",
        expr("aggregate(zip_with(qa, qv, (x, y) -> x * y), CAST(0 AS BIGINT), (a, b) -> a + b)"))
      .withColumn("cos",
        round(col("idot").cast("double") /
          (sqrt(col("qan2").cast("double")) * sqrt(col("qn2").cast("double"))), 4))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "cos")
  }

  /** (vec_id, cos): TWO-STAGE SQ8 serve — the production shape of the
    * scalar-quantized rung: stage 1 ranks the whole pool by int8
    * quantized cosine (pure int64 scan — the cheap pass over the 4×
    * smaller store), stage 2 re-scores only the top-`candK` survivors
    * with exact full-precision cosine and returns the top-k. Both
    * stages are deterministic (quantized ratio desc / rounded exact
    * cosine desc, vec_id tie-breaks), so the whole cascade — candidate
    * cut included — replays in the oracle. At 100 TB the float vectors
    * are only fetched for candK rows per query. */
  def sqRerank(embeddings: DataFrame, queryId: Long = 0L,
               k: Int = 10, candK: Int = 50): DataFrame = {
    require(candK >= k, s"candK ($candK) must be >= k ($k)")
    val sq = sqVecs(embeddings)
    val q = sq.filter(col("vec_id") === queryId)
      .select(col("qv").as("qa"), col("qn2").as("qan2"))
    val cand = sq.filter(col("vec_id") =!= queryId && col("qn2") > 0L)
      .crossJoin(broadcast(q))
      .withColumn("idot",
        expr("aggregate(zip_with(qa, qv, (x, y) -> x * y), CAST(0 AS BIGINT), (a, b) -> a + b)"))
      .withColumn("c_sq",
        col("idot").cast("double") /
          (sqrt(col("qan2").cast("double")) * sqrt(col("qn2").cast("double"))))
      .orderBy(col("c_sq").desc, col("vec_id").asc)
      .limit(candK)
      .select("vec_id")
    exactTopK(embeddings, Some(cand), queryId, k)
  }

  /** (n_vecs, total_err_1e5, avg_err, max_err_1e5): SQ8 DISTORTION
    * dashboard — how far int8-quantized cosine sits from exact cosine
    * against query `queryId`, over the whole searchable pool (the
    * monitoring twin of `q_pq_distortion` for the SQ rung: run per
    * encode, alert when a corpus shift pushes quantization error past
    * budget). Per-vector error is floored onto an integer 1e-5 grid
    * BEFORE aggregation, so the totals are exact integer sums —
    * engine-replayable regardless of aggregation order. */
  def sqDistortion(embeddings: DataFrame, queryId: Long = 0L): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("va"), col("nrm").as("na"))
    val exact = e.filter(col("vec_id") =!= queryId && col("nrm") > 0.0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(col("va"), col("v")) / (col("na") * col("nrm"))).as("c_exact"))
    val sq = sqVecs(embeddings)
    val sqq = sq.filter(col("vec_id") === queryId)
      .select(col("qv").as("qa"), col("qn2").as("qan2"))
    val approx = sq.filter(col("vec_id") =!= queryId && col("qn2") > 0L)
      .crossJoin(broadcast(sqq))
      .withColumn("idot",
        expr("aggregate(zip_with(qa, qv, (x, y) -> x * y), CAST(0 AS BIGINT), (a, b) -> a + b)"))
      .select(col("vec_id"),
        (col("idot").cast("double") /
          (sqrt(col("qan2").cast("double")) * sqrt(col("qn2").cast("double")))).as("c_sq"))
    exact.join(approx, "vec_id")
      .select(floor(abs(col("c_exact") - col("c_sq")) * 100000.0).cast("long").as("err5"))
      .agg(count(lit(1)).as("n_vecs"), sum("err5").as("total_err_1e5"),
        max("err5").as("max_err_1e5"))
      .select(col("n_vecs"), col("total_err_1e5"),
        round(col("total_err_1e5").cast("double") / col("n_vecs") / 100000.0, 8)
          .as("avg_err"),
        col("max_err_1e5"))
  }

  // ---- semantic (embedding-level) eval-set decontamination ----

  /** (vec_id, probe_id, cos): SEMANTIC CONTAMINATION screen — corpus
    * vectors whose cosine against any held-out probe (eval-set)
    * vector reaches `threshold`. The embedding-space member of the
    * contamination family (exact text → fuzzy MinHash → semantic):
    * paraphrased or translated eval leakage that shares no n-gram
    * still collides in embedding space. Scale path mirrors
    * [[lshCosinePairs]] but CROSS-RELATION: both sides bucket under
    * the same literal hyperplanes (a pure map stage), candidates come
    * from the (table, bucket) equi-join — corpus×probe work scales
    * with bucket co-occupancy, never |corpus|×|probes| — and the
    * exact-cosine verify runs on candidates only. Same S-curve recall
    * guard as the within-relation path: thresholds below the banding
    * midpoint are rejected loudly rather than silently losing
    * boundary pairs. `probes` is (probe_id, embedding). */
  def semanticContamination(corpus: DataFrame, probes: DataFrame,
                            threshold: Double = 0.45,
                            numTables: Int = 24, bitsPerTable: Int = 4,
                            maxMissProb: Double = 0.01): DataFrame = {
    // Recall guard on the quantity the contract actually needs (the
    // r14 midpoint check was vacuous at these defaults — cMid ≈ −0.28
    // rejects nothing): for random hyperplanes, a pair AT the verify
    // threshold agrees on one bit w.p. 1 − arccos(c)/π, matches one
    // table w.p. that^bits, and MISSES every table w.p.
    // (1 − p^bits)^tables — the per-pair candidate-miss probability.
    // The default config sits at ≈0.93% ≤ the declared 1% bound.
    // NOTE the exactness fine print: the oracle/crosscheck contract is
    // exact equality with the all-pairs relation, which this bound
    // cannot guarantee for an arbitrary corpus — it is the EXPECTED
    // miss rate of a random boundary pair. The hyperplanes here are
    // deterministic (md5-derived literals), so whether a specific
    // boundary pair is missed is a fixed property of the corpus; the
    // gate corpora have been verified to close the gap exactly, and
    // the crosscheck would fail loudly on any corpus where they don't.
    val pBit = 1.0 - math.acos(math.min(1.0, math.max(-1.0, threshold))) / math.Pi
    val missAtThreshold =
      math.pow(1.0 - math.pow(pBit, bitsPerTable.toDouble), numTables.toDouble)
    require(missAtThreshold <= maxMissProb,
      f"hyperplane-LSH candidate generation misses a threshold-$threshold%.2f " +
        f"pair w.p. $missAtThreshold%.4f > the $maxMissProb%.4f bound " +
        f"(numTables=$numTables, bitsPerTable=$bitsPerTable) — add tables or drop bits")
    val cb = lshBuckets(corpus, numTables, bitsPerTable)
    val pb = lshBuckets(
        probes.select(col("probe_id").as("vec_id"), col("embedding")),
        numTables, bitsPerTable)
      .select(col("vec_id").as("probe_id"), col("t"), col("bucket"))
    // candidate list is output-sized and feeds both verify joins —
    // materialize once (the fuzzyContamination convention)
    val cand = cb.join(pb, Seq("t", "bucket"))
      .select("vec_id", "probe_id").distinct().cutLineage()
    val ce = withNorm(corpus)
    val pe = withNorm(probes.select(col("probe_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("probe_id"), col("v").as("vb"), col("nrm").as("nb"))
    cand
      .join(ce.select(col("vec_id"), col("v").as("va"), col("nrm").as("na")), Seq("vec_id"))
      .join(pe, Seq("probe_id"))
      .withColumn("c_exact", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("c_exact") >= threshold)
      .select(col("vec_id"), col("probe_id"), round(col("c_exact"), 4).as("cos"))
  }
}
