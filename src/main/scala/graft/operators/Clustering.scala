package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Clustering for training-data curation: deterministic k-means over
  * the embeddings table, and SemDeDup-style semantic deduplication
  * (cluster the near-duplicate cosine graph, keep one document per
  * semantic cluster).
  *
  * k-means follows the MLlib execution recipe — centroids sync
  * through the driver between iterations (k×dim integers, a few KB at
  * any corpus size) and each assignment is a PURE MAP stage over
  * centroid literals baked into the plan — but on the repo's exact
  * integer-millis grid (SURVEY.md §6): every coordinate is quantized
  * once to floor(x·1000), distances are integer sums of squared
  * millis differences, and updated centroids are floor(Σmillis/n)
  * (one IEEE double division of two exact integers — bit-identical
  * across engines and partition orders, unlike float-mean Lloyd's,
  * which no two engines reduce in the same order). Results are
  * therefore hash-exact against the unrolled SQL oracle, iteration
  * by iteration, while keeping the true 100 TB shape: per iteration
  * one map-only assignment pass plus one (k×dim)-cell partial
  * aggregate — no shuffle ever carries vectors.
  *
  * Re-expresses no single reference operator: the reference
  * (flink-BM25) stops at lexical statistics; this is the standard
  * embedding-side curation stage a corpus pipeline adds next to it.
  */
object Clustering {

  private def dot(a: Column, b: Column): Column = graft.functions.Native.dot(a, b)

  /** Millis-grid view: mv = double-typed exact integer millis (for the
    * codegen'd native dot), qv = the same values as BIGINT (for exact
    * exploded sums in the update step). NULL embeddings are excluded —
    * a missing vector has no position, so it belongs to no cluster. */
  private def millis(embeddings: DataFrame): DataFrame =
    embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS DOUBLE))").as("mv"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("qv"))
      .withColumn("n2", dot(col("mv"), col("mv")))

  /** One assignment pass against literal centroids: argmin over k
    * squared-millis distances, ties to the lower cluster id. Each
    * distance is n2 + ‖c‖² − 2·(mv·c) through the native dot — every
    * term an exact integer ≪ 2^53 in double, so the BIGINT cast is
    * lossless and the argmin is exact. Zero joins, zero shuffles:
    * the centroid table rides in the plan as k literal arrays. */
  private def assign(e: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val choices = cents.zipWithIndex.map { case (c, i) =>
      val cv = typedlit(c.map(_.toDouble).toSeq)
      val c2 = lit(c.map(m => m * m).sum.toDouble)
      struct((col("n2") + c2 - lit(2.0) * dot(col("mv"), cv)).cast("long").as("d2"),
        lit(i.toLong).as("cid"))
    }
    val best = if (choices.length == 1) choices(0) else least(choices.toIndexedSeq: _*)
    e.withColumn("best", best)
      .select(col("vec_id"), col("qv"),
        col("best.cid").as("cluster_id"), col("best.d2").as("d2"))
  }

  /** (vec_id, cluster_id, d2): Lloyd's k-means, `iters` full
    * assign+update iterations from a deterministic seed (the k lowest
    * vec_ids' vectors, in vec_id order), then a final assignment under
    * the post-iteration centroids. Empty clusters keep their previous
    * centroid. d2 is the exact squared-millis distance to the owning
    * centroid.
    *
    * The driver round-trip per iteration is k×dim aggregated cells —
    * the same sync MLlib's KMeans does (collectAsMap on centers), and
    * the only part of Lloyd's that is inherently iterative. Overflow
    * bounds: |millis| ≤ ~10⁶ for |x| ≤ 1000, so Σmillis stays exact in
    * BIGINT for any corpus and converts losslessly to double below
    * 2^53 ≈ 9·10¹⁵ — at 10¹² same-cluster rows of unit-scale
    * embeddings the sum is ~10¹⁵, still exact. */
  def kmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val e = millis(embeddings).cutLineage() // reused iters+1 times
    assign(e, fitFrom(e, k, iters)).select(col("vec_id"), col("cluster_id"), col("d2"))
  }

  /** (sample_rank, vec_id, gain): GREEDY k-CENTER (farthest-point)
    * diversity sample over the embeddings — the coreset-selection
    * primitive a curation pipeline runs when it wants k maximally
    * SPREAD exemplars rather than k cluster means ([[kmeans]]'s
    * centroids average; k-center's picks are real documents, and the
    * greedy farthest-point traversal is the classic 2-approximation
    * of the k-center objective — Gonzalez 1985). Deterministic and
    * engine-exact end to end: the seed is the lowest vec_id, every
    * distance is the exact integer squared-millis metric (the
    * [[kmeans]] grid through the same codegen'd native dot), and each
    * step's pick maximizes (min-distance-to-selected, then lowest
    * vec_id) — an argmax over exact BIGINTs, so the whole greedy
    * trajectory replays bit-identically in SQL. `gain` is the picked
    * point's min squared-millis distance to the previously selected
    * set (NULL for the seed) — nonincreasing by construction, and
    * gain(k+1) would lower-bound the covering radius of the k sample.
    *
    * Scale shape: step j is ONE shuffle-free map pass (j distance
    * expressions against literal centers — the [[assign]] plan shape)
    * plus a single-row global argmax agg and a one-row pick fetch;
    * driver state is k×(dim+2) integers. k passes total, nothing
    * corpus-sized ever shuffles or syncs — the same ladder MLlib's
    * KMeans rides, minus even its per-iteration center-update
    * shuffle. */
  def kcenterSample(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    val e = millis(embeddings).cutLineage()
    val seed = e.select(col("vec_id"), col("qv"))
      .orderBy(col("vec_id").asc).limit(1).collect()
    require(seed.nonEmpty, "k-center sample: no non-null embeddings")
    var selected = Vector(
      (seed(0).getLong(0), seed(0).getSeq[Long](1).toArray, Option.empty[Long]))
    var exhausted = false
    while (selected.size < k && !exhausted) {
      val dists = selected.map { case (_, c, _) =>
        val cv = typedlit(c.map(_.toDouble).toSeq)
        val c2 = lit(c.map(m => m * m).sum.toDouble)
        (col("n2") + c2 - lit(2.0) * dot(col("mv"), cv)).cast("long")
      }
      val md = if (dists.length == 1) dists.head else least(dists: _*)
      val cand = e.filter(!col("vec_id").isin(selected.map(_._1): _*))
        .withColumn("md", md)
      val top = cand
        .agg(max(struct(col("md"), (-col("vec_id")).as("negid"))).as("m")).head
      if (top.isNullAt(0)) exhausted = true // corpus smaller than k
      else {
        val pick = top.getStruct(0)
        val (mdv, pid) = (pick.getLong(0), -pick.getLong(1))
        val qv = e.filter(col("vec_id") === pid).select("qv").head
          .getSeq[Long](0).toArray
        selected = selected :+ ((pid, qv, Some(mdv)))
      }
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, _, g), i) => (i + 1L, id, g) }
      .toDF("sample_rank", "vec_id", "gain")
  }

  /** (cluster_id, n_points, inertia): per-cluster SIZE + WITHIN-CLUSTER
    * SUM OF SQUARES of the fitted model — the clustering family's eval
    * leg (the elbow diagnostic's ingredient, and the "did one centroid
    * swallow everything" check). d2 is already the exact integer
    * squared distance in milli-units², so inertia is an exact BIGINT
    * sum — one k-cardinality rollup on the [[kmeans]] assignment. */
  def kmeansInertia(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    kmeans(embeddings, k, iters)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_points"), sum("d2").as("inertia"))

  /** (cluster_id, n_points, top_label, n_top, purity): external
    * cluster validation against the embeddings' ground-truth `label`
    * column — per-cluster majority-label purity, the "did the
    * clustering recover the classes" eval leg beside [[kmeansInertia]]
    * 's internal one. Ties break to the LOWER label (max_by over a
    * (count, −label) struct — window-free). One label join + two
    * k×|labels|-sized aggregations on the assignment. */
  def clusterPurity(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    labelContingency(embeddings, k, iters)
      .groupBy("cluster_id")
      .agg(sum("n").as("n_points"),
        max(struct(col("n"), (-col("label")).as("negl"))).as("m"))
      .select(col("cluster_id"), col("n_points"),
        (-col("m.negl")).as("top_label"), col("m.n").as("n_top"),
        round(col("m.n").cast("double") / col("n_points"), 6).as("purity"))

  /** (n_clusters, n_labels, mi, nmi): NORMALIZED MUTUAL INFORMATION
    * between the k-means assignment and the ground-truth labels — the
    * permutation-invariant summary purity can't give (purity inflates
    * with k; NMI doesn't). MI/H terms fold over the k×|labels|
    * contingency cells (tiny); sqrt(Hc·Hl) normalization. */
  def clusterNmi(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val cl = labelContingency(embeddings, k, iters).cutLineage()
    val n = cl.agg(sum("n").as("nn"))
    val pc = cl.groupBy("cluster_id").agg(sum("n").as("nc"))
    val pl = cl.groupBy("label").agg(sum("n").as("nl"))
    val mi = cl.join(pc, "cluster_id").join(pl, "label").crossJoin(broadcast(n))
      .agg(sum((col("n").cast("double") / col("nn")) *
        // margins to double BEFORE the product: nc·nl overflows BIGINT
        // at warehouse-scale contingency counts
        log(col("n").cast("double") * col("nn") /
          (col("nc").cast("double") * col("nl")))).as("mi"))
    val hc = pc.crossJoin(broadcast(n))
      .agg((-sum((col("nc").cast("double") / col("nn")) *
        log(col("nc").cast("double") / col("nn")))).as("hc"))
    val hl = pl.crossJoin(broadcast(n))
      .agg((-sum((col("nl").cast("double") / col("nn")) *
        log(col("nl").cast("double") / col("nn")))).as("hl"))
    val counts = cl.agg(countDistinct(col("cluster_id")).as("n_clusters"),
      countDistinct(col("label")).as("n_labels"))
    counts.crossJoin(mi).crossJoin(hc).crossJoin(hl)
      .select(col("n_clusters"), col("n_labels"),
        round(col("mi"), 6).as("mi"),
        round(col("mi") / sqrt(col("hc") * col("hl")), 6).as("nmi"))
  }

  /** The k-means-vs-label contingency table (cluster_id, label, n) the
    * two external-validation rollups share. */
  private def labelContingency(embeddings: DataFrame, k: Int, iters: Int): DataFrame =
    kmeans(embeddings, k, iters)
      .join(embeddings.select(col("vec_id"), col("label").cast("long").as("label")),
        "vec_id")
      .groupBy("cluster_id", "label").agg(count(lit(1)).as("n"))

  /** (cluster_id, term, n, rk): CLUSTER LABELS — the top `topN` terms
    * of the documents landing in each k-means cluster (ids shared
    * across the embeddings/documents tables), ranked by raw count
    * with a term tiebreak. The inspection table that makes an
    * unsupervised clustering legible ("what IS cluster 3?") before
    * any mix decision trusts it. Tokenization is the library standard
    * ([[Bm25.tokenize]]); one id join, one (cluster, term) rollup,
    * one cluster-partitioned rank window. */
  def clusterLabels(embeddings: DataFrame, docs: DataFrame, k: Int = 8,
                    iters: Int = 2, topN: Int = 3): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val asg = kmeans(embeddings, k, iters)
      .select(col("vec_id").as("doc_id"), col("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("n").desc, col("term").asc)
    Bm25.tokenize(docs)
      .join(asg, "doc_id")
      .groupBy("cluster_id", "term").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topN)
  }

  /** The fitted centroid table (k×dim exact millis) after `iters`
    * Lloyd's rounds — the artifact a serving path bakes into its
    * assignment plan (see [[graft.streaming.Streams.kmeansStream]]). */
  def fit(embeddings: DataFrame, k: Int = 8, iters: Int = 2): Array[Array[Long]] =
    fitFrom(millis(embeddings).cutLineage(), k, iters)

  private def fitFrom(e: DataFrame, k: Int, iters: Int): Array[Array[Long]] = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k, iters=$iters")
    // seed: the k lowest vec_ids in id order — deterministic, and k
    // rows through the driver (the oracle's ORDER BY vec_id LIMIT k)
    var cents: Array[Array[Long]] = e.orderBy("vec_id").limit(k)
      .select("qv").collect().map(_.getSeq[Long](0).toArray)
    require(cents.nonEmpty, "k-means needs at least one non-NULL embedding")
    for (_ <- 1 to iters) {
      // update: per-(cluster, dim) exact sums — k×dim cells shuffled
      // after map-side partials, nothing vector-sized moves
      val sums = assign(e, cents)
        .select(col("cluster_id"), posexplode(col("qv")).as(Seq("dim", "m")))
        .groupBy("cluster_id", "dim")
        .agg(sum("m").as("sm"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      cents = cents.zipWithIndex.map { case (old, cid) =>
        if (!sums.contains((cid, 0))) old // empty cluster: keep centroid
        else old.indices.map { d =>
          val (sm, n) = sums((cid, d))
          math.floor(sm.toDouble / n).toLong
        }.toArray
      }
    }
    cents
  }

  /** One map-only assignment of `embeddings` against an already-fitted
    * centroid table — the serving form of [[kmeans]]: no iteration, no
    * driver sync, centroids ride as plan literals. */
  def assignVectors(embeddings: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    require(cents.nonEmpty, "assignVectors needs at least one centroid")
    assign(millis(embeddings), cents)
      .select(col("vec_id"), col("cluster_id"), col("d2"))
  }

  /** (vec_id, cluster_id, rn): cluster-balanced sampling — at most
    * `perCluster` vectors from each [[kmeans]] cluster, chosen in
    * deterministic md5("cs:vec_id") order (a content-free shuffle with
    * no RNG state, the [[TextAnalysis]] hash-sampling rule applied
    * within clusters). The standard diverse-subset selection stage:
    * quota per REGION of embedding space, so dense regions can't
    * crowd out sparse ones. Cost over kmeans itself: one rank window
    * partitioned by cluster_id — a single small-key shuffle, no
    * vector payload. */
  def clusterSample(embeddings: DataFrame, k: Int = 8, iters: Int = 2,
                    perCluster: Int = 50): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive, got $perCluster")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("hk"), col("vec_id"))
    kmeans(embeddings, k, iters)
      .withColumn("hk", md5(concat(lit("cs:"), col("vec_id").cast("string"))))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= perCluster)
      .select(col("vec_id"), col("cluster_id"), col("rn"))
  }

  /** (vec_id, cluster_id): connected components of the semantic
    * near-duplicate graph — cosine ≥ `threshold` — labeled by
    * component-min vec_id. The 100 TB composition, end to end:
    *
    *  1. EXACT-VALUE COLLAPSE first (the [[Dedup.nearDupClusters]]
    *     canonicalization applied to vectors): byte-identical vectors
    *     are cosine-1 duplicates by definition, so one representative
    *     per distinct value enters the pair stage — k copies would
    *     otherwise multiply the candidate join by k². The collapse key
    *     is md5 of the JSON-formatted double vector (injective, 16
    *     bytes on the wire).
    *  2. Candidates + verify via [[Ann.lshCosinePairs]] — hyperplane
    *     buckets from the fused native expression, (table, bucket)
    *     equi-join, exact cosine over candidates only. Never all-pairs.
    *  3. [[Dedup.propagateMinLabels]] pointer-doubling min-label CC on
    *     the verified PAIR graph (pairs only, O(log d) rounds).
    *  4. Copies rejoin through their representative's label; a vector
    *     is emitted iff it near-duplicates something: its rep is in a
    *     verified component, or its value group has > 1 copy.
    *
    * Zero-norm vectors are excluded up front: cosine is undefined for
    * them (they cannot near-duplicate anything by angle). Singleton
    * clusters are implicit, as in the lexical CC operator. */
  def semanticClusters(embeddings: DataFrame, threshold: Double = 0.45,
                       numTables: Int = 24, bitsPerTable: Int = 4,
                       maxIter: Int = 20): DataFrame = {
    val keyed = embeddings.filter(col("embedding").isNotNull)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .filter(dot(col("v"), col("v")) > 0.0)
      .select(col("vec_id"), col("embedding"), md5(to_json(col("v"))).as("vk"))
      .cutLineage() // feeds reps AND the member fan-back below
    val reps = keyed.groupBy("vk")
      .agg(min("vec_id").as("rep"), count(lit(1)).as("n_copies"),
        min("embedding").as("embedding"))
    val pairs = Ann.lshCosinePairs(
      reps.select(col("rep").as("vec_id"), col("embedding")),
      threshold, numTables, bitsPerTable)
    val repClusters = Dedup.propagateMinLabels(
      pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")), maxIter)
    keyed.select(col("vec_id"), col("vk"))
      .join(reps.select(col("vk"), col("rep"), col("n_copies")), Seq("vk"))
      .join(repClusters.select(col("doc_id").as("rep"), col("cluster_id")),
        Seq("rep"), "left")
      .filter(col("cluster_id").isNotNull || col("n_copies") > 1)
      .select(col("vec_id"), coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
  }

  /** (vec_id, label): the semantically deduplicated embedding set —
    * SemDeDup's keep-one-per-cluster policy over [[semanticClusters]]:
    * every cluster survives through its min-vec_id canonical, plus
    * every vector that near-duplicates nothing (including zero-norm
    * vectors, which cannot). Anti-join against the loser set — the
    * corpus is never shuffled by anything vector-sized. */
  def semanticDrop(embeddings: DataFrame, threshold: Double = 0.45,
                   numTables: Int = 24, bitsPerTable: Int = 4): DataFrame = {
    val losers = semanticClusters(embeddings, threshold, numTables, bitsPerTable)
      .filter(col("vec_id") =!= col("cluster_id"))
      .select("vec_id")
    embeddings.filter(col("embedding").isNotNull)
      .join(losers, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label").cast("long").as("label"))
  }
}
