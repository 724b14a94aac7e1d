package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Vector analytics beyond search: per-class centroids, distance
  * outliers, and k-NN label prediction over the embeddings table.
  *
  * Arithmetic contract (SURVEY.md §6): every float component is
  * quantized ONCE to exact integer "millis" (floor(x·1000) — bounded
  * by ±~1000 for unit-scale embeddings), and all distances are
  * integer sums of squared millis differences, so results are
  * bit-identical across engines and partition orders. Centroids are
  * floor(Σmillis / n) — integer division, exact and bounded
  * regardless of class cardinality, so nothing overflows at any
  * corpus size.
  *
  * Scale shape: centroids shuffle on (label, dim) — cardinality
  * #classes × dim, tiny — then broadcast back; distances are a pure
  * map stage. [[knnClassify]] is the brute-force k-NN baseline
  * (quadratic in the split sizes); [[knnClassifyIvf]] composes the
  * same contract with the IVF coarse quantizer and is the wired
  * 100 TB route.
  */
object Vectors {

  /** millis-quantized dim-exploded view: (vec_id, label, dim, m). */
  private def dims(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
      posexplode(expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
        .as(Seq("dim", "m")))

  /** (vec_id, label, d2): squared millis distance of every vector to
    * its own class centroid, top `k` farthest (the "does this doc
    * belong to its cluster" outlier probe). */
  def centroidOutliers(embeddings: DataFrame, k: Int = 10): DataFrame = {
    val d = dims(embeddings)
    val centroids = d.groupBy("label", "dim")
      // floor over the IEEE quotient of two exact integers — the same
      // expression the oracle runs, so the centroid is engine-identical
      .agg(floor(sum("m").cast("double") / count(lit(1))).cast("long").as("c"))
    d.join(centroids, Seq("label", "dim"))
      .groupBy("vec_id", "label")
      .agg(sum((col("m") - col("c")) * (col("m") - col("c"))).as("d2"))
      .orderBy(col("d2").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("label").cast("long").as("label"), col("d2"))
  }

  /** (vec_id, true_label, predicted_label, n_votes): k-NN majority
    * vote — vectors with vec_id ≡ 0 (mod `testMod`) are the test
    * split, scored against all others by exact millis L2; ties break
    * (distance asc, neighbor id asc) for the neighbor set and
    * (votes desc, label asc) for the vote. */
  def knnClassify(embeddings: DataFrame, k: Int = 5, testMod: Int = 10): DataFrame = {
    // millis as integer-valued DOUBLES: ‖a-b‖² = ‖a‖²+‖b‖²-2a·b via the
    // codegen'd native dot — no per-pair intermediate array, and every
    // product/sum stays an exact integer ≪ 2^53, so the cast back to
    // BIGINT is lossless
    val e = embeddings.select(col("vec_id"), col("label"),
      // floor() yields BIGINT — cast back to DOUBLE for the native dot
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS DOUBLE))").as("mv"))
      .withColumn("n2", graft.functions.Native.dot(col("mv"), col("mv")))
    val test = e.filter(col("vec_id") % testMod === 0)
      .select(col("vec_id"), col("label").as("true_label"), col("mv").as("qa"), col("n2").as("qa2"))
    val train = e.filter(col("vec_id") % testMod =!= 0)
      .select(col("vec_id").as("nb_id"), col("label").as("nb_label"), col("mv").as("qb"), col("n2").as("qb2"))
    val d2 = (col("qa2") + col("qb2") -
      lit(2.0) * graft.functions.Native.dot(col("qa"), col("qb"))).cast("long")
    val wNbr = Window.partitionBy("vec_id").orderBy(col("d2").asc, col("nb_id").asc)
    // the TEST split is the small side — broadcast it into the train
    // partitions (train is corpus-sized and must stay distributed)
    val neighbors = train.join(broadcast(test), col("vec_id") =!= col("nb_id"))
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(wNbr))
      .filter(col("rk") <= k)
    val wVote = Window.partitionBy("vec_id").orderBy(col("n_votes").desc, col("nb_label").asc)
    neighbors.groupBy("vec_id", "true_label", "nb_label")
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("vec_id"), col("true_label").cast("long").as("true_label"),
        col("nb_label").cast("long").as("predicted_label"), col("n_votes"))
  }

  /** (label, n_actual, n_predicted, n_correct, precision, recall, f1):
    * per-label eval of the k-NN predictions — the confusion-matrix
    * margins every classifier report needs, from exact count ratios
    * (zero-denominator classes report NULL, a class predicted-but-
    * never-correct reports 0.0). Label grid = actual ∪ predicted via
    * one full-outer of two k-labels-sized rollups. */
  def knnMetrics(preds: DataFrame): DataFrame = {
    val ac = preds.groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("n_actual"))
    val pc = preds.groupBy(col("predicted_label").as("label"))
      .agg(count(lit(1)).as("n_predicted"))
    val cc = preds.filter(col("true_label") === col("predicted_label"))
      .groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("n_correct"))
    val p = col("n_correct").cast("double") / col("n_predicted")
    val r = col("n_correct").cast("double") / col("n_actual")
    ac.join(pc, Seq("label"), "full_outer")
      .join(cc, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .select(col("label"), col("n_actual"), col("n_predicted"), col("n_correct"),
        when(col("n_predicted") > 0, round(p, 6)).as("precision"),
        when(col("n_actual") > 0, round(r, 6)).as("recall"),
        when(col("n_correct") > 0, round(lit(2.0) * p * r / (p + r), 6))
          .otherwise(when(col("n_actual") > 0 && col("n_predicted") > 0, lit(0.0)))
          .as("f1"))
  }

  /** [[knnClassify]] composed with the IVF coarse quantizer — the
    * 100 TB route the brute-force scaladoc promises. A k-means
    * quantizer (MLlib, fixed seed, sample-trained — same recipe as
    * [[Ann.ivfTopK]]) partitions the TRAIN side into nLists inverted
    * lists in one map pass; each test vector probes its nProbe nearest
    * centroids (centroids are nLists×64 doubles — a broadcast literal
    * table, so probe selection is a pure map stage over the test
    * split); the exact millis-L2 top-k then runs on the probed lists
    * only, shuffling on list_id instead of cross-joining the splits.
    * Per-pair uniqueness is structural: a train vector lives in
    * exactly one list, so no candidate dedup pass is needed.
    *
    * The OUTPUT is EXACT unconditionally (same oracle as
    * [[knnClassify]]), by composing three exact reductions:
    *
    * 1. EXACT-DUPLICATE COLLAPSE on BOTH sides (the
    *    [[Dedup.dropDuplicates]] shape applied to geometry): distances
    *    depend only on the vector value, so one representative per
    *    DISTINCT train vector does all the distance work (copy groups
    *    expand back just before the final (d2, nb_id) rank — the k-th
    *    expanded distance comes from a running sum of group sizes, and
    *    every representative at or below it expands, a superset of the
    *    true top-k resolved by the final window); and one
    *    representative per distinct TEST vector computes the vote,
    *    which is value-determined, joined back to every copy at the
    *    end. On duplicate-heavy corpora (the realistic dedup-pipeline
    *    input) this divides pair work by the SQUARE of the copy
    *    factor; on duplicate-free data it costs two hash aggregates.
    * 2. IVF pass 1: scan the nProbe nearest inverted lists of
    *    representatives → running k-th expanded distance d_k.
    * 3. Ball-bound pass 2: rescan ONLY lists with d(q, c_L) − r_L ≤
    *    d_k (triangle inequality: no member of a failing list can beat
    *    d_k; the check carries a conservative FP slack, which can only
    *    ADD candidates). Clustered data prunes to nearly nothing;
    *    near-uniform data degrades toward a full scan of the
    *    REPRESENTATIVES — exactness is never traded, only scan
    *    fraction. FP wobble in quantizer training moves bucket
    *    boundaries and hence cost, never the result.
    *
    * Below `minIvfReps` DISTINCT train vectors the quantizer fit plus
    * two scan passes cost more than they save — the candidate stage
    * then scores every (test-rep, train-rep) pair directly (reps are
    * broadcastable at that size) through the same exact expanded-rank
    * selection. Specs force the IVF path with `minIvfReps = 0`. */
  def knnClassifyIvf(embeddings: DataFrame, k: Int = 5, testMod: Int = 10,
                     nLists: Int = 16, nProbe: Int = 4,
                     minIvfReps: Long = 4096L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dotc = graft.functions.Native.dot _
    val e = embeddings.select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS DOUBLE))").as("mv"))
      .withColumn("n2", dotc(col("mv"), col("mv")))
    // collapse key: md5 of the JSON-formatted vector — injective
    // (JSON number formatting round-trips doubles, and NULL elements
    // are preserved as literal `null`, which a concat_ws-based key
    // would silently DROP, merging distinct vectors), so groups are
    // precisely the equal-value classes and the shuffle key is 16
    // bytes instead of the 512-byte array itself
    def vkey(c: Column): Column = md5(to_json(c))
    val test = e.filter(col("vec_id") % testMod === 0)
      .select(col("vec_id"), col("label").as("true_label"), col("mv").as("qa"), col("n2").as("qa2"))
      .withColumn("tkey", vkey(col("qa")))
    // test-side collapse: the vote is a function of the vector value
    // alone — one representative per distinct test vector computes it
    val testReps = test.groupBy("tkey")
      .agg(min("vec_id").as("tid"), min("qa").as("qar"), min("qa2").as("qa2r"))
    val q = testReps.select(col("tid").as("vec_id"), col("qar").as("qa"), col("qa2r").as("qa2"))
    val train = e.filter(col("vec_id") % testMod =!= 0)
      .select(col("vec_id").as("nb_id"), col("label").as("nb_label"), col("mv"), col("n2"))
      .withColumn("vkey", vkey(col("mv")))
    // 1. collapse exact-duplicate train vectors; reps carry the group
    // size for expanded-rank arithmetic. localCheckpoint: reps feed
    // the quantizer fit, assignment, radii and both scan passes.
    val reps = train.groupBy("vkey")
      .agg(min("nb_id").as("rep_id"), min("mv").as("mv0"), min("n2").as("qb2"),
        count(lit(1)).as("grp_n"))
      .withColumnRenamed("mv0", "mv")
      .cutLineage()
    val members = train.join(reps.select(col("vkey"), col("rep_id")), Seq("vkey"))
      .select("rep_id", "nb_id", "nb_label")
    // quantizer trained on a deterministic ~200-per-centroid sample of
    // the representatives (training on the full corpus would be an
    // extra full pass — the sample is the 100 TB norm)
    val n = reps.count()
    // no train vectors → no neighbors (the brute-force contract);
    // KMeans cannot fit on an empty set
    if (n == 0)
      return test.select(col("vec_id"), col("true_label").cast("long").as("true_label"),
        lit(0L).as("predicted_label"), lit(0L).as("n_votes")).limit(0)
    val d2 = (col("qa2") + col("qb2") -
      lit(2.0) * dotc(col("qa"), col("vr"))).cast("long")
    // running EXPANDED count in (d2, rep_id) order; the k-th expanded
    // distance is the smallest d2 whose running group-size sum reaches k
    val wCum = Window.partitionBy("vec_id").orderBy(col("d2").asc, col("rep_id").asc)
    val wAll = Window.partitionBy("vec_id")
    val wProbe = Window.partitionBy("vec_id").orderBy(col("cd2").asc, col("list_id").asc)
    // (vec_id, rep_id, d2) candidate rep pairs, guaranteed to cover the
    // true top-k expanded members of every test representative
    val pairs: DataFrame =
      if (n < minIvfReps) {
        // small-reps path: the whole rep table broadcasts; scoring all
        // pairs directly beats paying the quantizer fit + two passes
        q.crossJoin(broadcast(reps.select(col("rep_id"),
            col("mv").as("vr"), col("qb2"), col("grp_n"))))
          .withColumn("d2", d2)
      } else {
        val feats = reps.select(col("rep_id"), array_to_vector(col("mv")).as("features"))
        val frac = math.min(1.0, nLists * 200.0 / math.max(1L, n))
        val fitSet = if (frac < 1.0) feats.sample(withReplacement = false, frac, seed = 7L) else feats
        val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(3).fit(fitSet)
        // one assign pass; a representative lives in exactly ONE list, so
        // (test, rep) candidate pairs are structurally unique — no dedup
        val repLists = model.transform(
          reps.withColumn("features", array_to_vector(col("mv"))))
          .select(col("prediction").as("list_id"), col("rep_id"),
            col("mv").as("vr"), col("qb2"), col("grp_n"))
          .cutLineage()
        val cents = model.clusterCenters.zipWithIndex
          .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("list_id", "cv")
          .withColumn("c2", dotc(col("cv"), col("cv")))
        // list radii: max member distance to own centroid — nLists rows
        val radii = repLists.join(broadcast(cents), Seq("list_id"))
          .select(col("list_id"),
            sqrt(greatest(lit(0.0), col("qb2") + col("c2") -
              lit(2.0) * dotc(col("vr"), col("cv")))).as("rx"))
          .groupBy("list_id").agg(max("rx").as("r"))
        val centsR = cents.join(radii, Seq("list_id"))
        // every (test representative, list) with centroid distance —
        // reps × nLists, centroid table broadcast, pure map stage
        val qc = q.crossJoin(broadcast(centsR))
          .withColumn("cd2", greatest(lit(0.0), col("qa2") + col("c2") -
            lit(2.0) * dotc(col("qa"), col("cv"))))
          .select(col("vec_id"), col("qa"), col("qa2"),
            col("list_id"), col("cd2"), col("r"))
        // 2. pass 1: nProbe nearest lists → preliminary k-th expanded distance
        val probes1 = qc.withColumn("pr", row_number().over(wProbe))
          .filter(col("pr") <= nProbe)
          .select(col("vec_id"), col("qa"), col("qa2"), col("list_id"))
        val stats1 = probes1.join(repLists, Seq("list_id"))
          .withColumn("d2", d2)
          .withColumn("cum", sum("grp_n").over(wCum))
          .groupBy("vec_id")
          .agg(min(when(col("cum") >= k, col("d2"))).as("kd2"))
        // 3. pass 2: every list the ball bound cannot exclude (always a
        // superset of the lists holding the true top-k members). A NULL
        // kd2 means the probed lists held fewer than k expanded members
        // (cum never reached k) — no bound exists yet, keep every list.
        val keep = qc.join(stats1, Seq("vec_id"), "left")
          .filter(col("kd2").isNull ||
            sqrt(col("cd2")) - col("r") <= sqrt(col("kd2").cast("double")) + lit(1e-6))
          .select(col("vec_id"), col("qa"), col("qa2"), col("list_id"))
        keep.join(repLists, Seq("list_id")).withColumn("d2", d2)
      }
    val candReps = pairs
      .withColumn("cum", sum("grp_n").over(wCum))
      .withColumn("kd2", min(when(col("cum") >= k, col("d2"))).over(wAll))
      // reps at or below the k-th expanded distance (all of them when
      // the whole train side holds fewer than k members)
      .filter(col("kd2").isNull || col("d2") <= col("kd2"))
      .select(col("vec_id"), col("rep_id"), col("d2"))
    // expand the surviving copy groups and rank members exactly
    val wNbr = Window.partitionBy("vec_id").orderBy(col("d2").asc, col("nb_id").asc)
    val neighbors = candReps.join(members, Seq("rep_id"))
      .withColumn("rk", row_number().over(wNbr))
      .filter(col("rk") <= k)
    val wVote = Window.partitionBy("vec_id").orderBy(col("n_votes").desc, col("nb_label").asc)
    val repVotes = neighbors.groupBy("vec_id", "nb_label")
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("vec_id").as("tid"),
        col("nb_label").cast("long").as("predicted_label"), col("n_votes"))
    // fan the value-determined vote back out to every test copy
    test.join(testReps.select(col("tkey"), col("tid")), Seq("tkey"))
      .join(repVotes, Seq("tid"))
      .select(col("vec_id"), col("true_label").cast("long").as("true_label"),
        col("predicted_label"), col("n_votes"))
  }

  /** (vec_id, dim_idx, unit): L2-normalized embeddings, exploded —
    * the mandatory preprocessing before cosine ANN (normalized
    * vectors turn cosine into a plain dot product, which is what the
    * LSH/IVF stages index). Pure map stage, zero shuffles; zero-norm
    * vectors are DROPPED (their direction is undefined — emitting
    * NaNs would poison any downstream dot). round 6: one sqrt + one
    * division over the same doubles on both engines. */
  def l2Normalize(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(graft.functions.Native.dot(col("v"), col("v"))))
      .filter(col("nrm") > 0.0)
      .select(col("vec_id"), col("nrm"), posexplode(col("v")).as(Seq("dim_idx", "x")))
      .select(col("vec_id"), col("dim_idx").cast("long").as("dim_idx"),
        round(col("x") / col("nrm"), 6).as("unit"))

  /** (vec_id, dim_idx, qval, scale_micros): symmetric int8
    * quantization of the embedding store — per-vector scale =
    * max|x|/127, qval = floor(x·127/max|x|) ∈ [−127, 127]. The
    * compression step every billion-vector ANN deployment takes (4×
    * smaller store, SIMD int8 dot products); emitted EXPLODED so the
    * quantized values are oracle-comparable row by row. Pure map
    * stage — zero shuffles at any scale; an all-zero vector gets
    * qval 0 everywhere (scale 0 marks it degenerate). The final
    * clamp guarantees the int8 range even for DOUBLE inputs, where
    * fl(x·127)/maxabs at x = ±maxabs can land one ulp outside ±127
    * (float inputs are exact in double and always hit full scale). */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("maxabs", expr("array_max(transform(v, x -> abs(x)))"))
      .select(col("vec_id"), col("maxabs"), posexplode(col("v")).as(Seq("dim_idx", "x")))
      .select(col("vec_id"), col("dim_idx").cast("long").as("dim_idx"),
        when(col("maxabs") === 0.0, lit(0L))
          .otherwise(greatest(lit(-127L),
            least(lit(127L), floor(col("x") * lit(127.0) / col("maxabs")).cast("long"))))
          .as("qval"),
        floor(col("maxabs") * lit(1000000.0)).cast("long").as("scale_micros"))

  /** (vec_id, dim_idx, w): WHITENED embeddings — every coordinate
    * centered on its corpus mean and scaled to unit variance, the
    * standard preprocessing before distance work (a dominant-variance
    * dimension otherwise owns every cosine/L2 comparison; PCA-free
    * diagonal whitening is the cheap 80% of it). Exactness and scale
    * shape: coordinates go to the exact millis grid first, so the
    * per-dimension sufficient statistics (count, Σx, Σx²) are ONE
    * dim-cardinality BIGINT aggregation; the dim-sized stats come
    * back as a bounded driver sync (the k-means-sync shape) and bake
    * into the plan as LITERAL arrays, making the whitening itself a
    * pure map stage — at 100 TB: one stats pass + one map pass, no
    * shuffle beyond the dim-sized agg. mean and variance derive with
    * the identical op order the oracle writes, so the rounded output
    * is engine-exact; a zero-variance dimension whitens to 0.0 (it
    * carries no signal). */
  def whiten(emb: DataFrame): DataFrame =
    whitenWith(emb, whitenStats(emb))

  /** The per-dimension (mean, variance) statistics on the millis grid
    * — the bounded driver sync [[whiten]] and the streaming leg share
    * (for a stream, these are the PRE-DRAIN corpus-global plan, the
    * budget-sampler precedent: fixed before the first micro-batch). */
  def whitenStats(emb: DataFrame): Array[(Int, Double, Double)] = {
    val stats = millisGrid(emb)
      .select(posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"), sum("x").as("s"), sum(expr("x * x")).as("q"))
      .collect().map { r =>
        val (n, s, q) = (r.getLong(1), r.getLong(2), r.getLong(3))
        // textual mirror of the oracle: CAST(s AS DOUBLE)/n and
        // (CAST(q AS DOUBLE) - CAST(s AS DOUBLE)*s/n)/n
        (r.getInt(0), s.toDouble / n, (q.toDouble - s.toDouble * s / n) / n)
      }.sortBy(_._1)
    require(stats.nonEmpty, "whiten: no non-null embeddings")
    stats
  }

  /** Apply [[whitenStats]] as plan LITERALS — a pure, stateless map
    * stage, which is exactly why the streaming leg is sound: union
    * over micro-batches equals the batch result row for row. */
  def whitenWith(emb: DataFrame, stats: Array[(Int, Double, Double)]): DataFrame = {
    val mArr = array(stats.map(t => lit(t._2)): _*)
    val vArr = array(stats.map(t => lit(t._3)): _*)
    millisGrid(emb)
      .select(col("vec_id"), posexplode(col("qv")).as(Seq("dim_idx", "x")))
      .select(col("vec_id"), col("dim_idx").cast("long").as("dim_idx"),
        when(element_at(vArr, (col("dim_idx") + 1).cast("int")) <= 0.0, lit(0.0))
          .otherwise(round(
            (col("x") - element_at(mArr, (col("dim_idx") + 1).cast("int"))) /
              sqrt(element_at(vArr, (col("dim_idx") + 1).cast("int"))), 4))
          .as("w"))
  }

  private def millisGrid(emb: DataFrame): DataFrame =
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("qv"))

  /** +1 when the first hex character of md5(s) is '0'..'7' (high bit
    * of the digest's first nibble is 0) — the identical predicate the
    * oracle evaluates as `substring(md5(s),1,1) <= '7'`, since hex
    * digits sort '0'..'9' < 'a'..'f' in ASCII. */
  private def md5SignPlus(s: String): Boolean =
    (java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))(0) & 0x80) == 0

  /** (vec_id, dim, y): Achlioptas-style random ±1 sign projection of
    * the embedding store down to `outDim` dimensions — the
    * Johnson–Lindenstrauss dimensionality-reduction stage that runs
    * BEFORE sketch/ANN work at corpus scale (distances are preserved
    * within (1±ε) w.h.p., and a dense float matrix multiply becomes
    * sign-flips and adds).
    *
    * Determinism contract: the projection matrix is derived from
    * md5("`tag`:j:i") — both engines compute the identical matrix with
    * no RNG state — and inputs are quantized once to exact integer
    * millis, so each output coordinate is an exact ± sum of integers
    * (|y| ≤ dim·10⁶ ≪ 2^53: exact in the double-typed native dot,
    * lossless BIGINT cast). Scale shape: the matrix rides in the plan
    * as `outDim` literal rows (one fused codegen'd dot each) — a PURE
    * MAP stage, zero shuffles at any corpus size.
    *
    * All vectors must share one dimensionality (the embeddings-table
    * contract); the input must be non-empty (the matrix width is read
    * from it). */
  def projectSigns(embeddings: DataFrame, outDim: Int = 16, tag: String = "proj"): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val e = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS DOUBLE))").as("mv"))
    val head = e.select(size(col("mv"))).head(1)
    require(head.nonEmpty, "projectSigns needs at least one non-NULL embedding")
    val inDim = head(0).getInt(0)
    val ys = (0 until outDim).map { j =>
      val row = (0 until inDim).map(i => if (md5SignPlus(s"$tag:$j:$i")) 1.0 else -1.0)
      graft.functions.Native.dot(col("mv"), typedlit(row)).cast("long")
    }
    e.select(col("vec_id"), posexplode(array(ys: _*)).as(Seq("dim", "y")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("y"))
  }

  /** (label, n_vecs, cos_to_global, l2_dist): EMBEDDING DRIFT per
    * class — each label's centroid against the corpus centroid, the
    * distribution-shift monitor for embedding columns (the vector
    * sibling of [[TextAnalysis]]'s KS drift on scalars). Exactness via
    * the file's millis contract: per-(label, dim) integer component
    * SUMS are the centroid up to a scale factor, cosine is
    * scale-invariant so it runs directly on the exact sum vectors, and
    * the centroid L2 distance clears denominators —
    * ‖s_l/c_l − s_g/c_g‖ = ‖s_l·c_g − s_g·c_l‖ / (c_l·c_g) — so every
    * sum/product is exact decimal(38,0) and the single sqrt/divide is
    * bit-deterministic. Shuffles are (label, dim)-cardinality; vectors
    * never move whole. Exact to ~1e19 millis·count magnitudes — far
    * past any real corpus's class sizes. */
  def embDrift(emb: DataFrame): DataFrame = {
    val dims = emb.filter(col("embedding").isNotNull)
      .select(col("label"), posexplode(
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")))
      .select(col("label"), col("pos").as("dim"), col("col").as("mv"))
    val byLabel = dims.groupBy("label", "dim")
      .agg(sum("mv").as("s"), count(lit(1)).as("cnt"))
    val global = byLabel.groupBy("dim").agg(sum("s").as("gs"), sum("cnt").as("gc"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    byLabel.join(global, "dim")
      .groupBy("label")
      .agg(max("cnt").as("n_vecs"), max("gc").as("gcv"),
        sum(dec(col("s")) * dec(col("gs"))).as("dot"),
        sum(dec(col("s")) * dec(col("s"))).as("nl"),
        sum(dec(col("gs")) * dec(col("gs"))).as("ng"),
        sum((dec(col("s")) * dec(col("gc")) - dec(col("gs")) * dec(col("cnt"))) *
          (dec(col("s")) * dec(col("gc")) - dec(col("gs")) * dec(col("cnt")))).as("d2"))
      .select(col("label"), col("n_vecs"),
        when(col("nl") > 0 && col("ng") > 0,
          round(col("dot").cast("double") /
            sqrt(col("nl").cast("double") * col("ng").cast("double")), 6))
          .as("cos_to_global"),
        round(sqrt(col("d2").cast("double")) /
          (col("n_vecs") * col("gcv") * lit(1000.0)), 6).as("l2_dist"))
  }
}
