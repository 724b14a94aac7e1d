package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Deduplication operators for a training-data pipeline: exact
  * (hash groupBy), word-n-gram Jaccard (exact, the verify baseline),
  * MinHash+LSH (the 100 TB scale path) and SimHash fingerprints.
  *
  * All hashing is md5-based so the DuckDB oracle replays it exactly
  * (SURVEY.md §6). Scale notes: exact dedup and minhash signatures are
  * single-shuffle hash aggregations on uniform keys; LSH candidate
  * generation shuffles on (band, bucket) with bounded bucket sizes;
  * only the ngram variant does a shingle self-join — it is the small-N
  * exact baseline that validates the LSH path, not the scale path.
  */
object Dedup {

  /** (text_md5, canonical_doc_id, n_copies): exact duplicate groups. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_copies"))

  /** (source, n_owned, n_absorbed, n_ceded): the DOMAIN-LEVEL dedup
    * OWNERSHIP convention — for every multi-copy exact-text group the
    * canonical copy (hence the group) belongs to the source of the
    * min-id doc (the store's rep convention), and each source reads:
    * groups it owns, EVERY non-canonical copy its groups absorb
    * (the owner's own same-source duplicates included — n_absorbed
    * counts the copies the group collapses, whoever contributed
    * them), and its own docs ceded to groups ANOTHER source owns
    * (foreign-only). The two legs are deliberately asymmetric:
    * Σ n_absorbed = total collapsed copies ≥ Σ n_ceded = copies that
    * crossed a source boundary; the gap is within-source duplication
    * — itself a triage signal (a self-duplicating crawl vs a
    * mirror). The provenance
    * decision surface behind per-source quotas and crawl triage: a
    * source whose dup exposure is mostly `n_ceded` is a mirror, not a
    * content source — cut it before tuning quality thresholds. Every
    * source reports (zeros when it has no multi-copy exposure), so
    * the report is a complete dashboard at any scale. One md5 hash
    * groupBy + two id-keyed joins — the [[exact]] shape, never
    * pairwise. */
  def sourceOwnership(docs: DataFrame): DataFrame = {
    val d = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val g = d.groupBy("h").agg(min("doc_id").as("rep"), count(lit(1)).as("m"))
      .filter(col("m") >= 2)
    val mem = d.join(g.select("h", "rep"), "h")
    val owner = mem.filter(col("doc_id") === col("rep"))
      .select(col("h").as("oh"), col("source").as("owner"))
    val dd = mem.join(owner, col("h") === col("oh"))
    val contrib = dd.select(col("owner").as("source"),
        when(col("doc_id") === col("rep"), 1L).otherwise(0L).as("own"),
        when(col("doc_id") =!= col("rep"), 1L).otherwise(0L).as("absorbed"),
        lit(0L).as("ceded"))
      .unionByName(dd
        .filter(col("doc_id") =!= col("rep") && col("source") =!= col("owner"))
        .select(col("source"), lit(0L).as("own"), lit(0L).as("absorbed"),
          lit(1L).as("ceded")))
    docs.select("source").distinct()
      .join(contrib.groupBy("source").agg(sum("own").as("o"),
        sum("absorbed").as("a"), sum("ceded").as("c")), Seq("source"), "left")
      .select(col("source"),
        coalesce(col("o"), lit(0L)).as("n_owned"),
        coalesce(col("a"), lit(0L)).as("n_absorbed"),
        coalesce(col("c"), lit(0L)).as("n_ceded"))
  }

  /** The deduplicated corpus: keep the min doc_id of every exact-hash
    * group, then drop the HIGHER doc_id of every VERIFIED near-dup
    * pair (the standard LLM-corpus policy; no iterative connected
    * components needed because dropping every doc_b breaks every
    * pair). LSH candidates are only candidates — a band collision at
    * true Jaccard 0.4 happens a few percent of the time — so exact
    * Jaccard runs over the candidate pairs before anything is
    * dropped. The verify pass touches only candidate docs' shingles
    * (semi-join), never the full corpus pairwise. */
  def dropDuplicates(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    // exact dedup FIRST: collapsing identical texts before any pairwise
    // work is what keeps dup-skewed corpora tractable (20 copies of a
    // doc would otherwise multiply every shingle join by 400; measured
    // 104 s -> ~4 s at 20x replication). Near-dup pairs lost by
    // dropping a copy are redundant: the canonical copy has identical
    // shingles, so it forms the same pairs. NULL-text docs hash to one
    // exact group by design (oracle GROUP BY null parity) — all but
    // the min-id null-text doc are dropped as "copies"; filter nulls
    // upstream if extraction failures must survive dedup.
    // localCheckpoint: this subtree feeds the verify stage AND the
    // final anti-join — two separate jobs whose exchange reuse cannot
    // span them; pay the corpus hash-agg once (eager, like the
    // candidate list in verifiedNearDups).
    val canonCorpus = docs.join(
      exact(docs).select(col("canonical_doc_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .cutLineage()
    val losers = verifiedNearDups(canonCorpus, threshold)
      .select(col("doc_b").as("doc_id")).distinct()
    canonCorpus.join(losers, Seq("doc_id"), "left_anti")
  }

  /** (doc_a, doc_b, jaccard): MinHash candidates verified by exact
    * Jaccard ≥ threshold, computed over candidate documents only.
    *
    * EXACT-COLLAPSE-FIRST with exact EXPANSION (the 190 s→6 s theorem,
    * here preserving the full pair contract): identical texts have
    * identical shingle sets, so (a) a rep-pair's verified Jaccard
    * applies verbatim to every cross-copy member pair, and (b)
    * within-copy-group pairs are definitionally Jaccard 1.0 whenever
    * the text shingles at all (≥ 3 words — shorter texts produce no
    * shingles and the brute form emits nothing for them either).
    * Banding + shingle-intersection verification therefore run ONCE
    * per distinct text; member pairs are a cheap join-expansion of
    * the rep-level result. Measured at the 20× dup-skew probe:
    * 165 s (copies fed straight into banding) → seconds, identical
    * output. */
  def verifiedNearDups(docs: DataFrame, threshold: Double = 0.8,
                       numPerm: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // the banding's S-curve midpoint (1/bands)^(1/rows) is where a
    // true pair's candidate probability crosses 50%: a verify
    // threshold far BELOW it silently loses most boundary pairs in
    // candidate generation (at the 16/4 default, midpoint ~0.71; a
    // 0.5 threshold would recall only ~23% of Jaccard-0.5 pairs).
    // Reject the mismatch instead of returning a quietly-partial set.
    val bands = numPerm / math.max(1, rowsPerBand)
    val midpoint = math.pow(1.0 / bands, 1.0 / rowsPerBand)
    require(threshold >= midpoint - 0.05,
      f"verify threshold $threshold%.2f is far below the LSH banding's " +
        f"S-curve midpoint $midpoint%.2f (numPerm=$numPerm, rowsPerBand=$rowsPerBand): " +
        "candidate generation would miss most boundary pairs — use more/narrower bands")
    val withH = docs.select(col("doc_id"), col("text"), md5(col("text")).as("h"))
    val reps = withH.groupBy("h")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("m"))
    // members is reused by both expansions; group-shaped (corpus rows)
    val members = withH.select(col("doc_id"), col("h")).join(reps, "h")
      .select(col("doc_id"), col("rep"), col("m")).cutLineage()
    val canon = docs.join(members.filter(col("doc_id") === col("rep"))
      .select("doc_id"), Seq("doc_id"), "left_semi")
    // the candidate list feeds BOTH the candidate-doc semi-join and the
    // final pair filter; it is output-sized (pairs, not corpus), so
    // materialize it once instead of re-running signatures + banding
    val cand = minhashCandidates(canon, numPerm, rowsPerBand).cutLineage()
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val candCorpus = canon.join(candDocs, Seq("doc_id"), "left_semi")
    val sh = shingles(candCorpus)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val repPairs = pairIntersections(cand, sh, "shingle")
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .withColumn("j_exact",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("j_exact") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("j_exact"), 4).as("jaccard"))
    // expansion 1: a rep pair's jaccard holds for every cross-group
    // member pair (identical shingle sets); reorder to doc_a < doc_b
    val ma = members.select(col("rep").as("doc_a"), col("doc_id").as("a"))
    val mb = members.select(col("rep").as("doc_b"), col("doc_id").as("b"))
    val cross = repPairs.join(ma, "doc_a").join(mb, "doc_b")
      .select(least(col("a"), col("b")).as("doc_a"),
        greatest(col("a"), col("b")).as("doc_b"), col("jaccard"))
    // expansion 2: within-group pairs (exact copies) are jaccard 1.0,
    // but ONLY for texts that shingle (≥ 3 words)
    val shingleable = canon
      .filter(size(graft.functions.Text.rawTokens(col("text"))) >= 3)
      .select(col("doc_id").as("rep"))
    val memA = members.filter(col("m") >= 2)
      .join(shingleable, "rep").select(col("rep"), col("doc_id").as("a"))
    val within = memA.as("x")
      .join(memA.as("y"), col("x.rep") === col("y.rep") && col("x.a") < col("y.a"))
      .select(col("x.a").as("doc_a"), col("y.a").as("doc_b"), lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** (doc_id, cluster_id): whole duplicate GROUPS — connected
    * components over the verified near-dup pair graph, labeled by the
    * component's minimum doc_id. Iterative min-label propagation runs
    * on the PAIR graph only (vastly smaller than the corpus at any
    * scale); each round is one join + aggregate, lineage cut by
    * localCheckpoint, and convergence needs at most the graph diameter
    * (duplicate clusters are near-cliques → 2-3 rounds in practice).
    * Membership: a doc is clustered iff it has an EXACT copy (n_copies
    * > 1 — including copies too short to shingle) or its canonical is
    * in a verified near-dup component; unique docs with no near-dup
    * are omitted (singleton clusters are implicit). */
  /** (doc_id, cluster_id): the KEEP decision that finishes near-dup
    * dedup — exactly one representative per [[nearDupClusters]]
    * component, ranked (n_chars desc, doc_id asc): the longest copy is
    * the least-truncated one (swap in a quality score for real mixes);
    * every unclustered doc keeps itself (cluster_id = doc_id), so the
    * output doc_id set IS the cleaned corpus. Scale: all corpus-sized
    * work stays inside nearDupClusters' exact-collapse + bucketed-LSH
    * pipeline; the ranking window runs over the small clustered-docs
    * relation only (WindowGroupLimit at rank 1), and the loner side is
    * one LEFT ANTI hash join on doc_id. */
  def keepBest(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    // the cluster relation feeds BOTH branches below (rank-1 pick and
    // the loner anti-join) — checkpoint it once or the whole iterative
    // CC pipeline executes twice (measured 2x at the 20x probe)
    val clusters = nearDupClusters(docs, threshold).cutLineage()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("n_chars").desc, col("doc_id").asc)
    val best = clusters
      .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("doc_id", "cluster_id")
    val loners = docs.join(clusters, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    best.unionByName(loners)
  }

  def nearDupClusters(docs: DataFrame, threshold: Double = 0.8,
                      maxIter: Int = 20): DataFrame = {
    // exact-dedup FIRST, same reason as dropDuplicates: k exact copies
    // multiply the pair graph by k² (measured 190 s vs 8 s at 20×
    // replication). Clustering the canonical corpus then mapping every
    // exact copy to its canonical's cluster is semantically identical:
    // copies have identical shingle sets, so a raw-corpus pair exists
    // iff the canonical pair exists, and the canonical doc_id (min of
    // its copy group) is the component min either way.
    // doc → canonical via the skew-safe hash aggregate (exact() does
    // map-side partial aggregation; a window over md5(text) would sort
    // each whole copy group on one executor — the very skew this path
    // exists to avoid)
    val groups = exact(docs).select(col("text_md5").as("gh"),
      col("canonical_doc_id").as("canon"), col("n_copies"))
    val canonMap = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      // null-safe equality: null-text docs form one group too (their
      // md5 is null on both sides), matching GROUP BY null semantics
      .join(groups, col("h") <=> col("gh"))
      .select("doc_id", "canon", "n_copies")
      .cutLineage()
    val canonCorpus = docs.join(
      canonMap.filter(col("doc_id") === col("canon")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val canonClusters = propagateMinLabels(
      verifiedNearDups(canonCorpus, threshold).select("doc_a", "doc_b"), maxIter)
    // a doc is clustered iff its canonical is near-dup-clustered OR its
    // exact group has >1 copy (the group alone is a cluster)
    canonMap
      .join(canonClusters.select(col("doc_id").as("canon"), col("cluster_id")),
        Seq("canon"), "left")
      .filter(col("cluster_id").isNotNull || col("n_copies") > 1)
      .select(col("doc_id"), coalesce(col("cluster_id"), col("canon")).as("cluster_id"))
  }

  /** Iterative min-label propagation over an undirected pair list →
    * (doc_id, cluster_id = component min). Each round takes the min
    * over graph neighbors AND then chases one hop through the label
    * table itself (pointer doubling: lbl ← label(lbl), sound because
    * every label value is a node id in the same component), so label
    * distance-to-root roughly halves per round → O(log diameter)
    * rounds, not O(diameter). A path graph of length 2^maxIter would
    * still exit unconverged, so the loop THROWS rather than silently
    * returning split components. */
  private[graft] def propagateMinLabels(pairs: DataFrame, maxIter: Int): DataFrame = {
    require(maxIter > 0, s"maxIter must be positive, got $maxIter")
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .distinct()
      .cutLineage()
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id"))
      .cutLineage()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("lbl")), "doc_b")
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min("lbl").as("neighbor_lbl"))
      // checkpointed: the pointer-doubling self-join below reads this
      // subtree on BOTH sides with different join keys — uncut, each
      // round would re-evaluate the labels⋈prop join twice
      val stepped = labels
        .join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lbl").as("old_lbl"),
          least(col("lbl"), coalesce(col("neighbor_lbl"), col("lbl"))).as("lbl"))
        .cutLineage()
      // old_lbl rides along so convergence is a filter on the
      // materialized round output — no extra join against last round
      val next = stepped.as("s")
        .join(stepped.select(col("doc_id").as("p"), col("lbl").as("p_lbl")).as("t"),
          col("s.lbl") === col("t.p"), "left")
        .select(col("s.doc_id").as("doc_id"), col("s.old_lbl").as("old_lbl"),
          least(col("s.lbl"), coalesce(col("p_lbl"), col("s.lbl"))).as("lbl"))
        .cutLineage()
      converged = next.filter(col("lbl") =!= col("old_lbl")).isEmpty
      labels = next.select("doc_id", "lbl")
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(component diameter > 2^maxIter); raise maxIter")
    labels.select(col("doc_id"), col("lbl").as("cluster_id"))
  }

  /** (doc_id, span_md5): every w-token sliding window of every
    * document, hashed — NON-distinct, one row per occurrence, because
    * the span operators below count occurrences as well as documents.
    * Pure map + explode: zero shuffle until the consumer aggregates. */
  private def spanHashes(docs: DataFrame, w: Int): DataFrame = {
    require(w >= 2, s"span width must be >= 2 tokens, got $w")
    docs.select(col("doc_id"), graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= w)
      .select(col("doc_id"),
        explode(graft.functions.Native.shingles(col("words"), w)).as("span"))
      .select(col("doc_id"), md5(col("span")).as("span_md5"))
  }

  /** (span_md5, n_docs, n_occ): w-token spans that appear in at least
    * two DISTINCT documents — substring-level exact duplication, the
    * windowed-hash re-expression of suffix-array training-data dedup
    * (Lee et al. 2022: duplicated passages, not just duplicated whole
    * documents, are what LLM corpora need scrubbed). Repetition within
    * a single document does NOT qualify (that is a quality signal —
    * see [[TextAnalysis.gopherRules]]); only cross-document spans are
    * duplication. One flatMap (windows) + one hash aggregation on the
    * span hash — map-side partial aggregation applies, and the output
    * is duplicated-span-sized, never corpus-sized. At 100 TB the
    * window relation is ~tokens-per-corpus rows, but it is never
    * materialized: it streams from the scan into the partial
    * aggregate. */
  def dupSpans(docs: DataFrame, w: Int = 8): DataFrame =
    spanHashes(docs, w)
      .groupBy("span_md5")
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)

  /** (doc_id, n_windows, n_dup_windows, keep): per-document duplicated
    * -span exposure — how many of the doc's w-token windows also
    * appear in some OTHER document, and a keep flag for the standard
    * policy "drop documents containing cross-corpus duplicated
    * passages". Documents too short to window (fewer than w tokens,
    * including NULL text) have zero windows and are kept. Two
    * aggregations on the span hash (dup-span set, then the per-doc
    * roll-up through a left join against it) — both shuffle on
    * bounded-skew md5 keys; the dup-span side is output-sized. */
  def spanFlags(docs: DataFrame, w: Int = 8): DataFrame = {
    val sp = spanHashes(docs, w)
    // distinct-doc count, not occurrence count: a span repeated inside
    // one document only is self-repetition, not duplication
    val dup = sp.groupBy("span_md5")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("span_md5"), lit(1).as("is_dup"))
    val perDoc = sp.join(dup, Seq("span_md5"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"), count(col("is_dup")).as("n_dup_windows"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("keep", col("n_dup_windows") === 0)
  }

  /** (doc_id, clean_text, n_removed): the corpus with every NON-FIRST
    * occurrence of a cross-document duplicated w-token span scrubbed —
    * the output form of suffix-array dedup (Lee et al. 2022: the
    * duplicated PASSAGE is removed everywhere but its first
    * occurrence, rather than whole documents dropped). "First" is the
    * (doc_id, position)-lexicographic minimum occurrence per span;
    * every token covered by any other occurrence is dropped and the
    * text rebuilt from the survivors in the engine's normalized
    * (lowercased, single-space) token space. NULL text stays NULL;
    * docs too short to window pass through verbatim (normalized).
    * Scale shape: the occurrence relation is duplicated-span-sized
    * (semi-join against the dup-span set before anything pairwise);
    * the only ordered operation is a per-span row_number whose
    * partitions are occurrence counts (bounded by corpus dup degree,
    * never corpus-sized); coverage positions collapse per doc into a
    * bounded-by-doc-length set that rides one row. */
  def scrubSpans(docs: DataFrame, w: Int = 8): DataFrame = {
    require(w >= 2, s"span width must be >= 2 tokens, got $w")
    val sp = docs.select(col("doc_id"), graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= w)
      .select(col("doc_id"),
        posexplode(graft.functions.Native.shingles(col("words"), w)).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"), md5(col("span")).as("span_md5"))
    val dup = sp.groupBy("span_md5")
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
    val occ = sp.join(dup.select("span_md5"), Seq("span_md5"), "left_semi")
    val ranked = occ.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("span_md5").orderBy("doc_id", "pos")))
    val covSets = ranked.filter(col("rn") > 1)
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${w - 1})")).as("ci"))
      .distinct()
      .groupBy("doc_id").agg(collect_set(col("ci")).as("cov"))
    docs.join(covSets, Seq("doc_id"), "left")
      .select(col("doc_id"),
        graft.functions.Text.rawTokens(col("text")).as("words"), col("cov"))
      .select(col("doc_id"),
        expr("""array_join(
                  filter(transform(words, (t, i) ->
                           IF(cov IS NOT NULL AND array_contains(cov, i), NULL, t)),
                         x -> x IS NOT NULL), ' ')""").as("clean_text"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"))
  }

  /** (doc_id, shingle): distinct word n-gram shingles per document.
    * The shingle array is built by the native `graft_shingles`
    * expression — ONE call per row — then explode + hash-distinct; the
    * previous `transform(sequence(...), i -> concat_ws(...))` form
    * paid an interpreted lambda call per shingle (higher-order array
    * functions never enter codegen). The distinct's exchange is REUSED
    * by both sides of the self-join in [[ngramJaccard]]. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= n)
      .select(col("doc_id"),
        explode(graft.functions.Native.shingles(col("words"), n)).as("shingle"))
      .distinct()

  /** (doc_a, doc_b, cont_a, cont_b): directional CONTAINMENT over the
    * LSH candidate pairs — |A∩B|/|A| and |A∩B|/|B| on word-3-gram
    * shingle sets. Jaccard misses the quote/sub-document case (a short
    * doc wholly inside a long one has tiny Jaccard but containment
    * ≈ 1); a pair survives when EITHER direction clears `threshold`.
    * Scale shape is [[verifiedNearDups]]'s: candidates come from the
    * banded MinHash bucket join (never all-pairs), the shingle
    * intersection joins only candidate docs (left-semi restricted
    * corpus), sizes ride broadcastable doc-cardinality aggregates.
    * Banding recall note: candidates are generated by JACCARD-tuned
    * bands, so asymmetric pairs BELOW the banding's S-curve midpoint
    * in Jaccard can be missed even when containment is high — the
    * documented trade; hook a containment-tuned band scheme (shingle
    * SAMPLING by the smaller side) in `numPerm`/`rowsPerBand` when
    * the workload is quote-mining rather than near-dup cleanup.
    *
    * EXACT-COLLAPSE-FIRST (the 190 s→6 s theorem, enforced here like
    * every production pairwise stage): identical texts have identical
    * shingle sets, so containment between copies is definitionally
    * (1.0, 1.0) and already owned by [[exact]] — while feeding copies
    * into banding inflates every bucket quadratically (measured 220 s
    * vs 3 s at the 20× dup-skew probe). Pairwise containment
    * therefore runs on ONE canonical doc per distinct text (min
    * doc_id); compose with [[exact]] to recover copy membership. */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.5,
                       numPerm: Int = 16, rowsPerBand: Int = 4): DataFrame =
    containmentStats(docs, numPerm, rowsPerBand)
      .withColumn("ca", col("inter").cast("double") / col("na"))
      .withColumn("cb", col("inter").cast("double") / col("nb"))
      .filter(col("ca") >= threshold || col("cb") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("ca"), 4).as("cont_a"), round(col("cb"), 4).as("cont_b"))

  /** (doc_a, doc_b, inter): exact element-intersection sizes for
    * EXACTLY the given candidate pairs — PAIR-DRIVEN: cand joins the
    * element relation on doc_a (Σ_pairs |set(doc_a)| rows), then the
    * match closes on (doc_b, element). Cost is linear in the candidate
    * set; the alternative all-candidate-docs element self-join pays
    * O(k²) rows for every boilerplate element shared by k candidate
    * docs even when few of those pairs are actual candidates — a skew
    * amplifier this shape cannot exhibit. Pairs with an empty
    * intersection do not appear (inner-join semantics, same as the
    * self-join shape). `sh` must be (doc_id, `key`) with distinct
    * elements per doc. */
  private[operators] def pairIntersections(cand: DataFrame, sh: DataFrame,
                                           key: String): DataFrame =
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col(key)), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col(key)), Seq("doc_b", key))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))

  /** (prefix_md5, n_docs, canonical_doc_id): PREFIX-DUPLICATION report
    * — groups of documents sharing an identical first-`w`-token prefix
    * (crawl boilerplate: shared titles, licence headers, templated
    * openings that full-document Jaccard under-weights on long docs).
    * Pure hash-groupBy on the prefix digest — one map + one
    * group-cardinality shuffle, the [[exact]] shape on a prefix key;
    * docs under `w` tokens have no prefix and are skipped. */
  def prefixDups(docs: DataFrame, w: Int = 8): DataFrame =
    docs.select(col("doc_id"), graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= w)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("words"), 1, w))).as("prefix_md5"))
      .groupBy("prefix_md5")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_doc_id"))
      .filter(col("n_docs") >= 2)

  /** One canonical doc per distinct text — the exact-collapse step
    * every pairwise stage runs first. */
  private def canonicalDocs(docs: DataFrame): DataFrame = {
    val reps = docs.withColumn("h", md5(col("text")))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(reps, Seq("doc_id"), "left_semi")
  }

  /** (doc_a, doc_b, inter, na, nb): the shared containment substrate —
    * LSH candidates over the CANONICAL corpus, shingle-set
    * intersection sizes joined with both sides' set sizes (exact
    * integers; the consumers derive their ratios from these). */
  private def containmentStats(docs: DataFrame,
                               numPerm: Int, rowsPerBand: Int): DataFrame = {
    val canon = canonicalDocs(docs)
    val cand = minhashCandidates(canon, numPerm, rowsPerBand).cutLineage()
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sh = shingles(canon.join(candDocs, Seq("doc_id"), "left_semi"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    pairIntersections(cand, sh, "shingle")
      .join(sizes.select(col("doc_id"), col("n_sh").as("na")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("n_sh").as("nb")), col("doc_b") === col("doc_id")).drop("doc_id")
  }

  /** (doc_id): the corpus cleaned of CONTAINED sub-documents — the
    * KEEP decision over [[containmentPairs]], the way [[dropDuplicates]]
    * is the decision over near-dup pairs: for every candidate pair,
    * the more-contained side is the one with the SMALLER shingle set
    * (containment inter/n is larger there; equal sizes keep the lower
    * doc_id), and it drops when its containment clears `threshold` —
    * quotes, excerpts and boilerplate-wrapped copies leave the corpus
    * while the longest source stays. Output is the CANONICAL kept
    * set (exact copies collapse first, like every pairwise stage);
    * the decision arithmetic is one exact-integer division per pair
    * compared against the literal threshold — engine-identical. */
  def dropContained(docs: DataFrame, threshold: Double = 0.9,
                    numPerm: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val losers = containmentStats(docs, numPerm, rowsPerBand)
      .filter(col("inter").cast("double") / least(col("na"), col("nb")) >= threshold)
      .select(when(col("na") < col("nb"), col("doc_a"))
        .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
    canonicalDocs(docs).join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id")
  }

  /** (doc_a, doc_b, jaccard): exact n-gram Jaccard near-dup pairs via
    * shingle self-join. Quadratic in cluster size — the correctness
    * baseline for [[minhashCandidates]]. The threshold applies to the
    * EXACT ratio (an integer-derived double, identical in any engine);
    * rounding happens only at output. The denominator comes from joins
    * against the per-doc size aggregate — doc-cardinality rows, far
    * smaller than the shingle relation, and broadcastable at scale
    * (cheaper than windowing n_sh over every shingle row, which would
    * re-shuffle and sort the full relation). */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val sh = shingles(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id"), col("n_sh").as("na")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("n_sh").as("nb")), col("doc_b") === col("doc_id")).drop("doc_id")
      .withColumn("j_exact", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("j_exact") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("j_exact"), 4).as("jaccard"))
  }

  /** (doc_a, doc_b, est_jaccard, jaccard): MinHash ESTIMATOR-QUALITY
    * evaluation — for every LSH candidate pair, the signature-agreement
    * estimate (matching components / numPerm, the unbiased MinHash
    * Jaccard estimator of Broder 1997) beside the exact n-gram
    * Jaccard. This is the monitoring query a production dedup pipeline
    * runs on a sample to validate its banding configuration: a
    * systematic est-vs-exact gap means the permutation family or
    * shingle width is wrong for the corpus. Work is PAIR-bounded: the
    * signature join restricts to candidate docs first (left-semi), the
    * agreement count is candidates × numPerm rows, and the exact side
    * is the pair-driven [[pairIntersections]] verify. Candidate pairs
    * whose shingle sets are disjoint (banding collision) report exact
    * 0.0 — the false-positive rows the estimator gap surfaces.
    * Exact-collapse-first: the monitor measures ONE representative per
    * distinct text — copies carry identical signatures and shingles,
    * so copy pairs are redundant measurements that would blow the pair
    * space up quadratically under dup skew (20× probe: 15.4 s / 3.9 M
    * rows raw → rep-level). */
  def minhashEstimate(docs: DataFrame, numPerm: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val canon = docs.join(
      docs.groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
    val cand = minhashCandidates(canon, numPerm, rowsPerBand).cutLineage()
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val candCorpus = docs.join(candDocs, Seq("doc_id"), "left_semi")
    val sigs = minhashSignatures(candCorpus, numPerm)
    val est = cand
      .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.p") === col("sb.p"))
      .groupBy("doc_a", "doc_b")
      .agg((sum(when(col("sa.sig") === col("sb.sig"), 1L).otherwise(0L))
        .cast("double") / numPerm).as("e"))
    val shE = shingles(candCorpus)
    val sizesE = shE.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val exact = pairIntersections(cand, shE, "shingle")
      .join(sizesE.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizesE.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 4).as("jaccard"))
    est.join(exact, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), round(col("e"), 4).as("est_jaccard"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"))
  }

  /** The banding configurations [[lshTune]] sweeps (bands ×
    * rowsPerBand partitions of the 16-perm signature), with each
    * config's S-curve midpoint (1/b)^(1/r) — the Jaccard level where
    * candidate probability crosses 50%. */
  val TuneConfigs: Seq[(Int, Int, Double)] =
    Seq(2, 4, 8).map { r =>
      val b = 16 / r
      (b, r, BigDecimal(math.pow(1.0 / b, 1.0 / r))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

  /** (bands, rows_per_band, midpoint, n_candidates): LSH banding
    * parameter SWEEP — the candidate-pair volume each (bands, rows)
    * partition of the SAME 16-permutation signature matrix would
    * produce, beside its S-curve midpoint. This is the tuning query an
    * operator runs before committing a dedup configuration: more/
    * narrower bands move the midpoint down (higher recall at low
    * Jaccard) and the candidate count up — the cost/recall frontier as
    * ONE relation. Each config re-slices the row-local signature array
    * (map stage) and pays only its own (band, key) equi-join; counts
    * are config-keyed scalars unioned at the end. */
  def lshTune(docs: DataFrame, numPerm: Int = 16): DataFrame =
    TuneConfigs.map { case (b, r, mid) =>
      minhashCandidates(docs, numPerm, r)
        .agg(count(lit(1)).as("n_candidates"))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          lit(mid).as("midpoint"), col("n_candidates"))
    }.reduce(_ unionByName _)

  /** See [[graft.functions.GraftHashing]] — re-exported for oracle
    * construction in SparkEntry. */
  val MinhashMod: Long = graft.functions.GraftHashing.MinhashMod
  def minhashParams(numPerm: Int): (Array[Long], Array[Long]) =
    graft.functions.GraftHashing.minhashParams(numPerm)

  /** (doc_id, sigs): all numPerm MinHash values via the native
    * graft_minhash expression — shingling, md5 and the affine
    * permutations fused in one pass per document. Pure map stage:
    * the signature matrix costs ZERO shuffle. */
  private def signatureArray(docs: DataFrame, n: Int, numPerm: Int): DataFrame =
    docs.select(col("doc_id"), graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= n)
      .select(col("doc_id"),
        graft.functions.Native.minhash(col("words"), n, numPerm).as("sigs"))

  /** (doc_id, p, sig): MinHash signature rows (row-local compute). */
  def minhashSignatures(docs: DataFrame, numPerm: Int = 16): DataFrame =
    signatureArray(docs, n = 3, numPerm = numPerm)
      .select(col("doc_id"), posexplode(col("sigs")).as(Seq("p", "sig")))

  /** (doc_a, doc_b): LSH candidate pairs — docs sharing any band of
    * rowsPerBand consecutive signature values. Bands are sliced from
    * the row-local signature array, so the ONLY shuffle is the
    * equi-join on (band, band key) — bounded buckets by construction,
    * never an all-pairs join (SURVEY.md §5). */
  def minhashCandidates(docs: DataFrame, numPerm: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val bands = bandKeys(docs, numPerm, rowsPerBand)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** (doc_id, band, bkey): LSH band keys — bands sliced row-locally
    * from the fused signature array, so banding costs ZERO shuffle;
    * consumers pay only their equi-join on (band, bkey). Shared with
    * the streaming near-dup path, which bands each arriving
    * micro-batch against a persisted static band relation. */
  private[graft] def bandKeys(docs: DataFrame, numPerm: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    require(rowsPerBand > 0 && numPerm % rowsPerBand == 0,
      s"rowsPerBand ($rowsPerBand) must evenly divide numPerm ($numPerm); " +
        "a remainder would silently drop permutations from the banding")
    val numBands = numPerm / rowsPerBand
    signatureArray(docs, n = 3, numPerm = numPerm)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, ${numBands - 1}),
           |  b -> array_join(transform(slice(sigs, b * $rowsPerBand + 1, $rowsPerBand),
           |                            x -> CAST(x AS STRING)), '|'))""".stripMargin))
        .as(Seq("band", "bkey")))
  }

  /** (doc_id, probe_id, jaccard): FUZZY train/test contamination — the
    * scale path for benchmark decontamination. The exact variant
    * ([[TextAnalysis.contamination]]) only catches verbatim shingle
    * overlap counts; this one reports which corpus documents are
    * near-duplicates of a probe (benchmark) document by n-gram
    * Jaccard, with candidates from a cross-relation MinHash band join
    * instead of corpus × probes. Both sides are EXACT-COLLAPSED first
    * (band keys and Jaccard are functions of the text value, so one
    * representative per distinct text does the matching and every
    * copy pair fans back out through the text-hash maps at the end —
    * the [[dropDuplicates]] rationale applied across relations:
    * exact copies would otherwise multiply the shingle-verify join
    * quadratically; measured 30→8.6 s at the 20×-dup-skew probe,
    * together with the candidates-first intersection below).
    * Joins carry no forced broadcast hints — a benchmark-sized probe
    * side broadcasts adaptively via AQE, a corpus-scale one degrades
    * to a plain shuffle join. Exact Jaccard verification runs over
    * candidate documents only, mirroring [[verifiedNearDups]].
    * Default banding is 8 bands × 2 rows: S-curve midpoint ≈ 0.35,
    * matching the lower thresholds decontamination uses (a benchmark
    * doc paraphrased into training data rarely survives at J ≥ 0.8).*/
  def fuzzyContamination(docs: DataFrame, probes: DataFrame, threshold: Double = 0.5,
                         numPerm: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    // same S-curve guard as verifiedNearDups: a threshold far below
    // the banding midpoint would silently lose boundary pairs
    val bands = numPerm / math.max(1, rowsPerBand)
    val midpoint = math.pow(1.0 / bands, 1.0 / rowsPerBand)
    require(threshold >= midpoint - 0.05,
      f"verify threshold $threshold%.2f is far below the LSH banding's " +
        f"S-curve midpoint $midpoint%.2f (numPerm=$numPerm, rowsPerBand=$rowsPerBand): " +
        "candidate generation would miss most boundary pairs — use more/narrower bands")
    val p = probes.select(col("probe_id").as("doc_id"), col("text"))
    // exact collapse per side: doc -> text hash, one rep per hash
    val dmap = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val pmap = p.select(col("doc_id"), md5(col("text")).as("h"))
    // rep tables are distinct-text-sized and each feeds two consumers
    // (the rep semi-join and the final fan-out) — materialize once
    val dreps = dmap.groupBy("h").agg(min(col("doc_id")).as("doc_id")).cutLineage()
    val preps = pmap.groupBy("h").agg(min(col("doc_id")).as("doc_id")).cutLineage()
    val dcorp = docs.join(dreps.select("doc_id"), Seq("doc_id"), "left_semi")
    val pcorp = p.join(preps.select("doc_id"), Seq("doc_id"), "left_semi")
    // candidate list is output-sized and feeds three consumers
    // (two semi-joins + the final pair filter) — materialize once
    val cand = bandKeys(dcorp, numPerm, rowsPerBand).as("a")
      .join(bandKeys(pcorp, numPerm, rowsPerBand).as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("probe_id"))
      .distinct()
      .cutLineage()
    val dsh = shingles(dcorp.join(cand.select("doc_id"), Seq("doc_id"), "left_semi"))
    val psh = shingles(pcorp.join(
        cand.select(col("probe_id").as("doc_id")), Seq("doc_id"), "left_semi"))
      .select(col("doc_id").as("probe_id"), col("shingle"))
    val dsz = dsh.groupBy("doc_id").agg(count(lit(1)).as("na"))
    val psz = psh.groupBy("probe_id").agg(count(lit(1)).as("nb"))
    // candidates-FIRST intersection (cand × doc shingles, then the
    // (probe, shingle) equi-join) rather than a raw shingle⋈shingle
    // join: on a small-vocabulary corpus every shingle is shared by
    // many docs, so the raw join's fanout is pairs-that-share-any-
    // shingle — far more than the band-filtered candidate set
    val repPairs = cand.join(dsh, "doc_id")
      .join(psh, Seq("probe_id", "shingle"))
      .groupBy("doc_id", "probe_id").agg(count(lit(1)).as("inter"))
      .join(dsz, "doc_id")
      .join(psz, "probe_id")
      .withColumn("j_exact", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("j_exact") >= threshold)
      .select(col("doc_id"), col("probe_id"), round(col("j_exact"), 4).as("jaccard"))
    // fan representative pairs back to every exact copy on both sides
    // (rep -> its text hash -> all doc/probe ids sharing that text)
    repPairs
      .join(dreps.select(col("doc_id"), col("h").as("ha")), "doc_id")
      .join(preps.select(col("doc_id").as("probe_id"), col("h").as("hb")), "probe_id")
      .select(col("ha"), col("hb"), col("jaccard"))
      .join(dmap.select(col("doc_id"), col("h").as("ha")), "ha")
      .join(pmap.select(col("doc_id").as("probe_id"), col("h").as("hb")), "hb")
      .select(col("doc_id"), col("probe_id"), col("jaccard"))
  }

  /** (doc_a, doc_b, hamming): near-dup pairs by SimHash hamming
    * distance ≤ maxHamming. Scale path: the 60-bit fingerprint splits
    * into maxHamming+1 blocks — any pair within the threshold shares
    * at least one exact block (pigeonhole), so candidates come from an
    * equi-join on (block index, block bits) and only candidates pay
    * the exact hamming check. Both join sides are the same subtree →
    * the fingerprint exchange is computed once and reused. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bits = 60
    // guard the pigeonhole geometry BEFORE the division: maxHamming
    // < 0 divides by zero, and a large maxHamming shrinks blocks until
    // buckets hold large corpus fractions (the candidate join
    // degenerates toward a cross product) — SimHash blocking is only
    // meaningful for small radii
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val nBlocks = maxHamming + 1
    val blockLen = bits / nBlocks
    require(blockLen >= 4,
      s"maxHamming=$maxHamming leaves $blockLen-bit blocks on a $bits-bit " +
        "fingerprint: buckets would hold large corpus fractions and the " +
        "candidate join degenerates — keep maxHamming <= 14")
    val mask = (1L << blockLen) - 1
    val bands = simhash(docs)
      .select(col("doc_id"), col("simhash"), posexplode(expr(
        s"transform(sequence(0, ${nBlocks - 1}), b -> (simhash >> (b * $blockLen)) & $mask)"))
        .as(Seq("b", "block")))
    bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.block") === col("b.block") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("fpa"), col("b.simhash").as("fpb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(fpa ^ fpb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** (doc_id, simhash): 60-bit SimHash as a bit string, tf-weighted
    * over stopword-filtered terms — one zero-shuffle pass via the
    * native graft_simhash expression (15 md5 hex digits per term so
    * the key fits a signed 64-bit int in both engines; docs with no
    * kept tokens yield null and are dropped, matching the aggregation
    * formulation in the SQL oracle). */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.Native.simhash(graft.functions.Text.rawTokens(col("text"))).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** (doc_id, n_chunks, n_dup_chunks, dup_ratio): chunk-level
    * duplicate profiling — every doc's fixed-size token chunks
    * ([[TextAnalysis.seqChunks]]'s exact windows) hashed, and a chunk
    * counted as duplicated when its md5 appears in ≥2 DISTINCT docs
    * (cross-document boilerplate: shared headers, license blocks,
    * navigation text — the within-doc repetition case is the Gopher
    * repetition operator's). The per-doc dup ratio is the
    * curation signal: high ratio = mostly-boilerplate doc. Scale
    * shape: chunk relation shuffles once on the uniform chunk_md5 key
    * for the frequency agg, joins back on the same key (co-partitioned
    * by AQE), final agg on doc_id; chunk rows carry hashes, never
    * text. */
  def chunkDups(docs: DataFrame, chunkSize: Int = 16): DataFrame = {
    val chunks = TextAnalysis.seqChunks(docs, chunkSize)
      .select("doc_id", "chunk_md5")
    val freq = chunks.groupBy("chunk_md5")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    chunks.join(freq, "chunk_md5")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_ratio",
        round(col("n_dup_chunks").cast("double") / col("n_chunks"), 4))
  }

  /** (source, n_docs, n_distinct_texts, n_copies, n_canonical): the
    * corpus-health ROLLUP of exact dedup — per ingestion source, how
    * many documents arrive, how many distinct texts they carry, how
    * many are redundant copies, and how many of the GLOBAL canonical
    * representatives (min doc_id per text, [[exact]]'s keep rule) this
    * source owns. n_canonical > n_distinct_texts is impossible;
    * n_canonical < n_distinct_texts means other sources shipped the
    * same text earlier — the cross-source contamination signal a
    * mixture designer reads before weighting sources. All-integer
    * output. Scale shape: two hash aggregations and one join, all
    * keyed on the uniform md5 — no skew, no global ordering. */
  def dupRateBySource(docs: DataFrame): DataFrame = {
    val withH = docs.select(col("source"), col("doc_id"), md5(col("text")).as("h"))
    val canon = withH.groupBy("h").agg(min("doc_id").as("keep_id"))
    withH.join(canon, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct_texts"),
        sum(when(col("doc_id") === col("keep_id"), 1L).otherwise(0L)).as("n_canonical"))
      .select(col("source"), col("n_docs"), col("n_distinct_texts"),
        (col("n_docs") - col("n_distinct_texts")).as("n_copies"), col("n_canonical"))
  }
}
