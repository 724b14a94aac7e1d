package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Iterative graph computation over document-relation graphs — the
  * general pattern behind link analysis, label propagation and
  * influence scoring, here instantiated as PageRank over the verified
  * near-duplicate similarity graph (which duplicate neighborhoods are
  * most central — a triage signal for aggressive dedup).
  *
  * Arithmetic contract (SURVEY.md §6): ranks are exact BIGINT
  * "picos" of probability mass (total ≈ 10^12) and every step is
  * integer: per-edge contribution = rank // outdeg (floor), damping =
  * (85·Σ) // 100, teleport = (15·r0) // 100. Floor-division of
  * non-negative longs is identical in Spark (`div`) and DuckDB
  * (`//`), integer sums are order-independent, so a fixed iteration
  * count is bit-reproducible across engines and partitionings.
  *
  * Scale shape: each iteration is one shuffle — contributions
  * aggregate on dst — plus a left join back to the node set; edges
  * and out-degrees are reused unchanged (at 100 TB both would be
  * co-partitioned once and the rank relation checkpointed every few
  * iterations to cut lineage; [[Dedup.nearDupClusters]] documents the
  * same pattern for its pointer-doubling loop).
  */
object Graph {

  val TotalMass = 1000000000000L // 10^12 "picos" of probability mass

  /** (doc_id, n_triangles): per-node TRIANGLE COUNT over the verified
    * near-dup graph — the local clustering signal that separates tight
    * duplicate cliques (template farms, mirrored sites: triangle-dense)
    * from chain-shaped drift (successive revisions: triangle-free),
    * which [[Dedup.nearDupClusters]]'s component ids cannot distinguish.
    * Standard distributed triangle enumeration on the a<b<c orientation
    * (each triangle counted once): wedge join (e1.b = e2.a) + closing-
    * edge semi-check, all equi-joins on the PAIR relation — work scales
    * with wedges of the dup graph, never with the corpus. Each closed
    * triangle credits its three vertices via one Expand + count. */
  def triangles(docs: DataFrame): DataFrame =
    trianglesFrom(Dedup.verifiedNearDups(docs))

  /** [[triangles]] over an externally-supplied verified pair relation
    * (doc_a, doc_b, ...) — the staged-substrate entry point
    * ([[DedupStore.verifiedNearDups]] serves the same relation the live
    * derivation produces). */
  def trianglesFrom(pairs: DataFrame): DataFrame = {
    val e = pairs
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().cutLineage()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"), "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }

  /** (doc_a, doc_b, n_common): LINK PREDICTION by common-neighbor
    * count — the top-k NON-adjacent doc pairs of the LSH CANDIDATE
    * graph sharing the most neighbors (Liben-Nowell & Kleinberg 2003's
    * strongest simple predictor): pairs no band ever put in one bucket
    * but whose shared candidate neighborhoods say "probably related" —
    * the review queue a dedup operator triages before re-banding. The
    * candidate graph (not the verified one) is the right substrate:
    * verification makes near-dup cliques transitive-closed, leaving no
    * open wedges, while banding collisions are exactly the
    * intransitive structure link prediction exploits. Same wedge join
    * as [[triangles]] but keeping the OPEN wedges: symmetric neighbor
    * relation, wedge equi-join on the shared endpoint, existing edges
    * anti-joined away, distributed TakeOrdered on (count desc, pair
    * asc). Work scales with candidate-graph wedges. */
  def commonNeighbors(docs: DataFrame, k: Int = 10): DataFrame = {
    // exact-collapse-first: copies carry identical band keys, so they
    // add 20-copy cliques and zero structural signal — the 20x probe
    // measured 36 s raw vs seconds rep-level; predictions are between
    // distinct TEXTS, which is what a review queue wants anyway
    val canon = docs.join(
      docs.groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
    val e = Dedup.minhashCandidates(canon)
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().cutLineage()
    commonNeighborsFrom(e, k)
  }

  /** [[commonNeighbors]] over an externally-supplied candidate pair
    * relation (doc_a, doc_b) — the staged-substrate entry point
    * ([[DedupStore.candidates]] stages exactly the canonical-corpus
    * candidate graph the live derivation builds). */
  def commonNeighborsFromCandidates(cands: DataFrame, k: Int = 10): DataFrame =
    commonNeighborsFrom(
      cands.select(least(col("doc_a"), col("doc_b")).as("a"),
          greatest(col("doc_a"), col("doc_b")).as("b"))
        .distinct().cutLineage(), k)

  /** The wedge-count core of [[commonNeighbors]] over any (a < b) edge
    * relation — split out so specs can drive planted graph topologies
    * (near-dup candidate graphs are mostly bucket cliques, so the
    * corpus review queue can legitimately be small or empty at some
    * scale factors; the planted chain spec proves the prediction
    * semantics regardless, and corpus predictions brute-verify). */
  private[graft] def commonNeighborsFrom(e: DataFrame, k: Int): DataFrame = {
    val nb = e.select(col("a").as("node"), col("b").as("nbr"))
      .union(e.select(col("b").as("node"), col("a").as("nbr")))
    val wedges = nb.as("x").join(nb.as("y"),
        col("x.nbr") === col("y.nbr") && col("x.node") < col("y.node"))
      .groupBy(col("x.node").as("doc_a"), col("y.node").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    wedges.join(e, col("doc_a") === col("a") && col("doc_b") === col("b"),
        "left_anti")
      .orderBy(col("n_common").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(k)
  }

  /** (doc_a, doc_b, n_common, aa): ADAMIC-ADAR link prediction over
    * the candidate graph — the common-neighbor count reweighted by
    * 1/ln(deg(w)) per shared neighbor w, so promiscuous hub neighbors
    * (giant LSH buckets) stop dominating the review queue; the
    * standard upgrade over raw common-neighbor ranking (Adamic & Adar
    * 2003). Same wedge-bounded join shape as [[commonNeighbors]] plus
    * one degree join; a shared neighbor always has degree ≥ 2, so
    * ln(deg) > 0 by construction. Ranked under the ROUNDED score with
    * id tiebreaks (deterministic, engine-portable). */
  def adamicAdarFromCandidates(cands: DataFrame, k: Int = 10): DataFrame = {
    val e = cands.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().cutLineage()
    val nb = e.select(col("a").as("node"), col("b").as("nbr"))
      .union(e.select(col("b").as("node"), col("a").as("nbr")))
    val deg = nb.groupBy("node").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("node", "w")
    val wedges = nb.as("x").join(nb.as("y"),
        col("x.nbr") === col("y.nbr") && col("x.node") < col("y.node"))
      .select(col("x.node").as("doc_a"), col("y.node").as("doc_b"),
        col("x.nbr").as("w"))
      .join(deg, "w")
    wedges.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"),
        round(sum(lit(1.0) / log(col("deg").cast("double"))), 6).as("aa"))
      .join(e, col("doc_a") === col("a") && col("doc_b") === col("b"), "left_anti")
      .orderBy(col("aa").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(k)
  }

  /** (degree, n_docs): DEGREE DISTRIBUTION of the verified near-dup
    * graph, isolated corpus docs included as degree 0 — the one-look
    * graph-health profile (a heavy tail here means boilerplate hubs;
    * dedup clusters should be small cliques). Two aggregations and an
    * anti-join; nothing corpus-sized concentrates. */
  def degreeDistribution(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    val conn = deg.groupBy("degree").agg(count(lit(1)).as("n_docs"))
    val iso = docs.select(col("doc_id")).join(deg, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_docs"))
      .select(lit(0L).as("degree"), col("n_docs"))
    conn.unionByName(iso).filter(col("n_docs") > 0)
  }

  /** (node, rank): `iterations` rounds of damped (0.85) PageRank over
    * the UNDIRECTED verified near-dup graph; isolated docs keep the
    * teleport mass only. */
  def pagerank(docs: DataFrame, iterations: Int = 10): DataFrame =
    pagerankFrom(Dedup.verifiedNearDups(docs), docs, iterations)

  /** [[pagerank]] over an externally-supplied verified pair relation —
    * the staged-substrate entry point. `docs` still supplies the node
    * set (isolated docs keep teleport mass). */
  def pagerankFrom(pairs: DataFrame, docs: DataFrame,
                   iterations: Int = 10): DataFrame = {
    // undirected: every pair contributes both directions; materialize
    // once — the SAME edge relation feeds all iterations
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cutLineage()
    val nodes = docs.select(col("doc_id").as("node"))
    val n = nodes.count()
    require(n > 0, "empty graph")
    val r0 = TotalMass / n
    val teleport = (15L * r0) / 100L
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.withColumn("rank", lit(r0))
    for (i <- 1 to iterations) {
      val inSum = edges.join(ranks, edges("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("insum"))
      // `div`, not `/`: Column./ is DOUBLE division; div is the
      // integral floor that mirrors DuckDB's `//`
      ranks = nodes.join(inSum, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(insum, CAST(0 AS BIGINT))) div 100"))
            .as("rank"))
      // periodic lineage cut: uncut, iteration N's plan nests N
      // join+agg rounds — optimizer time grows superlinearly and a
      // task failure would recompute the whole chain. Every 3rd round
      // (and the last) materializes the node-cardinality rank relation
      // and restarts lineage from it.
      if (i % 3 == 0 || i == iterations) ranks = ranks.cutLineage()
    }
    ranks
  }

  /** (cluster_id, n_nodes, diameter): per-component DIAMETER of the
    * near-dup graph — the cluster SHAPE metric the size histogram
    * can't see (a 10-doc clique, diameter 1, is one boilerplate blob;
    * a 10-doc chain, diameter 9, is drift — A≈B≈C where A and C no
    * longer match, the transitive-closure dedup failure mode).
    * Frontier BFS from every node simultaneously, capped at `maxD`
    * hops (distances beyond the cap saturate — real dup clusters are
    * clique-y, so the cap is generous); per-round cost is
    * Σ_components frontier-degree, i.e. within-component pair work,
    * never cross-component. cluster_id = min node of each node's
    * hop-capped REACHABLE set — equal to the component min only while
    * the component's radius fits in `maxD`. A wider component (a
    * drift chain longer than the cap) FRAGMENTS into several rows
    * with overlapping n_nodes, all saturated at diameter = maxD; the
    * saturation is the signal, the ids are not component ids there.
    * (The oracle replays the identical cap, so the contract is the
    * capped one on both sides.) */
  def clusterDiameters(pairs: DataFrame, maxD: Int = 8): DataFrame = {
    require(maxD >= 1, s"maxD must be >= 1, got $maxD")
    val e = pairs.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct()
    val nb = e.select(col("a").as("node"), col("b").as("nbr"))
      .union(e.select(col("b").as("node"), col("a").as("nbr")))
      .cutLineage()
    var dist = nb.select(col("node").as("x"), col("nbr").as("y"))
      .withColumn("d", lit(1L)).cutLineage()
    var frontier = dist
    var h = 2
    var done = false
    while (h <= maxD && !done) {
      val next = frontier
        .join(nb.select(col("node").as("y"), col("nbr").as("y2")), "y")
        .filter(col("y2") =!= col("x"))
        .select(col("x"), col("y2").as("y")).distinct()
        .join(dist, Seq("x", "y"), "left_anti")
        .withColumn("d", lit(h.toLong))
        .cutLineage()
      done = next.isEmpty
      if (!done) dist = dist.union(next).cutLineage()
      frontier = next
      h += 1
    }
    val comp = dist.groupBy("x")
      .agg(least(col("x"), min(col("y"))).as("cluster_id"))
    dist.join(comp, "x")
      .groupBy("cluster_id")
      .agg(countDistinct(col("x")).as("n_nodes"), max(col("d")).as("diameter"))
  }

  /** (doc_a, doc_b): BRIDGE-CLASS edges — edges of the near-dup graph
    * closing no triangle (support 0, the 3-truss reject class in one
    * shot): the links CONNECTING otherwise-unrelated clusters, which
    * in a dedup graph are the suspicious pairs (real dup clusters are
    * clique-y; a support-0 edge is either a chance LSH collision that
    * survived verification or genuine cross-cluster syndication) —
    * the review queue's highest-precision slice. One wedge join
    * anti-joined back to the edge list; wedge-bounded like the
    * triangle ops. */
  def bridgeEdges(pairs: DataFrame): DataFrame = {
    val e = pairs.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().cutLineage()
    val nb = e.select(col("a").as("node"), col("b").as("nbr"))
      .union(e.select(col("b").as("node"), col("a").as("nbr")))
    // an (a, b) edge has support > 0 iff some w is adjacent to both
    val supported = nb.as("x").join(nb.as("y"),
        col("x.nbr") === col("y.nbr") && col("x.node") < col("y.node"))
      .select(col("x.node").as("a"), col("y.node").as("b"))
      .join(e, Seq("a", "b"), "left_semi")
      .distinct()
    e.join(supported, Seq("a", "b"), "left_anti")
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
  }

  /** (doc_id, n_1hop, n_2hop): EGO-NETWORK sizes — each node's direct
    * neighborhood and its 2-hop closure (neighbors-of-neighbors,
    * self and duplicates excluded): the local-reach profile that
    * separates a node inside a tight clique (n_2hop ≈ n_1hop) from a
    * gateway between clusters (n_2hop ≫ n_1hop). One adjacency
    * self-join + two distinct rollups — wedge-bounded. */
  def egoSizes(pairs: DataFrame): DataFrame = {
    val e = pairs.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().cutLineage()
    val nb = e.select(col("a").as("node"), col("b").as("nbr"))
      .union(e.select(col("b").as("node"), col("a").as("nbr")))
    val one = nb.groupBy("node").agg(count(lit(1)).as("n_1hop"))
    // rename to avoid ambiguity: y keyed on its node column
    val yk = nb.select(col("node").as("nbr2Key"), col("nbr").as("hop2"))
    val reach = nb.join(yk, col("nbr") === col("nbr2Key"))
      .filter(col("hop2") =!= col("node"))
      .select(col("node"), col("hop2")).distinct()
      .union(nb.select(col("node"), col("nbr")).distinct())
      .distinct()
      .groupBy("node").agg(count(lit(1)).as("n_2hop"))
    one.join(reach, "node")
      .select(col("node").as("doc_id"), col("n_1hop"), col("n_2hop"))
  }

  /** (community, n_nodes, intra_edges, volume, contrib): MODULARITY
    * decomposition of the [[labelPropagation]] communities — per
    * community, its contribution e_c/m − (vol_c/2m)² to Newman's Q,
    * the "are these communities better than chance" score that grades
    * the partition LP produced (Q = Σ contrib; near 0 means the dup
    * graph has no community structure beyond degree). All counts are
    * exact integers (intra-edge count, degree volume, m); the two
    * divisions happen once per community row. Only graph nodes
    * participate — isolated docs are zero-volume singletons and carry
    * no Q mass. */
  def modularity(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val e = pairs.select(col("doc_a").as("a"), col("doc_b").as("b")).distinct()
      .cutLineage()
    val comm = labelPropagation(pairs, docs)
      .select(col("doc_id").as("node"), col("community"))
    val nbr = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
    val deg = nbr.groupBy("node").agg(count(lit(1)).as("deg"))
    val m = e.agg(count(lit(1)).as("m"))
    val vol = deg.join(comm, "node")
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("volume"))
    val intra = e
      .join(comm.select(col("node").as("a"), col("community").as("ca")), "a")
      .join(comm.select(col("node").as("b"), col("community").as("cb")), "b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    vol.join(intra, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"), col("volume"),
        round(coalesce(col("intra_edges"), lit(0L)).cast("double") / col("m") -
          (col("volume").cast("double") / (col("m") * 2)) *
          (col("volume").cast("double") / (col("m") * 2)), 6).as("contrib"))
  }

  /** (node, rank): PERSONALIZED PageRank — the damped walk restarts
    * only to the %`seedMod` seed set (the audited/trusted subset), so
    * rank measures proximity to the seeds instead of global
    * centrality: the "expand a trusted list through the near-dup
    * graph" primitive (TrustRank's shape). Same integer-exact
    * machinery as [[pagerankFrom]] — micros mass, floor division,
    * engine-replayable — with the teleport term gated per node; seed
    * mass splits over the seed count. Non-seed isolated nodes decay
    * to rank 0, seeds keep their teleport floor. */
  def personalizedPagerankFrom(pairs: DataFrame, docs: DataFrame,
                               iterations: Int = 10, seedMod: Int = 7): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cutLineage()
    val nodes = docs.select(col("doc_id").as("node"))
    val nSeeds = nodes.filter(col("node") % seedMod === 0).count()
    require(nSeeds > 0, s"personalized pagerank: no seeds under mod $seedMod")
    val r0 = TotalMass / nSeeds
    val teleport = (15L * r0) / 100L
    val isSeed = col("node") % seedMod === 0
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.withColumn("rank", when(isSeed, lit(r0)).otherwise(lit(0L)))
    for (i <- 1 to iterations) {
      val inSum = edges.join(ranks, edges("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("insum"))
      ranks = nodes.join(inSum, Seq("node"), "left")
        .select(col("node"),
          (when(isSeed, lit(teleport)).otherwise(lit(0L)) +
            expr("(85 * coalesce(insum, CAST(0 AS BIGINT))) div 100")).as("rank"))
      if (i % 3 == 0 || i == iterations) ranks = ranks.cutLineage()
    }
    ranks
  }

  /** (user_id, community_id): behavioral communities — connected
    * components of the BIPARTITE user↔item graph (item = the props.k
    * the user acted on). The user-user projection of a bipartite
    * graph is quadratic per item (one 10⁶-user item yields 10¹²
    * pairs); propagating labels THROUGH the bipartite edges keeps
    * every round linear in |edges| — the same never-materialize-pairs
    * discipline as exact-collapse-first dedup. Encoded id space:
    * user → 2·user_id, item → 2·k+1 (injective, overflow-safe far
    * past any real id range); community_id = the component's minimum
    * ENCODED node id — kept raw because that is the engine-replayable
    * contract (decode is a caller-side projection). Reuses the
    * pointer-doubling min-label propagation (O(log diameter) rounds,
    * convergence-enforced) from the dedup CC pipeline. */
  def userCommunities(events: DataFrame, maxIter: Int = 12): DataFrame = {
    val edges = events
      .select((col("user_id") * 2L).as("doc_a"),
        (get_json_object(col("props"), "$.k").cast("long") * 2L + 1L).as("doc_b"))
      .filter(col("doc_b").isNotNull)
      .distinct()
    Dedup.propagateMinLabels(edges, maxIter)
      .filter(col("doc_id") % 2 === 0)
      .select(expr("doc_id div 2").as("user_id"),
        col("cluster_id").as("community_id"))
  }

  /** (n_edges, assortativity): DEGREE ASSORTATIVITY of the verified
    * near-dup graph — the Pearson correlation of endpoint degrees over
    * every directed edge (Newman 2002). Positive: hub pages duplicate
    * other hubs (template networks); negative: hubs surrounded by
    * leaves (boilerplate radiating from one source) — which of the two
    * regimes the dedup graph is in decides whether cluster-collapse or
    * hub-excision is the right cleanup. Degrees are BIGINTs, so every
    * sum in the correlation is EXACT integer arithmetic (order
    * independent); the two float divisions happen once, on the final
    * 1-row aggregate, rounded to 6. Degenerate graphs (all degrees
    * equal → zero variance) yield NULL, not NaN. Cost: one degree
    * aggregation + two degree joins + a 1-row reduce — edge-linear. */
  def assortativity(pairs: DataFrame): DataFrame = {
    // normalize + distinct defensively (the sibling entry points
    // trianglesFrom/adamicAdarFromCandidates do the same): a caller
    // handing duplicate or unnormalized (doc_a, doc_b) rows would
    // otherwise inflate every degree and skew r
    val e = pairs.select(least(col("doc_a"), col("doc_b")).as("a"),
      greatest(col("doc_a"), col("doc_b")).as("b")).distinct()
    val dir = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val deg = dir.groupBy("a").agg(count(lit(1)).as("deg"))
    val xy = dir
      .join(deg.select(col("a"), col("deg").as("dx")), "a")
      .join(deg.select(col("a").as("b"), col("deg").as("dy")), "b")
    xy.agg(count(lit(1)).as("n"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(col("n").as("n_edges"),
        when(col("n") > 0 &&
            (col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6))
          .as("assortativity"))
  }

  /** (doc_id, community): LABEL PROPAGATION communities (Raghavan et
    * al. 2007) on the verified near-dup graph, made DETERMINISTIC the
    * standard way: synchronous updates, a FIXED iteration count, and
    * the tie rule "most frequent neighbor label, ties → smallest
    * label" — no RNG, no visit order, so any engine replays it (the
    * oracle unrolls the same `iterations` rounds as chained CTEs).
    * Differs from [[Dedup.propagateMinLabels]] (= connected
    * components) by splitting a component along density: a label only
    * travels while it keeps winning local majorities. Each round is
    * one neighbor-join + two bounded aggregations (count per
    * (node,label) → argmax per node), labels checkpointed per round to
    * keep lineage flat — edge-linear per round at any scale. */
  def labelPropagation(pairs: DataFrame, docs: DataFrame,
                       iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val nbr = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().cutLineage()
    var labels = nbr.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to iterations) {
      labels = nbr
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("votes"))
        // argmax with (votes desc, label asc) tiebreak via max_by on
        // an encoded (votes, -label) struct — window-free
        .groupBy(col("a").as("node"))
        .agg(max(struct(col("votes"), (-col("label")).as("nl"))).as("best"))
        .select(col("node"), (-col("best.nl")).as("label"))
        .cutLineage()
    }
    docs.select(col("doc_id"))
      .join(labels.select(col("node").as("doc_id"), col("label")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("community"))
  }

  /** (doc_id, degree, n_triangles, cc): LOCAL CLUSTERING COEFFICIENT
    * per node of the pair graph — 2·T / (deg·(deg−1)), the "how
    * clique-like is this node's dup neighborhood" number that turns
    * [[trianglesFrom]]'s raw counts into a degree-normalized signal
    * (a hub with 3 triangles across 40 neighbors is chain-y; a
    * 4-clique member with 3 triangles across 3 neighbors is a mirror
    * farm). Degree-1 nodes report cc = 0. Triangle side is the
    * [[trianglesFrom]] wedge join (edge/wedge-scaled); degrees are one
    * edge-scaled aggregation; the divide is exact integer → one
    * rounded double. */
  def clusteringCoef(pairs: DataFrame): DataFrame = {
    val e = pairs
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().cutLineage()
    val deg = e.select(col("a"), col("b"))
      .union(e.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a").as("doc_id")).agg(count(lit(1)).as("degree"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"), "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
    deg.join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)), 6)).otherwise(0.0).as("cc"))
  }

  /** (doc_a, doc_b, support): the `k`-TRUSS of the pair graph — the
    * maximal subgraph where every EDGE sits in ≥ k−2 triangles — by
    * fixed-budget support peeling (compute per-edge triangle support
    * over the surviving edge set, drop under-supported edges, repeat).
    * The edge-level sibling of [[kcore]]: a node can clear the k-core
    * on degree alone while its edges are chain-y; truss membership
    * certifies the edge itself is embedded in overlapping triangles —
    * the strongest cheap "this really is one mirrored cluster" signal
    * before collapsing a component. Each round is the [[trianglesFrom]]
    * wedge join (wedge-scaled) + one edge-count aggregation; early
    * exit on an edge-count fixed point is exact (peeling only removes
    * edges; a fixed point peels to itself), `rounds` stays the
    * determinism bound; lineage cut per round. Output is the surviving
    * edges with their final-round support. */
  def ktruss(pairs: DataFrame, k: Int = 3, rounds: Int = 4): DataFrame = {
    require(k >= 3 && rounds >= 1, s"need k >= 3, rounds >= 1; got k=$k, rounds=$rounds")
    def supports(e: DataFrame): DataFrame = {
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.b") === col("e2.a"))
        .join(e.as("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"), "left_semi")
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      tri.select(explode(array(
          struct(col("x").as("a"), col("y").as("b")),
          struct(col("y").as("a"), col("z").as("b")),
          struct(col("x").as("a"), col("z").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
    }
    var e = pairs.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().cutLineage()
    var prev = e.count()
    var round = 0
    var converged = false
    while (round < rounds && !converged) {
      e = e.join(supports(e).filter(col("support") >= k - 2),
          Seq("a", "b"), "left_semi")
        .select("a", "b")
        .cutLineage()
      val n = e.count()
      converged = n == prev
      prev = n
      round += 1
    }
    supports(e).join(e, Seq("a", "b"), "left_semi")
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("support"))
  }

  /** (doc_a, doc_b, n_common, jaccard): JACCARD-coefficient link
    * prediction over the candidate graph — |N(a)∩N(b)| / |N(a)∪N(b)|
    * for non-adjacent pairs, the set-overlap normalization of the raw
    * common-neighbor count (penalizes pairs whose shared neighbors
    * are a small fraction of either neighborhood). Union size comes
    * free from the degree join: |N(a)∪N(b)| = deg(a)+deg(b)−common,
    * so the plan is the same wedge-bounded join as
    * [[commonNeighborsFrom]] plus two broadcast-sized degree joins —
    * no neighborhood materialization beyond the wedge rows. Ranked
    * under the ROUNDED score with id tiebreaks (deterministic,
    * engine-portable). Re-expresses the similarity-join family the
    * reference drives through TfIdfUtil (TfIdfUtil.java:104-124) at
    * graph granularity. */
  def jaccardLinkPred(cands: DataFrame, k: Int = 10): DataFrame = {
    val e = cands.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().cutLineage()
    val nb = e.select(col("a").as("node"), col("b").as("nbr"))
      .union(e.select(col("b").as("node"), col("a").as("nbr")))
    val deg = nb.groupBy("node").agg(count(lit(1)).as("deg"))
    val wedges = nb.as("x").join(nb.as("y"),
        col("x.nbr") === col("y.nbr") && col("x.node") < col("y.node"))
      .groupBy(col("x.node").as("doc_a"), col("y.node").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    wedges
      .join(deg.select(col("node").as("doc_a"), col("deg").as("da")), "doc_a")
      .join(deg.select(col("node").as("doc_b"), col("deg").as("db")), "doc_b")
      .join(e, col("doc_a") === col("a") && col("doc_b") === col("b"), "left_anti")
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("da") + col("db") - col("n_common")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(k)
  }

  /** (doc_id, hops): MULTI-SOURCE BFS hop distance over the near-dup
    * graph — every reached node labeled with its distance to the
    * NEAREST seed (seeds = nodes with doc_id % seedMod == 0, the
    * deterministic stand-in for an audited/flagged subset), bounded
    * at `maxHops`. The "blast radius" primitive of a review pipeline:
    * how far does a flagged document's near-dup neighborhood extend?
    * Classic frontier-expansion BFS — each round joins ONLY the new
    * frontier against the adjacency relation (never the full distance
    * table), anti-joins the already-settled set, and localCheckpoints
    * to cut lineage; rounds are bounded by maxHops and exit early on
    * an empty frontier (exact, not heuristic: BFS frontiers are
    * monotone). Cost per round is frontier-degree-sum, so the total
    * is O(edges within maxHops) regardless of graph size. */
  def bfsHops(pairs: DataFrame, maxHops: Int = 6, seedMod: Int = 7): DataFrame = {
    require(maxHops >= 0 && seedMod >= 1,
      s"need maxHops >= 0, seedMod >= 1; got maxHops=$maxHops, seedMod=$seedMod")
    val e = pairs.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct()
    val nb = e.select(col("a").as("node"), col("b").as("nbr"))
      .union(e.select(col("b").as("node"), col("a").as("nbr")))
      .cutLineage()
    var dist = nb.select("node").distinct()
      .filter(col("node") % seedMod === 0)
      .withColumn("hops", lit(0L))
      .cutLineage()
    var frontier = dist
    var h = 1
    var done = frontier.isEmpty
    while (h <= maxHops && !done) {
      val next = frontier.join(nb, "node")
        .select(col("nbr").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("hops", lit(h.toLong))
        .cutLineage()
      done = next.isEmpty
      if (!done) dist = dist.union(next).cutLineage()
      frontier = next
      h += 1
    }
    dist.select(col("node").as("doc_id"), col("hops"))
  }

  /** (seed, n_reached, harmonic): HARMONIC CENTRALITY of the `seeds`
    * lowest-id nodes of the pair graph — Σ_{u≠s} 1/d(s,u) over nodes
    * within `maxHops`, the centrality that stays finite on
    * DISCONNECTED graphs (closeness diverges; near-dup graphs are
    * always forests of components), answering "which exemplars sit
    * closest to everything" for hub/outlier triage. EXACT in
    * integers end to end: distances are BFS levels, so the harmonic
    * sum groups by distance and clears denominators through
    * C = lcm(1..maxHops) (60 at the default depth 6) — H·C =
    * Σ_d cnt_d·(C/d), every term a BIGINT because C div d is exact
    * for every reachable hop count — with ONE rounded division at
    * the end; no per-node FP accumulation anywhere. maxHops is
    * capped at 20 (C = lcm(1..20) ≈ 2.3e8; per-seed sums then stay
    * far inside Long for any graph this engine serves — a deeper
    * probe needs a different clearing scheme and fails loudly rather
    * than truncating). All seeds ride ONE multi-source BFS
    * (state keyed (seed, node) — k seeds never cost k traversals),
    * each level one join + anti-join with cut lineage, the
    * [[bfsHops]] ladder. */
  def harmonicCentrality(pairs: DataFrame, seeds: Int = 4,
                         maxHops: Int = 6): DataFrame = {
    require(seeds >= 1 && maxHops >= 1,
      s"need seeds >= 1, maxHops >= 1; got seeds=$seeds, maxHops=$maxHops")
    // the clearing constant DERIVES from maxHops — a depth the
    // constant does not divide exactly would silently truncate the
    // integer-exact contract (60 div 7 = 8, not 8.571); capped so the
    // cleared sums stay far inside Long
    require(maxHops <= 20,
      s"maxHops $maxHops > 20 — lcm(1..maxHops) would overflow the " +
        "BIGINT clearing scheme; the exact core needs a different " +
        "denominator-clearing strategy at that depth")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val clear = (1 to maxHops).foldLeft(1L)((acc, d) => acc / gcd(acc, d) * d)
    val e = pairs.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct()
    val nb = e.select(col("a").as("node"), col("b").as("nbr"))
      .union(e.select(col("b").as("node"), col("a").as("nbr")))
      .cutLineage()
    val seedRows = nb.select("node").distinct()
      .orderBy(col("node").asc).limit(seeds)
    var dist = seedRows
      .select(col("node").as("seed"), col("node"), lit(0L).as("hops"))
      .cutLineage()
    var frontier = dist
    var h = 1
    var done = frontier.isEmpty
    while (h <= maxHops && !done) {
      val next = frontier.join(nb, "node")
        .select(col("seed"), col("nbr").as("node")).distinct()
        .join(dist.select("seed", "node"), Seq("seed", "node"), "left_anti")
        .withColumn("hops", lit(h.toLong))
        .cutLineage()
      done = next.isEmpty
      if (!done) dist = dist.union(next).cutLineage()
      frontier = next
      h += 1
    }
    dist.filter(col("hops") >= 1)
      .groupBy("seed")
      .agg(count(lit(1)).as("n_reached"),
        sum(expr(s"${clear}L div hops")).as("h60"))
      .select(col("seed"), col("n_reached"),
        round(col("h60").cast("double") / clear.toDouble, 6).as("harmonic"))
  }

  /** (doc_id, degree): the `k`-CORE of the pair graph after `rounds`
    * peeling iterations — repeatedly drop nodes of degree < k and the
    * edges touching them; survivors are the densely inter-duplicated
    * neighborhoods (a chain of pairwise near-dups peels away, a
    * boilerplate clique stays — the "how entangled is this cluster"
    * signal CC ids and degrees alone can't give). Each round is one
    * edge-scaled degree aggregation + two semi-joins; `rounds` is a
    * FIXED iteration budget so the operator is deterministic at any
    * scale (the oracle unrolls the same rounds; convergence within
    * the budget on the gate corpus is spec-asserted, the
    * [[labelPropagation]] convention). Lineage is cut per round. */
  def kcore(pairs: DataFrame, k: Int = 2, rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1; got k=$k, rounds=$rounds")
    var e = pairs.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().cutLineage()
    // early exit on a count fixed point is exact, not heuristic: a
    // peel round only ever REMOVES edges, so an unchanged edge count
    // means an unchanged edge set, and peeling a fixed point yields
    // itself — the remaining rounds are identities (the budget stays
    // the determinism bound for adversarial inputs that never settle)
    var prev = e.count()
    var round = 0
    var converged = false
    while (round < rounds && !converged) {
      // select("a","b") pins column ORDER before the positional union:
      // a using-column semi-join moves its key to position 0, so the
      // round-2 union would otherwise zip (b,a) against (a,b)
      val dir = e.select("a", "b")
        .union(e.select(col("b").as("a"), col("a").as("b")))
      val alive = dir.groupBy("a").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("a").as("node"))
      e = e.join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .cutLineage()
      val n = e.count()
      converged = n == prev
      prev = n
      round += 1
    }
    e.select("a", "b").union(e.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a").as("doc_id"))
      .agg(count(lit(1)).as("degree"))
  }

  /** (side, node, score): `iterations` rounds of HITS (Kleinberg 1999)
    * over a DIRECTED bipartite edge relation (hub column `c` → authority
    * column `s`): hub mass flows forward to authorities, authority mass
    * flows back to hubs, each half-step renormalized. On the customer→
    * supplier purchase graph, authorities are the suppliers that the
    * best-connected customers concentrate on and hubs the customers
    * whose baskets span the authoritative suppliers — the mutual-
    * reinforcement signal one-sided degree counts can't see.
    *
    * 5 rounds, not PageRank's 10: one HITS round is a full power-
    * iteration step on M·Mᵀ, advancing by the SQUARE of the spectral
    * ratio — twice the per-round convergence rate of a damped
    * single-matrix walk — so 5 mutual-reinforcement rounds (10
    * renormalized half-steps) reach the same fixpoint tolerance.
    *
    * Same exact-integer discipline as [[pagerankFrom]]: scores live on
    * the [[TotalMass]] grid, every division is an integral floor
    * (Spark `div` == DuckDB `//`), and each half-step renormalizes by
    * the scalar `greatest(1, total div TotalMass)` — keeping
    * magnitudes near TotalMass so a sum over max-degree neighbors
    * stays ≲ deg·10¹² ≪ 2⁶³. The whole 10-round recurrence replays
    * bit-exactly in the oracle's iterative CTEs.
    *
    * Barrier structure — a three-rung ladder keyed on the LARGER side
    * of the bipartite node set, every rung bit-identical (spec-pinned
    * on a planted graph):
    *
    *   - ranks ≤ `driverRankBound` (8M rows ≈ a few hundred MB — the
    *     same order a broadcast already collects to the driver): rank
    *     vectors LIVE on the driver. A half-step is exactly ONE job —
    *     the edge join (rank injected as a broadcast LocalRelation,
    *     which ships without a job) + map-side-combined in-sum,
    *     collected back; the overflow-checked total and the floor
    *     renorm are driver integer arithmetic, identical to the `div`
    *     grid. 10 jobs for the whole recurrence — at the gate SF the
    *     loop is pure job-launch overhead, so job count IS the cost.
    *   - ranks ≤ `broadcastNodeBound` (64M ≈ 1 GiB, comfortably under
    *     executor memory and Spark's 8 GiB broadcast ceiling): ranks
    *     stay distributed; the node-sized in-sum relation feeds two
    *     consumers (the renorm scalar and the renormalized score), so
    *     it is lineage-cut once per half-step and the scalar rides
    *     the SAME job as the cut — a global-window `sum(raw) OVER ()`
    *     (single-partition exchange of ≤ bound rows, exactly the
    *     oracle's formulation). Two jobs per half-step (cut +
    *     broadcast collect).
    *   - above the bound (billion-node): the broadcast hint drops —
    *     edge joins degrade gracefully to shuffle joins on the node
    *     key — and the scalar becomes a broadcast one-row aggregate
    *     crossJoined back in (a single-partition window over an
    *     above-bound relation would itself be the bottleneck). Same
    *     graceful-degradation convention as the segmenter vocab cap
    *     and the KMV pair-matrix bound.
    *
    * Scale shape: edge partitioning is SIZE-AWARE (one partition per
    * `edgesPerPartition` rows — 4M (BIGINT, BIGINT) rows ≈ 64 MB, a
    * healthy scan partition — capped at the session's default
    * parallelism: the 600k-edge gate graph packs into ONE fat
    * partition (the per-half-step job is trivially small, so task
    * count is pure overhead there — measured 3.3 → 2.9 s at sf0.1),
    * while a 100×-scale graph fans out to the cluster instead of
    * bottlenecking on a fixed task count). */
  def hitsFrom(edges: DataFrame, iterations: Int = 5,
               edgesPerPartition: Long = 4000000L,
               driverRankBound: Long = 8000000L,
               broadcastNodeBound: Long = 64000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = edges.sparkSession
    // materialize the deduplicated edge relation once at its natural
    // partitioning, then size the scan width from its measured count
    val e0 = edges.select(col("c"), col("s")).distinct().cutLineage()
    val Row(nEdges: Long, nHubs: Long, nAuths: Long) = e0.agg(
      count(lit(1)), countDistinct("c"), countDistinct("s")).head
    require(nHubs > 0, "empty bipartite graph")
    val parts = math.max(1L, math.min(
      (nEdges + edgesPerPartition - 1) / edgesPerPartition,
      spark.sparkContext.defaultParallelism.toLong)).toInt
    // coalesce is a narrow read over the checkpointed blocks — no
    // second materialization needed
    val e = e0.coalesce(parts)
    val maxRank = math.max(nHubs, nAuths)
    val (hub, auth) =
      if (maxRank <= driverRankBound)
        hitsDriverRanks(e, iterations, nHubs)
      else
        hitsDistributedRanks(e, iterations, nHubs,
          small = maxRank <= broadcastNodeBound)
    auth.select(lit("auth").as("side"), col("s").as("node"), col("auth").as("score"))
      .unionByName(
        hub.select(lit("hub").as("side"), col("c").as("node"), col("hub").as("score")))
  }

  /** [[hitsFrom]] rung 1: rank vectors resident on the driver —
    * bounded by driverRankBound, the same order a broadcast would
    * collect driver-side anyway. One job per half-step. */
  private def hitsDriverRanks(e: DataFrame, iterations: Int,
                              nHubs: Long): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = e.sparkSession
    val hubSchema = StructType(Seq(
      StructField("c", e.schema("c").dataType), StructField("hub", LongType)))
    val authSchema = StructType(Seq(
      StructField("s", e.schema("s").dataType), StructField("auth", LongType)))
    def local(rows: Array[Row], schema: StructType): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    // overflow-CHECKED total (Spark's ANSI sum would throw too), floor
    // division of non-negative longs == the `div`/`//` grid
    def renormed(rows: Array[Row]): Array[Row] = {
      var total = 0L
      rows.foreach(r => total = Math.addExact(total, r.getLong(1)))
      val g = math.max(1L, total / TotalMass)
      rows.map(r => Row(r.get(0), r.getLong(1) / g))
    }
    def halfStep(rank: DataFrame, inKey: String, inScore: String,
                 outKey: String): Array[Row] =
      e.join(broadcast(rank), inKey).groupBy(outKey)
        .agg(sum(inScore).as("raw")).collect()
    val init = e.select("c").distinct().collect()
      .map(r => Row(r.get(0), TotalMass / nHubs))
    var hub = local(init, hubSchema)
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      auth = local(renormed(halfStep(hub, "c", "hub", "s")), authSchema)
      hub = local(renormed(halfStep(auth, "s", "auth", "c")), hubSchema)
    }
    (hub, auth)
  }

  /** [[hitsFrom]] rungs 2-3: ranks stay distributed; `small` keeps
    * the broadcast hint and the same-job window renorm, above the
    * bound both degrade (shuffle joins, crossJoined scalar). */
  private def hitsDistributedRanks(e: DataFrame, iterations: Int,
                                   nHubs: Long,
                                   small: Boolean): (DataFrame, DataFrame) = {
    val hint: DataFrame => DataFrame = if (small) broadcast else identity
    val renorm = expr(
      s"raw div greatest(CAST(1 AS BIGINT), t div ${TotalMass}L)")
    def halfStep(rank: DataFrame, inKey: String, inScore: String,
                 outKey: String, outScore: String): DataFrame = {
      val sums = e.join(hint(rank), inKey).groupBy(outKey)
        .agg(sum(inScore).as("raw"))
      val withTotal =
        if (small)
          sums.withColumn("t", sum("raw").over(
            org.apache.spark.sql.expressions.Window
              .rowsBetween(Long.MinValue, Long.MaxValue)))
            .cutLineage()
        else {
          val cut = sums.cutLineage()
          cut.crossJoin(broadcast(cut.agg(sum("raw").as("t"))))
        }
      withTotal.select(col(outKey), renorm.as(outScore))
    }
    var hub = e.select("c").distinct().withColumn("hub", lit(TotalMass / nHubs))
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      auth = halfStep(hub, "c", "hub", "s", "auth")
      hub = halfStep(auth, "s", "auth", "c", "hub")
    }
    (hub, auth)
  }
}
