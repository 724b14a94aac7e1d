package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  def triangles(docs: DataFrame): DataFrame = {
    val e = Dedup.verifiedNearDups(docs)
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"), "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }

  /** (node, rank): `iterations` rounds of damped (0.85) PageRank over
    * the UNDIRECTED verified near-dup graph; isolated docs keep the
    * teleport mass only. */
  def pagerank(docs: DataFrame, iterations: Int = 10): DataFrame = {
    val pairs = Dedup.verifiedNearDups(docs).select("doc_a", "doc_b")
    // undirected: every pair contributes both directions; materialize
    // once — the SAME edge relation feeds all iterations
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    val nodes = docs.select(col("doc_id").as("node"))
    val n = nodes.count()
    require(n > 0, "empty graph")
    val r0 = TotalMass / n
    val teleport = (15L * r0) / 100L
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.withColumn("rank", lit(r0))
    for (_ <- 1 to iterations) {
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
}
