package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DedupStore}
import graft.sources.Tables

/** Round-10 staged dedup substrate: every decision served from
  * [[DedupStore]] must equal its live [[Dedup]] derivation row-for-row
  * — the store is a performance artifact, never a semantic one. */
class Round10Spec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)

  private lazy val store: String = {
    val p = java.nio.file.Files.createTempDirectory("dedupstore").toString + "/store"
    DedupStore.build(docs, p)
    p
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      case x => x
    }.toList).toList.sortBy(_.mkString("|"))

  private def assertSame(staged: DataFrame, live: DataFrame, what: String): Unit = {
    assert(staged.columns.toSeq == live.columns.toSeq, s"$what: column mismatch")
    val (s, l) = (rows(staged), rows(live))
    assert(s.nonEmpty, s"$what: staged result is empty — nothing was compared")
    assert(s == l, s"$what: staged != live (${s.size} vs ${l.size} rows)")
  }

  test("staged verifiedNearDups == live") {
    assertSame(DedupStore.verifiedNearDups(spark, store),
      Dedup.verifiedNearDups(docs), "verifiedNearDups")
  }

  test("staged nearDupClusters == live") {
    assertSame(DedupStore.nearDupClusters(spark, store),
      Dedup.nearDupClusters(docs), "nearDupClusters")
  }

  test("staged keepBest == live") {
    assertSame(DedupStore.keepBest(docs, store), Dedup.keepBest(docs), "keepBest")
  }

  test("staged dropDuplicates == live") {
    assertSame(
      DedupStore.dropDuplicates(docs, store).select("doc_id", "n_chars"),
      Dedup.dropDuplicates(docs).select("doc_id", "n_chars"), "dropDuplicates")
  }

  test("staged containmentPairs == live") {
    assertSame(DedupStore.containmentPairs(spark, store),
      Dedup.containmentPairs(docs), "containmentPairs")
  }

  test("staged dropContained == live") {
    assertSame(DedupStore.dropContained(spark, store),
      Dedup.dropContained(docs).select("doc_id"), "dropContained")
  }

  test("staged graph serves == live (pagerank, triangles, common neighbors)") {
    import graft.operators.Graph
    assertSame(
      Graph.pagerankFrom(DedupStore.verifiedNearDups(spark, store), docs),
      Graph.pagerank(docs), "pagerank")
    assertSame(
      Graph.trianglesFrom(DedupStore.verifiedNearDups(spark, store)),
      Graph.triangles(docs), "triangles")
    // common neighbors can legitimately be empty at some scale factors
    // (candidate cliques close); compare without the nonEmpty gate
    val s = rows(Graph.commonNeighborsFromCandidates(DedupStore.candidates(spark, store)))
    val l = rows(Graph.commonNeighbors(docs))
    assert(s == l, s"commonNeighbors staged != live (${s.size} vs ${l.size})")
  }

  test("incremental build+update == full rebuild across every serve") {
    val cut = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
      .collect()(0).getLong(0) * 4 / 5
    val inc = java.nio.file.Files.createTempDirectory("dedupinc").toString + "/store"
    DedupStore.build(docs.filter(org.apache.spark.sql.functions.col("doc_id") <= cut), inc)
    DedupStore.update(docs.filter(org.apache.spark.sql.functions.col("doc_id") > cut), inc)
    // `store` (the full one-shot build) is the rebuild baseline
    assertSame(DedupStore.verifiedNearDups(spark, inc),
      DedupStore.verifiedNearDups(spark, store), "incremental verifiedNearDups")
    assertSame(DedupStore.nearDupClusters(spark, inc),
      DedupStore.nearDupClusters(spark, store), "incremental nearDupClusters")
    assertSame(DedupStore.containmentPairs(spark, inc),
      DedupStore.containmentPairs(spark, store), "incremental containmentPairs")
    val si = rows(DedupStore.candidates(spark, inc))
    val sf0 = rows(DedupStore.candidates(spark, store))
    assert(si == sf0, s"incremental candidates != rebuild (${si.size} vs ${sf0.size})")
  }

  test("incremental update rejects non-monotone and duplicate ids") {
    val inc = java.nio.file.Files.createTempDirectory("dedupmono").toString + "/store"
    val hi = docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 100)
    val lo = docs.filter(org.apache.spark.sql.functions.col("doc_id") < 100)
    DedupStore.build(hi, inc)
    intercept[IllegalArgumentException] { DedupStore.update(lo, inc) } // below max
    intercept[IllegalArgumentException] { DedupStore.update(hi.limit(1), inc) } // replayed id
    ()
  }

  test("staged semantic serves == live (clusters, drop)") {
    import graft.operators.{Clustering, SemanticStore}
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val p = java.nio.file.Files.createTempDirectory("semstore").toString + "/store"
    SemanticStore.build(emb, p)
    assertSame(SemanticStore.semanticClusters(spark, p),
      Clustering.semanticClusters(emb), "semanticClusters")
    assertSame(SemanticStore.semanticDrop(emb, p),
      Clustering.semanticDrop(emb), "semanticDrop")
  }

  test("pagerank lineage is cut: iteration N's plan does not nest N join rounds") {
    val pr = graft.operators.Graph.pagerank(docs, iterations = 10)
    val plan = pr.queryExecution.optimizedPlan
    val nJoins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    // 10 uncut iterations would nest ~30 joins; the periodic
    // localCheckpoint (every 3rd round + the last) bounds the returned
    // plan to the materialized relation — no join chain survives
    assert(nJoins <= 2, s"pagerank plan still nests $nJoins joins — lineage not cut")
    // and the values are unchanged by the cut (sum of mass conserved
    // modulo integer-floor leakage: bounded by n per round)
    assert(pr.count() == docs.count())
  }

  test("staged serve rejects a threshold below the banding midpoint") {
    intercept[IllegalArgumentException] {
      DedupStore.verifiedNearDups(spark, store, threshold = 0.3)
    }
    ()
  }
}
