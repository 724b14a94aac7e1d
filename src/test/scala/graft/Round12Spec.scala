package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupStore, Graph}
import graft.sources.Tables

/** Round-12 batch 1: rep-level copy-symmetry serving for the two graph
  * ops the round-11 verdict flagged as doc-level scale-killers —
  * cluster diameter (all-sources BFS was O(Σ|C|²) on copy-expanded
  * components) and bridge edges (wedge join was O(m³) per m-copy
  * clique). Planted copy-clique corpora prove the closed-form
  * multiplicity arithmetic; gate-corpus equality pins staged == live. */
class Round12Spec extends AnyFunSuite {
  import SparkTestSession._

  /** A corpus that exercises every copy-symmetry class: a 3-copy
    * clique with a near-dup satellite, an isolated 2-copy group, and
    * an m=1 three-rep chain (sliding 20-token windows with 16/20
    * shingle Jaccard between adjacent reps, 14/22 across the gap). */
  private def plantedDocs = {
    import spark.implicits._
    val base = (1 to 24).map(i => s"tok$i")
    def win(from: Int) = base.slice(from - 1, from - 1 + 20).mkString(" ")
    val blob = (1 to 10).map(i => s"blob$i").mkString(" ")
    val blobPlus = blob + " blob11"
    val island = "isle one two three four"
    Seq(
      (1L, blob), (2L, blob), (3L, blob), // 3-copy clique
      (4L, blobPlus),                     // near-dup satellite (J = 8/9)
      (10L, island), (11L, island),       // isolated 2-copy group
      (20L, win(1)), (21L, win(3)), (22L, win(5))) // m=1 chain
      .toDF("doc_id", "text")
  }

  private def buildStore(tag: String) = {
    val path = java.nio.file.Files.createTempDirectory(tag).toString + "/s"
    DedupStore.build(plantedDocs, path)
    path
  }

  // ---- rep-level cluster diameter ----

  test("staged clusterDiameters equals the doc-level BFS on the planted copy cliques") {
    val path = buildStore("r12diam")
    val live = Graph.clusterDiameters(DedupStore.verifiedNearDups(spark, path))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val staged = DedupStore.clusterDiameters(spark, path)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(staged === live)
    // the closed-form pieces that hold regardless of LSH banding luck:
    // exact copies always collapse, so the isolated 2-copy island is a
    // diameter-1 component of its own, never fragmented
    assert(staged(10L) === ((2L, 1L)))
    // the 3-copy blob clique (+ satellite if banding caught it) is one
    // diameter-1 component rooted at doc 1: copies sit at distance 1
    // and the satellite (if present) is adjacent to every copy
    assert(staged(1L)._2 === 1L)
    assert(staged(1L)._1 >= 3L)
  }

  test("staged clusterDiameters equals the doc-level BFS on the gate corpus") {
    val path = java.nio.file.Files.createTempDirectory("r12diamg").toString + "/s"
    DedupStore.build(Tables.documents(spark, sf), path)
    val live = Graph.clusterDiameters(DedupStore.verifiedNearDups(spark, path))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val staged = DedupStore.clusterDiameters(spark, path)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(staged === live)
  }

  // ---- rep-level bridge edges ----

  test("staged bridgeEdges equals the doc-level wedge join on the planted copy cliques") {
    val path = buildStore("r12brdg")
    val live = Graph.bridgeEdges(DedupStore.verifiedNearDups(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val staged = DedupStore.bridgeEdges(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(staged === live)
    // closed-form: the isolated 2-copy island is the support-0 edge
    // multiplicity can never rescue
    assert(staged.contains((10L, 11L)))
    // closed-form: intra-clique edges of the m=3 blob group are NEVER
    // bridges (the third copy closes the triangle)
    assert(!staged.exists(p => Set(1L, 2L, 3L).contains(p._1) &&
      Set(1L, 2L, 3L).contains(p._2)))
  }

  test("staged bridgeEdges equals the doc-level wedge join on the gate corpus") {
    val path = java.nio.file.Files.createTempDirectory("r12brdgg").toString + "/s"
    DedupStore.build(Tables.documents(spark, sf), path)
    val live = Graph.bridgeEdges(DedupStore.verifiedNearDups(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val staged = DedupStore.bridgeEdges(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(staged === live)
  }
}
