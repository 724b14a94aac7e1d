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

  // ---- incremental PQ index (frozen-codebook ingest) ----

  test("PQ update encodes new vectors under frozen codebooks and serves them") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("r12pq").toString + "/idx"
    val maxId = emb.agg(org.apache.spark.sql.functions.max("vec_id"))
      .collect()(0).getLong(0)
    // build WITHOUT the query's exact twin, then ingest a byte-copy of
    // vector 0 under a fresh id: the served top-1 must become the new
    // vector at cos 1.0 — new rows are first-class, codebooks untouched
    val q0 = emb.filter($"vec_id" === 0L).select("embedding")
      .collect()(0).getSeq[Float](0)
    graft.operators.PqIndex.build(emb, path)
    val cbBefore = spark.read.parquet(
      graft.sources.DeltaStore.committedDeltas(spark, path).head + "/codebooks")
      .collect().map(_.toSeq).toSet
    val twin = Seq((maxId + 1, q0)).toDF("vec_id", "embedding")
    graft.operators.PqIndex.update(twin, path, "t1")
    val top = graft.operators.PqIndex.searchTopK(spark, path).collect()
    assert(top.head.getLong(0) === maxId + 1)
    assert(top.head.getDouble(2) === 1.0)
    val cbAfter = spark.read.parquet(
      graft.sources.DeltaStore.committedDeltas(spark, path).head + "/codebooks")
      .collect().map(_.toSeq).toSet
    assert(cbAfter === cbBefore) // frozen: ingest never retrains
    // replayed tag is a no-op; duplicate ids are rejected loudly
    graft.operators.PqIndex.update(twin, path, "t1")
    assert(graft.operators.PqIndex.searchTopK(spark, path).count() === 10L)
    intercept[IllegalArgumentException] {
      graft.operators.PqIndex.update(twin, path, "t2")
    }
  }

  test("incremental PQ serve is batch-split invariant (frozen codebooks)") {
    import spark.implicits._
    // codebooks freeze at build, so HOW the tail arrives (one batch vs
    // two) cannot change a single code — serving must be identical.
    // The frozen-re-encode exactness itself is oracle-pinned: the
    // q_pq_store_incremental DuckDB replay trains on the build cut and
    // encodes the full corpus relationally.
    val emb = Tables.embeddings(spark, sf).localCheckpoint()
    val maxId = emb.agg(org.apache.spark.sql.functions.max("vec_id"))
      .collect()(0).getLong(0)
    val cut = maxId * 4 / 5
    val mid = (cut + maxId) / 2
    val one = java.nio.file.Files.createTempDirectory("r12pq1").toString + "/idx"
    graft.operators.PqIndex.build(emb.filter($"vec_id" <= cut), one)
    graft.operators.PqIndex.update(emb.filter($"vec_id" > cut), one, "all")
    val two = java.nio.file.Files.createTempDirectory("r12pq2").toString + "/idx"
    graft.operators.PqIndex.build(emb.filter($"vec_id" <= cut), two)
    graft.operators.PqIndex.update(
      emb.filter($"vec_id" > cut && $"vec_id" <= mid), two, "b1")
    graft.operators.PqIndex.update(emb.filter($"vec_id" > mid), two, "b2")
    val oneRows = graft.operators.PqIndex.searchTopK(spark, one)
      .collect().map(_.toSeq)
    val twoRows = graft.operators.PqIndex.searchTopK(spark, two)
      .collect().map(_.toSeq)
    assert(oneRows.sameElements(twoRows))
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
