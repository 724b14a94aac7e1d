package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupStore, Graph}
import graft.sources.Tables

/** Round-13 batch 1: rep-level copy-symmetry serving for the LAST
  * doc-level iterative graph family — PageRank, personalized PageRank,
  * label propagation and the modularity decomposition. The doc-level
  * loops walk the copy-EXPANDED edge relation (quadratic in copy
  * multiplicity by construction: a 20-copy group contributes 190
  * intra edges and 20× every cross edge); copy symmetry says all
  * copies of a text have identical neighborhoods, hence identical
  * rank/label, so the walks run on the rep classes (PPR and LP refine
  * one notch: seed-gated teleport and id-initialized labels split each
  * class into two subclasses that stay internally uniform). Planted
  * corpora exercise every subclass shape; gate-corpus equality pins
  * staged == live end-to-end. */
class Round13Spec extends AnyFunSuite {
  import SparkTestSession._

  /** Copy-symmetry worst-case shapes with seeds (%7 == 0) landing both
    * ON and OFF group reps: a 3-copy clique whose third copy (id 7) is
    * a seed, a near-dup satellite, an isolated 2-copy island with a
    * seed copy (14), an m=1 three-rep chain with a seed middle (21),
    * and two fully isolated docs (25 non-seed, 28 seed). */
  private def plantedDocs = {
    import spark.implicits._
    val base = (1 to 24).map(i => s"tok$i")
    def win(from: Int) = base.slice(from - 1, from - 1 + 20).mkString(" ")
    val blob = (1 to 10).map(i => s"blob$i").mkString(" ")
    val blobPlus = blob + " blob11"
    val island = "isle one two three four"
    Seq(
      (1L, blob), (2L, blob), (7L, blob),   // 3-copy clique, one seed
      (4L, blobPlus),                       // near-dup satellite
      (10L, island), (14L, island),         // isolated island, one seed
      (20L, win(1)), (21L, win(3)), (22L, win(5)), // m=1 chain, seed mid
      (25L, "alone stray words here"),      // isolated non-seed
      (28L, "another lonely doc entirely")) // isolated seed
      .toDF("doc_id", "text")
  }

  private lazy val plantedPath = {
    val path = java.nio.file.Files.createTempDirectory("r13p").toString + "/s"
    DedupStore.build(plantedDocs, path)
    path
  }

  private lazy val gatePath = {
    val path = java.nio.file.Files.createTempDirectory("r13g").toString + "/s"
    DedupStore.build(Tables.documents(spark, sf), path)
    path
  }

  private def rankMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // ---- rep-level PageRank ----

  test("staged pagerank equals the doc-level integer walk on the planted copy cliques") {
    val docs = plantedDocs
    val live = rankMap(Graph.pagerankFrom(
      DedupStore.verifiedNearDups(spark, plantedPath), docs))
    val staged = rankMap(DedupStore.pagerankRanks(spark, plantedPath))
    assert(staged === live)
    // copy symmetry visible in the output: all copies of the blob
    // share one rank, strictly above the teleport-only isolated docs
    assert(staged(1L) === staged(2L) && staged(2L) === staged(7L))
    assert(staged(25L) === staged(28L))
    assert(staged(1L) > staged(25L))
  }

  test("staged pagerank equals the doc-level integer walk on the gate corpus") {
    val live = rankMap(Graph.pagerankFrom(
      DedupStore.verifiedNearDups(spark, gatePath), Tables.documents(spark, sf)))
    val staged = rankMap(DedupStore.pagerankRanks(spark, gatePath))
    assert(staged === live)
  }

  // ---- rep-level personalized PageRank ----

  test("staged ppr equals the doc-level seed-gated walk on the planted copy cliques") {
    val docs = plantedDocs
    val live = rankMap(Graph.personalizedPagerankFrom(
      DedupStore.verifiedNearDups(spark, plantedPath), docs))
    val staged = rankMap(DedupStore.pprRanks(spark, plantedPath))
    assert(staged === live)
    // the subclass split is real: the seed copy (7) outranks its
    // non-seed co-copies (teleport floor), which still hold walk mass
    assert(staged(7L) > staged(1L))
    assert(staged(1L) === staged(2L))
    assert(staged(1L) > 0L)
    // isolated non-seeds decay to zero; isolated seeds keep teleport
    assert(staged(25L) === 0L)
    assert(staged(28L) > 0L)
  }

  test("staged ppr equals the doc-level seed-gated walk on the gate corpus") {
    val live = rankMap(Graph.personalizedPagerankFrom(
      DedupStore.verifiedNearDups(spark, gatePath), Tables.documents(spark, sf)))
    val staged = rankMap(DedupStore.pprRanks(spark, gatePath))
    assert(staged === live)
  }

  // ---- rep-level label propagation ----

  test("staged label propagation equals the doc-level vote loop on the planted copy cliques") {
    val docs = plantedDocs
    val live = rankMap(Graph.labelPropagation(
      DedupStore.verifiedNearDups(spark, plantedPath), docs))
    val staged = rankMap(DedupStore.lpCommunities(spark, plantedPath))
    assert(staged === live)
    // subclass uniformity: the two NON-REP blob copies share a label
    // (the rep may differ — its self-excluded neighborhood differs);
    // the 2-copy island OSCILLATES under synchronous LP (classic
    // bipartite flip: 10↔14 swap labels every round) — reproducing
    // that faithfully is part of the staged==live contract above
    assert(staged(2L) === staged(7L))
    assert(Set(staged(10L), staged(14L)) === Set(10L, 14L))
    // isolated docs keep their own ids
    assert(staged(25L) === 25L && staged(28L) === 28L)
  }

  test("staged label propagation equals the doc-level vote loop on the gate corpus") {
    val live = rankMap(Graph.labelPropagation(
      DedupStore.verifiedNearDups(spark, gatePath), Tables.documents(spark, sf)))
    val staged = rankMap(DedupStore.lpCommunities(spark, gatePath))
    assert(staged === live)
  }

  // ---- rep-level modularity decomposition ----

  private def modMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("staged modularity equals the doc-level decomposition on the planted copy cliques") {
    val docs = plantedDocs
    val live = modMap(Graph.modularity(
      DedupStore.verifiedNearDups(spark, plantedPath), docs))
    val staged = modMap(DedupStore.modularityDecomp(spark, plantedPath))
    assert(staged === live)
    // every graph node lands in exactly one community on both sides
    assert(staged.values.map(_._1).sum === live.values.map(_._1).sum)
    assert(staged.nonEmpty)
  }

  test("staged modularity equals the doc-level decomposition on the gate corpus") {
    val live = modMap(Graph.modularity(
      DedupStore.verifiedNearDups(spark, gatePath), Tables.documents(spark, sf)))
    val staged = modMap(DedupStore.modularityDecomp(spark, gatePath))
    assert(staged === live)
  }

  // ---- two-stage rerank family ----

  private def demoQueries = {
    import spark.implicits._
    graft.operators.Bm25.DemoQueries.toDF("query_id", "qtext")
  }

  test("rerank emits a per-query permutation of the first-stage top-k") {
    val docs = Tables.documents(spark, sf)
    val rows = graft.operators.SearchExtras.rerank(docs, demoQueries).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (_, qr) =>
      val base = qr.map(_.getLong(2)).sorted.toSeq
      val rr = qr.map(_.getLong(4)).sorted.toSeq
      assert(base === (1L to qr.length).toSeq) // first stage is 1..k
      assert(rr === (1L to qr.length).toSeq)   // rerank permutes, never drops
    }
  }

  test("rerank delta is consistent with the rerank permutation") {
    val docs = Tables.documents(spark, sf)
    val rr = graft.operators.SearchExtras.rerank(docs, demoQueries).collect()
      .groupBy(_.getInt(0))
    val delta = graft.operators.SearchExtras.rerankDelta(docs, demoQueries)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    rr.foreach { case (qid, qr) =>
      val (footrule, nMoved, newTop1) = delta(qid)
      assert(footrule === qr.map(r => math.abs(r.getLong(2) - r.getLong(4))).sum)
      assert(nMoved === qr.count(r => r.getLong(2) != r.getLong(4)).toLong)
      assert(newTop1 === qr.find(_.getLong(4) == 1L).get.getLong(2))
    }
  }

  test("search cost profiles every query and zeros corpus misses") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val qs = demoQueries.union(
      Seq((999, "zzzqqqxxx neverinthecorpus")).toDF("query_id", "qtext"))
    val cost = graft.operators.SearchExtras.searchCost(docs, qs)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // the planted miss query reports its kept terms but zero work
    assert(cost(999) === ((2L, 0L, 0L, 0L)))
    // every demo query hits: postings >= candidates >= 1, terms_hit <= n_qterms
    graft.operators.Bm25.DemoQueries.foreach { case (qid, _) =>
      val (nq, hit, post, cand) = cost(qid)
      assert(hit >= 1L && hit <= nq)
      assert(post >= cand && cand >= 1L)
    }
  }

  // ---- KMV union algebra ----

  test("kmv union is exact under k and consistent with the sketch bound") {
    import spark.implicits._
    // two sources with 30/40 distinct-shingle docs overlapping in 20
    // shingles: well under k=64, so the union estimate is EXACT
    def doc(words: Seq[String]) = words.mkString(" ")
    val a = (1 to 32).map(i => s"w$i")
    val b = (13 to 42).map(i => s"w$i")
    val docs = Seq((1L, doc(a), "srcA"), (2L, doc(b), "srcB"))
      .toDF("doc_id", "text", "source")
    val row = graft.operators.Sketches.kmvUnion(docs).collect()
    assert(row.length === 1)
    val r = row.head
    assert(r.getString(0) === "srcA" && r.getString(1) === "srcB")
    // |A| = 30 shingles, |B| = 28, overlap = 32-13+1-2 = 18 windows
    val nA = 30L; val nB = 28L; val nBoth = 18L
    assert(r.getLong(2) === nA + nB - nBoth)
    assert(r.getDouble(3) === (nA + nB - nBoth).toDouble)
  }

  test("kmv union tracks the exact union within KMV error on the gate corpus") {
    val docs = Tables.documents(spark, sf)
    val est = graft.operators.Sketches.kmvUnion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val sh = graft.operators.Dedup.shingles(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("shingle")).as("h"))
      .distinct().collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    est.foreach { case ((a, b), e) =>
      val exact = (sh(a) ++ sh(b)).size.toDouble
      // standard KMV relative error ~ 1/sqrt(k-2) ≈ 0.127; allow 4x
      assert(math.abs(e - exact) / exact < 0.5,
        s"($a,$b): est $e vs exact $exact")
    }
  }

  // ---- domain-level dedup ownership ----

  test("source ownership books owned/absorbed/ceded per the min-id convention") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared text one", "srcA"),  // group rep -> srcA owns
      (2L, "shared text one", "srcB"),  // ceded by srcB, absorbed by srcA
      (3L, "shared text one", "srcA"),  // absorbed by srcA (own copy)
      (4L, "other text here", "srcB"),  // group rep -> srcB owns
      (5L, "other text here", "srcB"),  // absorbed, same source: not ceded
      (6L, "unique snowflake", "srcC")) // no multi-copy exposure
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Dedup.sourceOwnership(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("srcA") === ((1L, 2L, 0L)))
    assert(got("srcB") === ((1L, 1L, 1L)))
    assert(got("srcC") === ((0L, 0L, 0L)))
  }

  // ---- staged-index tombstone delete (the maintenance quad) ----

  import graft.operators.Bm25Index

  private def scoreMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("tombstone delete serves exactly the rebuild-without-the-docs scores") {
    val docs = Tables.documents(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("r13del").toString + "/idx"
    Bm25Index.build(docs, path)
    Bm25Index.delete(docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 10 === 3)
      .select("doc_id"), path, "t1")
    val served = scoreMap(Bm25Index.score(spark, path))
    val rebuilt = java.nio.file.Files.createTempDirectory("r13delrb").toString + "/idx"
    Bm25Index.build(docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 10 =!= 3), rebuilt)
    assert(served === scoreMap(Bm25Index.score(spark, rebuilt)))
    // the deleted slice is gone from serving AND the stats shifted:
    // no served doc_id ends in 3
    assert(!served.keySet.exists(_ % 10 == 3))
    // batchSearch serves the same live view
    import spark.implicits._
    val bs = Bm25Index.batchSearch(spark, path,
      graft.operators.Bm25.DemoQueries.toDF("query_id", "qtext")).collect()
    assert(bs.nonEmpty && !bs.exists(_.getLong(1) % 10 == 3))
  }

  test("delete is idempotent per tag, loud on dead ids, and reserved against re-ingest") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta epsilon zeta"),
      (3L, "theta iota kappa lambda")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("r13del2").toString + "/idx"
    Bm25Index.build(docs, path)
    Bm25Index.delete(Seq(2L).toDF("doc_id"), path, "d1")
    Bm25Index.delete(Seq(2L).toDF("doc_id"), path, "d1") // replay: no-op
    assert(graft.sources.DeltaStore.committedDeltas(spark, path).size === 2)
    // double-delete under a NEW tag names a dead id -> loud
    intercept[IllegalArgumentException] {
      Bm25Index.delete(Seq(2L).toDF("doc_id"), path, "d2")
    }
    // absent id -> loud
    intercept[IllegalArgumentException] {
      Bm25Index.delete(Seq(99L).toDF("doc_id"), path, "d3")
    }
    // a tombstoned id stays reserved until compaction purges it
    intercept[IllegalArgumentException] {
      Bm25Index.update(Seq((2L, "new text for two")).toDF("doc_id", "text"), path, "u1")
    }
  }

  test("compaction physically purges tombstoned rows and serving is unchanged") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta epsilon zeta"),
      (3L, "alpha iota kappa lambda")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("r13del3").toString + "/idx"
    Bm25Index.build(docs, path)
    Bm25Index.delete(Seq(2L).toDF("doc_id"), path, "d1")
    val before = scoreMap(Bm25Index.score(spark, path, Seq("alpha", "beta")))
    Bm25Index.compactDeltas(spark, path)
    val deltas = graft.sources.DeltaStore.committedDeltas(spark, path)
    assert(deltas.size === 1)
    val fs = graft.sources.DeltaStore.fsOf(spark, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(deltas.head, "tombstones")))
    assert(spark.read.parquet(s"${deltas.head}/doclen")
      .filter($"doc_id" === 2L).isEmpty)
    assert(scoreMap(Bm25Index.score(spark, path, Seq("alpha", "beta"))) === before)
    // the purged id is free again: re-ingest now succeeds and serves
    Bm25Index.update(Seq((2L, "alpha fresh replacement")).toDF("doc_id", "text"),
      path, "u1")
    assert(scoreMap(Bm25Index.score(spark, path, Seq("alpha"))).contains(2L))
    // replayed delete tag stays a no-op through the cumulative history
    Bm25Index.delete(Seq(1L).toDF("doc_id"), path, "d1")
    assert(scoreMap(Bm25Index.score(spark, path, Seq("alpha"))).contains(1L))
  }

  test("ANN tombstone delete equals the rebuild and purges on compaction") {
    import spark.implicits._
    import graft.operators.AnnIndex
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("r13anndel").toString + "/idx"
    AnnIndex.build(emb, path)
    AnnIndex.delete(emb.filter($"vec_id" % 9 === 4).select("vec_id"), path, "t1")
    def topk(p: String) = AnnIndex.searchTopK(spark, p, queryId = 2L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = topk(path)
    assert(served.nonEmpty && !served.exists(_._1 % 9 == 4))
    val rebuilt = java.nio.file.Files.createTempDirectory("r13anndelrb").toString + "/idx"
    AnnIndex.build(emb.filter($"vec_id" % 9 =!= 4), rebuilt)
    assert(served === topk(rebuilt))
    // deleted ids are reserved; absent/dead deletes are loud
    intercept[IllegalArgumentException] {
      AnnIndex.update(emb.filter($"vec_id" % 9 === 4), path, "u1")
    }
    intercept[IllegalArgumentException] {
      AnnIndex.delete(Seq(4L).toDF("vec_id"), path, "t2")
    }
    // compaction purges physically and serving is unchanged
    AnnIndex.compactDeltas(spark, path)
    val deltas = graft.sources.DeltaStore.committedDeltas(spark, path)
    assert(deltas.size === 1)
    val fs = graft.sources.DeltaStore.fsOf(spark, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(deltas.head, "tombstones")))
    assert(spark.read.parquet(s"${deltas.head}/vectors")
      .filter($"vec_id" % 9 === 4).isEmpty)
    assert(topk(path) === served)
  }

  test("streaming delete feed drains to the one-shot delete state") {
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("r13sdel").toString
    val streamed = base + "/streamed"
    Bm25Index.build(docs, streamed)
    val src = base + "/delsrc"
    docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 3)
      .select("doc_id").repartition(2).write.parquet(src)
    graft.streaming.Streams.deleteStream(spark, src, streamed,
      maxFilesPerTrigger = Some(1))
    // two micro-batches committed two tombstone deltas
    assert(graft.sources.DeltaStore.committedDeltas(spark, streamed).size === 3)
    val oneShot = base + "/oneshot"
    Bm25Index.build(docs, oneShot)
    Bm25Index.delete(docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 10 === 3)
      .select("doc_id"), oneShot, "d")
    assert(scoreMap(Bm25Index.score(spark, streamed)) ===
      scoreMap(Bm25Index.score(spark, oneShot)))
    // drained feed re-runs are no-ops (tags already committed)
    graft.streaming.Streams.deleteStream(spark, src, streamed,
      maxFilesPerTrigger = Some(1))
    assert(graft.sources.DeltaStore.committedDeltas(spark, streamed).size === 3)
  }

  test("PQ tombstone delete serves under frozen codebooks and purges on compaction") {
    import spark.implicits._
    import graft.operators.PqIndex
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("r13pqdel").toString + "/idx"
    PqIndex.build(emb, path)
    val cbBefore = spark.read.parquet(
      graft.sources.DeltaStore.committedDeltas(spark, path)
        .find(d => graft.sources.DeltaStore.fsOf(spark, path)
          .exists(new org.apache.hadoop.fs.Path(d, "pq.params"))).get + "/codebooks")
      .collect().map(_.toString).sorted.toSeq
    PqIndex.delete(emb.filter($"vec_id" % 8 === 5).select("vec_id"), path, "t1")
    def topk(p: String) = PqIndex.searchTopK(spark, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val served = topk(path)
    assert(served.nonEmpty && !served.exists(_._1 % 8 == 5))
    // deletes never retrain: codebooks byte-identical, and the ADC
    // ranking among survivors is untouched (frozen-model contract)
    intercept[IllegalArgumentException] {
      PqIndex.delete(Seq(5L).toDF("vec_id"), path, "t2") // dead id
    }
    PqIndex.compactDeltas(spark, path)
    val deltas = graft.sources.DeltaStore.committedDeltas(spark, path)
    assert(deltas.size === 1)
    val fs = graft.sources.DeltaStore.fsOf(spark, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(deltas.head, "tombstones")))
    assert(spark.read.parquet(s"${deltas.head}/codes")
      .filter($"vec_id" % 8 === 5).isEmpty)
    val cbAfter = spark.read.parquet(s"${deltas.head}/codebooks")
      .collect().map(_.toString).sorted.toSeq
    assert(cbAfter === cbBefore)
    assert(topk(path) === served)
  }
}
