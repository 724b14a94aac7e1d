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

  // ---- streaming PQ ingest ----

  test("streamed PQ ingest equals the batch build-then-update result") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).localCheckpoint()
    val maxId = emb.agg(max("vec_id")).collect()(0).getLong(0)
    val cut = maxId * 4 / 5
    val batch = java.nio.file.Files.createTempDirectory("r12spqb").toString + "/idx"
    graft.operators.PqIndex.build(emb.filter(col("vec_id") <= cut), batch)
    graft.operators.PqIndex.update(emb.filter(col("vec_id") > cut), batch, "t")
    val streamed = java.nio.file.Files.createTempDirectory("r12spqs").toString + "/idx"
    graft.operators.PqIndex.build(emb.filter(col("vec_id") <= cut), streamed)
    val src = java.nio.file.Files.createTempDirectory("r12spqsrc").toString
    emb.filter(col("vec_id") > cut).repartition(2).write.mode("overwrite").parquet(src)
    graft.streaming.Streams.pqIngestStream(spark, src, streamed, Some(1))
    val a = graft.operators.PqIndex.searchTopK(spark, batch).collect().map(_.toSeq)
    val b = graft.operators.PqIndex.searchTopK(spark, streamed).collect().map(_.toSeq)
    assert(b.sameElements(a))
  }

  // ---- PQ/IVF diagnostics ----

  test("pq distortion is zero when every vector is its own codeword") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 16 distinct vectors, ksub=16: the lowest-16-id seeds ARE the
    // corpus, so every subvector sits exactly on a codeword
    val emb = (0 until 16).map { i =>
      (i.toLong, Seq.fill(16)(i * 0.125f - 1.0f))
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("r12dist").toString + "/idx"
    graft.operators.PqIndex.build(emb, path, m = 2, ksub = 16)
    val rows = graft.operators.PqIndex.distortion(spark, path).collect()
    assert(rows.length === 2)
    assert(rows.forall(r => r.getLong(2) === 0L && r.getDouble(3) === 0.0))
    assert(rows.forall(_.getLong(1) === 16L))
  }

  test("ivf list balance shares sum to one over the assigned corpus") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("r12bal").toString + "/idx"
    graft.operators.PqIndex.buildIvfFlat(emb, path)
    val rows = graft.operators.PqIndex.listBalance(spark, path).collect()
    val total = rows.map(_.getLong(1)).sum
    val nonNull = emb.filter(org.apache.spark.sql.functions.col("embedding").isNotNull).count()
    assert(total === nonNull)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3)
  }

  // ---- review queue ----

  test("review queue is a deterministic size-k subset of the verified pairs") {
    val path = java.nio.file.Files.createTempDirectory("r12rq").toString + "/s"
    DedupStore.build(Tables.documents(spark, sf), path)
    val q1 = DedupStore.reviewQueue(spark, path, k = 5).collect().map(_.toSeq)
    val q2 = DedupStore.reviewQueue(spark, path, k = 5).collect().map(_.toSeq)
    assert(q1.sameElements(q2))
    assert(q1.length <= 5)
    val ver = DedupStore.verifiedNearDups(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q1.forall(r => ver.contains((r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))))
  }

  test("jaccardHistogram bins the full candidate mass including exact copies at bin 20") {
    val path = buildStore("r12jh")
    val rows = graft.operators.DedupStore.jaccardHistogram(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.keySet.forall(b => b >= 0L && b <= 20L))
    // total mass equals the staged pair count
    assert(rows.values.sum === graft.operators.DedupStore.pairStats(spark, path).count())
  }

  test("winnowingPairs surfaces long shared runs and drops boilerplate fingerprints") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " tailone aa bb"),
      (2L, shared + " tailtwo cc dd"),
      (3L, "unrelated words apart entirely distinct tokens here")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.winnowingPairs(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L)) >= 3L)
    // a fingerprint shared by MORE than dfCap docs is boilerplate:
    // with dfCap=2, the pair shared by all three drops below minShared
    val boiler = Seq(
      (1L, shared), (2L, shared), (3L, shared)).toDF("doc_id", "text")
    val caps = graft.operators.TextAnalysis
      .winnowingPairs(boiler, dfCap = 2).collect()
    assert(caps.isEmpty)
  }

  // ---- relational additions ----

  test("cohortRevenue builds the retention triangle with exact micros") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // customer 1: first order 1995-01, repeat in 1995-03 (months_since 2)
    // customer 2: first order 1995-03 only — lands in its own cohort
    val orders = Seq(
      (1L, 1L, ts("1995-01-15 00:00:00"), 10.5),
      (2L, 1L, ts("1995-03-02 00:00:00"), 5.25),
      (3L, 2L, ts("1995-03-20 00:00:00"), 7.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.operators.Relational.cohortRevenue(orders).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val m9501 = 1995 * 12 + 1
    val m9503 = 1995 * 12 + 3
    assert(got === Map(
      (m9501.toLong, 0L) -> ((1L, 1L, 10500000L)),
      (m9501.toLong, 2L) -> ((1L, 1L, 5250000L)),
      (m9503.toLong, 0L) -> ((1L, 1L, 7000000L))))
  }

  test("fanoutHistogram counts keys per fanout bucket") {
    import spark.implicits._
    val li = Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1), (3L, 1), (3L, 2))
      .toDF("l_orderkey", "l_linenumber")
    val got = graft.operators.Relational.fanoutHistogram(li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(3L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("ivfTune recall is monotone in nProbe and hits 1.0 at full probe depth") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("r12tune").toString + "/idx"
    graft.operators.PqIndex.buildIvfFlat(emb, path)
    val rows = graft.operators.PqIndex.ivfTune(spark, path,
        probeGrid = Seq(1, 2, 4, 16)).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(rows.keySet === Set(1L, 2L, 4L, 16L))
    assert(rows(1L) <= rows(2L) + 1e-9 && rows(2L) <= rows(4L) + 1e-9)
    assert(rows(16L) === 1.0) // probing every list IS the exact scan
    assert(rows.values.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("dedupSavings partitions the corpus and bounds the drop") {
    val docs = Tables.documents(spark, sf).localCheckpoint()
    val path = java.nio.file.Files.createTempDirectory("r12sav").toString + "/s"
    DedupStore.build(docs, path)
    val rows = graft.operators.DedupStore.dedupSavings(docs, path).collect()
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val survivors = graft.operators.DedupStore.dropDuplicates(docs, path).count()
    assert(rows.map(_.getLong(2)).sum === docs.count() - survivors)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3)) // chars_dropped <= chars_total
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 100.0)
    }
  }

  test("modalityMix shares sum to one within every source") {
    val rows = graft.operators.Multimodal
      .modalityMix(spark, Tables.documents(spark, sf)).collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-3, src)
    }
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("sourceLengthProfile computes the exact midpoint median") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "s1", 1L), (2L, "b", "s1", 2L), (3L, "c", "s1", 4L),
      (4L, "d", "s2", 1L), (5L, "e", "s2", 2L), (6L, "f", "s2", 4L), (7L, "g", "s2", 10L))
      .toDF("doc_id", "text", "source", "n_chars")
    val got = graft.operators.TextAnalysis.sourceLengthProfile(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got("s1") === ((3L, 1L, 2.0, 4L)))  // odd count: middle value
    assert(got("s2") === ((4L, 1L, 3.0, 10L))) // even count: midpoint of 2 and 4
  }

  test("pairCosHistogram bins a bounded sample into [-10, 10]") {
    val rows = graft.operators.Ann
      .pairCosHistogram(Tables.embeddings(spark, sf)).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total > 0 && total <= 100L * 100L)
    assert(rows.forall(r => r.getLong(0) >= -10L && r.getLong(0) <= 10L))
    // deterministic: identical draw on a second run
    val again = graft.operators.Ann
      .pairCosHistogram(Tables.embeddings(spark, sf)).collect()
    assert(again.map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("PQ compaction folds to one delta and changes no served row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).localCheckpoint()
    val maxId = emb.agg(max("vec_id")).collect()(0).getLong(0)
    val cut = maxId * 4 / 5
    val path = java.nio.file.Files.createTempDirectory("r12cpt").toString + "/idx"
    graft.operators.PqIndex.build(emb.filter($"vec_id" <= cut), path)
    graft.operators.PqIndex.update(emb.filter($"vec_id" > cut), path, "t1")
    val before = graft.operators.PqIndex.searchTopK(spark, path).collect().map(_.toSeq)
    graft.operators.PqIndex.compactDeltas(spark, path)
    assert(graft.sources.DeltaStore.committedDeltas(spark, path).size === 1)
    val after = graft.operators.PqIndex.searchTopK(spark, path).collect().map(_.toSeq)
    assert(after.sameElements(before))
    // a replayed ingest tag is STILL a no-op after compaction (the
    // cumulative tag history carries it)
    graft.operators.PqIndex.update(emb.filter($"vec_id" > cut), path, "t1")
    assert(graft.sources.DeltaStore.committedDeltas(spark, path).size === 1)
    assert(graft.operators.PqIndex.searchTopK(spark, path).collect()
      .map(_.toSeq).sameElements(before))
  }

  test("dedup-store compaction folds to one delta and changes no pair") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).localCheckpoint()
    val maxId = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val cut = maxId * 4 / 5
    val path = java.nio.file.Files.createTempDirectory("r12dcpt").toString + "/s"
    DedupStore.build(docs.filter(col("doc_id") <= cut), path)
    DedupStore.update(docs.filter(col("doc_id") > cut), path, "t1")
    val before = DedupStore.verifiedNearDups(spark, path).collect()
      .map(_.toSeq).toSet
    DedupStore.compactDeltas(spark, path)
    assert(graft.sources.DeltaStore.committedDeltas(spark, path).size === 1)
    val after = DedupStore.verifiedNearDups(spark, path).collect()
      .map(_.toSeq).toSet
    assert(after === before)
    // replayed ingest tag stays a no-op through the tag history
    DedupStore.update(docs.filter(col("doc_id") > cut), path, "t1")
    assert(graft.sources.DeltaStore.committedDeltas(spark, path).size === 1)
  }

  test("semantic-store compaction folds to one delta and changes no pair") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).localCheckpoint()
    val maxId = emb.agg(max("vec_id")).collect()(0).getLong(0)
    val cut = maxId * 4 / 5
    val path = java.nio.file.Files.createTempDirectory("r12scpt").toString + "/s"
    graft.operators.SemanticStore.build(emb.filter(col("vec_id") <= cut), path)
    graft.operators.SemanticStore.update(emb.filter(col("vec_id") > cut), path, "t1")
    val before = graft.operators.SemanticStore.cosinePairs(spark, path).collect()
      .map(_.toSeq).toSet
    graft.operators.SemanticStore.compactDeltas(spark, path)
    assert(graft.sources.DeltaStore.committedDeltas(spark, path).size === 1)
    val after = graft.operators.SemanticStore.cosinePairs(spark, path).collect()
      .map(_.toSeq).toSet
    assert(after === before)
  }

  test("activityStreaks separates consecutive runs from scattered days") {
    import spark.implicits._
    val day = 86400000000000L
    // user 1: days 1,2,3 then 10 -> streak 3, active 4
    // user 2: days 5 and 7 -> streak 1, active 2
    val ev = Seq((1L, 1L * day), (1L, 2L * day), (1L, 2L * day + 5),
        (1L, 3L * day), (1L, 10L * day), (2L, 5L * day), (2L, 7L * day))
      .toDF("user_id", "ts")
    val got = graft.operators.Relational.activityStreaks(ev).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((4L, 3L)), 2L -> ((2L, 1L))))
  }

  test("clusterLabels ranks top terms per cluster with the term tiebreak") {
    val rows = graft.operators.Clustering.clusterLabels(
      Tables.embeddings(spark, sf), Tables.documents(spark, sf)).collect()
    val byCluster = rows.groupBy(_.getLong(0))
    byCluster.foreach { case (cid, rs) =>
      assert(rs.length <= 3, s"cluster $cid")
      val ranked = rs.sortBy(_.getLong(3))
      assert(ranked.map(_.getLong(3)).toSeq === (1L to rs.length).toSeq)
      // counts non-increasing down the ranks
      val ns = ranked.map(_.getLong(2))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"cluster $cid")
    }
  }

  test("decayScore halves the weight per week of age and floors at 2^0") {
    import spark.implicits._
    val week = 604800000000000L
    val ev = Seq(
      (1L, 10L * week, 1.0),  // age 0 -> weight 256
      (1L, 9L * week, 1.0),   // age 1 week -> 128
      (2L, 0L * week, 1.0),   // age 10 weeks -> floored at 2^0 = 1
      (2L, 10L * week, 2.0))  // age 0 -> 2 * 256
      .toDF("user_id", "ts", "value")
    val got = graft.operators.Relational.decayScore(ev).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((2L, 1000000L * 256 + 1000000L * 128)),
      2L -> ((2L, 1000000L * 1 + 2000000L * 256))))
  }
}
