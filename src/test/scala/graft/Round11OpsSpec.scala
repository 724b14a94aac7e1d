package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Dedup, DedupStore, Graph, SearchExtras, TextAnalysis}
import graft.sources.Tables

/** Round-11 operator batch: k-core peeling, prefix-duplication report,
  * PII audit, n-gram novelty, the BM25 parameter sweep, and MRR eval.
  * Properties here are the algorithmic guarantees the oracles can't
  * see (peel convergence, slice-equivalence with the pinned-constant
  * ranking, rr arithmetic); value parity is the DuckDB crosscheck. */
class Round11OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)

  // ---- k-core ----

  test("kcore keeps the triangle, peels the chain") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Graph.kcore(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kcore peels a lollipop tail over multiple rounds and converges in budget") {
    import spark.implicits._
    // triangle 1-2-3 with a 6-node tail hanging off node 3: each peel
    // round removes exactly one tail node (the current endpoint), so
    // full convergence genuinely needs 6 rounds — inside the 8-round
    // default budget; the tail's attachment edge dies with node 4
    val tail = (3L to 8L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++ tail).toDF("doc_a", "doc_b")
    val got = Graph.kcore(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (2L, 2L), (3L, 2L)))
    // fixed budget is genuinely a convergence point: more rounds = same
    val more = Graph.kcore(pairs, rounds = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(more === got)
  }

  test("kcore on the gate corpus's verified near-dup graph converges within the budget") {
    val path = java.nio.file.Files.createTempDirectory("r11kcore").toString + "/s"
    DedupStore.build(docs, path)
    val ver = DedupStore.verifiedNearDups(spark, path)
    val at8 = Graph.kcore(ver).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val at12 = Graph.kcore(ver, rounds = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at8 === at12, "8-round budget must be a fixed point on the gate corpus")
    // every survivor has within-core degree >= k by definition of a k-core
    assert(at8.forall(_._2 >= 2))
    // the rep-level weighted peel is exactly the doc-level peel
    val staged = DedupStore.kcoreDegrees(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(staged === at8, "weighted rep-level peel must equal the doc-level peel")
  }

  test("rep-level kcore equals doc-level kcore on a planted copy-heavy corpus") {
    import spark.implicits._
    // 3 near-dup texts (a triangle at rep level) with 1/3/5 exact
    // copies each, a lone pair, and copy-only cliques of 2 and 4 —
    // the multiplicity arithmetic must reproduce every expanded degree
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val texts = Seq(
      base, base + " lambda", base + " lambda mu",       // rep triangle
      "one two three four five six seven", "one two three four five six seven eight",
      "copy clique text here right now ok", "solo text nothing like the others at all")
    val mult = Seq(1, 3, 5, 1, 1, 4, 2)
    val docRows = texts.zip(mult).zipWithIndex.flatMap { case ((t, m), ti) =>
      (0 until m).map(ci => (ti * 100L + ci, t))
    }
    val d = docRows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val path = java.nio.file.Files.createTempDirectory("r11kcopies").toString + "/s"
    DedupStore.build(d, path)
    val docLevel = Graph.kcore(DedupStore.verifiedNearDups(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val repLevel = DedupStore.kcoreDegrees(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(repLevel === docLevel)
    assert(repLevel.nonEmpty)
    // and the edge-class truss equals the doc-level truss, support and all
    val docTruss = Graph.ktruss(DedupStore.verifiedNearDups(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val classTruss = DedupStore.ktrussEdges(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(classTruss === docTruss)
    assert(classTruss.nonEmpty)
    val docTruss4 = Graph.ktruss(DedupStore.verifiedNearDups(spark, path), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val classTruss4 = DedupStore.ktrussEdges(spark, path, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(classTruss4 === docTruss4, "k=4 peel must also agree")
    // triangle counts and clustering coefficients by the same arithmetic
    val docTri = Graph.trianglesFrom(DedupStore.verifiedNearDups(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val repTri = DedupStore.triangleCounts(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(repTri === docTri)
    assert(repTri.nonEmpty)
    val docCc = Graph.clusteringCoef(DedupStore.verifiedNearDups(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val repCc = DedupStore.clusteringCoefs(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(repCc === docCc)
  }

  test("ktruss: 3-truss keeps clique+triangle edges, 4-truss keeps only the clique") {
    import spark.implicits._
    // 4-clique {1..4}, lone triangle {8,9,10}, chain 5-6-7
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val pairs = (clique ++ Seq((8L, 9L), (9L, 10L), (8L, 10L),
      (5L, 6L), (6L, 7L))).toDF("doc_a", "doc_b")
    val t3 = Graph.ktruss(pairs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t3.keySet === (clique ++ Seq((8L, 9L), (9L, 10L), (8L, 10L))).toSet)
    clique.foreach(e => assert(t3(e) === 2L, s"clique edge $e sits in 2 triangles"))
    Seq((8L, 9L), (9L, 10L), (8L, 10L)).foreach(e => assert(t3(e) === 1L))
    val t4 = Graph.ktruss(pairs, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t4 === clique.toSet, "4-truss peels the lone triangle")
    // budget is a genuine fixed point: more rounds = same result
    val more = Graph.ktruss(pairs, k = 4, rounds = 9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(more === t4)
  }

  test("clusteringCoef: clique nodes score 1, chain nodes 0, tri+pendant scores 1/3") {
    import spark.implicits._
    // 4-clique {1,2,3,4}; chain 5-6-7; triangle {8,9,10} with pendant 11 on 8
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val pairs = (clique ++ Seq((5L, 6L), (6L, 7L),
      (8L, 9L), (9L, 10L), (8L, 10L), (8L, 11L))).toDF("doc_a", "doc_b")
    val got = Graph.clusteringCoef(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    (1L to 4L).foreach(n => assert(got(n) === ((3L, 3L, 1.0)), s"clique node $n"))
    assert(got(6L) === ((2L, 0L, 0.0)))     // chain middle: deg 2, no triangle
    assert(got(5L)._3 === 0.0 && got(11L)._3 === 0.0)  // deg-1 nodes
    assert(got(9L) === ((2L, 1L, 1.0)) && got(10L) === ((2L, 1L, 1.0)))
    assert(got(8L) === ((3L, 1L, 0.333333)))  // deg 3, one triangle
  }

  // ---- blocklist screen ----

  test("blocklistScreen flags any-hit docs and counts total hits per source") {
    import spark.implicits._
    val d = Seq(
      (1L, "clean text here", "a"),
      (2L, "spam spam and more spam", "a"),
      (3L, "one broken thing", "a"),
      (4L, "all clean again", "b")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.blocklistScreen(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getLong(1) === 3L)      // n_docs
    assert(got("a").getLong(2) === 2L)      // n_flagged (docs 2 and 3)
    assert(got("a").getLong(3) === 4L)      // total hits: 3 spam + 1 broken
    assert(math.abs(got("a").getDouble(4) - 0.666667) < 1e-9)
    assert(got("b").getLong(2) === 0L && got("b").getDouble(4) === 0.0)
  }

  // ---- source vocabulary overlap ----

  test("sourceJaccard: identical sources score 1, disjoint pairs still report 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta gamma delta", "s2"),   // same shingles as s1
      (3L, "zeta eta theta iota", "s3")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceJaccard(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.size === 3, "all 3 source pairs must report")
    assert(got(("s1", "s2")) === ((2L, 2L, 2L, 1.0)))
    assert(got(("s1", "s3")) === ((2L, 2L, 0L, 0.0)))
    assert(got(("s2", "s3"))._4 === 0.0)
  }

  // ---- prefix duplication ----

  test("prefixDups groups identical 8-token prefixes, skips short docs and singletons") {
    import spark.implicits._
    val boiler = "terms of service licensed under the apache two"
    val d = Seq(
      (10L, s"$boiler body alpha beta"),
      (11L, s"$boiler completely different tail text"),
      (12L, "unique opening eight tokens here right now ok tail"),
      (13L, "short doc")).toDF("doc_id", "text")
    val got = Dedup.prefixDups(d).collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 2L)           // n_docs
    assert(got(0).getLong(2) === 10L)          // canonical = min doc_id
  }

  // ---- PII audit ----

  test("piiAudit counts emails and long digit runs per source") {
    import spark.implicits._
    val d = Seq(
      (1L, "contact a@b.com and c.d@e.org now", "crawl"),
      (2L, "call 12345678 or 999 short", "crawl"),
      (3L, "clean text only", "books")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.piiAudit(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("crawl").getLong(3) === 2L)  // n_emails
    assert(got("crawl").getLong(4) === 1L)  // n_longnums (999 is short)
    assert(got("books").getLong(3) === 0L && got("books").getLong(4) === 0L)
    val crawl = got("crawl")
    val expected = (crawl.getLong(3) + crawl.getLong(4)).toDouble * 10000.0 /
      crawl.getLong(2)
    assert(math.abs(crawl.getDouble(5) - expected) < 1e-4)
  }

  // ---- n-gram novelty ----

  test("ngramNovelty: fully-seen probe scores 0, fully-unseen probe scores 1") {
    import spark.implicits._
    // ids 0 and 97 are probes (doc_id % 97 == 0); 1..3 are training
    val d = Seq(
      (0L, "alpha beta gamma delta"),          // shingles all appear in doc 1
      (97L, "zeta eta theta iota"),            // no shingle in training
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "other training text entirely here")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getLong(2) === 0L && got(0L).getDouble(3) === 0.0)
    assert(got(97L).getLong(2) === got(97L).getLong(1) &&
      got(97L).getDouble(3) === 1.0)
  }

  test("clusterSizeHistogram partitions the clustered docs; kmeansInertia sums d2") {
    val path = java.nio.file.Files.createTempDirectory("r11hist").toString + "/s"
    DedupStore.build(docs, path)
    val clusters = DedupStore.nearDupClusters(spark, path)
    val hist = DedupStore.clusterSizeHistogram(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.keys.forall(_ >= 2), "near-dup clusters have at least 2 members")
    assert(hist.map { case (sz, n) => sz * n }.sum === clusters.count(),
      "histogram mass equals the clustered doc count")
    val emb = Tables.embeddings(spark, sf)
    val inert = graft.operators.Clustering.kmeansInertia(emb).collect()
    assert(inert.map(_.getLong(1)).sum === emb.count(),
      "every vector lands in exactly one cluster")
    val totalD2 = graft.operators.Clustering.kmeans(emb)
      .agg(sum("d2")).collect()(0).getLong(0)
    assert(inert.map(_.getLong(2)).sum === totalD2)
  }

  test("lDiversity is a subset of kAnonymize with the item floor enforced") {
    val events = Tables.events(spark, sf)
    val ka = graft.operators.Relational.kAnonymize(events).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val ld = graft.operators.Relational.lDiversity(events).collect()
    assert(ld.nonEmpty)
    ld.foreach { r =>
      assert(ka.contains((r.getString(0), r.getLong(1))),
        "every l-diverse group must also be k-anonymous")
      assert(r.getLong(4) >= 3 && r.getLong(3) >= 5)
    }
  }

  test("sourceDiversity: templated source craters, varied source stays high") {
    import spark.implicits._
    val varied = (0 until 10).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e", "varied"))
    val templated = (10 until 20).map(i =>
      (i.toLong, "same old template text every single time", "templated"))
    val d = (varied ++ templated).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceDiversity(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("varied")._3 === 1.0, "all shingles distinct")
    assert(got("templated")._2 === 5L, "one template = 5 distinct shingles")
    assert(got("templated")._3 < 0.2)
  }

  // ---- OOV curve ----

  test("oovCurve is monotone in vocab size and hits 0 once the vocab is covered") {
    val rows = TextAnalysis.oovCurve(docs).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(5L, 10L, 20L, 40L))
    val rates = rows.map(_.getDouble(3))
    assert(rates.zip(rates.tail).forall { case (a, b) => a >= b },
      "bigger vocab can only lower the OOV rate")
    // testdata vocab has < 40 kept terms → the largest grid point covers it
    assert(rates.last === 0.0)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      val expect = 1.0 - r.getLong(1).toDouble / r.getLong(2)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6)
    }
  }

  // ---- BM25 parameter sweep ----

  test("bm25Tune's (K1, B) slice replays the pinned-constant top-3 ranking") {
    val sweep = SearchExtras.bm25Tune(docs).collect()
    val grid = sweep.map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(grid.size === 6, "3 k1 values x 2 b values")
    sweep.groupBy(r => (r.getDouble(0), r.getDouble(1))).foreach { case (g, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L), s"ranks at $g")
    }
    val slice = sweep.filter(r => r.getDouble(0) == Bm25.K1 && r.getDouble(1) == Bm25.B)
      .sortBy(_.getLong(2)).map(r => (r.getLong(3), r.getDouble(4))).toSeq
    val pinned = Bm25.searchTopN(docs, n = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(slice === pinned, "sweep slice at the pinned constants must equal searchTopN")
  }

  // ---- MRR ----

  test("searchMrr: rr is 1/first_rank, 0.0 with null rank when nothing relevant ranks") {
    import spark.implicits._
    val queries = (Bm25.DemoQueries :+ (9 -> "qqqqz zzzzq"))
      .toDF("query_id", "qtext")
    val got = SearchExtras.searchMrr(docs, queries).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got.size === 4)
    // the nonsense query matches no doc: no first rank, rr exactly 0
    assert(got(9).isNullAt(1) && got(9).getDouble(2) === 0.0)
    got.values.filterNot(_.isNullAt(1)).foreach { r =>
      val fr = r.getLong(1)
      assert(fr >= 1 && fr <= 10)
      assert(math.abs(r.getDouble(2) - BigDecimal(1.0 / fr)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // first_rank really is the first RELEVANT rank of the batch run
    val run = Bm25.batchSearch(docs, queries.toDF("query_id", "qtext"))
    val qt = queries.select(col("query_id"),
        explode(graft.functions.Text.rawTokens(col("qtext"))).as("term"))
      .filter(graft.functions.Text.keepToken(col("term"))).distinct()
    val rel = Bm25.tf(docs).join(qt, "term")
      .groupBy("query_id", "doc_id").agg(countDistinct("term").as("nt"))
      .filter(col("nt") >= 2)
    val recomputed = run.join(rel.select("query_id", "doc_id"), Seq("query_id", "doc_id"))
      .groupBy("query_id").agg(min("rk").as("fr")).collect()
      .map(r => r.getInt(0) -> r.getInt(1).toLong).toMap
    got.values.filterNot(_.isNullAt(1)).foreach { r =>
      assert(recomputed(r.getInt(0)) === r.getLong(1))
    }
  }

  test("ltrFeatures: one feature row per run row, with consistent aggregates") {
    import spark.implicits._
    val queries = Bm25.DemoQueries.toDF("query_id", "qtext")
    val run = Bm25.batchSearch(docs, queries).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getDouble(2), r.getInt(3)))).toMap
    val feats = SearchExtras.ltrFeatures(docs, queries).collect()
    assert(feats.length === run.size, "exactly one feature row per run row")
    feats.foreach { r =>
      val key = (r.getInt(0), r.getLong(1))
      val (score, rk) = run(key)
      assert(r.getLong(2) === rk.toLong && r.getDouble(3) === score,
        s"rank/score must replay the batch run for $key")
      val (nMatch, sumTf, maxTf, dl) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(nMatch >= 1 && maxTf >= 1 && sumTf >= maxTf && sumTf >= nMatch)
      assert(dl >= sumTf, "doc length bounds the matched-term tf sum")
      assert(r.getDouble(8) > 0.0 && r.getDouble(8) <= 1.0)
    }
  }

  test("searchMap: AP matches a hand recomputation from the run and relevance") {
    import spark.implicits._
    val queries = (Bm25.DemoQueries :+ (9 -> "qqqqz zzzzq"))
      .toDF("query_id", "qtext")
    val got = SearchExtras.searchMap(docs, queries).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(9) === ((0L, 0L, 0.0)))
    // recompute AP@10 driver-side from the run + the relevance contract
    val run = Bm25.batchSearch(docs, queries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(3)))
    val qt = queries.select(col("query_id"),
        explode(graft.functions.Text.rawTokens(col("qtext"))).as("term"))
      .filter(graft.functions.Text.keepToken(col("term"))).distinct()
    val rel = Bm25.tf(docs).join(qt, "term")
      .groupBy("query_id", "doc_id").agg(countDistinct("term").as("nt"))
      .filter(col("nt") >= 2).select("query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    got.keys.filter(_ != 9).foreach { q =>
      val nRel = rel.count(_._1 == q)
      val hits = run.filter(t => t._1 == q && rel.contains((q, t._2)))
        .map(_._3).sorted.zipWithIndex
      val ap = if (hits.isEmpty) 0.0
        else BigDecimal(hits.map { case (rk, i) => (i + 1).toDouble / rk }.sum /
          math.min(nRel, 10)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(q)._1 === nRel.toLong, s"n_rel for query $q")
      assert(got(q)._2 === hits.length.toLong, s"n_hits for query $q")
      assert(math.abs(got(q)._3 - ap) < 1e-9, s"ap for query $q")
    }
  }
}
